"""§2 extensions, fifty-first wave — the classical means family,
single-frequency spectral power, per-doc token entropy, and
tolerance-bounded as-of joins.

- agg_mean_family: arithmetic / geometric / harmonic / quadratic
  means per order priority — the Pythagorean-means surface with the
  AM ≥ GM ≥ HM invariant visible per group.
- ts_weekly_periodogram: periodogram power at the weekly frequency
  per event-type daily series, with the 7 Fourier weights as shared
  LITERALS so no engine transcendental enters the result.
- llm_token_entropy: per-document unigram Shannon entropy and its
  ln(V)-normalized form — the entropy quality filter.
- join_asof_tolerance: backward as-of join that REJECTS matches
  staler than 2 days (pandas merge_asof's `tolerance` semantics) —
  the freshness-bounded variant of join_asof.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# cos/sin(2πk/7) for k = 0..6, shared literal-for-literal with the
# oracle SQL below so no engine's transcendental implementation can
# leak a last-ulp into the spectral sums
_W7_COS = [math.cos(2 * math.pi * k / 7) for k in range(7)]
_W7_SIN = [math.sin(2 * math.pi * k / 7) for k in range(7)]


@register(
    "agg_mean_family",
    """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
           round(avg(cents) / 100, 4) AS mean_arith,
           round(exp(avg(ln(cents))) / 100, 4) AS mean_geom,
           round(count(*) / sum(1.0 / cents) / 100, 4) AS mean_harm,
           round(sqrt(avg(CAST(cents AS DOUBLE) * cents)) / 100, 4)
               AS mean_quad
    FROM o GROUP BY grp ORDER BY grp
    """,
    tags=("aggregate", "stats"),
)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean means family per order priority: arithmetic,
    geometric (exp∘avg∘ln — the right average for RATES and ratios),
    harmonic (the right average for per-unit prices), and quadratic
    (RMS — the right average for magnitudes), with AM ≥ GM ≥ HM
    holding per group by inequality. Inputs are exact cents; each
    mean is a fixed composition of partial-merged aggregates over
    them (round-4 display absorbs double-sum order drift, registry
    convention). cents² stays far inside double-exact range
    (< 2⁵³ per term; the Σ is the conventional float pass).

    Scale shape: one keyed aggregate, fully map-side-combined."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(
        F.col("o_orderpriority").alias("grp"), cents.alias("cents")
    )
    return (
        base.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("cents") / 100, 4).alias("mean_arith"),
            F.round(F.exp(F.avg(F.log("cents"))) / 100, 4).alias(
                "mean_geom"
            ),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / F.col("cents")) / 100, 4
            ).alias("mean_harm"),
            F.round(
                F.sqrt(F.avg(F.col("cents").cast("double") * F.col("cents")))
                / 100,
                4,
            ).alias("mean_quad"),
        )
        .orderBy("grp")
    )


def _w7_sql(vals: list[float]) -> str:
    return "[" + ", ".join(f"{v!r}" for v in vals) + "]"


@register(
    "ts_weekly_periodogram",
    f"""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) % 7 AS k
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               avg(c) AS mu FROM d GROUP BY event_type
    ),
    f AS (
        SELECT d.event_type, m.n,
               sum((d.c - m.mu) * ({_w7_sql(_W7_COS)})[d.k + 1]) AS re,
               sum((d.c - m.mu) * ({_w7_sql(_W7_SIN)})[d.k + 1]) AS im,
               sum((d.c - m.mu) * (d.c - m.mu)) AS ss
        FROM d JOIN m USING (event_type)
        GROUP BY d.event_type, m.n
    )
    SELECT event_type, n,
           round((re * re + im * im) / n, 4) AS weekly_power,
           round(CASE WHEN ss > 0
                      THEN 2 * (re * re + im * im) / n / ss END, 4)
               AS spectral_share
    FROM f ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_weekly_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram power at the WEEKLY frequency per event-type daily
    series (Schuster 1898; the single-frequency Goertzel shape):
    P(1/7) = |Σ (c_t − μ)·e^(−2πi·t/7)|² / n, plus its share of total
    variance — the direct "is there a weekly cycle and how dominant"
    probe that complements ts_seasonal_strength's decomposition view.
    The seven Fourier weights cos/sin(2πk/7) are emitted as LITERALS
    shared character-for-character between the Spark plan and the
    oracle SQL, so no engine's cos/sin implementation ever enters
    the numbers — the weighted sums are plain float dot products
    over exact integer-centered counts (round-4 display).

    Scale shape: one keyed shuffle to the daily aggregate; the
    spectral sums are one grouped reduce over the calendar-bounded
    axis."""
    e = tbl(spark, sf_dir, "events")
    d = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "k",
            F.pmod(
                F.datediff("day", F.lit("2024-01-01").cast("date")), F.lit(7)
            ).cast("int"),
        )
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.avg("c").alias("mu")
    )
    cosw = F.array(*[F.lit(v) for v in _W7_COS])
    sinw = F.array(*[F.lit(v) for v in _W7_SIN])
    dev = F.col("c") - F.col("mu")
    f = (
        d.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(dev * F.element_at(cosw, F.col("k") + 1)).alias("re"),
            F.sum(dev * F.element_at(sinw, F.col("k") + 1)).alias("im"),
            F.sum(dev * dev).alias("ss"),
        )
    )
    power = (F.col("re") * F.col("re") + F.col("im") * F.col("im")) / F.col(
        "n"
    )
    return f.select(
        "event_type",
        "n",
        F.round(power, 4).alias("weekly_power"),
        F.round(
            F.when(F.col("ss") > 0, 2 * power / F.col("ss")), 4
        ).alias("spectral_share"),
    ).orderBy("event_type")


@register(
    "llm_token_entropy",
    """
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    ),
    tot AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS v
        FROM cnt GROUP BY doc_id
    )
    SELECT c.doc_id, t.n AS n_tokens, t.v AS n_types,
           round(-sum((CAST(c.c AS DOUBLE) / t.n)
                      * ln(CAST(c.c AS DOUBLE) / t.n)), 4) AS entropy_nats,
           round(CASE WHEN t.v > 1
                      THEN -sum((CAST(c.c AS DOUBLE) / t.n)
                                * ln(CAST(c.c AS DOUBLE) / t.n)) / ln(t.v)
                      ELSE 0.0 END, 4) AS entropy_norm
    FROM cnt c JOIN tot t USING (doc_id)
    GROUP BY c.doc_id, t.n, t.v
    ORDER BY c.doc_id
    """,
    tags=("llm", "text"),
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy and its ln(V)-normalized
    form (Shannon 1948; the entropy quality filter): low normalized
    entropy = a few tokens dominate (keyword stuffing, templates),
    ≈1 = tokens near-uniform. Token counts are exact int64 per
    (doc, token); each share is one correctly-rounded division; the
    Σ p·ln p reduce is per-doc (round-4, theil convention) and the
    normalizer ln(V) divides once.

    Scale shape: one explode + one (doc, token) keyed aggregate with
    map-side combine; doc totals re-aggregate FROM it; everything
    joins back on doc_id."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    t = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    cnt = t.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    share = F.col("c").cast("double") / F.col("n")
    ent = -F.sum(share * F.log(share))
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", F.col("n").alias("n_tokens"), F.col("v").alias("n_types"))
        .agg(
            F.round(ent, 4).alias("entropy_nats"),
            F.round(
                F.when(
                    F.col("n_types") > 1, ent / F.log(F.col("n_types"))
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("entropy_norm"),
        )
        .orderBy("doc_id")
    )


@register(
    "join_asof_tolerance",
    """
    WITH probes AS (
        SELECT DISTINCT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS probe_ts
        FROM events
    ), ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(value, event_id) AS value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    , matched AS (
        SELECT p.user_id, p.probe_ts, e.ts AS ev_ts, e.value
        FROM probes p
        ASOF JOIN ev e ON e.user_id = p.user_id AND e.ts <= p.probe_ts
    )
    SELECT user_id, probe_ts, value AS asof_value
    FROM matched
    -- exact-µs staleness decision (a date_diff('hour') would truncate
    -- and disagree with the engine's timestamp compare at boundaries)
    WHERE epoch_us(probe_ts) - epoch_us(ev_ts)
          <= CAST(172800 AS BIGINT) * 1000000

    ORDER BY user_id, probe_ts
    """,
    tags=("join",),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of join (pandas merge_asof's
    `tolerance`): the latest event value at-or-before each probe,
    but matches STALER than 2 days are rejected — the semantics a
    freshness-gated feature join actually needs (an as-of match from
    last month is not a feature, it's a bug). Built on the same
    union+window core as join_asof, with the matched event packed as
    a (ts, value) STRUCT so the staleness test runs on the matched
    timestamp after the asof pass; the tolerance decision is a pure
    timestamp comparison (exact µs integers under the hood). Oracle:
    DuckDB's native ASOF JOIN + the same interval predicate — an
    independent implementation.

    Scale shape: identical to join_asof — one shuffle, O(1) window
    state per key, then a map-side filter."""
    from hadoop_deliver_spark.api import asof_join

    ev = tbl(spark, sf_dir, "events")
    e = (
        ev.groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("val"))
        .select(
            "user_id",
            "ts",
            F.struct(F.col("ts").alias("ev_ts"), F.col("val").alias("v")).alias(
                "value"
            ),
        )
    )
    probes = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("ts")
    ).distinct()
    matched = asof_join(
        e, probes, ["user_id"], "ts", "value", forward=False, out="m"
    )
    return (
        matched.filter(
            F.col("m.ev_ts") >= F.col("ts") - F.expr("INTERVAL 2 DAYS")
        )
        .select(
            "user_id",
            F.col("ts").alias("probe_ts"),
            F.col("m.v").alias("asof_value"),
        )
        .orderBy("user_id", "probe_ts")
    )
