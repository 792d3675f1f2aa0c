"""§2 extensions, sixty-eighth wave — symbolic time-series encoding,
the oldest significance test, embedding-spectrum health, and
compaction planning.

- ts_sax_symbols: SAX symbolic encoding (PAA + Gaussian breakpoints)
  of each event type's daily revenue series — the discretization
  behind time-series motif mining.
- events_sign_test: the week-over-week paired sign test per type —
  Arbuthnott's 1710 test with a purely integer significance verdict.
- llm_embedding_spectrum: eigenvalue spectrum health of the
  embedding corpus — effective rank and participation ratio
  (rows-only: driver-side eigendecomposition).
- delivery_compaction_plan: sequential fixed-quota grouping of
  per-source payloads into compaction bins — the small-file merge
  planner, exact integer cumulative quotas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# SAX alphabet-4 Gaussian breakpoints (Lin et al. 2003, Table 3) —
# ±0.6745 ≈ Φ⁻¹(3/4); literals shared with the oracle
_SAX_B = 0.6745
# compaction quota: 64 KiB of text per bin on the fixture
_QUOTA = 65536


@register(
    "ts_sax_symbols",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS q
        FROM daily GROUP BY event_type
    ),
    idx AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
                   AS i
        FROM daily
    ),
    paa AS (
        SELECT event_type, i // 3 AS w,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(cents) AS BIGINT) AS s3
        FROM idx GROUP BY 1, 2
    ),
    z AS (
        SELECT p.event_type, p.w,
               m.n * p.s3 - 3 * m.s AS num,
               sqrt(CAST(m.n AS DOUBLE) * m.q - CAST(m.s AS DOUBLE) * m.s)
                   AS sd_scaled
        FROM paa p JOIN m USING (event_type)
        WHERE p.cnt = 3
    )
    SELECT event_type, w AS window_id,
           round(num / (3.0 * sd_scaled), 4) AS paa_z,
           CASE WHEN num < -{_SAX_B!r} * 3 * sd_scaled THEN 'a'
                WHEN num < 0 THEN 'b'
                WHEN num < {_SAX_B!r} * 3 * sd_scaled THEN 'c'
                ELSE 'd' END AS symbol
    FROM z ORDER BY event_type, window_id
    """,
    tags=("timeseries",),
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic encoding (Symbolic Aggregate approXimation — Lin,
    Keogh, Lonardi & Chiu 2003) of each event type's daily revenue:
    z-normalize per series, Piecewise Aggregate Approximation over
    3-day windows, then map each PAA mean to a 4-letter alphabet at
    the Gaussian breakpoints {{−0.6745, 0, 0.6745}} — the
    discretization that makes time series grep-able (motif mining,
    anomaly grammars, indexable subsequences). Cross-engine
    exactness: the symbol decision cross-multiplies to
    n·Σ₃x − 3S ≷ b·3·√(nQ − S²) — the left side is an exact int64,
    the zero breakpoint is a PURE integer sign test, and the ±b
    boundaries pit an integer against a literal×√(non-square)
    irrational, which never parks. Partial trailing windows drop by
    exact count compare.

    Scale shape: one keyed daily aggregate, a per-type moment
    reduce, a (type, window) keyed PAA aggregate — windows over the
    calendar-bounded day axis only."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    widx = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "cents",
        (F.row_number().over(widx) - 1).alias("i"),
    )
    paa = (
        idx.groupBy("event_type", F.expr("i div 3").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("cents").cast("long").alias("s3"),
        )
        .filter(F.col("cnt") == 3)
    )
    z = paa.join(m, "event_type").select(
        "event_type",
        "w",
        (F.col("n") * F.col("s3") - 3 * F.col("s")).alias("num"),
        F.sqrt(
            F.col("n").cast("double") * F.col("q")
            - F.col("s").cast("double") * F.col("s")
        ).alias("sd_scaled"),
    )
    thr = F.lit(_SAX_B) * 3 * F.col("sd_scaled")
    return z.select(
        "event_type",
        F.col("w").alias("window_id"),
        F.round(F.col("num") / (3.0 * F.col("sd_scaled")), 4).alias(
            "paa_z"
        ),
        F.when(F.col("num") < -thr, "a")
        .when(F.col("num") < 0, "b")
        .when(F.col("num") < thr, "c")
        .otherwise("d")
        .alias("symbol"),
    ).orderBy("event_type", "window_id")


@register(
    "events_sign_test",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, c,
               lag(c, 7) OVER (PARTITION BY event_type ORDER BY day)
                   AS c_prev
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) FILTER (c <> c_prev) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (c > c_prev) AS BIGINT) AS n_up,
           round((2.0 * count(*) FILTER (c > c_prev)
                  - count(*) FILTER (c <> c_prev))
                 / sqrt(CAST(count(*) FILTER (c <> c_prev) AS DOUBLE)),
                 4) AS z,
           625 * (2 * count(*) FILTER (c > c_prev)
                  - count(*) FILTER (c <> c_prev))
               * (2 * count(*) FILTER (c > c_prev)
                  - count(*) FILTER (c <> c_prev))
               > 2401 * count(*) FILTER (c <> c_prev) AS significant
    FROM lagged WHERE c_prev IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "stats"),
)
def events_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week paired sign test per event type (Arbuthnott
    1711 — the oldest significance test in the literature; the
    normal approximation per standard practice): compare each day to
    the same weekday one week earlier, count ups among non-ties, and
    test S ~ Binomial(n, ½) — a growth/decline verdict immune to the
    magnitude outliers that distort mean-based week-over-week
    deltas; the paired complement of ts_runs_test's sequence check.
    Purely integer verdict: with z_{α/2} = 1.96 = 49/25 EXACTLY
    rational, |2S − n| > 1.96·√n cross-multiplies to
    625·(2S − n)² > 2401·n — both sides exact int64, so the flag
    cannot park on the boundary; only the displayed z is float.

    Scale shape: one keyed daily aggregate, one lag-7 window per
    type over the calendar-bounded day axis, one conditional
    reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "c",
        F.lag("c", 7).over(w).alias("c_prev"),
    ).filter(F.col("c_prev").isNotNull())
    n = F.count_if(F.col("c") != F.col("c_prev")).cast("long")
    s = F.count_if(F.col("c") > F.col("c_prev")).cast("long")
    return (
        lagged.groupBy("event_type")
        .agg(
            n.alias("n_pairs"),
            s.alias("n_up"),
            F.round(
                (2.0 * s - n) / F.sqrt(n.cast("double")), 4
            ).alias("z"),
            (
                625 * (2 * s - n) * (2 * s - n) > 2401 * n
            ).alias("significant"),
        )
        .orderBy("event_type")
    )


@register("llm_embedding_spectrum", None)  # rows-only: driver eigh
def llm_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-spectrum health check: the eigenvalue spectrum of
    the corpus's uncentered second-moment matrix — reported as the
    top-8 eigenvalue shares, the participation ratio (Σλ)²/Σλ²
    (the physics "effective dimensionality"; ≈ d for isotropic
    embeddings, ≈ 1 for collapsed ones) and its share of the ambient
    dimension. Representation collapse (all vectors near one
    direction) silently destroys cosine-based dedup and ANN recall —
    this is the one-query monitor for it, and the same spectrum that
    justified the cosine core's data-dependent principal axes
    (api._principal_directions, whose distributed moment pass this
    reuses). Rows-only: the eigendecomposition runs on the driver's
    d×d moment matrix (d=64 — tiny), so there is no SQL twin; the
    embedded flag asserts participation ratio ≥ 8 (an 8× collapse
    alarm on the 64-dim fixture).

    Scale shape: one mapInPandas partial-moment pass (d×d per
    partition) + driver eigh of the d×d matrix — the corpus is never
    collected."""
    import numpy as np
    import pandas as pd

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    # distributed uncentered second moment (same pass as the cosine
    # core's axis trainer, api._principal_directions), then the tiny
    # d×d eigh on the driver

    def moments(batches):
        mats = None
        cnt = 0
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: np.stack would raise
                continue
            arr = np.stack(pdf["e"].to_numpy())
            m = arr.T @ arr
            mats = m if mats is None else mats + m
            cnt += arr.shape[0]
        if mats is not None:
            d = mats.shape[0]
            yield pd.DataFrame(
                {"i": [0], "n": [cnt], "flat": [mats.reshape(-1).tolist()]}
            )

    parts = emb.select("e").mapInPandas(
        moments, "i int, n long, flat array<double>"
    )
    rows = parts.collect()
    if not rows:
        return spark.createDataFrame(
            [], "rank int, eig_share double, participation_ratio double, "
            "effective_dim_share double, healthy boolean"
        )
    d = int(len(rows[0]["flat"]) ** 0.5)
    total = np.zeros((d, d))
    for r in rows:
        total += np.array(r["flat"]).reshape(d, d)
    eig = np.linalg.eigvalsh(total)[::-1]
    eig = np.clip(eig, 0, None)
    pr = float(eig.sum() ** 2 / (eig**2).sum())
    shares = eig / eig.sum()
    out = [
        (
            int(i + 1),
            float(round(shares[i], 6)),
            float(round(pr, 4)),
            float(round(pr / d, 4)),
            bool(pr >= 8.0),
        )
        for i in range(min(8, d))
    ]
    return spark.createDataFrame(
        out,
        "rank int, eig_share double, participation_ratio double, "
        "effective_dim_share double, healthy boolean",
    )


@register(
    "delivery_compaction_plan",
    f"""
    WITH sizes AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS bytes
        FROM documents GROUP BY source
    ),
    cum AS (
        SELECT source, bytes,
               CAST(sum(bytes) OVER (ORDER BY source
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_bytes
        FROM sizes
    )
    SELECT source, bytes,
           CAST((cum_bytes - bytes) // {_QUOTA} AS BIGINT) AS bin,
           cum_bytes - CAST((cum_bytes - bytes) // {_QUOTA} AS BIGINT)
               * {_QUOTA} AS bin_fill
    FROM cum ORDER BY source
    """,
    tags=("delivery",),
)
def delivery_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: assign each source's payload
    to a compaction bin by fixed-quota sequential grouping — bin =
    (cumulative bytes before me) div quota over the name-ordered
    source list, the deterministic shuffle-free assignment that
    table-format compactors (bin-pack strategies in lakehouse
    OPTIMIZE implementations) use for sorted runs; next to
    sink_compact_small_files (which merges by repartition) this is
    the PLAN — which inputs land in which output group and how full
    each group runs, so the operator is auditable before any I/O.
    All arithmetic is exact int64 (byte sums, one integer division);
    the only window is the cumulative sum over the source list —
    domain-bounded (allowlisted), with the block-ranked cumsum core
    the documented swap if the file list outgrows a task.

    Scale shape: one keyed byte sum with map-side combine, a
    file-list-sized cumulative window."""
    d = tbl(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("bytes")
    )
    wcum = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sizes.withColumn(
        "cum_bytes", F.sum("bytes").over(wcum).cast("long")
    )
    return cum.select(
        "source",
        "bytes",
        F.expr(f"(cum_bytes - bytes) div {_QUOTA}").cast("long").alias(
            "bin"
        ),
        (
            F.col("cum_bytes")
            - F.expr(f"(cum_bytes - bytes) div {_QUOTA}").cast("long")
            * _QUOTA
        ).alias("bin_fill"),
    ).orderBy("source")
