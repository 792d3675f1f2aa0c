"""§2 extensions, fifty-fourth wave — unseen-mass estimation,
truncated path centrality, contest scoring, and circular time
statistics.

- llm_good_turing: the Good-Turing estimate of unseen-vocabulary
  mass and smoothed low-count probabilities per source — what
  count-of-counts are FOR.
- graph_katz_centrality: Katz centrality truncated at path length
  3 with an exact-binary β = 1/8 — integer path counts, exact
  weighted sum, zero iteration drift.
- agg_olympic_mean: the olympic (trimmed-by-one) average per order
  priority — drop exactly one min and one max, exact integer
  arithmetic until the single final division.
- events_circular_mean: the circular mean activity hour and
  resultant length per event type (directional statistics) — the
  right average for hours-of-day, where the arithmetic mean of
  23:00 and 01:00 is nonsense.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# cos/sin(2πh/24) for h = 0..23 — literals shared with the oracle so
# no engine transcendental enters the circular sums
_W24_COS = [math.cos(2 * math.pi * h / 24) for h in range(24)]
_W24_SIN = [math.sin(2 * math.pi * h / 24) for h in range(24)]


def _arr_sql(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]"


@register(
    "llm_good_turing",
    """
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS r
        FROM t GROUP BY 1, 2
    ),
    coc AS (
        SELECT source, r, CAST(count(*) AS BIGINT) AS nr
        FROM cnt GROUP BY source, r
    ),
    tot AS (
        SELECT source, CAST(sum(r * nr) AS BIGINT) AS n
        FROM coc GROUP BY source
    )
    SELECT c.source,
           CAST(max(t.n) AS BIGINT) AS n_tokens,
           round(CAST(max(CASE WHEN c.r = 1 THEN c.nr END) AS DOUBLE)
                 / max(t.n), 6) AS p_unseen,
           round(CAST(2 * max(CASE WHEN c.r = 2 THEN c.nr END) AS DOUBLE)
                 / max(CASE WHEN c.r = 1 THEN c.nr END), 6) AS r_star_1,
           round(CAST(3 * max(CASE WHEN c.r = 3 THEN c.nr END) AS DOUBLE)
                 / max(CASE WHEN c.r = 2 THEN c.nr END), 6) AS r_star_2
    FROM coc c JOIN tot t USING (source)
    GROUP BY c.source ORDER BY c.source
    """,
    tags=("llm", "lm"),
)
def llm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing estimation (Good 1953) per source from the
    count-of-counts table: the unseen-vocabulary mass P₀ = N₁/N (the
    probability the NEXT token is a word never seen in this source —
    the number that decides how much smoothing a LM needs and how
    under-sampled a corpus slice is) and the smoothed adjusted
    counts r* = (r+1)·N_{r+1}/N_r for r = 1, 2. All inputs are exact
    int64 count-of-counts; each output is one correctly-rounded
    division (round-6 display). The dis-legomena feed
    llm_hapax_ratio surfaces raw; this op turns them into the
    estimator they exist for.

    Scale shape: one (source, term) keyed aggregate, then the
    count-of-counts re-aggregation FROM it — the second table is
    max(r)-bounded, tiny at any corpus scale."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    coc = cnt.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("long").alias("nr")
    )
    tot = coc.groupBy("source").agg(
        F.sum(F.col("r") * F.col("nr")).cast("long").alias("n")
    )

    def nr_at(r: int):
        return F.max(F.when(F.col("r") == r, F.col("nr")))

    return (
        coc.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.round(nr_at(1).cast("double") / F.max("n"), 6).alias(
                "p_unseen"
            ),
            F.round((2 * nr_at(2)).cast("double") / nr_at(1), 6).alias(
                "r_star_1"
            ),
            F.round((3 * nr_at(3)).cast("double") / nr_at(2), 6).alias(
                "r_star_2"
            ),
        )
        .orderBy("source")
    )


@register(
    "graph_katz_centrality",
    """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    p1 AS (SELECT p, CAST(count(*) AS BIGINT) AS n1 FROM edges GROUP BY p),
    -- paths of length 2 ending at a customer, length 3 ending at a part
    c2 AS (
        SELECT e.c, CAST(sum(p1.n1) AS BIGINT) AS n2
        FROM edges e JOIN p1 USING (p) GROUP BY e.c
    ),
    p3 AS (
        SELECT e.p, CAST(sum(c2.n2) AS BIGINT) AS n3
        FROM edges e JOIN c2 USING (c) GROUP BY e.p
    )
    SELECT p AS part_id, n1, n3,
           round(0.125 * n1 + 0.001953125 * n3, 4) AS katz
    FROM (SELECT p1.p, p1.n1, p3.n3,
                 row_number() OVER (
                     ORDER BY 0.125 * p1.n1 + 0.001953125 * p3.n3 DESC,
                              p1.p) AS rn
          FROM p1 JOIN p3 USING (p))
    WHERE rn <= 20
    ORDER BY katz DESC, part_id
    """,
    tags=("graph",),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (Katz 1953) truncated at path length 3 on the
    customer↔part purchase graph, attenuation β = 1/8: katz(p) =
    β·paths₁(p) + β³·paths₃(p) (even-length path ends land on
    customers and don't contribute to part scores). Path counts are
    exact int64 through two keyed join-aggregate rounds (the HITS
    machinery), and β = 1/8 makes every weight an exact binary
    double — so the score is an exact sum of two exact products,
    bit-identical across engines, where a power-iteration Katz would
    drift. Top-20 parts with id tiebreak.

    Scale shape: two keyed equi-join + aggregate rounds over the
    deduped edge list; top-k via TakeOrderedAndProject."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    p1 = edges.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    c2 = (
        edges.join(p1, "p")
        .groupBy("c")
        .agg(F.sum("n1").cast("long").alias("n2"))
    )
    p3 = (
        edges.join(c2, "c")
        .groupBy("p")
        .agg(F.sum("n2").cast("long").alias("n3"))
    )
    katz = 0.125 * F.col("n1") + 0.001953125 * F.col("n3")
    return (
        p1.join(p3, "p")
        .withColumn("katz", katz)
        .orderBy(F.desc("katz"), "p")
        .limit(20)
        .select(
            F.col("p").alias("part_id"),
            "n1",
            "n3",
            F.round("katz", 4).alias("katz"),
        )
        .orderBy(F.desc("katz"), "part_id")
    )


@register(
    "agg_olympic_mean",
    """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(cents) - min(cents) - max(cents) AS DOUBLE)
                 / (count(*) - 2) / 100, 4) AS olympic_mean,
           round(CAST(min(cents) AS DOUBLE) / 100, 4) AS dropped_min,
           round(CAST(max(cents) AS DOUBLE) / 100, 4) AS dropped_max
    FROM o GROUP BY grp HAVING count(*) >= 3 ORDER BY grp
    """,
    tags=("aggregate", "stats"),
)
def agg_olympic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The olympic average per order priority — drop exactly one
    minimum and one maximum, average the rest (the judging rule of
    olympic scoring, and the cheapest outlier-resistant mean: one
    wild row cannot move it, unlike the arithmetic mean, while the
    full trimmed mean needs rank machinery). Everything is exact
    int64 (Σ − min − max over cents) until the single final
    division; groups need n ≥ 3.

    Scale shape: one map-side-combined keyed aggregate — min/max/
    sum/count all partial-merge."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(
        F.col("o_orderpriority").alias("grp"), cents.alias("cents")
    )
    return (
        base.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                (F.sum("cents") - F.min("cents") - F.max("cents")).cast(
                    "double"
                )
                / (F.count(F.lit(1)) - 2)
                / 100,
                4,
            ).alias("olympic_mean"),
            F.round(F.min("cents").cast("double") / 100, 4).alias(
                "dropped_min"
            ),
            F.round(F.max("cents").cast("double") / 100, 4).alias(
                "dropped_max"
            ),
        )
        .filter(F.col("n") >= 3)
        .orderBy("grp")
    )


@register(
    "events_circular_mean",
    f"""
    WITH h AS (
        SELECT event_type,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
               sum(c * ({_arr_sql(_W24_COS)})[hr + 1]) AS sc,
               sum(c * ({_arr_sql(_W24_SIN)})[hr + 1]) AS ss
        FROM h GROUP BY event_type
    )
    SELECT event_type, n,
           round(24 * (atan2(ss, sc) / (2 * pi())
                       + CASE WHEN atan2(ss, sc) < 0 THEN 1 ELSE 0 END),
                 4) AS mean_hour,
           round(sqrt(sc * sc + ss * ss) / n, 4) AS resultant_r
    FROM s ORDER BY event_type
    """,
    tags=("analytics", "stats"),
)
def events_circular_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular mean activity hour per event type (directional
    statistics, Fisher 1993): hours map to unit-circle angles, the
    mean direction atan2(Σsin, Σcos) maps back to an hour, and the
    resultant length R ∈ [0,1] says how CONCENTRATED activity is
    (R→1: one daily peak; R→0: uniform around the clock) — the right
    average for time-of-day, where the arithmetic mean of 23:00 and
    01:00 is noon. The 24 angle weights are LITERALS shared with the
    oracle; the weighted sums run over the 24-row hour histogram
    with exact integer counts; atan2/sqrt evaluate once per type on
    identical doubles.

    Scale shape: one keyed (type, hour) aggregate — the circular
    reduce runs on ≤ 24 rows per type."""
    e = tbl(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cosw = F.array(*[F.lit(v) for v in _W24_COS])
    sinw = F.array(*[F.lit(v) for v in _W24_SIN])
    s = h.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.element_at(cosw, F.col("hr") + 1)).alias("sc"),
        F.sum(F.col("c") * F.element_at(sinw, F.col("hr") + 1)).alias("ss"),
    )
    ang = F.atan2(F.col("ss"), F.col("sc"))
    mean_hour = 24 * (
        ang / (2 * math.pi) + F.when(ang < 0, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return s.select(
        "event_type",
        "n",
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(
            F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
            / F.col("n"),
            4,
        ).alias("resultant_r"),
    ).orderBy("event_type")
