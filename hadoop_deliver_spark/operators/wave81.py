"""§2 extensions, eighty-first wave — the Sen-slope confidence
interval and a species-richness/coverage profile.

- ts_sen_slope_ci: Gilbert's (1987) distribution-free confidence
  interval for the Theil-Sen slope — the interval the point estimate
  (ts_theil_sen) and the verdict (ts_mann_kendall) have been missing:
  CI bounds are ORDER STATISTICS of the pairwise slopes at ranks set
  by the Mann-Kendall variance, so the whole interval is
  selection-by-rank, no distributional assumption.
- agg_chao1_richness: the Chao1 nonparametric species-richness
  estimator (1984; bias-corrected 1987 form) with Good-Turing sample
  coverage (1953) over the parts "species" of lineitem — the data-
  profiling question "how many distinct values does the full
  population hold, and how much of it has this sample seen?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# z_{0.975} = 1.959964, shared textually (the transcendental-parity
# convention)
_Z975 = "1.959964"


@register(
    "ts_sen_slope_ci",
    f"""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x
        FROM events GROUP BY 1, 2, 4
    ),
    slopes AS (
        SELECT a.event_type,
               CAST(b.c - a.c AS DOUBLE) / (b.x - a.x) AS s,
               a.x AS xa, b.x AS xb,
               row_number() OVER (PARTITION BY a.event_type
                   ORDER BY CAST(b.c - a.c AS DOUBLE) / (b.x - a.x),
                            a.x, b.x) AS rn,
               count(*) OVER (PARTITION BY a.event_type) AS m
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.x < b.x
    ),
    vt AS (
        SELECT event_type,
               CAST(sum(tc) AS BIGINT) AS n,
               CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie18
        FROM (SELECT event_type, c, count(*) AS tc
              FROM d GROUP BY event_type, c) x
        GROUP BY event_type
    ),
    pos AS (
        SELECT event_type,
               GREATEST(1, CAST(floor(
                   (CAST(n AS DOUBLE) * (n - 1) / 2
                    - {_Z975} * sqrt((CAST(n AS DOUBLE) * (n - 1)
                        * (2 * n + 5) - tie18) / 18)) / 2) AS BIGINT) + 1)
                   AS r1,
               LEAST((CAST(n AS BIGINT) * (n - 1)) // 2,
                   CAST(ceil(
                   (CAST(n AS DOUBLE) * (n - 1) / 2
                    + {_Z975} * sqrt((CAST(n AS DOUBLE) * (n - 1)
                        * (2 * n + 5) - tie18) / 18)) / 2) AS BIGINT))
                   AS r2,
               n
        FROM vt
    ),
    med AS (
        SELECT event_type, avg(s) AS sen_slope
        FROM slopes
        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        GROUP BY event_type
    ),
    lo AS (
        SELECT s.event_type, max(s.s) AS ci_lo
        FROM slopes s JOIN pos p
          ON p.event_type = s.event_type AND s.rn = p.r1
        GROUP BY s.event_type
    ),
    hi AS (
        SELECT s.event_type, max(s.s) AS ci_hi
        FROM slopes s JOIN pos p
          ON p.event_type = s.event_type AND s.rn = p.r2
        GROUP BY s.event_type
    )
    SELECT p.event_type, p.n AS n_days,
           round(m.sen_slope, 4) AS sen_slope,
           round(l.ci_lo, 4) AS ci_lo,
           round(h.ci_hi, 4) AS ci_hi,
           l.ci_lo > 0 OR h.ci_hi < 0 AS trend_significant
    FROM pos p
    JOIN med m ON m.event_type = p.event_type
    JOIN lo l ON l.event_type = p.event_type
    JOIN hi h ON h.event_type = p.event_type
    ORDER BY p.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_sen_slope_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gilbert's (1987) distribution-free confidence interval for the
    Theil-Sen slope, per event-type daily count series (the
    ts_theil_sen frame): the 95% CI bounds are the order statistics
    of the m = n(n−1)/2 pairwise slopes at ranks R₁ = ⌊(m−C)/2⌋+1
    and R₂ = ⌈(m+C)/2⌉ (clamped to [1, m] — the stated small-m
    knob), with C = z₀.₉₇₅·√Var(S) and Var(S)·18 = n(n−1)(2n+5) −
    Σt(t−1)(2t+5) the EXACT tie-corrected Mann-Kendall variance
    int64 (the ts_mann_kendall device; the CI needs no distribution
    because ranks of slopes, not values of slopes, carry the
    coverage — Sen 1968 / Gilbert 1987). Each slope is one
    correctly-rounded division of exact int64 deltas and the rank
    order uses the (slope, xa, xb) deterministic tiebreak, so the
    selected bounds are bit-identical across engines; the
    trend_significant verdict (CI excludes 0) compares those
    selected doubles to 0, where the sign is exactly the sign of an
    integer delta. Completes the trend triple: ts_mann_kendall says
    WHETHER, ts_theil_sen says HOW MUCH, this says HOW PRECISELY.

    Scale shape: the pairwise join runs on the calendar-bounded
    per-type daily aggregate (≤ days² pairs per type at any corpus
    scale); rank windows partition by type; two 1-row-per-type
    rank-probe joins select the bounds."""
    e = tbl(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    d = d.select(
        "event_type",
        "c",
        F.datediff("day", F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    )
    a = d.select(
        "event_type", F.col("c").alias("ca"), F.col("x").alias("xa")
    )
    b = d.select(
        F.col("event_type").alias("et_b"),
        F.col("c").alias("cb"),
        F.col("x").alias("xb"),
    )
    slope = (F.col("cb") - F.col("ca")).cast("double") / (
        F.col("xb") - F.col("xa")
    )
    w_rn = Window.partitionBy("event_type").orderBy("s", "xa", "xb")
    w_m = Window.partitionBy("event_type")
    slopes = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("xa") < F.col("xb")),
        )
        .withColumn("s", slope)
        .select("event_type", "s", "xa", "xb")
        .withColumn("rn", F.row_number().over(w_rn))
        .withColumn("m", F.count(F.lit(1)).over(w_m))
    )
    vt = (
        d.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("tc"))
        .groupBy("event_type")
        .agg(
            F.sum("tc").cast("long").alias("n"),
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            )
            .cast("long")
            .alias("tie18"),
        )
    )
    n = F.col("n")
    nd = n.cast("double")
    half_m = nd * (n - 1) / 2
    c_alpha = float(_Z975) * F.sqrt(
        (nd * (n - 1) * (2 * n + 5) - F.col("tie18")) / 18
    )
    pos = vt.select(
        "event_type",
        "n",
        F.greatest(
            F.lit(1),
            F.floor((half_m - c_alpha) / 2).cast("long") + 1,
        ).alias("r1"),
        F.least(
            (n.cast("long") * (n - 1) / 2).cast("long"),
            F.ceil((half_m + c_alpha) / 2).cast("long"),
        ).alias("r2"),
    )
    med = (
        slopes.filter(
            (F.col("rn") == F.expr("(m + 1) div 2"))
            | (F.col("rn") == F.expr("(m + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(F.avg("s").alias("sen_slope"))
    )
    lo = (
        slopes.join(
            pos.select("event_type", "r1"), "event_type"
        )
        .filter(F.col("rn") == F.col("r1"))
        .groupBy("event_type")
        .agg(F.max("s").alias("ci_lo"))
    )
    hi = (
        slopes.join(
            pos.select("event_type", "r2"), "event_type"
        )
        .filter(F.col("rn") == F.col("r2"))
        .groupBy("event_type")
        .agg(F.max("s").alias("ci_hi"))
    )
    return (
        pos.join(med, "event_type")
        .join(lo, "event_type")
        .join(hi, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round("sen_slope", 4).alias("sen_slope"),
            F.round("ci_lo", 4).alias("ci_lo"),
            F.round("ci_hi", 4).alias("ci_hi"),
            ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias(
                "trend_significant"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "agg_chao1_richness",
    """
    WITH ab AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS k
        FROM lineitem GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS s_obs,
               CAST(count(*) FILTER (k = 1) AS BIGINT) AS f1,
               CAST(count(*) FILTER (k = 2) AS BIGINT) AS f2,
               CAST(sum(k) AS BIGINT) AS n
        FROM ab
    )
    SELECT s_obs, f1, f2, n AS n_rows,
           round(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2 * (f2 + 1)),
                 2) AS chao1,
           round(1 - CAST(f1 AS DOUBLE) / n, 6) AS coverage,
           100 * (n - f1) >= 99 * n AS well_sampled
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate (Chao 1984; the bias-corrected
    1987 form Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1)), which never divides by
    zero) with Good-Turing sample coverage Ĉ = 1 − f₁/n (Good 1953)
    over the "species" of lineitem — distinct part keys, abundance =
    order lines. THE standard data-profiling pair: how many distinct
    parts would the full population show (Chao1 extrapolates from
    the singleton/doubleton frequencies — the rare tail carries the
    unseen mass), and what fraction of the next row's probability
    mass has this sample already seen (coverage)? All inputs are
    EXACT integer frequency-of-frequency counts from a two-level
    keyed reduce; both displays are single fixed-order expressions
    of exact integers, and the well_sampled verdict (coverage ≥
    0.99) is FULLY exact with the denominator cleared: 100·(n−f₁) ≥
    99·n. No literal, no double in the decision.

    Scale shape: one keyed reduce over the fact table (part key —
    an ordinary shuffle key), a frequency-of-frequency reduce, a
    1-row pivot — map-side-combinable all the way."""
    li = tbl(spark, sf_dir, "lineitem")
    ab = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    s = ab.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.count_if(F.col("k") == 1).cast("long").alias("f1"),
        F.count_if(F.col("k") == 2).cast("long").alias("f2"),
        F.sum("k").cast("long").alias("n"),
    )
    f1, f2, n = F.col("f1"), F.col("f2"), F.col("n")
    return s.select(
        "s_obs",
        "f1",
        "f2",
        n.alias("n_rows"),
        F.round(
            F.col("s_obs") + f1.cast("double") * (f1 - 1) / (2 * (f2 + 1)),
            2,
        ).alias("chao1"),
        F.round(1 - f1.cast("double") / n, 6).alias("coverage"),
        (100 * (n - f1) >= 99 * n).alias("well_sampled"),
    )
