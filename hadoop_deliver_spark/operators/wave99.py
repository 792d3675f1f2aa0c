"""§2 extensions, ninety-ninth wave — the two memory-bearing SPC
charts, completing the control-chart family (x̄: ts_shewhart_xbar,
attributes: events_c_chart/events_p_chart, individuals:
events_imr_chart, memoryless CUSUM scan: ts_cusum_changepoint):

- events_ewma_chart: the EWMA control chart (Roberts 1959) — the
  small-persistent-shift detector; its recursion is re-expressed as
  a closed-form scaled prefix sum so both engines evaluate identical
  float sequences.
- events_cusum_tabular: Page's TABULAR one-sided CUSUM (1954) with
  the standard (k, h) = (0.5σ, 4σ) design — the max(0, ·) recursion
  re-expressed as prefix-sum minus running-min (a reflection
  identity), again pure windows over the bounded day axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


def _daily_mu_sigma_sql() -> str:
    """Shared oracle CTEs: daily counts, and (μ, σ) with σ from the
    moving-range estimator MR̄/d₂ (d₂ = 1.128) — the events_imr_chart
    convention, robust to the level shifts these charts exist to
    detect (a global stddev would inflate σ with the very signal
    under test)."""
    return """
    daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    mrd AS (
        SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS mr
        FROM daily
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(mr) AS BIGINT) AS smr
        FROM mrd
    ),
    ms AS (
        SELECT nn, CAST(s AS DOUBLE) / nn AS mu,
               CAST(smr AS DOUBLE) / (nn - 1) / 1.128 AS sigma
        FROM st
    )
    """


@register(
    "events_ewma_chart",
    """
    WITH
    """
    + _daily_mu_sigma_sql()
    + """,
    idx AS (
        SELECT day, x, row_number() OVER (ORDER BY day) AS i
        FROM daily
    ),
    u AS (
        SELECT day, x, i,
               sum(x * power(1.25, i)) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS uu
        FROM idx
    ),
    z AS (
        SELECT day, x, i,
               power(0.8, i) * (0.2 * uu + ms.mu) AS ewma,
               ms.mu AS mu,
               3.0 * ms.sigma
                   * sqrt(0.2 / 1.8 * (1.0 - power(0.8, 2 * i))) AS halfw
        FROM u CROSS JOIN ms
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x,
           round(ewma, 4) AS ewma,
           round(mu - halfw, 4) AS lcl,
           round(mu + halfw, 4) AS ucl,
           round(abs(ewma - mu) - halfw, 4) > 0.0 AS ooc
    FROM z ORDER BY day
    """,
    tags=("events", "spc"),
)
def events_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959; λ = 0.2, L = 3σ) on the
    daily event count — the chart that detects SMALL persistent mean
    shifts a Shewhart chart misses (it weights recent history
    geometrically instead of judging each point alone). The
    recursion z_t = λx_t + (1−λ)z_{t−1}, z_0 = μ is evaluated in the
    closed form z_t = (1−λ)^t·(λ·Σ_{i≤t} x_i·(1/(1−λ))^i + μ): ONE
    prefix sum of pre-scaled terms — both engines run the identical
    fixed-order float sequence, no recursion. The scale factor
    (1/0.8)^i reaches only ~807 on the 30-day events axis (stated
    envelope: the closed form is for calendar-bounded axes; a
    multi-year axis would overflow the scaling and needs the
    segmented-carry spelling). σ comes from the moving-range
    estimator MR̄/d₂ (the I-MR convention — robust to the very
    shifts under test); time-varying limits use the exact
    √(λ/(2−λ)·(1−(1−λ)^{2t})) startup narrowing. The OOC flag
    compares ONE rounded difference so it is rounding-stable.

    Scale shape: one keyed reduce to the bounded day axis; prefix
    windows over that axis (allowlisted ts_* shape); 1-row moment
    reduce broadcast back."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    mrd = daily.select(
        "day", "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("mr")
    )
    ms = mrd.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("s"),
        F.sum("mr").cast("long").alias("smr"),
    ).select(
        (F.col("s").cast("double") / F.col("nn")).alias("mu"),
        (F.col("smr").cast("double") / (F.col("nn") - 1) / 1.128).alias(
            "sigma"
        ),
    )
    idx = daily.select(
        "day", "x", F.row_number().over(w).alias("i")
    )
    u = idx.withColumn(
        "uu",
        F.sum(F.col("x") * F.pow(F.lit(1.25), F.col("i"))).over(wcum),
    )
    z = u.crossJoin(F.broadcast(ms)).select(
        "day",
        "x",
        (
            F.pow(F.lit(0.8), F.col("i"))
            * (0.2 * F.col("uu") + F.col("mu"))
        ).alias("ewma"),
        F.col("mu"),
        (
            3.0
            * F.col("sigma")
            * F.sqrt(
                0.2 / 1.8 * (1.0 - F.pow(F.lit(0.8), 2 * F.col("i")))
            )
        ).alias("halfw"),
    )
    return z.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        F.round("ewma", 4).alias("ewma"),
        F.round(F.col("mu") - F.col("halfw"), 4).alias("lcl"),
        F.round(F.col("mu") + F.col("halfw"), 4).alias("ucl"),
        (
            F.round(F.abs(F.col("ewma") - F.col("mu")) - F.col("halfw"), 4)
            > 0.0
        ).alias("ooc"),
    ).orderBy("day")


@register(
    "events_cusum_tabular",
    """
    WITH
    """
    + _daily_mu_sigma_sql()
    + """,
    d AS (
        SELECT day, x,
               x - ms.mu - 0.5 * ms.sigma AS dp,
               ms.mu - 0.5 * ms.sigma - x AS dn,
               4.0 * ms.sigma AS h
        FROM daily CROSS JOIN ms
    ),
    pre AS (
        SELECT day, x, h,
               sum(dp) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sp,
               sum(dn) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sn
        FROM d
    ),
    ref AS (
        SELECT day, x, h,
               sp - least(0.0, min(sp) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING)) AS cp,
               sn - least(0.0, min(sn) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING)) AS cn
        FROM pre
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x,
           round(cp, 4) AS cusum_pos,
           round(cn, 4) AS cusum_neg,
           round(cp - h, 4) > 0.0 AS ooc_pos,
           round(cn - h, 4) > 0.0 AS ooc_neg
    FROM ref ORDER BY day
    """,
    tags=("events", "spc"),
)
def events_cusum_tabular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's TABULAR one-sided CUSUM (1954) with the textbook
    design (k = 0.5σ reference value, h = 4σ decision interval) on
    daily event counts — the sequential-detection chart with
    near-optimal average run length for a 1σ shift (ts_cusum_
    changepoint is the retrospective scan; this is the monitoring
    form). The max(0, C_{t−1} + d_t) recursion is re-expressed by
    the reflection identity C⁺_t = S_t − min(0, min_{i≤t} S_i)
    (prefix sum minus running min, both plain windows) so no
    recursion exists on either engine and the float sequence is
    identical. Both one-sided charts are emitted (upward: d = x − μ
    − kσ; downward: d = μ − kσ − x); σ is the moving-range
    estimator MR̄/d₂ (the I-MR convention). OOC flags compare ONE
    rounded difference against the h = 4σ interval.

    Scale shape: one keyed reduce to the bounded day axis; prefix
    sum + running-min windows over that axis (allowlisted ts_*
    shape); 1-row moment reduce broadcast back."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    mrd = daily.select(
        "day", "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("mr")
    )
    ms = mrd.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("s"),
        F.sum("mr").cast("long").alias("smr"),
    ).select(
        (F.col("s").cast("double") / F.col("nn")).alias("mu"),
        (F.col("smr").cast("double") / (F.col("nn") - 1) / 1.128).alias(
            "sigma"
        ),
    )
    d = daily.crossJoin(F.broadcast(ms)).select(
        "day",
        "x",
        (F.col("x") - F.col("mu") - 0.5 * F.col("sigma")).alias("dp"),
        (F.col("mu") - 0.5 * F.col("sigma") - F.col("x")).alias("dn"),
        (4.0 * F.col("sigma")).alias("h"),
    )
    pre = d.select(
        "day",
        "x",
        "h",
        F.sum("dp").over(wcum).alias("sp"),
        F.sum("dn").over(wcum).alias("sn"),
    )
    ref = pre.select(
        "day",
        "x",
        "h",
        (
            F.col("sp") - F.least(F.lit(0.0), F.min("sp").over(wcum))
        ).alias("cp"),
        (
            F.col("sn") - F.least(F.lit(0.0), F.min("sn").over(wcum))
        ).alias("cn"),
    )
    return ref.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        F.round("cp", 4).alias("cusum_pos"),
        F.round("cn", 4).alias("cusum_neg"),
        (F.round(F.col("cp") - F.col("h"), 4) > 0.0).alias("ooc_pos"),
        (F.round(F.col("cn") - F.col("h"), 4) > 0.0).alias("ooc_neg"),
    ).orderBy("day")
