"""§2 extensions, hundred-sixtieth wave — energy-statistics
dependence and distribution-free tolerance.

- ts_distance_correlation: Székely–Rizzo–Bakirov (2007) distance
  correlation between daily revenue and daily error count — dCor = 0
  IFF independent (the property Pearson, Spearman, and even
  ts_hoeffding_d's D lack in full generality), computed exactly on
  the doubly-centered day-pair distance matrices.
- agg_wilks_tolerance: Wilks' (1941) nonparametric tolerance
  interval — with what confidence does [min, max] of the sample
  cover 95% of the population? The distribution-free guarantee
  behind 'our observed range covers nearly all traffic', dual to
  agg_dkw_band's ECDF view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "ts_distance_correlation",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT a.dn AS i, b.dn AS j,
               CAST(abs(a.x - b.x) AS DOUBLE) AS ax,
               CAST(abs(a.y - b.y) AS DOUBLE) AS ay
        FROM daily a CROSS JOIN daily b
    ),
    rows_m AS (
        SELECT i, avg(ax) AS rx, avg(ay) AS ry
        FROM pairs GROUP BY i
    ),
    cols_m AS (
        SELECT j, avg(ax) AS cx, avg(ay) AS cy
        FROM pairs GROUP BY j
    ),
    grand AS (
        SELECT avg(ax) AS gx, avg(ay) AS gy,
               CAST(count(*) AS BIGINT) AS m
        FROM pairs
    ),
    cent AS (
        SELECT (p.ax - r.rx - c.cx + g.gx) AS A,
               (p.ay - r.ry - c.cy + g.gy) AS B
        FROM pairs p
        JOIN rows_m r ON r.i = p.i
        JOIN cols_m c ON c.j = p.j
        CROSS JOIN grand g
    ),
    s AS (
        SELECT avg(A * B) AS vxy, avg(A * A) AS vx, avg(B * B) AS vy
        FROM cent
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           round(sqrt(greatest(vxy, 0.0)), 6) AS dcov,
           round(sqrt(vx), 6) AS dvar_x,
           round(sqrt(vy), 6) AS dvar_y,
           round(CASE WHEN vx * vy > 0
                      THEN sqrt(greatest(vxy, 0.0) / sqrt(vx * vy))
                 END, 6) AS dcor,
           round(CASE WHEN vx * vy > 0
                      THEN sqrt(greatest(vxy, 0.0) / sqrt(vx * vy))
                 END, 6) > 0.3 AS dependent_hint
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_distance_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distance correlation (Székely, Rizzo & Bakirov 2007) between
    daily revenue and daily error count: with aᵢⱼ = |xᵢ−xⱼ| and
    double-centered Aᵢⱼ = aᵢⱼ − āᵢ· − ā·ⱼ + ā·· (same for B on y),
    dCov² = mean(AᵢⱼBᵢⱼ), dVar likewise, and
    dCor = dCov/√(dVarₓ·dVar_y) ∈ [0,1] — the dependence measure
    that is ZERO if and only if the series are independent, catching
    nonlinear and non-monotone relations that Pearson
    (ts_cross_correlation), Spearman, and rank statistics miss;
    beside ts_hoeffding_d it is the modern energy-statistics member
    of the dependence family. The FULL n×n pair grid (diagonal zeros
    included — the population V-statistic normalization, pinned) is
    calendar-bounded; distances are exact integer differences cast
    once, the centering means are fixed textual averages, and the
    negative-rounding guard (greatest(·,0)) absorbs the −1e−17 that
    V-statistics produce under exact independence on both engines
    identically. The 0.3 'dependent' literal is a screening
    convention, stated as such.

    Scale shape: one daily reduce; a TRUE day×day pair join
    (≤days² ≈ 5.8M cells at ANY corpus scale — the ts_qn_scale
    envelope); two keyed row/column mean reduces joined back by
    equi-key; one scalar reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    a = daily.select(
        F.col("dn").alias("i"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = daily.select(
        F.col("dn").alias("j"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    pairs = a.crossJoin(b).select(
        "i",
        "j",
        F.abs(F.col("xi") - F.col("xj")).cast("double").alias("ax"),
        F.abs(F.col("yi") - F.col("yj")).cast("double").alias("ay"),
    )
    rows_m = pairs.groupBy("i").agg(
        F.avg("ax").alias("rx"), F.avg("ay").alias("ry")
    )
    cols_m = pairs.groupBy("j").agg(
        F.avg("ax").alias("cx"), F.avg("ay").alias("cy")
    )
    grand = pairs.agg(
        F.avg("ax").alias("gx"),
        F.avg("ay").alias("gy"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    cent = (
        pairs.join(rows_m, "i")
        .join(cols_m, "j")
        .crossJoin(F.broadcast(grand))
        .select(
            (
                F.col("ax") - F.col("rx") - F.col("cx") + F.col("gx")
            ).alias("A"),
            (
                F.col("ay") - F.col("ry") - F.col("cy") + F.col("gy")
            ).alias("B"),
        )
    )
    s = cent.agg(
        F.avg(F.col("A") * F.col("B")).alias("vxy"),
        F.avg(F.col("A") * F.col("A")).alias("vx"),
        F.avg(F.col("B") * F.col("B")).alias("vy"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    dcor = F.when(
        F.col("vx") * F.col("vy") > 0,
        F.sqrt(
            F.greatest(F.col("vxy"), F.lit(0.0))
            / F.sqrt(F.col("vx") * F.col("vy"))
        ),
    )
    return (
        s.crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            F.round(
                F.sqrt(F.greatest(F.col("vxy"), F.lit(0.0))), 6
            ).alias("dcov"),
            F.round(F.sqrt("vx"), 6).alias("dvar_x"),
            F.round(F.sqrt("vy"), 6).alias("dvar_y"),
            F.round(dcor, 6).alias("dcor"),
            (F.round(dcor, 6) > 0.3).alias("dependent_hint"),
        )
    )


@register(
    "agg_wilks_tolerance",
    """
    WITH x AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(min(cents) AS BIGINT) AS lo,
               CAST(max(cents) AS BIGINT) AS hi
        FROM x
    )
    SELECT n AS n_orders,
           round(lo / 100.0, 2) AS range_lo_dollars,
           round(hi / 100.0, 2) AS range_hi_dollars,
           round(1.0 - n * pow(0.95, CAST(n AS DOUBLE) - 1)
                 + (n - 1) * pow(0.95, CAST(n AS DOUBLE)), 6)
               AS conf_95_coverage,
           round(1.0 - n * pow(0.99, CAST(n AS DOUBLE) - 1)
                 + (n - 1) * pow(0.99, CAST(n AS DOUBLE)), 6)
               AS conf_99_coverage,
           1.0 - n * pow(0.95, CAST(n AS DOUBLE) - 1)
               + (n - 1) * pow(0.95, CAST(n AS DOUBLE)) > 0.95
               AS tolerance_95_95
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_wilks_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilks' nonparametric tolerance interval (1941) on order-value
    cents: the confidence that the sample range [x₍₁₎, x₍ₙ₎] covers
    at least a fraction p of the WHOLE population is the exact
    order-statistics identity 1 − n·pⁿ⁻¹ + (n−1)·pⁿ, needing no
    distributional assumption at all. Reported for p = 0.95 and
    0.99, with the classic '95/95' verdict (≥95% confidence of ≥95%
    coverage — the acceptance criterion nuclear and pharma specs
    write, met for n ≥ 93). This is the tolerance-interval dual of
    agg_dkw_band: DKW bounds the ECDF everywhere, Wilks certifies
    the two extreme order statistics as a coverage interval — and
    unlike agg_wilson_interval (a CI for a proportion) it speaks
    about future OBSERVATIONS, not parameters. min/max/n are exact
    integers from one reduce; the confidence polynomial is one
    fixed textual expression.

    Scale shape: ONE map-side-combined global reduce (count, min,
    max), then 1-row closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo"),
        F.max("cents").cast("long").alias("hi"),
    )
    n = F.col("n")

    def conf(p: str):
        pd = F.lit(float(p))
        return (
            1.0
            - n * F.pow(pd, n.cast("double") - 1)
            + (n - 1) * F.pow(pd, n.cast("double"))
        )

    return s.select(
        n.alias("n_orders"),
        F.round(F.col("lo") / 100.0, 2).alias("range_lo_dollars"),
        F.round(F.col("hi") / 100.0, 2).alias("range_hi_dollars"),
        F.round(conf("0.95"), 6).alias("conf_95_coverage"),
        F.round(conf("0.99"), 6).alias("conf_99_coverage"),
        (conf("0.95") > 0.95).alias("tolerance_95_95"),
    )
