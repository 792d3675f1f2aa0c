"""§2 extensions, hundred-sixth wave — reliability and extreme-value
fitting.

- orders_weibull_gaps: Weibull plot (median-rank regression) of
  inter-purchase gaps — THE reliability-engineering fit: the shape
  parameter k says whether repurchase hazard falls (k < 1, churny),
  is memoryless (k = 1, exponential), or rises (k > 1, habitual).
- orders_pot_gpd: peaks-over-threshold Generalized Pareto fit (MoM)
  of daily revenue — the EVT complement of the block-maxima
  events_gumbel_maxima: POT uses every exceedance, not one max per
  block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "orders_weibull_gaps",
    """
    WITH gaps AS (
        SELECT CAST(CAST(o_orderdate AS DATE)
                    - lag(CAST(o_orderdate AS DATE)) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS g
        FROM orders
    ),
    pos AS (
        SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0
    ),
    grid AS (
        SELECT g, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY g
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
    cdf AS (
        SELECT g, c,
               CAST(sum(c) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum
        FROM grid
    ),
    pts AS (
        SELECT c,
               ln(CAST(g AS DOUBLE)) AS x,
               ln(-ln(1.0 - CAST(cum AS DOUBLE) / (n.n + 1))) AS y
        FROM cdf CROSS JOIN n
    ),
    mom AS (
        SELECT CAST(sum(c) AS BIGINT) AS w,
               sum(c * x) AS sx, sum(c * y) AS sy,
               sum(c * x * x) AS sxx, sum(c * x * y) AS sxy
        FROM pts
    )
    SELECT w AS n_gaps,
           round((w * sxy - sx * sy) / (w * sxx - sx * sx), 4) AS shape_k,
           round(exp(-(sy / w - (w * sxy - sx * sy)
                       / (w * sxx - sx * sx) * sx / w)
                     / ((w * sxy - sx * sy) / (w * sxx - sx * sx))), 4)
               AS scale_days,
           round((w * sxy - sx * sy) / (w * sxx - sx * sx), 4) < 1.0
               AS decreasing_hazard
    FROM mom
    """,
    tags=("orders", "stats"),
)
def orders_weibull_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull plot / median-rank regression of inter-purchase gaps
    (the reliability-engineering standard): for a Weibull(k, λ),
    ln(−ln(1−F(t))) is LINEAR in ln t with slope k and intercept
    −k·ln λ, so a count-weighted OLS on the empirical CDF grid
    recovers both parameters. Gaps come from a customer-partitioned
    lag (keyed window); the CDF lives on the DISTINCT-gap grid
    (bounded by the calendar span at any corpus scale), cumulated by
    the block-ranked keyed cumsum with the (n+1) plotting-position
    convention (grouped-data form of Bernard's median rank — stated
    knob); zero-day gaps (same-day repeat orders) are excluded, as
    ln 0 demands. The verdict k < 1 (falling repurchase hazard —
    the longer a customer waits, the less likely they return per
    day) compares the ROUNDED slope. OLS moments are count-weighted
    float sums over the bounded grid — 1e-15 summation-order noise
    at O(1) magnitudes, far inside round(4).

    Scale shape: keyed lag window per customer, keyed reduce to the
    bounded gap grid, block-ranked cumsum, one grid-sized moment
    reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        )
        .cast("long")
        .alias("g")
    ).filter(F.col("g").isNotNull() & (F.col("g") > 0))
    grid = gaps.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = grid.agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_global_keyed_cumsum(grid, "g", "c", "g", "cum")
    pts = cdf.crossJoin(F.broadcast(n)).select(
        "c",
        F.log(F.col("g").cast("double")).alias("x"),
        F.log(
            -F.log(1.0 - F.col("cum").cast("double") / (F.col("n") + 1))
        ).alias("y"),
    )
    mom = pts.agg(
        F.sum("c").cast("long").alias("w"),
        F.sum(F.col("c") * F.col("x")).alias("sx"),
        F.sum(F.col("c") * F.col("y")).alias("sy"),
        F.sum(F.col("c") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("c") * F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("w") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("w") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = F.col("sy") / F.col("w") - slope * F.col("sx") / F.col("w")
    return mom.select(
        F.col("w").alias("n_gaps"),
        F.round(slope, 4).alias("shape_k"),
        F.round(F.exp(-intercept / slope), 4).alias("scale_days"),
        (F.round(slope, 4) < 1.0).alias("decreasing_hazard"),
    )


@register(
    "orders_pot_gpd",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    grid AS (
        SELECT y, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY y
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
    cdf AS (
        SELECT y, c,
               CAST(sum(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum
        FROM grid
    ),
    u AS (
        SELECT CAST(min(y) AS BIGINT) AS u
        FROM cdf CROSS JOIN n
        WHERE 20 * cum >= 19 * n.n
    ),
    exc AS (
        SELECT CAST(d.y - u.u AS BIGINT) AS e
        FROM daily d CROSS JOIN u WHERE d.y > u.u
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(e) AS BIGINT) AS s,
               CAST(sum(CAST(e AS HUGEINT) * e) AS DOUBLE) AS q
        FROM exc
    ),
    fit AS (
        SELECT k, s,
               CAST(s AS DOUBLE) / k AS m,
               (q - CAST(s AS DOUBLE) * s / k) / (k - 1) AS v
        FROM mom
    )
    SELECT (SELECT n FROM n) AS n_days, k AS n_exceed,
           (SELECT u FROM u) AS threshold_dollars,
           round(0.5 * (1.0 - m * m / v), 4) AS xi,
           round(0.5 * m * (m * m / v + 1.0), 4) AS beta,
           round(0.5 * (1.0 - m * m / v), 4) > 0.0 AS heavy_tail
    FROM fit
    """,
    tags=("orders", "stats"),
)
def orders_pot_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold Generalized Pareto fit (Pickands 1975;
    method-of-moments form) of daily revenue: the threshold u is the
    EXACT 95th-percentile order statistic of the daily totals (min y
    with 20·cum ≥ 19·n on the block-ranked CDF — pure integer rank
    selection, the ts_qn_scale device), exceedances e = y − u keep
    exact integer moments, and the GPD parameters come from the
    closed MoM: ξ = ½(1 − m²/v), β = ½m(m²/v + 1) — ξ > 0 means a
    genuinely heavy (power-law) revenue tail, where block-maxima
    Gumbel fitting (events_gumbel_maxima) would underestimate risk;
    POT uses EVERY exceedance instead of one max per block, the
    efficiency argument for the method. Verdict on the rounded ξ.

    Scale shape: one keyed reduce to the bounded day axis, a
    block-ranked CDF for the exact threshold, a 1-row excess-moment
    reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    grid = daily.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = grid.agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_global_keyed_cumsum(grid, "y", "c", "y", "cum")
    u = (
        cdf.crossJoin(F.broadcast(n))
        .filter(20 * F.col("cum") >= 19 * F.col("n"))
        .agg(F.min("y").cast("long").alias("u"))
    )
    exc = daily.crossJoin(F.broadcast(u)).filter(
        F.col("y") > F.col("u")
    ).select((F.col("y") - F.col("u")).cast("long").alias("e"))
    mom = exc.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("e").cast("long").alias("s"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e"))
        .cast("double")
        .alias("q"),
    )
    fit = mom.select(
        "k",
        (F.col("s").cast("double") / F.col("k")).alias("m"),
        (
            (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("k"))
            / (F.col("k") - 1)
        ).alias("v"),
    )
    xi = 0.5 * (1.0 - F.col("m") * F.col("m") / F.col("v"))
    beta = 0.5 * F.col("m") * (F.col("m") * F.col("m") / F.col("v") + 1.0)
    return (
        fit.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(u))
        .select(
            F.col("n").alias("n_days"),
            F.col("k").alias("n_exceed"),
            F.col("u").alias("threshold_dollars"),
            F.round(xi, 4).alias("xi"),
            F.round(beta, 4).alias("beta"),
            (F.round(xi, 4) > 0.0).alias("heavy_tail"),
        )
    )
