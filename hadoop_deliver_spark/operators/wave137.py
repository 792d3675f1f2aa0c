"""§2 extensions, hundred-thirty-seventh wave — fulfillment latency
and shrunken league tables.

- orders_shipping_lag: ship-lag distribution per order priority
  (does URGENT actually ship faster?) — exact integer-rank median
  and P90 on the stratified lag grid, the fulfillment-SLA league
  table.
- supplier_james_stein: positive-part James–Stein shrinkage of
  per-supplier mean ship lags toward the grand mean — THE estimator
  that dominates raw group means at k ≥ 4 (Stein 1956); the
  Gaussian-means sibling of customers_eb_shrinkage's rate version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "orders_shipping_lag",
    """
    WITH j AS (
        SELECT o.o_orderpriority AS priority,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS lag
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    grid AS (
        SELECT priority, lag, CAST(count(*) AS BIGINT) AS c
        FROM j GROUP BY 1, 2
    ),
    tot AS (
        SELECT priority, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * lag) AS BIGINT) AS s
        FROM grid GROUP BY 1
    ),
    cdf AS (
        SELECT priority, lag,
               CAST(sum(c) OVER (PARTITION BY priority ORDER BY lag
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    med AS (
        SELECT c.priority, min(c.lag) AS median_lag
        FROM cdf c JOIN tot t ON c.priority = t.priority
        WHERE 2 * c.cum >= t.n GROUP BY 1
    ),
    p90 AS (
        SELECT c.priority, min(c.lag) AS p90_lag
        FROM cdf c JOIN tot t ON c.priority = t.priority
        WHERE 10 * c.cum >= 9 * t.n GROUP BY 1
    )
    SELECT t.priority, t.n AS n_items,
           round(CAST(t.s AS DOUBLE) / t.n, 4) AS mean_lag_days,
           m.median_lag, p.p90_lag
    FROM tot t
    JOIN med m ON t.priority = m.priority
    JOIN p90 p ON t.priority = p.priority
    ORDER BY t.priority
    """,
    tags=("orders", "analytics"),
)
def orders_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-lag league table per order priority: days from order
    date to line-item ship date, with the EXACT integer-rank median
    and P90 (type-1, 2·cum ≥ n / 10·cum ≥ 9n on the per-priority
    lag-grid CDF) beside the exact-integer mean — the fulfillment
    question 'does paying for URGENT buy faster shipping, at the
    median AND at the tail?'. The lag domain is calendar-bounded
    (≤ the fixture's shipping horizon), so the per-priority grid
    cumsum is a bounded-axis window by the established argument;
    lags, counts, and rank probes are PURE INTEGER, the mean is one
    division.

    Scale shape: one join + (priority, lag) grid reduce, bounded
    per-priority grid cumsums, two rank-probe joins on the 5-row
    totals."""
    from hadoop_deliver_spark.api import exact_stratified_cumsum

    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    grid = j.groupBy("priority", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = grid.groupBy("priority").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("lag")).cast("long").alias("s"),
    )
    cdf = exact_stratified_cumsum(grid, "priority", "lag", "c", "cum")
    probes = cdf.join(tot, "priority")
    med = (
        probes.filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("priority")
        .agg(F.min("lag").alias("median_lag"))
    )
    p90 = (
        probes.filter(10 * F.col("cum") >= 9 * F.col("n"))
        .groupBy("priority")
        .agg(F.min("lag").alias("p90_lag"))
    )
    return (
        tot.join(med, "priority")
        .join(p90, "priority")
        .select(
            "priority",
            F.col("n").alias("n_items"),
            F.round(F.col("s").cast("double") / F.col("n"), 4).alias(
                "mean_lag_days"
            ),
            "median_lag",
            "p90_lag",
        )
        .orderBy("priority")
    )


@register(
    "supplier_james_stein",
    """
    WITH j AS (
        SELECT l_suppkey AS supp,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS lag
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    g AS (
        SELECT supp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(lag) AS BIGINT) AS s,
               CAST(sum(CAST(lag AS HUGEINT) * lag) AS DOUBLE) AS q
        FROM j GROUP BY 1
    ),
    pool AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(sum(s) AS BIGINT) AS s_tot,
               sum(q - CAST(s AS DOUBLE) * s / n) AS ssw,
               sum(1.0 / n) AS sinv
        FROM g WHERE n >= 2
    ),
    dev AS (
        SELECT p.k, p.n_tot, p.s_tot, p.ssw, p.sinv,
               sum(pow(CAST(g.s AS DOUBLE) / g.n
                       - CAST(p.s_tot AS DOUBLE) / p.n_tot, 2)) AS ssb,
               max(abs(CAST(g.s AS DOUBLE) / g.n
                       - CAST(p.s_tot AS DOUBLE) / p.n_tot)) AS max_dev
        FROM g, pool p WHERE g.n >= 2 GROUP BY 1, 2, 3, 4, 5
    )
    SELECT k AS n_suppliers, n_tot AS n_items,
           round(CAST(s_tot AS DOUBLE) / n_tot, 4) AS grand_mean_lag,
           round(sqrt(ssw / (n_tot - k)), 4) AS pooled_sd,
           round(greatest(0.0,
                 1.0 - (k - 3) * (ssw / (n_tot - k)) * (sinv / k) / (ssb / k)
                 ), 6) AS js_factor,
           round(max_dev, 4) AS max_raw_deviation,
           round(greatest(0.0,
                 1.0 - (k - 3) * (ssw / (n_tot - k)) * (sinv / k) / (ssb / k)
                 ) * max_dev, 4) AS max_shrunk_deviation
    FROM dev
    """,
    tags=("supplier", "stats"),
)
def supplier_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-part James–Stein shrinkage of per-supplier mean ship
    lags toward the grand mean: with pooled within-supplier variance
    s²_w = SSW/(N−k), average sampling variance v̄ = s²_w·mean(1/nᵢ),
    and between-supplier spread B = Σ(x̄ᵢ − x̄)²/k, the positive-part
    factor c = max(0, 1 − (k−3)·v̄/B) multiplies every deviation —
    the estimator that strictly dominates the raw league table at
    k ≥ 4 (Stein's paradox): a supplier's extreme mean is mostly
    noise when v̄ ≈ B, and c → 1 when the spread is real. Reports
    the factor and the most extreme supplier's deviation before and
    after shrinkage. Per-supplier moments are exact integers; the
    float chain is identical on both sides; suppliers with n < 2
    are excluded from pooling (pinned).

    Scale shape: one join + per-supplier reduce, one pooled reduce,
    one deviation reduce against the broadcast pool frame."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("supp"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    g = j.groupBy("supp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lag").cast("long").alias("s"),
        F.sum(F.col("lag").cast("decimal(38,0)") * F.col("lag"))
        .cast("double")
        .alias("q"),
    ).filter(F.col("n") >= 2)
    pool = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").cast("long").alias("s_tot"),
        F.sum(
            F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("ssw"),
        F.sum(1.0 / F.col("n")).alias("sinv"),
    )
    dev = (
        g.crossJoin(F.broadcast(pool))
        .groupBy("k", "n_tot", "s_tot", "ssw", "sinv")
        .agg(
            F.sum(
                F.pow(
                    F.col("s").cast("double") / F.col("n")
                    - F.col("s_tot").cast("double") / F.col("n_tot"),
                    F.lit(2),
                )
            ).alias("ssb"),
            F.max(
                F.abs(
                    F.col("s").cast("double") / F.col("n")
                    - F.col("s_tot").cast("double") / F.col("n_tot")
                )
            ).alias("max_dev"),
        )
    )
    s2w = F.col("ssw") / (F.col("n_tot") - F.col("k"))
    c = F.greatest(
        F.lit(0.0),
        1.0
        - (F.col("k") - 3)
        * s2w
        * (F.col("sinv") / F.col("k"))
        / (F.col("ssb") / F.col("k")),
    )
    return dev.select(
        F.col("k").alias("n_suppliers"),
        F.col("n_tot").alias("n_items"),
        F.round(
            F.col("s_tot").cast("double") / F.col("n_tot"), 4
        ).alias("grand_mean_lag"),
        F.round(F.sqrt(s2w), 4).alias("pooled_sd"),
        F.round(c, 6).alias("js_factor"),
        F.round(F.col("max_dev"), 4).alias("max_raw_deviation"),
        F.round(c * F.col("max_dev"), 4).alias("max_shrunk_deviation"),
    )
