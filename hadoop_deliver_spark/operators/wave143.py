"""§2 extensions, hundred-forty-third wave — distributional effects
and covariate hygiene.

- agg_qte_deciles: quantile treatment effects — the closed-vs-open
  order-value gap at every decile, on EXACT integer-rank quantiles;
  the distributional view that a single mean difference (or even
  agg_wasserstein_1d's integral) averages away: does the gap live
  in the tail or the middle?
- agg_covariate_balance: the standardized-mean-difference balance
  table over quantity/price/discount between the same two groups —
  the causal-inference hygiene check (|SMD| < 0.1 = balanced)
  behind every observational comparison; agg_cohens_d is its
  one-variable special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_qte_deciles",
    """
    WITH v AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    grid AS (
        SELECT g, cents, CAST(count(*) AS BIGINT) AS c
        FROM v GROUP BY 1, 2
    ),
    n AS (
        SELECT g, CAST(sum(c) AS BIGINT) AS n FROM grid GROUP BY 1
    ),
    cdf AS (
        SELECT g, cents,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY cents
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    dec AS (
        SELECT d FROM unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS t(d)
    ),
    q AS (
        SELECT dec.d, cdf.g, min(cdf.cents) AS qv
        FROM cdf JOIN n ON cdf.g = n.g CROSS JOIN dec
        WHERE 10 * cdf.cum >= dec.d * n.n
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT d,
               max(CASE WHEN g = 1 THEN qv END) AS q1,
               max(CASE WHEN g = 2 THEN qv END) AS q2
        FROM q GROUP BY 1
    )
    SELECT d AS decile,
           round(q1 / 100.0, 2) AS q_closed,
           round(q2 / 100.0, 2) AS q_open,
           round((q1 - q2) / 100.0, 2) AS qte,
           round(CAST(q1 AS DOUBLE) / q2, 4) AS q_ratio
    FROM wide ORDER BY d
    """,
    tags=("aggregate", "stats"),
)
def agg_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects at the nine deciles: the
    closed-vs-open order-value quantile gap q₁(d) − q₂(d), each
    quantile selected at EXACT integer rank (type-1: min cents with
    10·cum ≥ d·n on each group's own CDF). A mean difference says
    ONE number; the QTE profile says WHERE the distributions differ
    — a gap concentrated at d = 9 is a tail phenomenon invisible at
    the median. Per-group CDFs use the stratified cumsum device
    (2 strata × bounded value grid); every quantile is PURE INTEGER
    and the only floats are the display divisions.

    Scale shape: one 2-group grid reduce, stratified grid cumsums,
    one 9-decile rank-probe join, a 9-row pivot."""
    from hadoop_deliver_spark.api import exact_stratified_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(2).alias("g"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    grid = v.groupBy("g", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = grid.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_stratified_cumsum(grid, "g", "cents", "c", "cum")
    dec = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
    q = (
        cdf.join(n, "g")
        .crossJoin(F.broadcast(dec))
        .filter(10 * F.col("cum") >= F.col("d") * F.col("n"))
        .groupBy("d", "g")
        .agg(F.min("cents").alias("qv"))
    )
    wide = q.groupBy("d").agg(
        F.max(F.when(F.col("g") == 1, F.col("qv"))).alias("q1"),
        F.max(F.when(F.col("g") == 2, F.col("qv"))).alias("q2"),
    )
    return wide.select(
        F.col("d").alias("decile"),
        F.round(F.col("q1") / 100.0, 2).alias("q_closed"),
        F.round(F.col("q2") / 100.0, 2).alias("q_open"),
        F.round((F.col("q1") - F.col("q2")) / 100.0, 2).alias("qte"),
        F.round(F.col("q1").cast("double") / F.col("q2"), 4).alias(
            "q_ratio"
        ),
    ).orderBy("decile")


_BAL_VARS_SQL = """
    v AS (
        SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 2 END AS g,
               'quantity' AS var, CAST(l.l_quantity AS BIGINT) AS x
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 2 END,
               'extprice_cents',
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 2 END,
               'discount_pct',
               CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
"""


@register(
    "agg_covariate_balance",
    f"""
    WITH {_BAL_VARS_SQL},
    m AS (
        SELECT var, g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
        FROM v GROUP BY 1, 2
    ),
    wide AS (
        SELECT var,
               max(CASE WHEN g = 1 THEN n END) AS n1,
               max(CASE WHEN g = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
               max(CASE WHEN g = 1 THEN
                   (q - CAST(s AS DOUBLE) * s / n) / (n - 1) END) AS v1,
               max(CASE WHEN g = 2 THEN n END) AS n2,
               max(CASE WHEN g = 2 THEN CAST(s AS DOUBLE) / n END) AS m2,
               max(CASE WHEN g = 2 THEN
                   (q - CAST(s AS DOUBLE) * s / n) / (n - 1) END) AS v2
        FROM m GROUP BY 1
    )
    SELECT var, n1, n2,
           round(m1, 4) AS mean_closed,
           round(m2, 4) AS mean_open,
           round((m1 - m2) / sqrt((v1 + v2) / 2), 6) AS smd,
           round(v1 / v2, 4) AS variance_ratio,
           abs(round((m1 - m2) / sqrt((v1 + v2) / 2), 6)) < 0.1
               AS balanced
    FROM wide ORDER BY var
    """,
    tags=("aggregate", "stats"),
)
def agg_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance table between closed and open orders over
    the three line-item covariates (quantity, extended price,
    discount): standardized mean difference
    SMD = (m₁ − m₂)/√((v₁ + v₂)/2) with the |SMD| < 0.1 balance
    verdict and the variance ratio (≈1 = similar spreads) — the
    table every observational comparison prints BEFORE claiming a
    treatment effect (Austin 2009's reporting standard;
    agg_cohens_d is the one-variable case with a pooled-df
    denominator). The three covariates are stacked by a UNION ALL
    (one shuffle key = (var, g)); all moments are exact integers;
    three float operations per row; verdicts compare ROUNDED SMDs.

    Scale shape: one stacked scan (3× map-side), one keyed 6-row
    moment reduce, a 3-row pivot."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(2).alias("g"),
        F.col("l_quantity").cast("long").alias("quantity"),
        (dec2("l_extendedprice") * 100).cast("long").alias("extprice_cents"),
        (dec2("l_discount") * 100).cast("long").alias("discount_pct"),
    )
    stacked = None
    for var in ("discount_pct", "extprice_cents", "quantity"):
        part = j.select(
            "g", F.lit(var).alias("var"), F.col(var).alias("x")
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    m = stacked.groupBy("var", "g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var_ = (
        F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    wide = m.groupBy("var").agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("g") == 1, var_)).alias("v1"),
        F.max(F.when(F.col("g") == 2, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("g") == 2, mean)).alias("m2"),
        F.max(F.when(F.col("g") == 2, var_)).alias("v2"),
    )
    smd = (F.col("m1") - F.col("m2")) / F.sqrt(
        (F.col("v1") + F.col("v2")) / 2
    )
    return wide.select(
        "var",
        "n1",
        "n2",
        F.round(F.col("m1"), 4).alias("mean_closed"),
        F.round(F.col("m2"), 4).alias("mean_open"),
        F.round(smd, 6).alias("smd"),
        F.round(F.col("v1") / F.col("v2"), 4).alias("variance_ratio"),
        (F.abs(F.round(smd, 6)) < 0.1).alias("balanced"),
    ).orderBy("var")
