"""§2 extensions, hundred-twelfth wave — exact-rank robust dispersion
and tail-ratio inequality.

- agg_quartile_dispersion: the quartile coefficient of dispersion
  (Q3−Q1)/(Q3+Q1) — the robust, unit-free spread measure used when
  the CV's moments would be dragged by tails; exact integer-rank
  quartiles, no float percentile.
- agg_decile_ratio: the P90/P10 ratio — the wage-inequality
  headline number (OECD reporting standard); the RATIO complement
  of agg_palma_ratio's share form, on exact integer-rank deciles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_quartile_dispersion",
    """
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    grid AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
    cdf AS (
        SELECT cents, CAST(sum(c) OVER (ORDER BY cents
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    )
    SELECT n.n AS n_orders,
           (SELECT min(cents) FROM cdf WHERE 4 * cum >= n.n) AS q1_cents,
           (SELECT min(cents) FROM cdf WHERE 4 * cum >= 3 * n.n)
               AS q3_cents,
           (SELECT min(cents) FROM cdf WHERE 4 * cum >= 3 * n.n)
               - (SELECT min(cents) FROM cdf WHERE 4 * cum >= n.n)
               AS iqr_cents,
           round(CAST((SELECT min(cents) FROM cdf WHERE 4 * cum >= 3 * n.n)
                      - (SELECT min(cents) FROM cdf WHERE 4 * cum >= n.n)
                      AS DOUBLE)
                 / ((SELECT min(cents) FROM cdf WHERE 4 * cum >= 3 * n.n)
                    + (SELECT min(cents) FROM cdf WHERE 4 * cum >= n.n)),
                 6) AS cqv
    FROM n
    """,
    tags=("aggregate", "stats"),
)
def agg_quartile_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile coefficient of dispersion CQV = (Q3 − Q1)/(Q3 + Q1)
    of order value — the robust, unit-free spread measure that
    replaces the coefficient of variation when tails would drag the
    moments (the dq_outlier_iqr fence logic, condensed to one
    number). Q1 and Q3 are EXACT lower order statistics (min value
    with 4·cum ≥ n / ≥ 3n on the block-ranked cents CDF — the
    ts_qn_scale integer-rank device; no float percentile, no
    interpolation: a stated type-1 quantile convention shared with
    the oracle). The only float is the final ratio, rounded to 6.

    Scale shape: one map-side-combined reduce to the distinct-cents
    grid, block-ranked cumsum, two 1-row rank probes."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    grid = v.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = grid.agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_global_keyed_cumsum(grid, "cents", "c", "cents", "cum")
    j = cdf.crossJoin(F.broadcast(n))
    q1 = j.filter(4 * F.col("cum") >= F.col("n")).agg(
        F.min("cents").alias("q1_cents")
    )
    q3 = j.filter(4 * F.col("cum") >= 3 * F.col("n")).agg(
        F.min("cents").alias("q3_cents")
    )
    return (
        n.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .select(
            F.col("n").alias("n_orders"),
            "q1_cents",
            "q3_cents",
            (F.col("q3_cents") - F.col("q1_cents")).alias("iqr_cents"),
            F.round(
                (F.col("q3_cents") - F.col("q1_cents")).cast("double")
                / (F.col("q3_cents") + F.col("q1_cents")),
                6,
            ).alias("cqv"),
        )
    )


@register(
    "agg_decile_ratio",
    """
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    grid AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
    cdf AS (
        SELECT cents, CAST(sum(c) OVER (ORDER BY cents
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    )
    SELECT n.n AS n_orders,
           (SELECT min(cents) FROM cdf WHERE 10 * cum >= n.n) AS p10_cents,
           (SELECT min(cents) FROM cdf WHERE 10 * cum >= 9 * n.n)
               AS p90_cents,
           round(CAST((SELECT min(cents) FROM cdf
                       WHERE 10 * cum >= 9 * n.n) AS DOUBLE)
                 / (SELECT min(cents) FROM cdf WHERE 10 * cum >= n.n),
                 4) AS p90_p10_ratio,
           10 * (SELECT min(cents) FROM cdf WHERE 10 * cum >= n.n)
               < (SELECT min(cents) FROM cdf WHERE 10 * cum >= 9 * n.n)
               AS extreme_spread
    FROM n
    """,
    tags=("aggregate", "stats"),
)
def agg_decile_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P90/P10 decile ratio of order value — the OECD-standard
    inequality headline (how many times richer is the 90th
    percentile than the 10th), the RATIO complement of
    agg_palma_ratio's share form. Both deciles are EXACT lower order
    statistics on the block-ranked cents CDF (10·cum ≥ n / ≥ 9n —
    the integer-rank device shared with agg_quartile_dispersion);
    the extreme_spread verdict 10·P10 < P90 is PURE INTEGER — no
    float anywhere in the decision.

    Scale shape: the shared distinct-cents grid, block-ranked
    cumsum, two 1-row rank probes."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    grid = v.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = grid.agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_global_keyed_cumsum(grid, "cents", "c", "cents", "cum")
    j = cdf.crossJoin(F.broadcast(n))
    p10 = j.filter(10 * F.col("cum") >= F.col("n")).agg(
        F.min("cents").alias("p10_cents")
    )
    p90 = j.filter(10 * F.col("cum") >= 9 * F.col("n")).agg(
        F.min("cents").alias("p90_cents")
    )
    return (
        n.crossJoin(F.broadcast(p10))
        .crossJoin(F.broadcast(p90))
        .select(
            F.col("n").alias("n_orders"),
            "p10_cents",
            "p90_cents",
            F.round(
                F.col("p90_cents").cast("double") / F.col("p10_cents"), 4
            ).alias("p90_p10_ratio"),
            (10 * F.col("p10_cents") < F.col("p90_cents")).alias(
                "extreme_spread"
            ),
        )
    )
