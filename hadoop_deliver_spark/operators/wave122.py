"""§2 extensions, hundred-twenty-second wave — rank-mean inequality
indices: Bonferroni and Zenga.

- agg_bonferroni_index: the Bonferroni inequality index — one minus
  the average ratio of lower means to the grand mean; more
  bottom-sensitive than Gini (weights the poorest ranks hardest).
- agg_zenga_index: Zenga's (2007) I index — the mean relative gap
  between lower-tail and upper-tail means at every rank; the modern
  inequality measure whose pointwise curve Gini integrates away.

Both complete the inequality family (agg_gini, agg_theil_index,
agg_atkinson_index, agg_palma_ratio, agg_hoover_index,
agg_wolfson_polarization) with the two RANK-MEAN forms, computed on
the same block-ranked ascending cumsum device.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_RANKCUM_SQL = """
    v AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS t
        FROM v
    ),
    rc AS (
        SELECT CAST(row_number() OVER (ORDER BY cents, k) AS BIGINT) AS r,
               CAST(sum(cents) OVER (ORDER BY cents, k
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM v
    )
"""


@register(
    "agg_bonferroni_index",
    f"""
    WITH {_RANKCUM_SQL}
    SELECT tot.n AS n_orders,
           round(tot.t / 100.0, 2) AS total_dollars,
           round(1.0 - sum(CAST(tot.n AS DOUBLE) * cum
                           / (CAST(r AS DOUBLE) * tot.t))
                       / (tot.n - 1), 6) AS bonferroni
    FROM rc, tot
    WHERE r <= tot.n - 1
    GROUP BY tot.n, tot.t
    """,
    tags=("aggregate", "stats"),
)
def agg_bonferroni_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bonferroni inequality index of order value:
    B = 1 − (1/(n−1))·Σ_{i≤n−1} m⁻ᵢ/μ, where m⁻ᵢ = cumᵢ/i is the
    mean of the i poorest orders and μ = T/n the grand mean —
    equality ⇒ 0, all-in-one-hand ⇒ 1, and the 1/i weights make it
    MORE sensitive to the bottom of the distribution than Gini
    (whose weights are uniform in rank). Rank and cumulative sum are
    exact integers from the block-ranked ascending cumsum (orderkey
    tiebreak); each per-rank term is one float division, summed once
    (the Σ has n−1 O(1) terms, so summation-order drift sits at
    1e−15·n — far inside round-6 at any fixture scale).

    Scale shape: one block-ranked rank+cumsum over orders, one
    filtered reduce."""
    from hadoop_deliver_spark.api import (
        exact_global_keyed_cumsum,
        exact_global_rank,
    )

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tot = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    rc = exact_global_keyed_cumsum(v, "cents", "cents", "k", "cum")
    rc = exact_global_rank(rc, "cents", "k", "r")
    j = rc.crossJoin(F.broadcast(tot)).filter(
        F.col("r") <= F.col("n") - 1
    )
    return j.groupBy("n", "t").agg(
        F.round(
            1.0
            - F.sum(
                F.col("n").cast("double")
                * F.col("cum")
                / (F.col("r").cast("double") * F.col("t"))
            )
            / (F.col("n") - 1),
            6,
        ).alias("bonferroni")
    ).select(
        F.col("n").alias("n_orders"),
        F.round(F.col("t") / 100.0, 2).alias("total_dollars"),
        "bonferroni",
    )


@register(
    "agg_zenga_index",
    f"""
    WITH {_RANKCUM_SQL}
    SELECT tot.n AS n_orders,
           round(sum(1.0 - (CAST(cum AS DOUBLE) * (tot.n - r))
                           / (CAST(tot.t - cum AS DOUBLE) * r))
                 / (tot.n - 1), 6) AS zenga,
           round(max(1.0 - (CAST(cum AS DOUBLE) * (tot.n - r))
                           / (CAST(tot.t - cum AS DOUBLE) * r)), 6)
               AS zenga_max_pointwise
    FROM rc, tot
    WHERE r <= tot.n - 1
    GROUP BY tot.n, tot.t
    """,
    tags=("aggregate", "stats"),
)
def agg_zenga_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zenga (2007) I index of order value: at each rank i the
    pointwise gap I(i) = 1 − m⁻ᵢ/m⁺ᵢ compares the mean of the i
    poorest orders, m⁻ᵢ = cumᵢ/i, with the mean of the n−i richest,
    m⁺ᵢ = (T−cumᵢ)/(n−i); the index averages the gap over
    i = 1…n−1 (the pinned convention — i = n has no upper group).
    Unlike Gini, the pointwise curve does not dilute tail inequality
    by integrating against uniform weights — the max pointwise gap
    is reported alongside as the worst split. Rank/cumsum are exact
    integers (block-ranked, orderkey tiebreak); each term is the
    identical two-division float expression on both sides.

    Scale shape: one block-ranked rank+cumsum over orders, one
    filtered reduce."""
    from hadoop_deliver_spark.api import (
        exact_global_keyed_cumsum,
        exact_global_rank,
    )

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tot = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    rc = exact_global_keyed_cumsum(v, "cents", "cents", "k", "cum")
    rc = exact_global_rank(rc, "cents", "k", "r")
    term = 1.0 - (
        F.col("cum").cast("double") * (F.col("n") - F.col("r"))
    ) / ((F.col("t") - F.col("cum")).cast("double") * F.col("r"))
    j = rc.crossJoin(F.broadcast(tot)).filter(
        F.col("r") <= F.col("n") - 1
    )
    return j.groupBy("n", "t").agg(
        F.round(F.sum(term) / (F.col("n") - 1), 6).alias("zenga"),
        F.round(F.max(term), 6).alias("zenga_max_pointwise"),
    ).select(
        F.col("n").alias("n_orders"),
        "zenga",
        "zenga_max_pointwise",
    )
