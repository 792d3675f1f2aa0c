"""§2 extensions, ninetieth wave — the polarization side of the
inequality panel (the Palma ratio already ships at wave55; Wolfson is
its missing bipolarization sibling).

- agg_wolfson_polarization: Wolfson's bipolarization index (1994) —
  inequality (Gini) measures spread from the mean; polarization
  measures the hollowing-out of the middle, and the two can move in
  OPPOSITE directions. Exact from block-ranked cumulants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_wolfson_polarization",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS rk
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS vt,
               CAST(sum(CASE WHEN rk <= (SELECT count(*) FROM o) // 2
                             THEN cents ELSE 0 END) AS BIGINT) AS vh,
               CAST(sum(CAST(cents AS HUGEINT)
                        * (2 * rk - (SELECT count(*) FROM o) - 1))
                    AS HUGEINT) AS sw,
               CAST(max(CASE WHEN rk = ((SELECT count(*) FROM o) + 1) // 2
                             THEN cents END) AS BIGINT) AS med
        FROM o
    )
    SELECT n AS n_orders,
           round(CAST(vh AS DOUBLE) / vt, 6) AS lorenz_at_half,
           round((2 * (0.5 - CAST(vh AS DOUBLE) / vt)
                  - CAST(sw AS DOUBLE) / ((n - 1) * CAST(vt AS DOUBLE)))
                 * (CAST(vt AS DOUBLE) / n)
                 / (CAST(med AS DOUBLE)), 6) AS wolfson_w,
           CAST(n - 1 AS HUGEINT) * (vt - 2 * CAST(vh AS HUGEINT)) > sw
               AS polarization_exceeds_gini
    FROM m
    """,
    tags=("aggregate", "stats"),
)
def agg_wolfson_polarization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wolfson's bipolarization index (1994): W = [2·(½ − L(½)) −
    G]·(μ/m) — twice the gap between the diagonal and the Lorenz
    curve AT the median, minus the Gini, rescaled by mean over
    median. Inequality and polarization are DIFFERENT orderings: a
    transfer from the middle to both tails raises W while barely
    moving G — W is the "disappearing middle class" number. Every
    ingredient here is an exact integer from ONE block-ranked pass
    (api.exact_global_rank on the Spark side — no single-partition
    window): L(½) = V_half/V_tot with V_half the cents below the
    ⌊n/2⌋ rank; G = S_w/((n−1)·V_tot) via the rank-weighted
    Σ(2i−n−1)·x identity (the agg_gini_mean_difference device); m =
    the exact lower-median element at rank ⌈n/2⌉ (type-1, stated
    knob). The headline verdict — bipolarization exceeds inequality,
    2(½ − L(½)) > G — clears ALL denominators exactly:
    (n−1)·(V_tot − 2·V_half) > S_w in DECIMAL(38)/HUGEINT, no
    double in the decision. W displays as a fixed-order double.

    Scale shape: one block-ranked pass over orders, a 1-row reduce
    with two exact rank probes."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"), "o_orderkey")
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    nn = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.crossJoin(F.broadcast(nn))
    m = j.agg(
        F.max("n").alias("n"),
        F.sum("cents").cast("long").alias("vt"),
        F.sum(
            F.when(
                F.col("rk") <= F.expr("n div 2"), F.col("cents")
            ).otherwise(0)
        )
        .cast("long")
        .alias("vh"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * (2 * F.col("rk") - F.col("n") - 1)
        ).alias("sw"),
        F.max(
            F.when(
                F.col("rk") == F.expr("(n + 1) div 2"), F.col("cents")
            )
        )
        .cast("long")
        .alias("med"),
    )
    n, vt, vh, sw, med = (
        F.col("n"),
        F.col("vt"),
        F.col("vh"),
        F.col("sw"),
        F.col("med"),
    )
    lhalf = vh.cast("double") / vt
    gini = sw.cast("double") / ((n - 1) * vt.cast("double"))
    return m.select(
        n.alias("n_orders"),
        F.round(lhalf, 6).alias("lorenz_at_half"),
        F.round(
            (2 * (0.5 - lhalf) - gini)
            * (vt.cast("double") / n)
            / med.cast("double"),
            6,
        ).alias("wolfson_w"),
        (
            (n - 1).cast("decimal(38,0)")
            * (vt - 2 * vh.cast("decimal(38,0)"))
            > sw
        ).alias("polarization_exceeds_gini"),
    )
