"""§2 extensions, hundred-tenth wave — rate standardization (the
epidemiology pair every cross-group comparison eventually needs).

Comparing raw per-nation urgent-order rates is confounded by segment
mix (a nation heavy in a segment that is urgent-prone looks urgent
regardless of its own behavior). The two classical fixes:

- agg_direct_standardization: apply each nation's OWN stratum rates
  to a COMMON reference mix (the portfolio's segment weights) — what
  the nation's rate would be on the standard population.
- agg_smr_indirect: apply the REFERENCE stratum rates to the
  nation's own mix and compare observed vs expected (the SMR) —
  the form that stays stable when per-cell counts are thin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


_CELLS_SQL = """
    cells AS (
        SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (o.o_orderpriority = '1-URGENT')
                    AS BIGINT) AS u
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ref AS (
        SELECT seg, CAST(sum(n) AS BIGINT) AS n_s,
               CAST(sum(u) AS BIGINT) AS u_s
        FROM cells GROUP BY seg
    ),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn FROM ref)
"""


@register(
    "agg_direct_standardization",
    f"""
    WITH {_CELLS_SQL}
    SELECT g.nation,
           CAST(sum(g.n) AS BIGINT) AS n_orders,
           round(CAST(sum(g.u) AS DOUBLE) / sum(g.n), 6) AS crude_rate,
           round(sum((CAST(r.n_s AS DOUBLE) / t.nn)
                     * (CAST(g.u AS DOUBLE) / g.n)), 6) AS dsr,
           round(sum((CAST(r.n_s AS DOUBLE) / t.nn)
                     * (CAST(g.u AS DOUBLE) / g.n)), 6)
               > round(CAST(sum(g.u) AS DOUBLE) / sum(g.n), 6)
               AS mix_hides_urgency
    FROM cells g
    JOIN ref r ON r.seg = g.seg
    CROSS JOIN tot t
    GROUP BY g.nation, t.nn
    ORDER BY g.nation
    """,
    tags=("aggregate", "stats"),
)
def agg_direct_standardization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Directly standardized urgent-order rate per nation: the
    nation's own per-segment rates re-weighted onto the PORTFOLIO's
    segment mix, DSR_g = Σ_s (N_s/N)·(u_{g,s}/n_{g,s}) — removing
    segment-mix confounding so nations become comparable (the
    epidemiology age-standardization template; events_simpson_check
    demonstrates the paradox this repairs). Nations missing a
    stratum contribute nothing for it (the grouped-sum convention —
    stated; the SMR twin below is the estimator of choice when cells
    run thin). All counts exact integers; each term is one
    fixed-order double product; the mix_hides_urgency verdict
    compares the ROUNDED DSR to the ROUNDED crude rate.

    Scale shape: one broadcast dim join + keyed reduce to the ≤125
    (nation × segment) cell grid; everything after is grid-sized."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("u"),
        )
    )
    ref = cells.groupBy("seg").agg(
        F.sum("n").cast("long").alias("n_s"),
        F.sum("u").cast("long").alias("u_s"),
    )
    tot = ref.agg(F.sum("n_s").cast("long").alias("nn"))
    j = cells.join(F.broadcast(ref), "seg").crossJoin(F.broadcast(tot))
    dsr = F.round(
        F.sum(
            (F.col("n_s").cast("double") / F.col("nn"))
            * (F.col("u").cast("double") / F.col("n"))
        ),
        6,
    )
    crude = F.round(
        F.sum("u").cast("double") / F.sum("n"), 6
    )
    return (
        j.groupBy("nation", "nn")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            crude.alias("crude_rate"),
            dsr.alias("dsr"),
            (dsr > crude).alias("mix_hides_urgency"),
        )
        .drop("nn")
        .orderBy("nation")
    )


@register(
    "agg_smr_indirect",
    f"""
    WITH {_CELLS_SQL}
    SELECT g.nation,
           CAST(sum(g.u) AS BIGINT) AS observed,
           round(sum(g.n * (CAST(r.u_s AS DOUBLE) / r.n_s)), 4)
               AS expected,
           round(CAST(sum(g.u) AS DOUBLE)
                 / sum(g.n * (CAST(r.u_s AS DOUBLE) / r.n_s)), 4) AS smr,
           round(CAST(sum(g.u) AS DOUBLE)
                 / sum(g.n * (CAST(r.u_s AS DOUBLE) / r.n_s)), 4) > 1.0
               AS excess_urgency
    FROM cells g JOIN ref r ON r.seg = g.seg
    GROUP BY g.nation
    ORDER BY g.nation
    """,
    tags=("aggregate", "stats"),
)
def agg_smr_indirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect standardization / SMR per nation: expected urgent
    orders E_g = Σ_s n_{g,s}·(U_s/N_s) under the PORTFOLIO's stratum
    rates, against the observed count O_g — SMR = O/E > 1 means the
    nation is more urgent-prone than its segment mix predicts. The
    indirect form borrows the reference rates' stability, so it is
    the estimator of choice when (nation × segment) cells are thin —
    the design reason it coexists with agg_direct_standardization
    rather than duplicating it. O is an exact integer; E is a sum of
    fixed-order double products over ≤5 strata; the excess flag
    verdicts on the ROUNDED SMR.

    Scale shape: the shared ≤125-cell grid; grid-sized math after."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("u"),
        )
    )
    ref = cells.groupBy("seg").agg(
        F.sum("n").cast("long").alias("n_s"),
        F.sum("u").cast("long").alias("u_s"),
    )
    j = cells.join(F.broadcast(ref), "seg")
    expected = F.sum(
        F.col("n") * (F.col("u_s").cast("double") / F.col("n_s"))
    )
    smr = F.round(F.sum("u").cast("double") / expected, 4)
    return (
        j.groupBy("nation")
        .agg(
            F.sum("u").cast("long").alias("observed"),
            F.round(expected, 4).alias("expected"),
            smr.alias("smr"),
            (smr > 1.0).alias("excess_urgency"),
        )
        .orderBy("nation")
    )
