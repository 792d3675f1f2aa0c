"""§2 extensions, hundred-twenty-first wave — small-sample outlier
screening and revenue concentration.

- agg_dixon_q: Dixon's Q test (Dean & Dixon 1951) on the 25 nation
  mean order values — the small-k outlier screen (gap/range) that
  agg_grubbs_extreme's z-form complements; both suspect ends tested
  against the Rorabacher (1991) 95 % critical value.
- customers_whale_curve: the whale curve — how few customers carry
  50/80/90 % of revenue, and the top-1 %/top-10 % revenue shares —
  on exact descending block-ranked cumsums; the customer-side
  concentration twin of orders_pareto_abc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

#: Rorabacher (1991) two-tailed r10 critical value, n = 25, 95 %.
_Q_CRIT_25 = 0.317


@register(
    "agg_dixon_q",
    f"""
    WITH j AS (
        SELECT c.c_nationkey AS nation,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT nation, CAST(sum(cents) AS DOUBLE) / count(*) AS m
        FROM j GROUP BY 1
    ),
    ext AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               max(m) AS mx, min(m) AS mn FROM g
    ),
    ext2 AS (
        SELECT e.k, e.mx, e.mn,
               (SELECT max(m) FROM g WHERE m < e.mx) AS mx2,
               (SELECT min(m) FROM g WHERE m > e.mn) AS mn2,
               (SELECT min(nation) FROM g WHERE m = e.mx) AS nation_hi,
               (SELECT min(nation) FROM g WHERE m = e.mn) AS nation_lo
        FROM ext e
    )
    SELECT k AS n_groups, nation_hi, nation_lo,
           round(mx / 100, 4) AS mean_hi,
           round(mn / 100, 4) AS mean_lo,
           round((mx - mx2) / (mx - mn), 6) AS q_hi,
           round((mn2 - mn) / (mx - mn), 6) AS q_lo,
           round((mx - mx2) / (mx - mn), 6) > {_Q_CRIT_25!r}
               AS hi_is_outlier,
           round((mn2 - mn) / (mx - mn), 6) > {_Q_CRIT_25!r}
               AS lo_is_outlier
    FROM ext2
    """,
    tags=("aggregate", "stats"),
)
def agg_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q test on the 25 nation mean order values: for each
    suspect end, Q = gap/range — (x₍ₖ₎ − x₍ₖ₋₁₎)/(x₍ₖ₎ − x₍₁₎) for
    the high end, mirrored for the low — compared to the Rorabacher
    (1991) two-tailed 95 % critical value 0.317 for k = 25. The
    small-sample screen chemists use before Grubbs
    (agg_grubbs_extreme) is valid; here it asks whether any single
    nation's market is priced apart from the pack. No sort window
    anywhere: max/second-max/min/second-min come from four bounded
    reduces over the 25-row group table, and the suspect nations are
    picked by deterministic min-nation among float-equal means (the
    per-nation means are the identical s/n double on both engines,
    so equality agrees). Verdicts compare the ROUNDED Q.

    Scale shape: one broadcast join + keyed reduce to 25 rows, four
    1-row reduces, closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            (
                F.sum((dec2("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    ext = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("m").alias("mx"),
        F.min("m").alias("mn"),
    )
    mx2 = (
        g.crossJoin(F.broadcast(ext.select("mx")))
        .filter(F.col("m") < F.col("mx"))
        .agg(F.max("m").alias("mx2"))
    )
    mn2 = (
        g.crossJoin(F.broadcast(ext.select("mn")))
        .filter(F.col("m") > F.col("mn"))
        .agg(F.min("m").alias("mn2"))
    )
    hi = (
        g.crossJoin(F.broadcast(ext.select("mx")))
        .filter(F.col("m") == F.col("mx"))
        .agg(F.min("nation").alias("nation_hi"))
    )
    lo = (
        g.crossJoin(F.broadcast(ext.select("mn")))
        .filter(F.col("m") == F.col("mn"))
        .agg(F.min("nation").alias("nation_lo"))
    )
    q_hi = F.round((F.col("mx") - F.col("mx2")) / (F.col("mx") - F.col("mn")), 6)
    q_lo = F.round((F.col("mn2") - F.col("mn")) / (F.col("mx") - F.col("mn")), 6)
    return (
        ext.crossJoin(F.broadcast(mx2))
        .crossJoin(F.broadcast(mn2))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(lo))
        .select(
            F.col("k").alias("n_groups"),
            "nation_hi",
            "nation_lo",
            F.round(F.col("mx") / 100, 4).alias("mean_hi"),
            F.round(F.col("mn") / 100, 4).alias("mean_lo"),
            q_hi.alias("q_hi"),
            q_lo.alias("q_lo"),
            (q_hi > _Q_CRIT_25).alias("hi_is_outlier"),
            (q_lo > _Q_CRIT_25).alias("lo_is_outlier"),
        )
    )


@register(
    "customers_whale_curve",
    """
    WITH rev AS (
        SELECT o_custkey AS cust,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS t
        FROM rev
    ),
    cum AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents DESC, cust)
                    AS BIGINT) AS r,
               CAST(sum(cents) OVER (ORDER BY cents DESC, cust
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM rev
    )
    SELECT tot.n AS n_customers,
           round(tot.t / 100.0, 2) AS total_revenue,
           (SELECT min(r) FROM cum WHERE 2 * cum >= tot.t) AS cust_50pct,
           (SELECT min(r) FROM cum WHERE 5 * cum >= 4 * tot.t)
               AS cust_80pct,
           (SELECT min(r) FROM cum WHERE 10 * cum >= 9 * tot.t)
               AS cust_90pct,
           round(CAST((SELECT min(r) FROM cum WHERE 2 * cum >= tot.t)
                 AS DOUBLE) / tot.n, 4) AS cust_50pct_share,
           round(CAST((SELECT max(cum) FROM cum
                       WHERE 100 * r <= tot.n) AS DOUBLE) / tot.t, 6)
               AS top1_rev_share,
           round(CAST((SELECT max(cum) FROM cum
                       WHERE 10 * r <= tot.n) AS DOUBLE) / tot.t, 6)
               AS top10_rev_share
    FROM tot
    """,
    tags=("customers", "analytics"),
)
def customers_whale_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whale curve of customer revenue concentration: rank
    customers by revenue descending (custkey tiebreak), then report
    how many customers it takes to cover 50/80/90 % of total revenue
    (exact integer-rank threshold crossings 2·cum ≥ T etc. on the
    block-ranked descending cumsum — no single-partition window) and
    the revenue share held by the top 1 % / top 10 % of customers
    (floor convention: ranks with 100·r ≤ n). Everything is PURE
    INTEGER until the four displayed ratios. The customer-side twin
    of orders_pareto_abc; the 'how few whales pay for everything'
    number sales teams actually ask for.

    Scale shape: one keyed reduce per customer, one block-ranked
    descending cumsum + rank, five 1-row rank probes."""
    from hadoop_deliver_spark.api import (
        exact_global_cumsum_desc,
        exact_global_rank,
    )

    o = tbl(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    cum = exact_global_cumsum_desc(rev, "cents", "cust", "cum")
    cum = exact_global_rank(
        cum.withColumn("neg", -F.col("cents")), "neg", "cust", "r"
    ).drop("neg")
    j = cum.crossJoin(F.broadcast(tot))

    def probe(cond, val, name):
        return j.filter(cond).agg(F.min(val).alias(name))

    c50 = probe(2 * F.col("cum") >= F.col("t"), "r", "cust_50pct")
    c80 = probe(5 * F.col("cum") >= 4 * F.col("t"), "r", "cust_80pct")
    c90 = probe(10 * F.col("cum") >= 9 * F.col("t"), "r", "cust_90pct")
    top1 = j.filter(100 * F.col("r") <= F.col("n")).agg(
        F.max("cum").alias("cum1")
    )
    top10 = j.filter(10 * F.col("r") <= F.col("n")).agg(
        F.max("cum").alias("cum10")
    )
    return (
        tot.crossJoin(F.broadcast(c50))
        .crossJoin(F.broadcast(c80))
        .crossJoin(F.broadcast(c90))
        .crossJoin(F.broadcast(top1))
        .crossJoin(F.broadcast(top10))
        .select(
            F.col("n").alias("n_customers"),
            F.round(F.col("t") / 100.0, 2).alias("total_revenue"),
            "cust_50pct",
            "cust_80pct",
            "cust_90pct",
            F.round(
                F.col("cust_50pct").cast("double") / F.col("n"), 4
            ).alias("cust_50pct_share"),
            F.round(F.col("cum1").cast("double") / F.col("t"), 6).alias(
                "top1_rev_share"
            ),
            F.round(F.col("cum10").cast("double") / F.col("t"), 6).alias(
                "top10_rev_share"
            ),
        )
    )
