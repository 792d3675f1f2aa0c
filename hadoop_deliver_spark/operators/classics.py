"""§2 extensions, twenty-ninth wave — the remaining classic warehouse
query shapes (TPC-H Q13/Q15/Q22/Q11 adapted to the fixture schema).

- customers_order_distribution (Q13 shape): how many customers placed
  exactly k orders — the LEFT OUTER join that must keep zero-order
  customers, then a distribution over the counts.
- supplier_top_revenue (Q15 shape): the supplier(s) achieving the
  maximum revenue in a quarter — group, take the max as a scalar,
  select the argmax set (ties survive, exactly as SQL defines it).
- customers_idle_rich (Q22 shape): high-balance customers with NO
  orders, per nation — scalar-subquery threshold + anti join, with
  the above-average test done in EXACT integer cross-multiplication.
- supplier_value_share (Q11 shape): each supplier's share of total
  lineitem value with an above-average flag, again integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "customers_order_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count ORDER BY c_count
    """,
    tags=("analytics", "classic"),
)
def customers_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution (TPC-H Q13's shape): customers
    bucketed by how many orders they placed — where the LEFT OUTER
    join is load-bearing: an inner join silently erases the
    zero-order bucket, the single most business-relevant row
    (count(o_orderkey), not count(*), so null-extended rows count
    0). Two aggregates; the second is over |customers| rows with a
    tiny key space. At 100 TB the join shuffles on the customer key
    once."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy("c_count")
    )


@register(
    "supplier_top_revenue",
    f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(sum({_CENTS}) AS BIGINT) AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("analytics", "classic"),
)
def supplier_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15's shape): revenue
    per supplier over a 3-month ship window, then the argmax SET —
    ties all survive, as the scalar-subquery formulation defines, and
    revenue is exact cents so the max comparison cannot ulp-split
    between engines. The shipdate filter pushes into the parquet
    scan; revenue is one supplier-keyed aggregate; the max is a
    1-row scalar collected and inlined (same two-pass shape as
    supplier_value_share)."""
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    mx = rev.agg(F.max("rev_cents")).collect()[0][0]
    return (
        rev.filter(F.col("rev_cents") == F.lit(int(mx)))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "rev_cents")
        .orderBy("s_suppkey")
    )


@register(
    "customers_idle_rich",
    """
    WITH cents AS (
        SELECT c_custkey, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS bal_cents
        FROM customer
    ),
    pos AS (
        SELECT CAST(sum(bal_cents) AS BIGINT) AS s, count(*) AS n
        FROM cents WHERE bal_cents > 0
    )
    SELECT n.n_name AS nation, count(*) AS n_custs,
           CAST(sum(c.bal_cents) AS BIGINT) AS total_cents
    FROM cents c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.bal_cents * (SELECT n FROM pos) > (SELECT s FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name ORDER BY nation
    """,
    tags=("analytics", "classic"),
)
def customers_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle high-balance customers per nation (TPC-H Q22's shape):
    balance above the positive-balance average AND no orders in the
    current era (since 2000 — the fixture's customers all have SOME
    historical order, so the recency bound is what makes 'idle'
    non-vacuous). The
    above-average test is exact integer cross-multiplication
    (bal·n > Σ) — a float avg threshold could ulp-flip membership
    for a boundary customer — and the no-orders test is a LEFT ANTI
    join on the customer key. The (Σ, n) scalar pair is collected
    once; nation broadcast; one anti-join shuffle on c_custkey."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    n = tbl(spark, sf_dir, "nation")
    cents = c.select(
        "c_custkey",
        "c_nationkey",
        (dec2("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    pos = cents.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    rich = cents.filter(
        F.col("bal_cents") * F.lit(int(pos.n)) > F.lit(int(pos.s))
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    idle = rich.join(
        recent.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").cast("long").alias("total_cents"),
        )
        .orderBy("nation")
    )


@register(
    "supplier_value_share",
    f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(sum({_CENTS}) AS BIGINT) AS value_cents
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t,
                   count(*) AS n FROM rev)
    SELECT r.l_suppkey AS s_suppkey, r.value_cents,
           floor(CAST(r.value_cents AS DOUBLE) / (SELECT t FROM tot)
                 * 1000000) / 1000000 AS share,
           (r.value_cents * (SELECT n FROM tot) > (SELECT t FROM tot))
               AS above_avg
    FROM rev r ORDER BY s_suppkey
    """,
    tags=("analytics", "classic"),
)
def supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier value concentration (TPC-H Q11's shape): each
    supplier's share of total lineitem value plus an above-average
    flag. Share is floor-quantized display; the FLAG — the decision
    column — is integer cross-multiplication (value·n > total), so
    the partition of suppliers is bit-stable. One supplier-keyed
    aggregate; the (total, n) scalar collected once and inlined
    (the oracle writes it as scalar subqueries — same plan role)."""
    li = tbl(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum((dec2("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("value_cents")
    )
    tot = rev.agg(
        F.sum("value_cents").cast("long").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return rev.select(
        F.col("l_suppkey").alias("s_suppkey"),
        "value_cents",
        (
            F.floor(
                F.col("value_cents").cast("double") / F.lit(int(tot.t)) * 1000000
            )
            / 1000000
        ).alias("share"),
        (F.col("value_cents") * F.lit(int(tot.n)) > F.lit(int(tot.t))).alias(
            "above_avg"
        ),
    ).orderBy("s_suppkey")
