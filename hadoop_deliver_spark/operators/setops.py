"""§2.G — Set operations.

Catalyst rewrites every one of these to joins/aggregates
(ReplaceDistinctWithAggregate, ReplaceExceptWithAntiJoin,
RewriteExceptAll/IntersectAll), so they inherit the same shuffle
economics as the join layer — no bespoke physical work needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_R = 4


def _seg(spark, sf_dir, seg):
    return (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == seg)
        .select("c_custkey", "c_nationkey")
    )


@register(
    "set_union_all",
    """
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (keeps duplicates across the two branches)."""
    a = _seg(spark, sf_dir, "BUILDING")
    b = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_nationkey")
    )
    return a.unionAll(b)


@register(
    "set_union_distinct",
    """
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (union + distinct ⇒ hash aggregate after the concat)."""
    a = _seg(spark, sf_dir, "BUILDING")
    b = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_nationkey")
    )
    return a.union(b).distinct()


@register(
    "set_union_by_name",
    f"""
    SELECT s_suppkey AS entity_key, s_name AS entity_name,
           s_acctbal AS acctbal, 'supplier' AS kind
    FROM supplier
    UNION ALL BY NAME
    SELECT 'customer' AS kind, c_custkey AS entity_key,
           c_acctbal AS acctbal, c_name AS entity_name
    FROM customer
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union matched by column *name* (different column order per
    branch) — schema-drift-tolerant concat for delivery pipelines."""
    s = tbl(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    c = tbl(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_name").alias("entity_name"),
    )
    return s.unionByName(c)


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both finished and open
    orders (⇒ left-semi join of distincts)."""
    o = tbl(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@register(
    "set_intersect_all",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ORDER BY c_nationkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag semantics — each nationkey kept
    min(count_a, count_b) times."""
    c = tbl(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.intersectAll(b).orderBy("c_nationkey")


@register(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    ORDER BY c_custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS: customers minus customers-with-orders (⇒
    left-anti join; same answer as join_left_anti, different route)."""
    c = tbl(spark, sf_dir, "customer").select("c_custkey")
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o).orderBy("c_custkey")


@register(
    "set_except_all",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    ORDER BY l_orderkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference — multiplicity max(count_a − count_b, 0)."""
    li = tbl(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return a.exceptAll(b).orderBy("l_orderkey")
