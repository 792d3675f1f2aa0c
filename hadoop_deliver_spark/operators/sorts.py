"""§2.F — Sorts / limits / top-k / sampling.

Top-k is the one to get right at scale: ``orderBy(...).limit(k)``
plans as TakeOrderedAndProject — a per-partition bounded heap plus a
driver merge of k×partitions rows — NOT a global sort. A full sort
followed by limit would shuffle 100 TB; the heap ships kilobytes.
Every top-k carries a unique-key tiebreaker so the row *set* is
deterministic across engines (FIXTURES.md oracle notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_R = 4


@register(
    "sort_multi",
    """
    SELECT o_orderkey, o_orderstatus,
           nullif(o_orderpriority, '5-LOW') AS priority_or_null,
           o_totalprice
    FROM orders
    ORDER BY o_orderstatus DESC, priority_or_null ASC NULLS LAST, o_orderkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with asc/desc and explicit NULLS LAST (null
    sort keys derived via nullif — fixtures are null-free). The hash
    check is order-insensitive; the sort itself is exercised by the
    range-partitioned exchange in the plan."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("o_orderstatus").desc(),
            F.col("priority_or_null").asc_nulls_last(),
            F.col("o_orderkey"),
        )
    )


@register(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a unique total order (orderkey —
    pagination without a unique sort is nondeterministic in any
    engine)."""
    o = tbl(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(
        100
    ).limit(50)


@register(
    "topk_global",
    f"""
    SELECT l_orderkey, l_linenumber, l_extendedprice AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price → TakeOrderedAndProject (bounded heap
    per partition, no global sort). Unique (orderkey, linenumber)
    tiebreak keeps the set deterministic under ties."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("price"),
        )
        .orderBy(F.col("price").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register("sort_within_partitions", None)  # rows-only: oracle can't see partitioning
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (delivery-file ordering): repartition by
    returnflag then sortWithinPartitions — the write pattern that
    produces per-partition-ordered output files without a global
    sort's extra exchange. Verified rows-only (content equals the
    input projection; ordering is a physical property)."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
        .repartition("l_returnflag")
        .sortWithinPartitions("l_shipdate", "l_orderkey", "l_linenumber")
    )


@register("sample_rows", None)  # rows-only: RNG differs across engines by design
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (~10% of lineitem). Deterministic for a
    fixed seed *within Spark* but engine-specific, so rows-only."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
