"""§2.B — Projections / filters / predicates.

Everything here stays inside whole-stage codegen: pure Column
expressions, no UDFs. Filters and column pruning are written so
Catalyst pushes them into the parquet scan (verify with
``.explain``: PushedFilters / ReadSchema) — at 100 TB the scan is
the dominant cost and pushdown is the difference between reading a
column chunk and reading the table.

The fixtures contain no NULLs (FIXTURES.md), so null-predicate
queries derive them with ``nullif`` — same trick on the oracle side.

Float policy (engine-wide): *computed* double outputs are cast to
float32 (`FLOAT`/`REAL`) on both the Spark and oracle side — raw
parquet doubles pass through untouched. Rationale: Spark's round() on
doubles goes through the shortest decimal repr (BigDecimal.valueOf)
while DuckDB rounds the binary value, so money products (exact 4-6
decimal digits → frequent decimal ties) systematically disagree in
the last rounded digit; and cross-engine aggregate sums differ in the
final ulps from summation order. A float32 cast collapses both
discrepancy classes (double ulp ≪ float32 ulp) with no rounding-rule
dependence at all, making results bit-identical and hash-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_R = 4


@register(
    "project_select",
    f"""
    SELECT c_custkey AS cust_id,
           c_name,
           c_mktsegment AS segment,
           CAST(c_acctbal * 1.05 AS REAL) AS grown_bal
    FROM customer ORDER BY cust_id
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename + computed column (scan reads only the
    4 referenced columns of 5 — check ReadSchema)."""
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("cust_id"),
        "c_name",
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") * 1.05).cast("float").alias("grown_bal"),
    ).orderBy("cust_id")


@register(
    "project_expr",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice * (1 - l_discount) AS REAL) AS revenue,
           CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS REAL) AS charged
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-expression projection via selectExpr. (Money expressions are
    surfaced as float32 — see the module float policy.) Sort-before-
    project: global order preserved, sampler/sort touch only the
    scan."""
    li = tbl(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "CAST(l_extendedprice * (1 - l_discount) AS FLOAT) AS revenue",
        "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS FLOAT) AS charged",
    )


@register(
    "filter_comparison",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1997-01-01'
      AND l_quantity > 45 AND l_discount >= 0.05 AND l_linenumber <> 1
    ORDER BY l_orderkey, l_linenumber
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six comparison predicates; every one is parquet-pushable."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-01-01").cast("timestamp"))
        .filter(F.col("l_quantity") > 45)
        .filter(F.col("l_discount") >= 0.05)
        .filter(F.col("l_linenumber") != 1)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_boolean",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
      AND NOT (o_totalprice < 50000)
    ORDER BY o_orderkey
    """,
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition on Column booleans."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(
            ((F.col("o_orderstatus") == "F") | (F.col("o_orderstatus") == "P"))
            & ~(F.col("o_totalprice") < 50000)
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "filter_in_between",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
    ORDER BY o_orderkey
    """,
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN (both fold to pushable range/set predicates)."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(F.col("o_totalprice").between(100000, 200000))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "filter_like_regex",
    """
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%'
       OR regexp_matches(p_brand, '^Brand#1[0-9]$')
    ORDER BY p_partkey
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / RLIKE — the 'grep' of the delivery-pipeline genre, as a
    pushable StringStartsWith plus a JVM regex (no Python in the loop)."""
    p = tbl(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").like("PROMO%")
            | F.col("p_brand").rlike("^Brand#1[0-9]$")
        )
        .select("p_partkey", "p_name", "p_type", "p_brand")
        .orderBy("p_partkey")
    )


@register(
    "filter_null",
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               nullif(l_discount, 0.0) AS disc_or_null,
               l_quantity
        FROM lineitem
    )
    SELECT
        count(*) FILTER (WHERE disc_or_null IS NULL) AS n_null,
        count(*) FILTER (WHERE disc_or_null IS NOT NULL) AS n_not_null,
        count(*) FILTER (WHERE disc_or_null IS NOT DISTINCT FROM 0.05) AS n_nullsafe_eq
    FROM t
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>), over a
    derived nullable column (fixtures are null-free)."""
    li = tbl(spark, sf_dir, "lineitem")
    t = li.withColumn("disc_or_null", F.nullif(F.col("l_discount"), F.lit(0.0)))
    return t.agg(
        F.count_if(F.col("disc_or_null").isNull()).alias("n_null"),
        F.count_if(F.col("disc_or_null").isNotNull()).alias("n_not_null"),
        F.count_if(F.col("disc_or_null").eqNullSafe(F.lit(0.05))).alias(
            "n_nullsafe_eq"
        ),
    )


@register(
    "project_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 250000 THEN 'jumbo'
                WHEN o_totalprice >= 100000 THEN 'large'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_word
    FROM orders ORDER BY o_orderkey
    """,
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection: searched CASE + simple CASE."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 250000, "jumbo")
        .when(F.col("o_totalprice") >= 100000, "large")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_word"),
    ).orderBy("o_orderkey")


@register(
    "project_cast",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(trunc(o_totalprice) AS INTEGER) AS BIGINT) AS price_int,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
           CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_num
    FROM orders ORDER BY o_orderkey
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts: int→string, double→int, timestamp→date,
    string→int. (double→string is deliberately absent: engines format
    doubles differently, so it can never be oracle-hashed.)"""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        # Spark's double→int cast truncates toward zero; DuckDB's
        # rounds — the oracle carries an explicit trunc() to match.
        F.col("o_totalprice").cast("int").cast("long").alias("price_int"),
        # date outputs surface as midnight timestamps: Spark DateType
        # reaches pandas as datetime.date objects while DuckDB DATE
        # arrives as datetime64 — same value, different cell type, so a
        # raw date column can never value-hash across engines.
        F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_num"),
    ).orderBy("o_orderkey")
