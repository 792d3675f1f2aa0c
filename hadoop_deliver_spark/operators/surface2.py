"""§2 extensions, eighteenth wave — conditional aggregates, named
windows, and the stack() generator. Small surface completions a SQL
user reaches for weekly; all map-only or single keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "agg_conditional_counts",
    """
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_high,
           count(*) FILTER (WHERE value <= 50) AS n_low,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 95) AS any_extreme,
           CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
               AS n_even_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregate",),
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate family: count_if (the FILTER-clause
    aggregate), every/any boolean quantifiers — the predicates-as-
    aggregates surface that turns three scans into one. All
    map-side-combinable; one shuffle of 5 groups regardless of
    input size."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 50).alias("n_high"),
            F.count_if(F.col("value") <= 50).alias("n_low"),
            F.every(F.col("value") >= 0).alias("all_nonneg"),
            F.some(F.col("value") > 95).alias("any_extreme"),
            F.count_if(F.col("user_id") % 2 == 0)
            .cast("bigint")
            .alias("n_even_users"),
        )
        .orderBy("event_type")
    )


@register(
    "sql_named_windows",
    """
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rk,
           CAST(count(*) OVER w AS BIGINT) AS n_cust_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_all
                     AS DOUBLE) AS REAL) AS cust_total
    FROM orders
    WHERE o_orderkey <= 3000
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_all AS (PARTITION BY o_custkey)
    ORDER BY o_orderkey
    """,
    tags=("sql", "window"),
)
def sql_named_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clauses (SQL-only surface): one window definition
    referenced by several functions — the planner instantiates ONE
    exchange+sort for all of them, which is the point: ad-hoc
    per-function OVER specs that happen to match still share the
    shuffle, but naming makes the reuse explicit and the SQL
    readable. The per-customer total runs through an exact DECIMAL
    sum (order-free) — a windowed double avg differs between engines
    in the last ulp. Same text runs on DuckDB."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_nw_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               row_number() OVER w AS rk,
               CAST(count(*) OVER w AS BIGINT) AS n_cust_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_all
                         AS DOUBLE) AS REAL) AS cust_total
        FROM hds_nw_orders
        WHERE o_orderkey <= 3000
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_all AS (PARTITION BY o_custkey)
        ORDER BY o_orderkey
        """
    )


@register(
    "fn_stack",
    """
    SELECT n_nationkey, 'key' AS metric,
           CAST(n_nationkey AS BIGINT) AS val FROM nation
    UNION ALL
    SELECT n_nationkey, 'region', CAST(n_regionkey AS BIGINT) FROM nation
    UNION ALL
    SELECT n_nationkey, 'name_len', CAST(length(n_name) AS BIGINT)
    FROM nation
    ORDER BY n_nationkey, metric
    """,
    tags=("function", "reshape"),
)
def fn_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(): the SQL row-generator twin of unpivot — three
    (metric, value) pairs per nation row emitted as rows by the
    generator expression itself (fn_unpivot is the DataFrame-API
    relational form; stack is what SQL users write inline). Map-only
    row expansion inside the task. The DuckDB oracle states the same
    long-form result as a three-branch UNION ALL."""
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("hds_stack_nation")
    return spark.sql(
        """
        SELECT n_nationkey, metric, val
        FROM hds_stack_nation
        LATERAL VIEW stack(3,
            'key', CAST(n_nationkey AS BIGINT),
            'region', CAST(n_regionkey AS BIGINT),
            'name_len', CAST(length(n_name) AS BIGINT)
        ) AS metric, val
        ORDER BY n_nationkey, metric
        """
    )
