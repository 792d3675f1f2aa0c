"""§2 extensions, eighth wave — SQL-relational surface completions.

Operators that round out the relational algebra surface a SQL user of
a delivery engine expects: UNPIVOT (wide→long reshape), the
corr/covar/regr_* bivariate aggregate family, error-safe TRY
arithmetic (ANSI mode without job-killing exceptions), correlated
scalar/EXISTS subqueries (Catalyst decorrelates them into joins —
nothing here is driver-side), SQL-defined UDFs (CREATE FUNCTION …
RETURN, both scalar and table-valued — logic lives in the catalog,
planned inline, NOT a Python round-trip), and Spark 4's SQL pipe
syntax (`|>`) proving the pipelined dialect plans identically to
classic SELECT.

Scale notes: every query here is either map-only column work or a
standard keyed shuffle; the correlated subqueries decorrelate to an
aggregate + equi-join on o_orderkey (verified via .explain — no
per-row re-execution, which is what would kill it at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "fn_unpivot",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber,
               l_quantity AS qty, l_extendedprice AS price,
               l_discount AS disc, l_tax AS tax
        FROM lineitem WHERE l_orderkey <= 2000
    ) UNPIVOT (val FOR metric IN (qty, price, disc, tax))
    ORDER BY l_orderkey, l_linenumber, metric
    """,
    tags=("function", "reshape"),
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT / melt): four lineitem measures into
    (metric, val) pairs. Map-only — each input row expands to four
    output rows inside the same task, no shuffle, so it scales as a
    pure narrow transform. Values are read, not computed, so the
    doubles are bit-exact on both engines with no rounding needed.
    DuckDB oracle uses the SQL-standard UNPIVOT clause."""
    li = tbl(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
            F.col("l_tax").alias("tax"),
        )
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["qty", "price", "disc", "tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@register(
    "agg_corr_regr",
    """
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_s,
           round(covar_pop(l_extendedprice, l_quantity), 4) AS cov_p,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n_pairs
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregate family: Pearson correlation,
    sample/population covariance, and the OLS regr_* trio
    (slope/intercept/R²) of extendedprice on quantity per return
    flag. All are single-pass co-moment aggregates with map-side
    partial merge — one shuffle of 3 groups × a handful of moments
    regardless of input size. Rounded to 4 decimals on both sides
    (co-moment accumulation order differs between engines in the
    last ulps, per registry convention)."""
    li = tbl(spark, sf_dir, "lineitem")
    ep, q = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(ep, q), 4).alias("price_qty_corr"),
            F.round(F.covar_samp(ep, q), 4).alias("cov_s"),
            F.round(F.covar_pop(ep, q), 4).alias("cov_p"),
            F.round(F.regr_slope(ep, q), 4).alias("slope"),
            F.round(F.regr_intercept(ep, q), 4).alias("intercept"),
            F.round(F.regr_r2(ep, q), 4).alias("r2"),
            F.regr_count(ep, q).alias("n_pairs"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_try_arith",
    """
    SELECT event_id,
           value / NULLIF(CAST(user_id - 7 AS DOUBLE), 0.0) AS safe_ratio,
           TRY_CAST(2147483640 + event_id % 20 AS INT) AS guarded_add,
           TRY_CAST(-2147483640 - event_id % 20 AS INT) AS guarded_sub,
           TRY_CAST(CASE WHEN event_id % 2 = 0
                         THEN CAST(event_id AS VARCHAR)
                         ELSE 'id-' || event_type END AS BIGINT) AS parsed_id
    FROM events ORDER BY event_id
    """,
    tags=("function", "ansi"),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe TRY arithmetic: try_divide (÷0 → NULL instead of an
    ANSI exception), try_add / try_subtract at the INT overflow
    boundary (overflow → NULL instead of a job-killing error — the
    behavior a 100 TB batch wants: quarantine the row, not retry the
    stage), and try_cast on a column that is only sometimes numeric.
    Map-only column work. The DuckDB oracle has no TRY arithmetic, so
    it states the same semantics from first principles: NULLIF
    guards for ÷0, and BIGINT arithmetic followed by TRY_CAST back
    to int32 — which nulls exactly the rows Spark's int32 overflow
    nulls."""
    # sort-before-project: global order preserved; the range sampler
    # and sort touch only the scan, not the try_* expressions
    e = tbl(spark, sf_dir, "events").orderBy("event_id")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), (F.col("user_id") - 7).cast("double")).alias(
            "safe_ratio"
        ),
        F.try_add(F.lit(2147483640), (eid % 20).cast("int")).alias("guarded_add"),
        F.try_subtract(F.lit(-2147483640), (eid % 20).cast("int")).alias(
            "guarded_sub"
        ),
        # try_cast mirrors the oracle's TRY_CAST exactly; try_to_number
        # with a digit format would silently cap parseable ids at the
        # format width — a latent divergence at larger id ranges.
        F.when(eid % 2 == 0, eid.cast("string"))
        .otherwise(F.concat(F.lit("id-"), F.col("event_type")))
        .try_cast("bigint")
        .alias("parsed_id"),
    )


@register(
    "sql_correlated_subquery",
    """
    SELECT o.o_orderkey,
           round(o.o_totalprice, 2) AS total,
           (SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS n_items,
           (SELECT round(max(l.l_extendedprice), 2) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
    FROM orders o
    WHERE o.o_orderkey <= 4000
      AND EXISTS (SELECT 1 FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND l.l_discount > 0.06)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_returnflag = 'R'
                         AND l.l_tax > 0.07)
    ORDER BY o.o_orderkey
    """,
    tags=("sql", "subquery"),
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries — two scalar (per-order item count and
    max price) plus EXISTS / NOT EXISTS filters. Catalyst
    *decorrelates* all four into aggregate + equi-join / semi-join /
    anti-join on l_orderkey (verified via .explain: no per-row
    subquery re-execution), so the plan is the same keyed-shuffle
    shape as writing the joins by hand — the subquery form is purely
    declarative sugar, and it survives 100× because it IS the join
    plan. Identical SQL runs on DuckDB."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_sq_orders")
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("hds_sq_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               round(o.o_totalprice, 2) AS total,
               (SELECT count(*) FROM hds_sq_lineitem l
                 WHERE l.l_orderkey = o.o_orderkey) AS n_items,
               (SELECT round(max(l.l_extendedprice), 2)
                  FROM hds_sq_lineitem l
                 WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
        FROM hds_sq_orders o
        WHERE o.o_orderkey <= 4000
          AND EXISTS (SELECT 1 FROM hds_sq_lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_discount > 0.06)
          AND NOT EXISTS (SELECT 1 FROM hds_sq_lineitem l
                           WHERE l.l_orderkey = o.o_orderkey
                             AND l.l_returnflag = 'R'
                             AND l.l_tax > 0.07)
        ORDER BY o.o_orderkey
        """
    )


@register(
    "sql_udf_sql",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 10000) / 10000
               AS revenue,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000)
               / 10000 AS charged,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 15 THEN 'mid'
                ELSE 'small' END AS qty_band
    FROM lineitem WHERE l_orderkey <= 1500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("sql", "udf"),
)
def sql_udf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 `CREATE FUNCTION … RETURN`): revenue
    / charged-amount formulas and a quantity banding function defined
    ONCE in the catalog and reused by name. Unlike a Python UDF,
    the body is inlined by the planner into ordinary Column
    expressions — whole-stage codegen, zero serialization boundary,
    indistinguishable at runtime from writing the expression inline
    (which is exactly what the oracle does). Per-row IEEE arithmetic
    is bit-identical across engines; the output surface is
    floor-quantized to 4 decimals (floor of an identical double is
    deterministic, where round() tie-breaks can diverge — Spark
    rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    binary value)."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("hds_udf_lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION hds_revenue(
            ep DOUBLE, disc DOUBLE) RETURNS DOUBLE
        RETURN ep * (1 - disc)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION hds_charged(
            ep DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
        RETURN hds_revenue(ep, disc) * (1 + tax)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION hds_qty_band(q DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN q >= 40 THEN 'bulk'
                    WHEN q >= 15 THEN 'mid'
                    ELSE 'small' END
        """
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               floor(hds_revenue(l_extendedprice, l_discount) * 10000)
                   / 10000 AS revenue,
               floor(hds_charged(l_extendedprice, l_discount, l_tax) * 10000)
                   / 10000 AS charged,
               hds_qty_band(l_quantity) AS qty_band
        FROM hds_udf_lineitem WHERE l_orderkey <= 1500
        ORDER BY l_orderkey, l_linenumber
        """
    )


@register(
    "sql_pipe_syntax",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2024-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql",),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax: the same pricing-summary aggregation
    written as a linear `|>` pipeline (FROM … |> WHERE … |>
    AGGREGATE … GROUP BY … |> ORDER BY). The pipe dialect is parse-
    level sugar — it lowers to the identical logical plan as the
    classic SELECT (same pushed filter, same partial/final hash
    aggregate), which the hash-match against the classic-SQL DuckDB
    oracle demonstrates end to end."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("hds_pipe_lineitem")
    return spark.sql(
        """
        FROM hds_pipe_lineitem
        |> WHERE l_shipdate < TIMESTAMP '2024-06-01'
        |> AGGREGATE count(*) AS n_rows,
                     round(sum(l_quantity), 4) AS sum_qty,
                     round(avg(l_extendedprice), 4) AS avg_price
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows, sum_qty, avg_price
        |> ORDER BY l_returnflag, l_linestatus
        """
    )
