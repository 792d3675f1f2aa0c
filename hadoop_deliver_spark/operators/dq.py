"""§2.K extensions, fourth wave — data-quality constraint checking.

A delivery pipeline gates every dataset hand-off on a constraint
sweep: primary-key uniqueness, foreign-key integrity, null and range
rules. These are exactly the checks a 100 TB training-data refresh
runs before publishing a snapshot, so the engine ships them as a
first-class operator rather than ad-hoc notebook SQL.

Shape at scale: each check is either a single-pass aggregate (null /
range / uniqueness via count vs count-distinct) or a shuffle
anti-join on the FK key (orphan detection). The per-check results are
one row each, so the final union is trivially small; the expensive
part parallelizes exactly like the joins/aggregates it is built from.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "dq_constraints",
    """
    WITH checks AS (
      SELECT 'orders.o_orderkey unique' AS check_name,
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                 AS n_violations
      UNION ALL
      SELECT 'customer.c_custkey unique',
             (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
      UNION ALL
      SELECT 'orders.o_custkey fk customer',
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'lineitem.l_orderkey fk orders',
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'orders.o_totalprice positive',
             (SELECT count(*) FROM orders
              WHERE o_totalprice IS NULL OR o_totalprice <= 0)
      UNION ALL
      SELECT 'lineitem.l_discount in [0, 0.1]',
             (SELECT count(*) FROM lineitem
              WHERE l_discount IS NULL
                 OR l_discount < 0 OR l_discount > 0.1)
      UNION ALL
      SELECT 'lineitem.l_quantity in [1, 50]',
             (SELECT count(*) FROM lineitem
              WHERE l_quantity IS NULL
                 OR l_quantity < 1 OR l_quantity > 50)
      UNION ALL
      SELECT 'events.user_id not null',
             (SELECT count(*) FROM events WHERE user_id IS NULL)
      UNION ALL
      SELECT 'documents.n_chars = len(text)',
             (SELECT count(*) FROM documents WHERE n_chars <> length(text))
    )
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM checks ORDER BY check_name
    """,
    tags=("quality", "delivery"),
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint sweep over the star schema + pipeline tables: PK
    uniqueness, FK orphans (anti-join), positivity/range rules, and a
    derived-column consistency check (documents.n_chars). Returns one
    row per check with its violation count — the dataset publishes
    only when every `passed` is true. All non-join checks for a table
    ride ONE conditional-aggregate scan of it (5 scans total, not one
    per check — the difference between 5 and 9 full passes at 100 TB);
    uniqueness is count minus count-distinct (no self-join); FK
    orphans are left-anti joins that shuffle on the key like any
    equi-join."""
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    lineitem = tbl(spark, sf_dir, "lineitem")
    events = tbl(spark, sf_dir, "events")
    documents = tbl(spark, sf_dir, "documents")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def unpivot(df_agg: DataFrame, names: list[str]) -> DataFrame:
        # df_agg: one row whose columns c0..cN hold the violation
        # counts; stack() unpivots to (check_name, n_violations) rows
        # so every per-table check rides ONE scan of that table.
        pairs = ", ".join(
            f"'{n}', c{i}" for i, n in enumerate(names)
        )
        return df_agg.select(
            F.expr(
                f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"
            )
        )

    checks = [
        unpivot(
            orders.agg(
                (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("c0"),
                viol(
                    F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
                ).alias("c1"),
            ),
            ["orders.o_orderkey unique", "orders.o_totalprice positive"],
        ),
        unpivot(
            customer.agg(
                (F.count(F.lit(1)) - F.count_distinct("c_custkey")).alias("c0")
            ),
            ["customer.c_custkey unique"],
        ),
        unpivot(
            lineitem.agg(
                viol(
                    F.col("l_discount").isNull()
                    | (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 0.1)
                ).alias("c0"),
                viol(
                    F.col("l_quantity").isNull()
                    | (F.col("l_quantity") < 1)
                    | (F.col("l_quantity") > 50)
                ).alias("c1"),
            ),
            ["lineitem.l_discount in [0, 0.1]", "lineitem.l_quantity in [1, 50]"],
        ),
        unpivot(
            events.agg(viol(F.col("user_id").isNull()).alias("c0")),
            ["events.user_id not null"],
        ),
        unpivot(
            documents.agg(
                viol(F.col("n_chars") != F.length("text")).alias("c0")
            ),
            ["documents.n_chars = len(text)"],
        ),
        # FK orphan checks genuinely need the join; left_anti shuffles
        # on the key like any equi-join and counts survivors.
        unpivot(
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("c0")),
            ["orders.o_custkey fk customer"],
        ),
        unpivot(
            lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("c0")),
            ["lineitem.l_orderkey fk orders"],
        ),
    ]
    return (
        reduce(DataFrame.unionByName, checks)
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("check_name")
    )


@register(
    "delivery_observed_metrics",
    """
    SELECT count(*) AS n_rows,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS REAL) AS total_price,
           min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
    FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("quality", "delivery"),
)
def delivery_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline instrumentation via df.observe(): the delivery scan
    carries named aggregate metrics that the engine accumulates
    DURING the pass — row count, exact DECIMAL money total, key
    range — so publishing a dataset and auditing it is ONE job, not
    a write plus a re-read. At 100 TB that second scan is real money;
    observe() metrics ride the task results for free. The query
    materializes the delivery (foreach no-op action), then surfaces
    the observed metrics as the result row — hash-checked against the
    oracle recomputing them relationally."""
    from pyspark.sql import Observation, Row

    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    ob = Observation("delivery_metrics")
    observed = li.observe(
        ob,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .cast("float")
        .alias("total_price"),
        # observe() forbids DISTINCT aggregates (they don't merge as
        # task-local partials); key range stands in for the audit.
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )
    # The delivery action must be a SQL-layer action (noop-sink write):
    # RDD actions like foreach() bypass the QueryExecution listener
    # that delivers observed metrics, and Observation.get blocks forever.
    observed.write.format("noop").mode("overwrite").save()
    m = ob.get
    return spark.createDataFrame(
        [Row(n_rows=m["n_rows"], total_price=m["total_price"],
             min_key=m["min_key"], max_key=m["max_key"])],
        "n_rows BIGINT, total_price FLOAT, min_key BIGINT, max_key BIGINT",
    )
