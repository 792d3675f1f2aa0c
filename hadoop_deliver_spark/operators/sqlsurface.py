"""§2.K extensions, seventh wave — SQL-surface operators.

The engine's second entry point is the SQL string (SURVEY §3.2):
`spark.sql(...)` over temp views must be able to express everything
the DataFrame API does, plus the SQL-only constructs. Two of those
get dedicated operators:

- recursive CTE (new in Spark 4): iterative traversal INSIDE one
  declarative statement — the planner unrolls it, one shuffle per
  step, no driver-side loop.
- CTAS + INSERT INTO: catalog-table DML, the workflow that turns a
  query into a managed dataset other jobs read by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE chain(key, node, depth) AS (
        SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey <= 512
        UNION ALL
        SELECT key, node // 2, depth + 1 FROM chain WHERE node > 1
    )
    SELECT key, max(depth) AS depth_to_root,
           CAST(sum(node) AS BIGINT) AS path_sum
    FROM chain GROUP BY key ORDER BY key
    """,
    tags=("sql",),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each order key up
    the implicit binary hierarchy node → node/2 until the root —
    depth and path-sum per key, all integer arithmetic. This is the
    SQL-only construct for iterative graph/hierarchy traversal (BOM
    explosions, org charts); the engine unrolls it into one join per
    level, each an ordinary shuffle — contrast llm_dedup_clusters,
    which hand-rolls the same fixpoint loop in Python for an unbounded
    diameter. Oracle: DuckDB's own recursive CTE (`//` vs `div` is the
    only dialect difference)."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_orders_v")
    return spark.sql(
        """
        WITH RECURSIVE chain(key, node, depth) AS (
            SELECT o_orderkey, o_orderkey, 0 FROM hds_orders_v
            WHERE o_orderkey <= 512
            UNION ALL
            SELECT key, node div 2, depth + 1 FROM chain WHERE node > 1
        )
        SELECT key, max(depth) AS depth_to_root,
               sum(node) AS path_sum
        FROM chain GROUP BY key ORDER BY key
        """
    )


@register(
    "sql_ctas_insert",
    """
    WITH t AS (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey <= 2
        UNION ALL
        SELECT n_nationkey + 100, upper(n_name), n_regionkey
        FROM nation WHERE n_regionkey = 3
    )
    SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
    FROM t GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("sql",),
)
def sql_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog DML: CREATE TABLE AS SELECT seeds a managed table, then
    INSERT INTO ... SELECT appends a second batch — the named-dataset
    hand-off between pipeline stages (writer materializes once,
    readers address the catalog name). Both statements are ordinary
    jobs: CTAS is a parallel write, INSERT appends new files — no
    rewrite of existing data. The read-back aggregate hash-checks the
    combined content. The table lives at an explicit staged LOCATION
    (not the default warehouse): a fresh session's catalog does not
    know about a prior run's managed directory, and CTAS refuses a
    location that already exists — so the location is owned and
    cleared here, never inherited."""
    import shutil

    from hadoop_deliver_spark.operators.sources import _stage_dir

    tbl(spark, sf_dir, "nation").createOrReplaceTempView("hds_nation_v")
    name = "hds_ctas_demo"
    loc = _stage_dir(sf_dir, "ctas_demo")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {name} USING parquet LOCATION '{loc}' AS
        SELECT n_nationkey, n_name, n_regionkey FROM hds_nation_v
        WHERE n_regionkey <= 2
        """
    )
    spark.sql(
        f"""
        INSERT INTO {name}
        SELECT n_nationkey + 100, upper(n_name), n_regionkey
        FROM hds_nation_v WHERE n_regionkey = 3
        """
    )
    return spark.sql(
        f"""
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM {name} GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )
