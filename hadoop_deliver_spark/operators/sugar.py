"""§2 extensions, eleventh wave (2/3) — dialect sugar, redaction,
wire codecs, and path analytics.

- sql_sugar: GROUP BY ALL / ORDER BY ALL / SELECT * EXCEPT — the
  modern-dialect conveniences (Spark 3.4+/4.x) that delivery SQL
  written by analysts actually uses; proves they lower to the same
  plan as the explicit forms (the oracle is DuckDB's equivalent
  sugar: GROUP BY ALL + EXCLUDE).
- fn_mask_redact: the built-in mask() column redactor (uppercase→X,
  lowercase→x, digit→n, plus a custom-alphabet variant) — the
  column-level cousin of llm_pii_scrub's regex families.
- fn_base64_hex: base64/hex encode–decode roundtrips — the wire
  formats delivery feeds embed binary in.
- events_user_paths: first-3-step journey paths per user (ordered on
  the (ts, event_id) total order) counted across users — the path
  analytics staple. One user-keyed shuffle; path assembly is
  array algebra on the grouped rows.

All map-only or single-keyed-shuffle; nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "sql_sugar",
    """
    SELECT * EXCLUDE (avg_bal)
    FROM (
        SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
               count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS total_bal,
               round(avg(c_acctbal), 2) AS avg_bal
        FROM customer
        GROUP BY ALL
    )
    ORDER BY ALL
    """,
    tags=("sql",),
)
def sql_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL dialect sugar in one statement: GROUP BY ALL infers
    the grouping keys from the non-aggregate select list, ORDER BY
    ALL orders by every output column left-to-right, and
    SELECT * EXCEPT drops a column without enumerating the rest.
    All three are parse-time conveniences — the plan is the ordinary
    hash aggregate + sort of the explicit form. Oracle: DuckDB's own
    sugar (GROUP BY ALL / ORDER BY ALL / EXCLUDE)."""
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("hds_sugar_cust")
    return spark.sql(
        """
        SELECT * EXCEPT (avg_bal)
        FROM (
            SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
                   count(*) AS n_cust,
                   round(sum(c_acctbal), 2) AS total_bal,
                   round(avg(c_acctbal), 2) AS avg_bal
            FROM hds_sugar_cust
            GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


@register(
    "fn_mask_redact",
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'),
               '[0-9]', '9', 'g') AS masked_custom,
           c_name AS original
    FROM customer WHERE c_custkey <= 800 ORDER BY c_custkey
    """,
    tags=("function", "privacy"),
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column redaction with the built-in mask(): uppercase→X,
    lowercase→x, digits→n (default alphabet) and a custom-alphabet
    variant — the shape-preserving redactor for delivering schema-
    compatible but de-identified feeds (llm_pii_scrub handles the
    pattern-family cousin). Map-only. The oracle states the same
    mapping as three global regexp_replace passes."""
    c = tbl(spark, sf_dir, "customer").where(F.col("c_custkey") <= 800)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name",
            F.lit("Q"),
            F.lit("q"),
            F.lit("9"),
            F.lit("#"),
        ).alias("masked_custom"),
        F.col("c_name").alias("original"),
    ).orderBy("c_custkey")


@register(
    "fn_base64_hex",
    """
    SELECT n_nationkey,
           to_base64(CAST(n_name AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR)
               AS b64_rt,
           hex(n_name) AS hexed,
           lower(hex(n_name)) AS hexed_lc
    FROM nation ORDER BY n_nationkey
    """,
    tags=("function", "codec"),
)
def fn_base64_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format codecs: base64 and hex encode of a string column
    plus the decode roundtrip back to the original text — the
    embed-binary-in-text staple of delivery feeds (and the inverse
    pair scan_avro's container codec builds on). Map-only JVM string
    ops; both engines emit RFC 4648 base64 and uppercase hex, so the
    wire strings compare byte-for-byte."""
    n = tbl(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary")))
        .cast("string")
        .alias("b64_rt"),
        F.hex(F.col("n_name")).alias("hexed"),
        F.lower(F.hex(F.col("n_name"))).alias("hexed_lc"),
    ).orderBy("n_nationkey")


@register(
    "events_user_paths",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM events
    ),
    paths AS (
        SELECT user_id,
               array_to_string(array_agg(event_type ORDER BY rk), '>')
                   AS path
        FROM ordered WHERE rk <= 3 GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    """,
    tags=("analytics", "events"),
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey-path analytics: each user's first three events on the
    (ts, event_id) total order become a 'view>click>purchase' path
    string; paths are then counted across users — the entry-funnel
    exploration primitive. One user-keyed window pass (rank ≤ 3 keeps
    state tiny), then a path-keyed aggregate whose cardinality is
    bounded by |event_type|³, not by users — the second shuffle is
    trivially small at any scale."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rk", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
    )
