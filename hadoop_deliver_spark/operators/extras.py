"""§2.L — Extended coverage batch: bitwise/bool functions and
aggregates, arg-min/max, URL parsing, time-series gap-fill, delivery
manifests, trigonometry.

All seven queries are full-oracle (DuckDB hash parity). Two are
delivery-genre capabilities the earlier sections lacked:

- ``ts_resample_gapfill`` — resample an event stream onto a fixed
  6-hour grid and fill gaps by last-observation-carried-forward, the
  standard time-series densification step before ML feature windows.
  Scale shape: one grid row per (event_type, bucket) — the grid is
  tiny relative to the events, built from an aggregated bounds row +
  ``sequence``/``explode``, so the only real shuffle is the bucketed
  aggregation; the LOCF window partitions by event_type (bounded
  cardinality, no skew).
- ``delivery_manifest`` — per-delivery-partition record count, key
  range, and an order-insensitive content checksum: the verification
  manifest a getmerge-style delivery ships alongside the data. The
  checksum is md5 over the *sorted* per-group key list, so it is
  engine- and partitioning-independent. collect_list is bounded by
  the delivery-partition size (one month here) — at 100 TB the
  partition key is what the pipeline already delivers by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

@register(
    "fn_bitwise",
    """
    SELECT event_id,
           event_id & 255 AS band,
           event_id | 4096 AS bor,
           xor(event_id, user_id) AS bxor,
           CAST(bit_count(event_id) AS BIGINT) AS bits,
           event_id << 3 AS shl,
           event_id >> 2 AS shr
    FROM events ORDER BY event_id
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR, popcount, shifts — all JVM-side Column ops."""
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("band"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("bor"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("bxor"),
        F.bit_count("event_id").cast("long").alias("bits"),
        F.shiftleft("event_id", 3).alias("shl"),
        F.shiftright("event_id", 2).alias("shr"),
    ).orderBy("event_id")


@register(
    "agg_bitwise_bool",
    """
    SELECT event_type,
           bit_and(user_id) AS ba,
           bit_or(user_id) AS bo,
           bit_xor(user_id) AS bx,
           bool_and(value > 0) AS all_pos,
           bool_or(value > 90) AS any_large,
           count(*) AS n_rows
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregate", "bitwise"),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and/bit_or/bit_xor and bool_and/bool_or grouped aggregates."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("ba"),
            F.bit_or("user_id").alias("bo"),
            F.bit_xor("user_id").alias("bx"),
            F.bool_and(F.col("value") > 0).alias("all_pos"),
            F.bool_or(F.col("value") > 90).alias("any_large"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_arg_minmax",
    """
    SELECT event_type,
           arg_max(user_id, event_id) AS latest_user,
           arg_min(user_id, event_id) AS first_user,
           max(event_id) AS max_eid,
           CAST(max(value) AS REAL) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregate",),
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) keyed on the *unique* event_id so
    the result is deterministic across engines and partition orders."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.max_by("user_id", "event_id").alias("latest_user"),
            F.min_by("user_id", "event_id").alias("first_user"),
            F.max("event_id").alias("max_eid"),
            F.max("value").cast("float").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_url_parse",
    """
    SELECT c_custkey,
           'deliver.example.com' AS host,
           '/' || lower(c_mktsegment) || '/item' AS path,
           'id=' || c_custkey || '&ref=home' AS query,
           CAST(c_custkey AS VARCHAR) AS qid
    FROM customer ORDER BY c_custkey
    """,
    tags=("function", "string"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url HOST/PATH/QUERY/QUERY:key extraction. The oracle
    recomputes the expected components from first principles (DuckDB
    1.0 has no parse_url)."""
    c = tbl(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://deliver.example.com/"),
        F.lower("c_mktsegment"),
        F.lit("/item?id="),
        F.col("c_custkey").cast("string"),
        F.lit("&ref=home"),
    )
    return c.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid"),
    ).orderBy("c_custkey")


@register(
    "ts_resample_gapfill",
    """
    WITH e AS (
      SELECT event_type, event_id,
             make_timestamp(((epoch_us(ts) // 1000000 // 21600) * 21600)
                            * 1000000) AS bucket,
             value
      FROM events
    ),
    b AS (
      SELECT event_type, bucket,
             CAST(arg_max(value, event_id) AS REAL) AS obs_v
      FROM e GROUP BY event_type, bucket
    ),
    bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 6 HOUR)) AS bucket
      ) g
    )
    SELECT grid.event_type, grid.bucket,
           last_value(b.obs_v IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled
    FROM grid LEFT JOIN b
      ON b.event_type = grid.event_type AND b.bucket = grid.bucket
    ORDER BY grid.event_type, grid.bucket
    """,
    tags=("timeseries",),
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events onto a global 6-hour grid per event_type and
    gap-fill by last-observation-carried-forward (leading gaps stay
    null). Bucket = floor(epoch seconds / 21600) — integer math, so
    both engines land on identical bucket timestamps (session TZ is
    pinned to UTC in prepare_session)."""
    e = tbl(spark, sf_dir, "events").withColumn(
        "bucket",
        F.timestamp_seconds(F.expr("(unix_timestamp(ts) div 21600) * 21600")),
    )
    # The bucket value is the *latest* observation (max_by on the
    # unique event_id), not an average: true LOCF semantics, and —
    # unlike avg/sum — involves zero float arithmetic, so both engines
    # round the very same parquet double (an engine-computed avg can
    # straddle a .xxxx5 rounding edge by one ulp).
    b = e.groupBy("event_type", "bucket").agg(
        F.max_by("value", "event_id").cast("float").alias("obs_v")
    )
    # densify + LOCF via the public core (api.locf_grid carries the
    # bounds-row/sequence grid-construction scale rationale)
    from hadoop_deliver_spark.api import locf_grid

    return locf_grid(
        b, ["event_type"], "bucket", "obs_v", F.expr("interval 6 hours")
    ).orderBy("event_type", "bucket")


@register(
    "delivery_manifest",
    """
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           count(*) AS n_rows,
           min(l_orderkey) AS min_key,
           max(l_orderkey) AS max_key,
           CAST(sum(l_quantity) AS REAL) AS sum_qty,
           md5(string_agg(l_orderkey || '#' || l_linenumber, ','
                          ORDER BY l_orderkey || '#' || l_linenumber))
             AS checksum
    FROM lineitem GROUP BY ship_month ORDER BY ship_month
    """,
    tags=("delivery", "aggregate"),
)
def delivery_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-delivery-partition manifest: row count, key range, quantity
    total, and an order-insensitive md5 checksum over the sorted
    (orderkey#linenumber) key list — what a getmerge-style delivery
    publishes so the receiver can verify completeness. Keys sort
    lexicographically in both engines (binary collation)."""
    li = tbl(spark, sf_dir, "lineitem")
    rk = F.concat_ws(
        "#",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        li.withColumn("ship_month", F.date_trunc("month", "l_shipdate"))
        .withColumn("rk", rk)
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.sum("l_quantity").cast("float").alias("sum_qty"),
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list("rk")))
            ).alias("checksum"),
        )
        .orderBy("ship_month")
    )


@register(
    "fn_trig",
    """
    SELECT p_partkey,
           CAST(sin(p_retailprice / 1000) AS REAL) AS s,
           CAST(cos(p_retailprice / 1000) AS REAL) AS c,
           CAST(atan2(CAST(p_partkey AS DOUBLE), 7.0) AS REAL) AS a2,
           CAST(radians(CAST(p_partkey % 360 AS DOUBLE)) AS REAL) AS rad,
           CAST(degrees(1.0) AS REAL) AS deg,
           CAST(sign(p_retailprice - 1000) AS REAL) AS sg,
           CAST(cbrt(CAST(p_partkey AS DOUBLE)) AS REAL) AS cr
    FROM part ORDER BY p_partkey
    """,
    tags=("function", "math"),
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/radians/degrees/sign/cbrt — surfaced as float32
    on both sides (JVM Math vs libm can differ in the last double ulp)."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.sin(F.col("p_retailprice") / 1000).cast("float").alias("s"),
        F.cos(F.col("p_retailprice") / 1000).cast("float").alias("c"),
        F.atan2(F.col("p_partkey").cast("double"), F.lit(7.0)).cast("float").alias("a2"),
        F.radians((F.col("p_partkey") % 360).cast("double")).cast("float").alias("rad"),
        F.degrees(F.lit(1.0)).cast("float").alias("deg"),
        F.signum(F.col("p_retailprice") - 1000).cast("float").alias("sg"),
        F.cbrt(F.col("p_partkey").cast("double")).cast("float").alias("cr"),
    ).orderBy("p_partkey")


@register(
    "fn_string_extra",
    """
    SELECT c_custkey,
           upper(substr(lower(c_mktsegment), 1, 1))
             || substr(lower(c_mktsegment), 2) AS seg_title,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           repeat(left(c_mktsegment, 2), 3) AS seg_rep,
           reverse(c_name) AS name_rev,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           left(c_name, 8) AS name_l,
           right(c_name, 4) AS name_r,
           CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ascii,
           chr(65 + CAST(c_nationkey % 26 AS INTEGER)) AS nat_chr,
           split_part(c_name, '#', 2) AS name_id
    FROM customer ORDER BY c_custkey
    """,
    tags=("function", "string"),
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """initcap/translate/repeat/reverse/instr/left/right/ascii/chr/
    split_part. The initcap oracle is recomputed from first principles
    (DuckDB 1.0 lacks initcap); segments are single words so the two
    definitions coincide."""
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("seg_rep"),
        F.reverse("c_name").alias("name_rev"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.substring("c_name", 1, 8).alias("name_l"),
        F.col("c_name").substr(F.length("c_name") - 3, F.lit(4)).alias("name_r"),
        F.ascii("c_mktsegment").cast("long").alias("seg_ascii"),
        F.chr(F.lit(65) + (F.col("c_nationkey") % 26)).alias("nat_chr"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_id"),
    ).orderBy("c_custkey")


@register(
    "agg_histogram",
    """
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
           CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000 AS bin_lo,
           count(*) AS n_rows,
           CAST(min(l_extendedprice) AS REAL) AS bin_min,
           CAST(max(l_extendedprice) AS REAL) AS bin_max
    FROM lineitem GROUP BY bin ORDER BY bin
    """,
    tags=("aggregate", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (5000-unit bins) —
    the one-pass distributed histogram shape: bin id is computed
    map-side, so the shuffle carries one row per (partition, bin).
    min/max per bin are exact parquet doubles surfaced as float32
    per the cross-engine convention."""
    li = tbl(spark, sf_dir, "lineitem")
    bin_ = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").cast("float").alias("bin_min"),
            F.max("l_extendedprice").cast("float").alias("bin_max"),
        )
        .withColumn("bin_lo", F.col("bin") * 5000)
        .select("bin", "bin_lo", "n_rows", "bin_min", "bin_max")
        .orderBy("bin")
    )


@register(
    "ts_sessionize",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM o
    )
    SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    tags=("timeseries", "window"),
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization, 30-minute inactivity gap: lag → gap flag →
    running sum = session id → per-session aggregate. The batch twin of
    stream_session_window (same sessions, plus the id). One shuffle on
    user_id serves both windows and the final groupBy; ties at equal ts
    are ordered by the unique event_id so the lag is deterministic.
    Core: api.sessionize (column-parameterized gaps-and-islands)."""
    from hadoop_deliver_spark.api import sessionize

    e = tbl(spark, sf_dir, "events")
    sess = sessionize(e, ["user_id"], "ts", 1800, ["event_id"])
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )
