"""§2.H — Scalar function sweep (string / date / math / array / map /
json / struct).

Each query bundles one family into a single projection so the
inventory stays testable. Everything is built-in ``pyspark.sql.
functions`` Column expressions — JVM-side, inside whole-stage
codegen; no Python UDFs anywhere in this module.

Oracle philosophy: the DuckDB SQL must produce the same *result set*,
not mirror the mechanism — where DuckDB lacks a function (e.g.
array set-ops), the oracle recomputes the value from first
principles (list_filter/list_contains, index arithmetic). Engine-
specific functions with no cross-engine semantics (xxhash64, soundex,
rand, monotonically_increasing_id, …) are quarantined in the
rows-only ``fn_misc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import joined_str, tbl

_R = 4


@register(
    "fn_string_basic",
    """
    SELECT c_custkey,
           concat(c_name, '-', c_mktsegment) AS tagged,
           concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS path,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           substr(c_name, 10, 5) AS name_mid,
           length(c_name) AS name_len,
           string_split(c_name, '#')[2] AS name_num
    FROM customer ORDER BY c_custkey
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/concat_ws/upper/lower/trim/lpad/substring/length/split."""
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat("c_name", F.lit("-"), "c_mktsegment").alias("tagged"),
        F.concat_ws("/", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "path"
        ),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.length("c_name").cast("long").alias("name_len"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_num"),
    ).orderBy("c_custkey")


@register(
    "fn_string_regex",
    """
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
           regexp_replace(p_name, 'widget', 'gizmo') AS renamed,
           regexp_matches(p_name, '^(cold|small)') AS starts_cold_small
    FROM part ORDER BY p_partkey
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike (JVM regex, no Python)."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).cast("int").alias(
            "brand_num"
        ),
        F.regexp_replace("p_name", "widget", "gizmo").alias("renamed"),
        F.col("p_name").rlike("^(cold|small)").alias("starts_cold_small"),
    ).orderBy("p_partkey")


@register(
    "fn_string_distance",
    """
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000000') AS dist_to_zero,
           levenshtein(c_mktsegment, 'BUILDING') AS dist_seg
    FROM customer ORDER BY c_custkey
    """,
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzz matching (soundex has no DuckDB twin; it
    lives in fn_misc rows-only)."""
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000000"))
        .cast("long")
        .alias("dist_to_zero"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias(
            "dist_seg"
        ),
    ).orderBy("c_custkey")


@register(
    "fn_hash",
    """
    SELECT s_suppkey,
           md5(s_name) AS h_md5,
           sha256(s_name) AS h_sha256
    FROM supplier ORDER BY s_suppkey
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes with cross-engine-identical output
    (md5/sha2-256). Spark-native xxhash64/hash/crc32 — the fast
    partitioning hashes used by the dedup pipeline — are exercised in
    fn_misc (rows-only, engine-specific by design)."""
    s = tbl(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.md5("s_name").alias("h_md5"),
        F.sha2("s_name", 256).alias("h_sha256"),
    ).orderBy("s_suppkey")


@register(
    "fn_date_extract",
    """
    SELECT event_id,
           CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
           CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mo,
           CAST(dayofmonth(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour,
           date_trunc('month', CAST(ts AS TIMESTAMP)) AS month_start
    FROM events ORDER BY event_id
    """,
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/hour extraction + date_trunc/trunc (runs on the
    ns-shimmed events timestamps)."""
    # sort-before-project: global order preserved through the narrow
    # map-side projection, but the range sampler and sort touch only
    # the scan instead of re-evaluating the projected expressions
    ev = tbl(spark, sf_dir, "events").orderBy("event_id")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("month", "ts").alias("month_start"),
    )


@register(
    "fn_date_arith",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS TIMESTAMP) AS ship_by,
           CAST(CAST(o_orderdate - INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS month_before,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           CAST(make_date(1995, 1, 1) AS TIMESTAMP) AS epoch_date
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add/date_sub/datediff/make_date. Sort-before-project (see
    fn_date_extract)."""
    o = tbl(spark, sf_dir, "orders").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        F.date_add("o_orderdate", 7).cast("timestamp").alias("ship_by"),
        F.date_sub("o_orderdate", 30).cast("timestamp").alias("month_before"),
        F.datediff("o_orderdate", F.make_date(F.lit(1995), F.lit(1), F.lit(1)))
        .cast("long")
        .alias("days_since_95"),
        F.make_date(F.lit(1995), F.lit(1), F.lit(1))
        .cast("timestamp")
        .alias("epoch_date"),
    )


@register(
    "fn_date_convert",
    """
    WITH t AS (
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_str,
               o_orderdate
        FROM orders
    )
    SELECT o_orderkey,
           CAST(CAST(d_str AS DATE) AS TIMESTAMP) AS parsed_date,
           CAST(d_str AS TIMESTAMP) AS parsed_ts,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
           CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT) + 86400) AS TIMESTAMP)
               AS next_day_ts
    FROM t ORDER BY o_orderkey
    """,
)
def fn_date_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_date/to_timestamp string parsing + unix epoch round-trips
    (UTC session timezone keeps both engines on the same wall clock).
    Sort-before-project (see fn_date_extract)."""
    o = tbl(spark, sf_dir, "orders").orderBy("o_orderkey")
    t = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("d_str"),
        "o_orderdate",
    )
    return t.select(
        "o_orderkey",
        F.to_date("d_str").cast("timestamp").alias("parsed_date"),
        F.to_timestamp("d_str").alias("parsed_ts"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.from_unixtime(F.unix_timestamp("o_orderdate") + 86400)
        .cast("timestamp")
        .alias("next_day_ts"),
    )


@register(
    "fn_math",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(abs(l_discount - 0.05) AS REAL) AS abs_ctr,
           CAST(round(l_extendedprice, 1) AS REAL) AS price_r1,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(sqrt(l_quantity) AS REAL) AS qty_sqrt,
           CAST(exp(l_discount) AS REAL) AS disc_exp,
           CAST(ln(l_extendedprice) AS REAL) AS price_ln,
           CAST(pow(l_quantity, 2) AS REAL) AS qty_sq,
           CAST(greatest(l_quantity, l_extendedprice / 1000) AS REAL) AS g,
           CAST(least(l_quantity, l_extendedprice / 1000) AS REAL) AS l
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/ceil/floor/sqrt/exp/log/pow/greatest/least.
    Sort-before-project (see fn_date_extract)."""
    li = tbl(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).cast("float").alias("abs_ctr"),
        F.round("l_extendedprice", 1).cast("float").alias("price_r1"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.sqrt("l_quantity").cast("float").alias("qty_sqrt"),
        F.exp("l_discount").cast("float").alias("disc_exp"),
        F.log("l_extendedprice").cast("float").alias("price_ln"),
        F.pow("l_quantity", F.lit(2)).cast("float").alias("qty_sq"),
        F.greatest("l_quantity", F.col("l_extendedprice") / 1000)
        .cast("float")
        .alias("g"),
        F.least("l_quantity", F.col("l_extendedprice") / 1000)
        .cast("float")
        .alias("l"),
    )


@register(
    "fn_conditional",
    f"""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg,
           ifnull(nullif(l_tax, 0.0), 0.0) AS tax_nvl,
           isnan(CAST('NaN' AS DOUBLE)) AS nan_flag,
           (nullif(l_discount, 0.0) IS NULL) AS disc_was_zero,
           l_extendedprice / nullif(l_quantity - l_quantity, 0.0) AS div_by_zero
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nvl/nullif/isnan/isnull/try_divide (try_divide by the
    derived zero yields NULL — matched by /nullif(0) in the oracle).
    Sort-before-project (see fn_date_extract)."""
    li = tbl(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_neg"
        ),
        F.nvl(F.nullif("l_tax", F.lit(0.0)), F.lit(0.0)).alias("tax_nvl"),
        F.isnan(F.lit("NaN").cast("double")).alias("nan_flag"),
        F.isnull(F.nullif("l_discount", F.lit(0.0))).alias("disc_was_zero"),
        F.try_divide(
            "l_extendedprice", F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
    )


@register(
    "fn_array_basic",
    """
    WITH t AS (
        SELECT p_partkey,
               [CAST(p_size AS BIGINT), p_partkey % 7, CAST(3 AS BIGINT)] AS arr
        FROM part
    )
    SELECT p_partkey,
           list_contains(arr, 3) AS has_three,
           arr[1] AS first_el,
           array_to_string(list_transform(list_slice(arr, 2, 3),
                                          x -> CAST(x AS VARCHAR)), ',') AS mid,
           array_to_string(list_transform(list_sort(arr),
                                          x -> CAST(x AS VARCHAR)), ',')
               AS sorted_arr,
           array_to_string(list_transform(list_sort(list_distinct(arr)),
                                          x -> CAST(x AS VARCHAR)), ',')
               AS distinct_arr,
           array_to_string(list_transform(flatten([arr, arr]),
                                          x -> CAST(x AS VARCHAR)), ',')
               AS doubled,
           array_to_string(list_transform(range(1, (p_partkey % 4) + 2),
                                          x -> CAST(x AS VARCHAR)), ',') AS seq,
           array_to_string(list_transform(arr, x -> CAST(x AS VARCHAR)), '-') AS joined
    FROM t ORDER BY p_partkey
    """,
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array construction, contains, element_at, slice, sort,
    distinct, flatten, sequence, join. Array-typed outputs are
    comma-joined to strings (identical content) because the driver's
    value hasher cannot canonicalize raw array cells; the array ops
    themselves are unchanged underneath."""
    p = tbl(spark, sf_dir, "part")

    t = p.select(
        "p_partkey",
        F.array(
            F.col("p_size").cast("long"),
            F.col("p_partkey") % 7,
            F.lit(3).cast("long"),
        ).alias("arr"),
    )
    return t.select(
        "p_partkey",
        F.array_contains("arr", 3).alias("has_three"),
        F.element_at("arr", 1).alias("first_el"),
        joined_str(F.slice("arr", 2, 2)).alias("mid"),
        joined_str(F.sort_array("arr")).alias("sorted_arr"),
        joined_str(F.array_sort(F.array_distinct("arr"))).alias("distinct_arr"),
        joined_str(F.flatten(F.array("arr", "arr"))).alias("doubled"),
        joined_str(
            F.sequence(F.lit(1).cast("long"), (F.col("p_partkey") % 4) + 1)
        ).alias("seq"),
        F.array_join(F.transform("arr", lambda x: x.cast("string")), "-").alias(
            "joined"
        ),
    ).orderBy("p_partkey")


@register(
    "fn_array_setops",
    """
    WITH t AS (
        SELECT p_partkey,
               [p_partkey % 5, p_partkey % 3, CAST(2 AS BIGINT)] AS a,
               [CAST(2 AS BIGINT), p_partkey % 5] AS b
        FROM part
    )
    SELECT p_partkey,
           COALESCE(array_to_string(list_transform(
               list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))),
               x -> CAST(x AS VARCHAR)), ','), '') AS inter,
           COALESCE(array_to_string(list_transform(
               list_sort(list_distinct(list_concat(a, b))),
               x -> CAST(x AS VARCHAR)), ','), '') AS uni,
           COALESCE(array_to_string(list_transform(
               list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))),
               x -> CAST(x AS VARCHAR)), ','), '') AS diff,
           greatest(len(a), len(b)) AS zip_len
    FROM t ORDER BY p_partkey
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/union/except (+ arrays_zip length) — outputs
    sorted (Spark's set-ops preserve first-occurrence order while the
    oracle recomputes via list_filter) and comma-joined to strings so
    the driver's hasher can verify them; set-op logic unchanged."""
    p = tbl(spark, sf_dir, "part")

    t = p.select(
        "p_partkey",
        F.array(
            F.col("p_partkey") % 5, F.col("p_partkey") % 3, F.lit(2).cast("long")
        ).alias("a"),
        F.array(F.lit(2).cast("long"), F.col("p_partkey") % 5).alias("b"),
    )
    return t.select(
        "p_partkey",
        joined_str(F.array_sort(F.array_intersect("a", "b"))).alias("inter"),
        joined_str(F.array_sort(F.array_union("a", "b"))).alias("uni"),
        joined_str(F.array_sort(F.array_except("a", "b"))).alias("diff"),
        F.size(F.arrays_zip("a", "b")).cast("long").alias("zip_len"),
    ).orderBy("p_partkey")


@register(
    "fn_array_hof",
    f"""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT vec_id,
           CAST(list_sum(e) AS REAL) AS vec_sum,
           len(list_filter(e, x -> x > 0)) AS n_pos,
           len(list_filter(e, x -> abs(x) > 2.0)) > 0 AS has_big,
           len(list_filter(e, x -> NOT (abs(x) < 10))) = 0 AS all_small,
           CAST(list_dot_product(e, e) AS REAL) AS self_dot,
           CAST(list_sum(list_transform(e, x -> x * 2.0)) AS REAL) AS scaled_sum
    FROM t ORDER BY vec_id
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions on embedding vectors: transform /
    filter / aggregate / exists / forall / zip_with. The self dot
    product (zip_with + aggregate) is cross-checked against DuckDB's
    native list_dot_product — an independent implementation."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    zero = F.lit(0.0)
    return e.select(
        "vec_id",
        F.aggregate("e", zero, lambda acc, x: acc + x)
        .cast("float")
        .alias("vec_sum"),
        F.size(F.filter("e", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists("e", lambda x: F.abs(x) > 2.0).alias("has_big"),
        F.forall("e", lambda x: F.abs(x) < 10).alias("all_small"),
        F.aggregate(
            F.zip_with("e", "e", lambda x, y: x * y),
            zero,
            lambda acc, x: acc + x,
        )
        .cast("float")
        .alias("self_dot"),
        F.aggregate(
            F.transform("e", lambda x: x * 2.0), zero, lambda acc, x: acc + x
        )
        .cast("float")
        .alias("scaled_sum"),
    ).orderBy("vec_id")


@register(
    "fn_explode",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct,
           min(tok) AS first_alpha
    FROM toks GROUP BY doc_id ORDER BY doc_id
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(text)) token stream → per-doc token stats (the
    workhorse pattern under llm_tokenize/llm_tfidf)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct("tok").alias("n_distinct"),
            F.min("tok").alias("first_alpha"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_posexplode",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(range(1, len(toks) + 1),
                i -> CASE WHEN toks[i] = 'the' THEN i ELSE 0 END)) AS BIGINT)
               AS the_pos_sum,
           len(toks) AS n_tokens
    FROM t ORDER BY doc_id
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: positional token analytics (sum of 1-based
    positions of 'the' per doc; oracle recomputes via index ranges —
    DuckDB unnest has no ordinality)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("tok") == "the", F.col("pos") + 1).otherwise(0)
            ).alias("the_pos_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_inline",
    """
    SELECT doc_id, 1 AS idx, lang AS val FROM documents
    UNION ALL
    SELECT doc_id, 2 AS idx, source AS val FROM documents
    ORDER BY doc_id, idx
    """,
)
def fn_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>): one row → N rows from struct arrays
    (UDTF-shaped, but fully relational)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.inline(
            F.array(
                F.struct(F.lit(1).alias("idx"), F.col("lang").alias("val")),
                F.struct(F.lit(2).alias("idx"), F.col("source").alias("val")),
            )
        ),
    ).orderBy("doc_id", "idx")


@register(
    "fn_map",
    f"""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS qty_val,
           l_discount AS disc_val,
           2 AS n_keys,
           'disc,qty' AS keys_joined,
           l_quantity + l_discount AS entries_sum
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map / element_at / map_keys / map_entries /
    map_from_entries round-trip. The oracle recomputes the expected
    scalars directly (DuckDB map extraction returns lists — different
    shape, same information). Sort-before-project (see
    fn_date_extract)."""
    li = tbl(spark, sf_dir, "lineitem").orderBy("l_orderkey", "l_linenumber")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    rt = F.map_from_entries(F.map_entries(m))  # entries→map round-trip
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, F.lit("qty")).alias("qty_val"),
        F.element_at(rt, F.lit("disc")).alias("disc_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_joined"),
        F.aggregate(F.map_values(m), F.lit(0.0), lambda acc, x: acc + x).alias(
            "entries_sum"
        ),
    )


@register(
    "fn_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           concat('{"k":', json_extract_string(props, '$.k'), '}') AS repacked,
           json_extract_string(props, '$.k') AS k_tuple
    FROM events ORDER BY event_id
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json / to_json / json_tuple over the
    semi-structured events.props column. Sort-before-project (see
    fn_date_extract)."""
    ev = tbl(spark, sf_dir, "events").orderBy("event_id")
    parsed = F.from_json("props", "struct<k:int>")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_int"),
            F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("repacked"),
            F.json_tuple("props", "k").alias("k_tuple"),
        )
    )


@register(
    "fn_struct",
    f"""
    SELECT o_orderkey,
           o_orderkey AS sk,
           o_totalprice AS sp,
           o_orderstatus AS nested_status,
           CAST(o_totalprice * 2 AS REAL) AS via_named
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct / named_struct packing + dotted field access (the
    multimodal-column packing primitive; values surfaced back as
    scalars so both engines hash identically)."""
    o = tbl(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.struct(F.col("o_orderstatus").alias("st")).alias("inner"),
    )
    named = F.named_struct(
        F.lit("dbl"), (F.col("o_totalprice") * 2).cast("float")
    )
    return o.select(
        "o_orderkey",
        s.getField("k").alias("sk"),
        s.getField("p").alias("sp"),
        s.getField("inner").getField("st").alias("nested_status"),
        named.getField("dbl").alias("via_named"),
    ).orderBy("o_orderkey")


@register("fn_misc", None)  # rows-only: every function here is engine-specific
def fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-specific grab bag (no cross-engine oracle possible):
    monotonically_increasing_id, spark_partition_id, rand(seed),
    xxhash64/hash/crc32, soundex, months_between, percentile_approx,
    schema_of_json. Rows-only: stable schema + executability."""
    n = tbl(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.monotonically_increasing_id().alias("mono_id"),
        F.spark_partition_id().alias("part_id"),
        F.rand(42).alias("rnd"),
        F.xxhash64("n_name").alias("xx64"),
        F.hash("n_name").alias("h32"),
        F.crc32("n_name").alias("crc"),
        F.soundex("n_name").alias("sdx"),
        F.months_between(
            F.make_date(F.lit(2024), F.lit(6), F.lit(15)),
            F.make_date(F.lit(2024), F.lit(1), F.lit(1)),
        ).alias("mb"),
        F.schema_of_json(F.lit('{"k": 1}')).alias("json_schema"),
    ).orderBy("n_nationkey")


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing
    FROM events ORDER BY event_id
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: parse the semi-structured props column
    once into a variant (binary, shredded, no per-access re-parse —
    the open-JSON column type for schema-on-read at scale), then
    extract typed paths; a missing path under try_variant_get is
    NULL, mirroring SQL NULL semantics."""
    ev = tbl(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("k_missing"),
    ).orderBy("event_id")


@register(
    "fn_aes_roundtrip",
    """
    SELECT n_nationkey, n_name AS decrypted,
           CAST(length(n_name) AS BIGINT) AS plain_len
    FROM nation ORDER BY n_nationkey
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption for delivery feeds: aes_encrypt →
    aes_decrypt roundtrip (AES-128-GCM, the Spark default). The
    ciphertext is nondeterministic by design (random IV per row), so
    what the oracle hashes is the DECRYPTED surface — the identity
    roundtrip plus plaintext length, which is exactly the contract a
    consumer of an encrypted column cares about. The key would come
    from a KMS at deploy time; a literal stands in here."""
    key = F.lit("0123456789abcdef")  # 16 bytes → AES-128
    n = tbl(spark, sf_dir, "nation")
    enc = n.select(
        "n_nationkey",
        F.aes_encrypt(F.col("n_name").cast("binary"), key).alias("ct"),
    )
    return enc.select(
        "n_nationkey",
        F.aes_decrypt("ct", key).cast("string").alias("decrypted"),
        F.length(F.aes_decrypt("ct", key).cast("string")).cast("long")
        .alias("plain_len"),
    ).orderBy("n_nationkey")
