"""§2.H extensions, ninth wave — serialization & text-surface functions.

Column-level codecs and text-normalization surfaces a delivery engine
meets constantly: XML field extraction (xpath_* — the row-tagged feeds
scan_xml reads whole, here addressed per-field inside a column), CSV
encode/decode as *column* functions (to_csv/from_csv — embedded CSV in
a field, not a file), collation-aware grouping (Spark 4 UTF8_LCASE —
case-insensitive semantics declared in the type system instead of
scattering lower() calls), and locale-stable number/string formatting
for human-facing delivery files.

All four are map-only column work (plus one keyed aggregate for the
collation demo) — no shuffle beyond the group-by, nothing
driver-side, trivially scale-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "fn_xpath",
    """
    SELECT p_partkey,
           CAST(p_partkey AS INT) AS xk,
           p_brand AS xbrand,
           CAST(p_size AS INT) AS xsize,
           [CAST(p_partkey AS VARCHAR), p_brand, CAST(p_size AS VARCHAR)]
               AS xall,
           3 AS n_nodes
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
    """,
    tags=("function", "xml"),
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML field extraction with the xpath_* function family: build a
    row-tagged XML column, then pull typed fields back out with
    xpath_int / xpath_string and the node-list form xpath(...) (→
    array<string>). This is the per-COLUMN twin of scan_xml (which
    reads whole files): the genre's feeds often embed an XML blob in
    one field of an otherwise tabular record. The oracle states the
    expected values from first principles (DuckDB has no xpath) —
    since the XML is built from the same row, extraction must invert
    construction exactly. Map-only; JVM-side goog XPath evaluation,
    no Python."""
    p = tbl(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    xml = F.concat(
        F.lit("<p><k>"),
        F.col("p_partkey").cast("string"),
        F.lit("</k><b>"),
        F.col("p_brand"),
        F.lit("</b><sz>"),
        F.col("p_size").cast("string"),
        F.lit("</sz></p>"),
    )
    return (
        p.select("p_partkey", xml.alias("xml"))
        .select(
            "p_partkey",
            F.xpath_int("xml", F.lit("p/k")).alias("xk"),
            F.xpath_string("xml", F.lit("p/b")).alias("xbrand"),
            F.xpath_int("xml", F.lit("p/sz")).alias("xsize"),
            F.xpath("xml", F.lit("p/*/text()")).alias("xall"),
            F.size(F.xpath("xml", F.lit("p/*"))).alias("n_nodes"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_to_from_csv",
    """
    SELECT n_nationkey,
           n_nationkey || ',' || n_name || ',' || n_regionkey AS csv_line,
           n_nationkey AS rt_key,
           n_name AS rt_name,
           n_regionkey AS rt_region
    FROM nation ORDER BY n_nationkey
    """,
    tags=("function", "csv"),
)
def fn_to_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a COLUMN codec: to_csv(struct(...)) serializes each row
    to an embedded CSV string, from_csv parses it straight back with
    an explicit schema — the encode/decode pair for feeds that nest a
    CSV record inside one field. Integer/string columns only, so the
    wire format is locale-free and the oracle can state it as plain
    concatenation; the roundtripped fields must equal the originals
    byte-for-byte. Map-only."""
    n = tbl(spark, sf_dir, "nation")
    enc = n.select(
        "n_nationkey",
        F.to_csv(
            F.struct("n_nationkey", "n_name", "n_regionkey")
        ).alias("csv_line"),
    )
    dec = F.from_csv(
        F.col("csv_line"),
        F.lit("k INT, name STRING, region INT"),
    )
    return (
        enc.select(
            "n_nationkey",
            "csv_line",
            dec.getField("k").alias("rt_key"),
            dec.getField("name").alias("rt_name"),
            dec.getField("region").alias("rt_region"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "fn_collation",
    """
    WITH mangled AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT lower(seg) AS segment, count(*) AS n_customers
    FROM mangled GROUP BY lower(seg) ORDER BY segment
    """,
    tags=("function", "collation"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a case-mangled
    market-segment column is grouped under UTF8_LCASE collation — the
    case-insensitive semantics live in the COLUMN TYPE, so the
    group-by, joins, and comparisons all inherit them without
    sprinkling lower() at each use site. The displayed key is
    lower(any member) (deterministic: all members of a UTF8_LCASE
    group share one lowercase form). Oracle states the equivalent
    from first principles by grouping on lower(). Plans as an
    ordinary hash aggregate on the collated key — same shuffle shape
    as a binary-collation group-by."""
    c = tbl(spark, sf_dir, "customer")
    mangled = c.select(
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg")
    )
    collated = mangled.select(F.collate("seg", "UTF8_LCASE").alias("seg"))
    return (
        collated.groupBy("seg")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.lower("seg").cast("string").alias("segment"), "n_customers"
        )
        .orderBy("segment")
    )


@register(
    "fn_format",
    """
    WITH cents AS (
        SELECT *, CAST(floor(o_totalprice * 100) AS BIGINT) AS c
        FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           format('{:,}', c // 100) || '.' ||
               lpad(CAST(c % 100 AS VARCHAR), 2, '0') AS money_fmt,
           printf('%08d:%s', o_orderkey, o_orderpriority) AS order_tag,
           lpad(o_orderstatus, 5, '*') AS status_l,
           rpad(o_orderstatus, 5, '.') AS status_r
    FROM cents ORDER BY o_orderkey
    """,
    tags=("function", "format"),
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-facing delivery formatting: thousands-grouped money
    (format_number — Java DecimalFormat; the value is floor-quantized
    to cents first so no rounding tie-break is ever exercised; DuckDB
    can only thousands-group integers, so the oracle assembles
    '{:,}'-grouped dollars || '.' || zero-padded cents from first
    principles), printf-style zero-padded record tags, and lpad/rpad
    fixed-width fields. Map-only string work, JVM-side."""
    o = tbl(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    cents = F.floor(F.col("o_totalprice") * 100) / 100
    return o.select(
        "o_orderkey",
        F.format_number(cents, 2).alias("money_fmt"),
        F.printf(
            F.lit("%08d:%s"), F.col("o_orderkey"), F.col("o_orderpriority")
        ).alias("order_tag"),
        F.lpad("o_orderstatus", 5, "*").alias("status_l"),
        F.rpad("o_orderstatus", 5, ".").alias("status_r"),
    ).orderBy("o_orderkey")
