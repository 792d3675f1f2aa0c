"""§2 extensions, hundred-seventy-first wave — delivery integrity.

- delivery_merkle_root: a two-level Merkle checksum over the
  lineitem key space — 16 bucket digests (md5 of the
  ordered-concatenated row keys in each bucket) rolled into one
  root digest. delivery_manifest's per-month checksums localize a
  diff to a month; the Merkle layout localizes it to a bucket with
  ONE root comparison first — the sync-protocol primitive.
- dq_key_density: the surrogate-key density audit on the orders key
  space — span vs count, missing-key mass, duplicate census, and
  the contiguity verdict; the two-reduce integrity check that needs
  no sort and no window over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_MERKLE_BUCKETS = 16


@register(
    "delivery_merkle_root",
    f"""
    WITH keys AS (
        SELECT l_orderkey * 10 + l_linenumber AS k,
               l_orderkey % {_MERKLE_BUCKETS} AS b
        FROM lineitem
    ),
    leaf AS (
        SELECT b, CAST(count(*) AS BIGINT) AS n_rows,
               md5(string_agg(CAST(k AS VARCHAR), ',' ORDER BY k))
                   AS digest
        FROM keys GROUP BY b
    ),
    root AS (
        SELECT md5(string_agg(digest, ',' ORDER BY b)) AS root_digest,
               CAST(sum(n_rows) AS BIGINT) AS total_rows
        FROM leaf
    )
    SELECT l.b AS bucket, l.n_rows, l.digest AS bucket_digest,
           r.root_digest, r.total_rows
    FROM leaf l CROSS JOIN root r
    ORDER BY l.b
    """,
    tags=("delivery", "dq"),
)
def delivery_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle checksum of the lineitem key space: rows
    bucket by orderkey mod 16, each bucket digests the
    ascending-ordered comma-joined composite keys
    (orderkey·10 + linenumber — unique by the data model) with md5,
    and the root digests the bucket digests in bucket order. Two
    deliveries agree iff the roots agree; on disagreement the 16
    bucket digests localize the diff in one round — the rsync/Merkle
    sync primitive, one level deeper than delivery_manifest's flat
    per-month checksums. md5 and the ordered string_agg are
    bit-identical across engines (binary collation, same ordering
    key), so the digests are exact string equalities, not float
    comparisons.

    Scale shape: one bucket-keyed reduce with an ordered string
    aggregate per bucket (each bucket sorts only ITS rows — 16-way
    parallel), one 16-row roll-up; at cluster scale the bucket count
    is the knob (mod 4096 for a 4096-leaf tree, same plan)."""
    li = tbl(spark, sf_dir, "lineitem")
    keys = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        (F.col("l_orderkey") % _MERKLE_BUCKETS).alias("b"),
    )
    leaf = keys.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(
            F.array_join(
                F.array_sort(F.collect_list(F.col("k"))).cast(
                    "array<string>"
                ),
                ",",
            ).cast("binary")
        ).alias("digest"),
    )
    root = leaf.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("b", "digest"))
                    ),
                    lambda s: s["digest"],
                ),
                ",",
            ).cast("binary")
        ).alias("root_digest"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )
    return (
        leaf.crossJoin(F.broadcast(root))
        .select(
            F.col("b").alias("bucket"),
            "n_rows",
            F.col("digest").alias("bucket_digest"),
            "root_digest",
            "total_rows",
        )
        .orderBy("bucket")
    )


@register(
    "dq_key_density",
    """
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd,
               CAST(min(o_orderkey) AS BIGINT) AS lo,
               CAST(max(o_orderkey) AS BIGINT) AS hi
        FROM orders
    )
    SELECT n AS n_rows, nd AS n_distinct_keys,
           lo AS min_key, hi AS max_key,
           hi - lo + 1 AS key_span,
           hi - lo + 1 - nd AS n_missing,
           n - nd AS n_duplicated,
           round(CAST(nd AS DOUBLE) / (hi - lo + 1), 6) AS density,
           (n = nd AND hi - lo + 1 = nd) AS contiguous_unique
    FROM s
    """,
    tags=("dq",),
)
def dq_key_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key density audit on the orders key space: rows vs
    distinct keys (duplicate census), key span vs distinct keys
    (missing-key mass), the density ratio, and the
    `contiguous_unique` verdict that certifies an exactly-dense
    1-per-key sequence — the cheap integrity check run before any
    'row count matches upstream' sign-off, catching both silent
    duplication (n > nd) and silent loss (span > nd) without
    sorting anything. dq_constraints checks FK orphans and rules;
    this checks the KEY SPACE itself. All quantities are exact
    integers from ONE global reduce (count-distinct shuffles on the
    key like any exact distinct); the density alone is a display
    ratio.

    Scale shape: one global reduce (count, distinct-count, min,
    max) — no windows, no sort, no joins."""
    o = tbl(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("o_orderkey").cast("long").alias("nd"),
        F.min("o_orderkey").cast("long").alias("lo"),
        F.max("o_orderkey").cast("long").alias("hi"),
    )
    span = F.col("hi") - F.col("lo") + 1
    return s.select(
        F.col("n").alias("n_rows"),
        F.col("nd").alias("n_distinct_keys"),
        F.col("lo").alias("min_key"),
        F.col("hi").alias("max_key"),
        span.alias("key_span"),
        (span - F.col("nd")).alias("n_missing"),
        (F.col("n") - F.col("nd")).alias("n_duplicated"),
        F.round(F.col("nd").cast("double") / span, 6).alias("density"),
        (
            (F.col("n") == F.col("nd")) & (span == F.col("nd"))
        ).alias("contiguous_unique"),
    )
