"""§2 extensions, fifty-ninth wave — hierarchical delivery digests,
heavy-tail-robust estimation, readability scoring, and the Robin Hood
inequality index.

- delivery_merkle_digest: a two-level Merkle-style digest of the
  orders delivery — order-independent leaf checksums under a single
  root hash, so replicas reconcile with one string compare and a
  mismatch localizes to a bucket without moving data.
- agg_median_of_means: the median-of-means robust mean estimator per
  event type — deterministic hash buckets, exact per-bucket sums,
  median over the bucket means.
- llm_flesch_kincaid: Flesch reading-ease and Flesch–Kincaid grade
  level per documents source from exact word/sentence/vowel-group
  counts.
- agg_hoover_index: the Hoover (Robin Hood) index of customer
  revenue concentration — what share of revenue must move to
  equalize — in exact integer arithmetic until one division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "delivery_merkle_digest",
    """
    WITH rows_h AS (
        SELECT from_hex(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))
                   ::BIT::INT AS bucket,
               CAST(from_hex(substr(
                    md5(CAST(o_orderkey AS VARCHAR) || '|'
                        || CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                AS VARCHAR)
                        || '|' || o_orderstatus), 1, 8))
                    AS BIT)::INT::BIGINT AS h32
        FROM orders
    ),
    leaves AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(h32) AS BIGINT) AS leaf_sum
        FROM rows_h GROUP BY bucket
    ),
    root AS (
        SELECT md5(string_agg(
                   lpad(CAST(bucket AS VARCHAR), 3, '0') || ':'
                       || CAST(leaf_sum AS VARCHAR),
                   ',' ORDER BY bucket)) AS root_digest,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(min(leaf_sum) AS BIGINT) AS min_leaf,
               CAST(max(leaf_sum) AS BIGINT) AS max_leaf
        FROM leaves
    )
    SELECT n_buckets, n_rows, root_digest, min_leaf, max_leaf FROM root
    """,
    tags=("delivery",),
)
def delivery_merkle_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle-style delivery digest (Merkle 1979 for the
    tree; the order-independent leaf is Bellare–Micciancio 1997
    incremental AdHash): each order row collapses to a signed-32
    window of md5(key|price|status), rows hash-route to one of 256
    leaf buckets (first md5 byte of the key), a leaf's checksum is
    the plain SUM of its rows (commutative — identical under ANY row
    order, partitioning, or engine), and the root is md5 over the
    bucket-ordered "bucket:leaf_sum" string. Two replicas of a
    delivery reconcile by comparing ONE string; on mismatch the leaf
    table (kept upstream of the root reduce) localizes the damage to
    a bucket holding 1/256 of the data — the distcp-style integrity
    check delivery_row_checksums generalizes into a hierarchy. The
    canonical serialization pins DECIMAL(18,2) money text, and the
    signed-32 normalization is the established cross-engine hex-parse
    parity device.

    Scale shape: map-side hash + one 256-key sum with map-side
    combine + a 256-row reduce into the root string — no full-width
    shuffle anywhere; deepen the tree (more levels, 256-way fan-out
    each) when one leaf table outgrows a reduce."""
    o = tbl(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        dec2("o_totalprice").cast("string"),
        F.col("o_orderstatus"),
    )
    raw32 = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    h32 = F.when(raw32 >= 2**31, raw32 - 2**32).otherwise(raw32)
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2), 16, 10
    ).cast("int")
    leaves = (
        o.select(bucket.alias("bucket"), h32.alias("h32"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h32").cast("long").alias("leaf_sum"),
        )
    )
    leaf_str = F.concat(
        F.lpad(F.col("bucket").cast("string"), 3, "0"),
        F.lit(":"),
        F.col("leaf_sum").cast("string"),
    )
    return leaves.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(leaf_str)), ",")
        ).alias("root_digest"),
        F.min("leaf_sum").cast("long").alias("min_leaf"),
        F.max("leaf_sum").cast("long").alias("max_leaf"),
    )


@register(
    "agg_median_of_means",
    """
    WITH b AS (
        SELECT event_type,
               from_hex(substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIT::INT % 16 AS bucket,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    bm AS (
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(cents) AS BIGINT) AS s_b,
               CAST(sum(cents) AS DOUBLE) / count(*) AS mean_b
        FROM b GROUP BY 1, 2
    ),
    rk AS (
        SELECT event_type, mean_b,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mean_b, bucket) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m,
               CAST(sum(n_b) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(sum(s_b) OVER (PARTITION BY event_type) AS BIGINT) AS s
        FROM bm
    )
    SELECT event_type, n, CAST(max(m) AS BIGINT) AS n_buckets,
           round(CAST(max(s) AS DOUBLE) / max(n) / 100, 4) AS mean,
           round(avg(mean_b) / 100, 4) AS mom
    FROM rk
    WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
    GROUP BY event_type, n ORDER BY event_type
    """,
    tags=("aggregate", "stats"),
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust mean estimation (Nemirovsky & Yudin
    1983; the modern heavy-tail workhorse per Lugosi & Mendelson
    2019) of event value per type: rows hash-route to 16 buckets by
    md5(event_id) — content-derived, so the grouping is deterministic
    across engines and partitionings, unlike a random split — each
    bucket contributes an exact-integer-cents mean (one division),
    and the estimate is the MEDIAN of the 16 bucket means, which a
    few wild outliers cannot drag the way they drag the plain mean
    (they poison at most their own buckets). Median selection uses
    the ts_theil_sen midrank device on (mean_b, bucket) order; bucket
    means are identical doubles across engines (exact int64 sums, one
    fixed-order division), so the order and the selected elements are
    bit-deterministic. The plain mean ships alongside for contrast.

    Scale shape: one (type, bucket) keyed aggregate with map-side
    combine, then 16-row-per-type windows — domain-bounded."""
    e = tbl(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2),
            16,
            10,
        ).cast("int")
        % 16
    )
    b = e.select(
        "event_type",
        bucket.alias("bucket"),
        (dec2("value") * 100).cast("long").alias("cents"),
    )
    bm = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("cents").cast("long").alias("s_b"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mean_b"),
    )
    wrk = Window.partitionBy("event_type").orderBy("mean_b", "bucket")
    wall = Window.partitionBy("event_type")
    rk = bm.select(
        "event_type",
        "mean_b",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.sum("n_b").over(wall).cast("long").alias("n"),
        F.sum("s_b").over(wall).cast("long").alias("s"),
    )
    mid = (F.col("rn") == F.floor((F.col("m") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("m") + 2) / 2)
    )
    return (
        rk.filter(mid)
        .groupBy("event_type", "n")
        .agg(
            F.max("m").cast("long").alias("n_buckets"),
            F.round(F.max("s").cast("double") / F.max("n") / 100, 4).alias(
                "mean"
            ),
            F.round(F.avg("mean_b") / 100, 4).alias("mom"),
        )
        .orderBy("event_type")
    )


@register(
    "llm_flesch_kincaid",
    """
    WITH d AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS syllables
        FROM documents WHERE length(text) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS words,
           CAST(sum(sentences) AS BIGINT) AS sentences,
           CAST(sum(syllables) AS BIGINT) AS syllables,
           round(206.835
                 - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
                 - 84.6 * (CAST(sum(syllables) AS DOUBLE) / sum(words)),
                 4) AS reading_ease,
           round(0.39 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
                 + 11.8 * (CAST(sum(syllables) AS DOUBLE) / sum(words))
                 - 15.59, 4) AS fk_grade
    FROM d GROUP BY source ORDER BY source
    """,
    tags=("llm", "text"),
)
def llm_flesch_kincaid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease (Flesch 1948) and Flesch–Kincaid grade
    level (Kincaid et al. 1975) per documents source — the two
    standard readability scores, used in corpus curation to route
    text by audience level and to flag degenerate prose (negative
    grade = fragment soup; grade > 20 = run-on OCR sludge). Counts
    are exact int64: words by whitespace split, sentences by
    non-overlapping [.!?]+ runs (floored at 1 per doc so fragments
    count as one sentence), syllables by the standard vowel-group
    proxy [aeiouy]+ — both engines' regex engines agree on
    non-overlapping greedy match counts (probed). The published
    coefficients are literals; floats enter only in the two final
    fixed-order formulas over per-source exact sums.

    Scale shape: map-only per-doc counting folded into one per-source
    aggregate with map-side combine."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    per = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.greatest(
            F.regexp_count("text", F.lit("[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("syllables"),
    )
    w = F.sum("words").cast("double")
    s = F.sum("sentences")
    syl = F.sum("syllables").cast("double")
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("words"),
            F.sum("sentences").cast("long").alias("sentences"),
            F.sum("syllables").cast("long").alias("syllables"),
            F.round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 4).alias(
                "reading_ease"
            ),
            F.round(0.39 * (w / s) + 11.8 * (syl / w) - 15.59, 4).alias(
                "fk_grade"
            ),
        )
        .orderBy("source")
    )


@register(
    "agg_hoover_index",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total
        FROM cust
    )
    SELECT n, total,
           round(CAST(sum(CAST(abs(n * cents - total) AS DECIMAL(38,0)))
                      AS DOUBLE)
                 / (2.0 * n * total), 6) AS hoover
    FROM cust CROSS JOIN tot
    GROUP BY n, total
    """,
    tags=("aggregate", "stats"),
)
def agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover / Robin Hood index (Hoover 1936) of customer revenue
    concentration: H = ½·Σ|xᵢ/T − 1/n| — the share of total revenue
    that would have to move from above-average customers to
    below-average ones to equalize, the maximum vertical gap between
    agg_lorenz_curve's curve and the diagonal and the blunt sibling
    of agg_gini. Cross-multiplied exact form: H = Σ|n·xᵢ − T| /
    (2nT), where n·xᵢ fits int64 into the billions-of-customers ×
    billions-of-cents range per term and the Σ accumulates in
    DECIMAL(38,0) (associative-exact, the agg_gini device) — one
    float division at the end.

    Scale shape: one customer-keyed sum, a 1-row (n, T) broadcast
    (the ts_resample_gapfill pattern), one scalar reduce."""
    o = tbl(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    return (
        cust.crossJoin(F.broadcast(tot))
        .groupBy("n", "total")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("n") * F.col("cents") - F.col("total")
                    ).cast("decimal(38,0)")
                ).cast("double")
                / (2.0 * F.col("n") * F.col("total")),
                6,
            ).alias("hoover")
        )
        .select("n", "total", "hoover")
    )
