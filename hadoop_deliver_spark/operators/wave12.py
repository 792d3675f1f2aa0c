"""§2 extensions, thirty-sixth wave — robust local fingerprinting
and content-defined chunking.

- llm_winnowing: Winnowing fingerprints (Schleimer, Wilkerson &
  Aiken, SIGMOD 2003 — the MOSS algorithm): min-hash-per-sliding-
  window selection over k-gram hashes, which GUARANTEES any shared
  run of ≥ w+k−1 tokens produces a shared fingerprint — the
  detection guarantee minhash sampling cannot give — while keeping
  the stored fingerprint density ~2/(w+1).
- llm_cdc_chunking: content-defined chunking (rsync/FastCDC): chunk
  boundaries from a rolling window hash, so edits shift boundaries
  only locally — the storage-dedup primitive fixed-width chunking
  cannot be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_WK = 3  # tokens per k-gram
_WW = 4  # k-gram hashes per winnowing window


@register(
    "llm_winnowing",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_transform(
                   range(1, len(a) - {_WK - 2}),
                   i -> from_hex(substr(md5(array_to_string(
                            a[i:i+{_WK - 1}], ' ')), 1, 8))::BIT::BIGINT
               ) AS h
        FROM toks
    ),
    fp AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(h) - {_WW - 2}),
                   i -> list_min(h[i:i+{_WW - 1}])
               ))) AS f
        FROM hashed WHERE len(h) >= {_WW}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared
    FROM fp a JOIN fp b ON b.f = a.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "dedup"),
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the
    MOSS plagiarism detector): hash every 3-token gram (md5-derived
    32-bit value, oracle-exact), slide a window of 4 hashes, keep
    each window's MINIMUM, store the distinct minima as the doc's
    fingerprints. The guarantee minhash cannot give: ANY shared token
    run of length ≥ w+k−1 (= 6 tokens) between two documents
    produces at least one shared fingerprint, while only ~2/(w+1) of
    positions are stored. Pairs sharing ≥ 2 fingerprints rank as
    clone candidates — the third member of the near-dup family next
    to sampling (minhash) and spectral (simhash) methods, completing
    detection-guaranteed / probabilistic / bit-parallel coverage.

    Scale shape: gram hashing and window minima are IN-ROW array
    algebra (transform over the position sequence — the token array
    never joins anything), so fingerprinting is map-only; the pair
    discovery is one equi-join keyed on the 32-bit fingerprint —
    winnowing's density bound means that join carries ~2/(w+1) of
    the corpus's gram count, and a hot fingerprint is a skew key AQE
    splits like any other."""
    from hadoop_deliver_spark import api

    d = tbl(spark, sf_dir, "documents")
    # r12: materialize the fingerprint stage once — the pair self-join
    # below otherwise re-runs the per-position md5 towers and window
    # minima on BOTH sides (measured 2× ~3.3s at sf0.1; the join
    # itself is ~1s).
    fp = api.winnow_fingerprints(
        d, "doc_id", "text", gram_k=_WK, window_w=_WW
    ).localCheckpoint(eager=True)
    x = fp.select(F.col("doc_id").alias("doc_a"), "f")
    y = fp.select(F.col("doc_id").alias("doc_b"), "f")
    return (
        x.join(y, "f")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "llm_cdc_chunking",
    """
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    b AS (
        SELECT doc_id, text, L,
               [i FOR i IN range(8, L + 1)
                IF from_hex(substr(md5(substr(text, i - 7, 8)), 1, 4))
                   ::BIT::INT % 16 = 0] AS cuts
        FROM d
    ),
    s AS (
        SELECT doc_id,
               [c FOR c IN
                [substr(text, starts[j], ends[j] - starts[j] + 1)
                 FOR j IN range(1, len(starts) + 1)]
                IF length(c) > 0] AS chunks
        FROM (
            SELECT doc_id, text,
                   list_prepend(1, list_transform(cuts, x -> x + 1))
                       AS starts,
                   list_append(cuts, L) AS ends
            FROM b
        )
    ),
    ch AS (SELECT doc_id, unnest(chunks) AS chunk FROM s),
    occ AS (
        SELECT chunk, count(DISTINCT doc_id) AS n_docs
        FROM ch GROUP BY chunk
    )
    SELECT ch.doc_id,
           count(*) AS n_chunks,
           CAST(min(length(ch.chunk)) AS BIGINT) AS min_len,
           CAST(max(length(ch.chunk)) AS BIGINT) AS max_len,
           CAST(count(*) FILTER (occ.n_docs >= 2) AS BIGINT)
               AS n_dup_chunks
    FROM ch JOIN occ USING (chunk)
    GROUP BY ch.doc_id ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def llm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/FastCDC boundary rule that
    storage dedup and incremental-sync pipelines run on): a chunk
    boundary falls after position i wherever the rolling 8-char
    window hash satisfies h ≡ 0 (mod 16) — ~16-char expected chunks
    whose boundaries depend only on LOCAL content, so an insertion
    reshuffles nearby chunks and leaves the rest of the document's
    chunks byte-identical (the property fixed-width chunking lacks;
    compare api.dedup_chunks' fixed token windows). Reports per-doc
    chunk stats plus how many chunk instances recur in ≥2 docs — the
    dedupable mass.

    Scale shape: boundary detection and chunk slicing are IN-ROW
    array algebra over the character positions (filter + zip_with —
    map-only, nothing joins until chunks exist); the recurrence count
    is one shuffle keyed on the chunk text and a rejoin on the same
    key. The md5 window hash doubles as the cross-engine-exact stand-
    in for a production Rabin/Gear rolling hash (same plan shape,
    O(1) vs O(w) per position)."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("L")
    )
    cond = lambda i: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.substr(F.col("text"), i - 7, F.lit(8)).cast("binary")),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 16
        == 0
    )
    cuts = F.when(
        F.col("L") >= 8,
        F.filter(F.sequence(F.lit(8), F.col("L")), cond),
    ).otherwise(F.array().cast("array<int>"))
    b = d.select("doc_id", "text", "L", cuts.alias("cuts"))
    starts = F.concat(
        F.array(F.lit(1)), F.transform("cuts", lambda x: x + 1)
    )
    ends = F.concat(F.col("cuts"), F.array(F.col("L")))
    chunks = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.substr(F.col("text"), s, e - s + 1),
        ),
        lambda c: F.length(c) > 0,
    )
    ch = b.select("doc_id", F.explode(chunks).alias("chunk"))
    occ = ch.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        ch.join(occ, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min(F.length("chunk")).cast("long").alias("min_len"),
            F.max(F.length("chunk")).cast("long").alias("max_len"),
            F.count_if(F.col("n_docs") >= 2).alias("n_dup_chunks"),
        )
        .orderBy("doc_id")
    )
