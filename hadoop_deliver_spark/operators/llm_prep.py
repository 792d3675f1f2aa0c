"""§2.K extensions, seventeenth wave — training-example preparation.

The last mile of an LLM data pipeline turns cleaned documents into
model-ready examples. Two canonical transforms land here, plus the
genre's classic log-parsing scan:

- llm_context_window_chunking: overlapping sliding windows (size 40
  words, stride 20) per document — the standard long-document →
  context-window split. Chunk starts come from `sequence()`, the
  window is an array `slice` — all JVM array algebra, map-only, and
  the explode multiplies rows by ~len/stride exactly like the real
  job.
- llm_span_corruption_masking: T5-style span corruption with
  DETERMINISTIC mask selection — a word position is masked iff the
  md5 nibble of (doc_id, position) falls in the mask band (≈25%).
  Content-keyed hashing replaces RNG so the example set is
  reproducible across engines/runs; outputs count + masked text with
  sentinels.
- scan_http_log_parse: Common-Log-Format lines built from events,
  then parsed back with one regexp and rolled up by status class —
  the weblog grep-and-ship job the reference genre was born for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_CHUNK = 40
_STRIDE = 20


@register(
    "llm_context_window_chunking",
    f"""
    WITH words AS (
        SELECT doc_id, str_split(text, ' ') AS ws
        FROM documents WHERE length(text) > 0
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(ws) - {_CHUNK} + 1, 1) + 1,
                            {_STRIDE})) AS start,
               ws
        FROM words
    )
    SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
           CAST(least({_CHUNK}, len(ws) - start + 1) AS BIGINT) AS n_tokens,
           ws[start] AS first_tok,
           ws[least(start + {_CHUNK} - 1, len(ws))] AS last_tok
    FROM chunks ORDER BY doc_id, chunk_start
    """,
    tags=("llm", "prep"),
)
def llm_context_window_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking: each document becomes
    overlapping 40-word windows at stride 20 (last partial window
    kept). Chunk starts are a `sequence(1, max(len-39,1), 20)` per
    row, exploded; the window itself is an array slice — map-only
    array algebra whose output row count is the corpus's real
    chunk-multiplication factor. Emits per-chunk span metadata
    (start, length, boundary tokens) — the downstream pack/shuffle
    stages (llm_pack_sequences) consume exactly this shape."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = d.select("doc_id", F.split("text", " ").alias("ws"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("ws") - F.lit(_CHUNK - 1), F.lit(1)),
        F.lit(_STRIDE),
    )
    chunks = words.select(
        "doc_id", "ws", F.explode(starts).alias("start")
    )
    return chunks.select(
        "doc_id",
        F.col("start").cast("bigint").alias("chunk_start"),
        F.least(
            F.lit(_CHUNK), F.size("ws") - F.col("start") + 1
        )
        .cast("bigint")
        .alias("n_tokens"),
        F.element_at("ws", F.col("start")).alias("first_tok"),
        F.element_at(
            "ws",
            F.least(F.col("start") + F.lit(_CHUNK - 1), F.size("ws")),
        ).alias("last_tok"),
    ).orderBy("doc_id", "chunk_start")


@register(
    "llm_span_corruption_masking",
    """
    WITH pos AS (
        SELECT doc_id, w, i,
               substr(md5(doc_id || ':' || i), 1, 1) IN ('0','1','2','3')
                   AS masked
        FROM (
            SELECT doc_id, unnest(str_split(text, ' ')) AS w,
                   generate_subscripts(str_split(text, ' '), 1) AS i
            FROM documents WHERE doc_id <= 200 AND length(text) > 0
        )
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_masked,
           array_to_string(
               list(CASE WHEN masked THEN '<X>' ELSE w END ORDER BY i),
               ' ') AS corrupted
    FROM pos GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "prep"),
)
def llm_span_corruption_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption with deterministic mask selection: a
    word position is masked iff the first md5 nibble of
    'doc_id:position' lands in 0-3 (a 25% band). Hash-keyed masking
    replaces RNG, so the corrupted example set is bit-reproducible
    across engines, retries and backfills — the property a training
    pipeline needs for resumable preprocessing. posexplode → per-
    position hash flag → ordered re-assembly with '<X>' sentinels;
    one doc-keyed shuffle for the rebuild."""
    d = (
        tbl(spark, sf_dir, "documents")
        .where((F.col("doc_id") <= 200) & (F.length("text") > 0))
    )
    pos = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "w"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "w",
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    (F.col("i0") + 1).cast("string"),
                )
            ),
            1,
            1,
        )
        .isin("0", "1", "2", "3")
        .alias("masked"),
    )
    return (
        pos.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("masked"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_masked"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "i",
                                F.when(F.col("masked"), "<X>")
                                .otherwise(F.col("w"))
                                .alias("tok"),
                            )
                        )
                    ),
                    lambda s: s.getField("tok"),
                ),
                " ",
            ).alias("corrupted"),
        )
        .orderBy("doc_id")
    )


@register(
    "scan_http_log_parse",
    """
    WITH logs AS (
        SELECT 'host' || user_id || ' - - [' ||
               strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] "GET /' ||
               event_type || '/' || event_id || ' HTTP/1.1" ' ||
               CAST(200 + (event_id % 4) * 100 AS VARCHAR) || ' ' ||
               CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR)
                   AS line
        FROM events
    )
    SELECT regexp_extract(line, '"[A-Z]+ /([a-z]+)/', 1) AS section,
           CAST(regexp_extract(line, '" (\\d{3}) ', 1) AS INT) // 100
               AS status_class,
           count(*) AS hits,
           CAST(sum(CAST(regexp_extract(line, ' (\\d+)$', 1) AS BIGINT))
                AS BIGINT) AS bytes_total
    FROM logs
    GROUP BY 1, 2 ORDER BY section, status_class
    """,
    tags=("scan", "text"),
)
def scan_http_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Log-Format weblog analytics — the grep-and-ship job the
    reference genre exists for: access-log lines (built
    deterministically from events: host, CLF timestamp, request
    path, status, bytes) parsed with regexp_extract and rolled up to
    hits + bytes per (path section, status class). One regexp pass
    map-side, one small aggregate; on a real cluster this reads
    gzipped text shards (scan_csv_gzip shows the codec path) and the
    regex runs at scan speed."""
    e = tbl(spark, sf_dir, "events")
    line = F.concat(
        F.lit("host"), F.col("user_id").cast("string"),
        F.lit(" - - ["),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        F.lit(" +0000] \"GET /"),
        F.col("event_type"), F.lit("/"),
        F.col("event_id").cast("string"),
        F.lit(" HTTP/1.1\" "),
        (F.lit(200) + (F.col("event_id") % 4) * 100).cast("string"),
        F.lit(" "),
        F.floor(F.col("value") * 10).cast("bigint").cast("string"),
    )
    logs = e.select(line.alias("line"))
    return (
        logs.select(
            F.regexp_extract("line", r'"[A-Z]+ /([a-z]+)/', 1).alias(
                "section"
            ),
            (
                F.regexp_extract("line", r'" (\d{3}) ', 1).cast("int")
                / 100
            )
            .cast("int")
            .alias("status_class"),
            F.regexp_extract("line", r" (\d+)$", 1)
            .cast("bigint")
            .alias("bytes"),
        )
        .groupBy("section", "status_class")
        .agg(
            F.count("*").alias("hits"),
            F.sum("bytes").cast("bigint").alias("bytes_total"),
        )
        .orderBy("section", "status_class")
    )
