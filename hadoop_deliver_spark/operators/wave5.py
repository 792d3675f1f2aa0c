"""§2 extensions, round-5 wave — interval analytics + multimodal
frame sampling.

- events_peak_concurrency / events_active_coverage: sweep-line peak
  concurrency per hour and per-user union-of-intervals active time —
  the classic interval-overlap aggregates (capacity planning,
  licensing, connection-pool sizing) that no point-in-time groupBy
  can express: concurrency is a PREFIX SUM over interval boundary
  events, not a property of any single row.
- llm_multimodal_framesample / llm_multimodal_resize: every-kth-frame
  sampling over a video-bytes column and 2×2 box-filter downsampling
  of an image-bytes column. Since round 12 these run a REAL codec on
  real pixel data: payloads whose magic bytes are ``P6`` are genuine
  Netpbm PPM images (multi-frame concatenations for the video case),
  decoded/re-encoded by the pure-Python codec in
  ``hadoop_deliver_spark.codecs`` (the avro_io.py precedent — format
  implemented from its public spec, cross-validated against an
  independent decoder in tests); payloads with any other magic keep
  the documented ``stub-v1`` byte-stride contract. The fixture has no
  binary column, so a staging pass SYNTHESIZES the payloads: docs with
  ``doc_id % 4 == 0`` get a real PPM file built from the closed-form
  pixel law ``(doc_id*31 + phase*101 + 7*i) mod 256`` — which the
  DuckDB oracle recomputes WITHOUT ever seeing a byte, so a wrong
  header parse, wrong stride, or wrong box-filter round shows up as a
  hash mismatch — and the rest carry opaque utf-8 text bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    """Per-doc synthetic image dims (4..16 × 4..14) — doc-dependent so
    header parsing is load-bearing (no constant the decoder could
    shortcut)."""
    return 4 + doc_id % 13, 4 + doc_id % 11


def stage_multimodal_payloads(df: DataFrame, *, text_prefix: int | None,
                              n_frames: bool = False) -> DataFrame:
    """(doc_id, payload binary) staging pass shared by the multimodal
    trio: docs with ``doc_id % 4 == 0`` get a REAL P6 PPM payload
    (``n_frames=True`` → a concatenation of ``1 + doc_id % 5`` frames,
    phase-shifted pixels per frame — the 'video' container), everyone
    else gets opaque utf-8 text bytes (full text, or its first
    ``text_prefix`` chars). Map-only; payloads stay ≤ ~3.4 KB."""
    import pandas as pd

    from hadoop_deliver_spark import codecs

    def stage(batches):
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id % 4 == 0:
                    w, h = _ppm_dims(doc_id)
                    frames = range(1 + doc_id % 5) if n_frames else (0,)
                    payloads.append(
                        b"".join(
                            codecs.ppm_encode(
                                w, h, codecs.synth_pixels(doc_id, w, h, f)
                            )
                            for f in frames
                        )
                    )
                else:
                    t = text if text_prefix is None else text[:text_prefix]
                    payloads.append(t.encode("utf-8"))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return df.select("doc_id", "text").mapInPandas(
        stage, "doc_id bigint, payload binary"
    )


@register(
    "events_peak_concurrency",
    """
    WITH pts AS (
        SELECT CAST(ts AS TIMESTAMP) AS t, 1 AS d FROM events
        UNION ALL
        SELECT CAST(ts AS TIMESTAMP) + INTERVAL 15 MINUTE, -1 FROM events
    ),
    swept AS (
        SELECT t,
               sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS conc
        FROM pts
    )
    SELECT strftime(t, '%Y-%m-%d %H:00') AS hour,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY 1 ORDER BY hour
    """,
    tags=("events", "interval"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 15-minute sessions per hour via a sweep line:
    +1 at each session start, −1 at its end, prefix-sum in global
    (t, d) order — d ascending puts ends before coincident starts,
    i.e. half-open [start, start+15min) intervals. The per-hour max
    samples the concurrency curve at boundary points falling in that
    hour (identical formula on both engines, so the sampling
    convention cancels out).

    Scale shape: a GLOBAL prefix sum would be a single-partition
    window, so the sweep runs two-phase exactly like the
    exact_global_* ranking cores — running sum WITHIN each calendar
    day (partitioned window, parallel) plus per-day carry-in offsets
    (one tiny driver collect, bounded by the number of days, the same
    split-point-probe budget api._approx_splits uses). Sessions are
    15 minutes, but correctness does not depend on intervals staying
    inside a day: boundary POINTS are partitioned, not intervals, and
    the carry-in restores the global sum.

    Core: api.concurrency_sweep (column-parameterized; with
    partition_cols the carry-in is a partitioned window — no driver
    collect at all — and it is fuzzed against a brute-force overlap
    count in tests/test_hypothesis.py)."""
    from hadoop_deliver_spark.api import concurrency_sweep

    e = tbl(spark, sf_dir, "events")
    iv = e.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    return (
        concurrency_sweep(iv, "s", "e", out="conc")
        .groupBy(F.date_format("t", "yyyy-MM-dd HH:00").alias("hour"))
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .orderBy("hour")
    )


@register(
    "llm_multimodal_framesample",
    """
    WITH ppm AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h,
               unnest(range(0, 1 + doc_id % 5, 2)) AS f
        FROM documents WHERE doc_id % 4 = 0
    ),
    stub AS (
        SELECT doc_id, text,
               unnest(range(0,
                   least(CAST(ceil(length(text) / 16.0) AS BIGINT), 32),
                   4)) AS idx
        FROM documents WHERE doc_id % 4 <> 0
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST((doc_id * 31 + f * 101) % 256 AS INT) AS first_byte,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(list_sum(list_transform(range(0, w * h * 3),
                i -> (doc_id * 31 + f * 101 + 7 * i) % 256))
                // (w * h * 3) AS INT) AS frame_mean,
           'ppm-p6' AS codec
    FROM ppm
    UNION ALL
    SELECT doc_id, CAST(idx AS INT),
           unicode(substr(text, CAST(idx * 16 + 1 AS BIGINT), 1)),
           CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
           'stub-v1'
    FROM stub
    ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling with a REAL container demux: payloads
    whose magic is ``P6`` are concatenations of 1–5 genuine PPM
    frames (``stage_multimodal_payloads(n_frames=True)``); the
    sampler walks the stream with ``codecs.ppm_decode`` — each
    frame's position is knowable ONLY by parsing the previous frame's
    header, the defining property of real demuxing — keeps every 2nd
    frame, and emits its parsed dims + floor-mean pixel. Any other
    magic keeps the documented ``stub-v1`` byte-stride contract
    (16-byte frames, every 4th, ≤ 32) with NULL image features. The
    oracle predicts the PPM rows from the closed-form pixel law
    without touching a byte — a wrong header parse or frame offset
    hash-mismatches. Map-only at any scale; at 100 TB the payload
    column stays opaque bytes in parquet and partitions by file
    splits."""
    import pandas as pd

    from hadoop_deliver_spark import codecs

    frame, step, cap = 16, 4, 32  # stub-v1: 16-byte frames, every 4th

    def sample(batches):
        import numpy as np

        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "first_byte": [],
                "width": [], "height": [], "frame_mean": [], "codec": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if bytes(payload[:2]) == codecs.PPM_MAGIC:
                    frames, off = [], 0
                    while off < len(payload):
                        w, h, px, off = codecs.ppm_decode(payload, off)
                        frames.append((w, h, px))
                    for f in range(0, len(frames), 2):
                        w, h, px = frames[f]
                        arr = np.frombuffer(px, dtype=np.uint8)
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(f)
                        rows["first_byte"].append(int(px[0]))
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["frame_mean"].append(
                            int(arr.sum()) // len(px)
                        )
                        rows["codec"].append("ppm-p6")
                else:
                    n_frames = (len(payload) + frame - 1) // frame
                    for idx in range(0, min(n_frames, cap), step):
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(idx)
                        rows["first_byte"].append(payload[idx * frame])
                        rows["width"].append(None)
                        rows["height"].append(None)
                        rows["frame_mean"].append(None)
                        rows["codec"].append("stub-v1")
            yield pd.DataFrame(rows)

    d = tbl(spark, sf_dir, "documents")
    packed = stage_multimodal_payloads(d, text_prefix=None, n_frames=True)
    return packed.mapInPandas(
        sample,
        "doc_id bigint, frame_idx int, first_byte int, width int, "
        "height int, frame_mean int, codec string",
    ).orderBy("doc_id", "frame_idx")


@register(
    "llm_multimodal_resize",
    """
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h,
               (4 + doc_id % 13) // 2 AS w2, (4 + doc_id % 11) // 2 AS h2
        FROM documents WHERE doc_id % 4 = 0
    ),
    px AS (
        SELECT doc_id, w, h, w2, h2,
               list_transform(range(0, w2 * h2 * 3), j ->
                 ( (doc_id*31 + 7*((2*((j//3)//w2)*w + 2*((j//3)%w2))*3
                                   + j%3)) % 256
                 + (doc_id*31 + 7*((2*((j//3)//w2)*w + 2*((j//3)%w2)
                                    + 1)*3 + j%3)) % 256
                 + (doc_id*31 + 7*(((2*((j//3)//w2) + 1)*w
                                    + 2*((j//3)%w2))*3 + j%3)) % 256
                 + (doc_id*31 + 7*(((2*((j//3)//w2) + 1)*w
                                    + 2*((j//3)%w2) + 1)*3 + j%3)) % 256
                 ) // 4) AS small
        FROM dims
    )
    SELECT doc_id,
           CAST(length('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
                 || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
                + w * h * 3 AS INT) AS orig_bytes,
           CAST(length('P6' || chr(10) || CAST(w2 AS VARCHAR) || ' '
                 || CAST(h2 AS VARCHAR) || chr(10) || '255' || chr(10))
                + w2 * h2 * 3 AS INT) AS resized_bytes,
           CAST(small[1] AS INT) AS resized_first_byte,
           CAST(list_sum(small) % 2147483647 AS BIGINT)
               AS resized_checksum,
           'ppm-p6' AS codec
    FROM px
    UNION ALL
    SELECT doc_id,
           CAST(length(text) AS INT) AS orig_bytes,
           CAST(ceil(length(text) / 2.0) AS INT) AS resized_bytes,
           unicode(substr(text, 1, 1)) AS resized_first_byte,
           CAST(list_aggregate(
               list_transform(range(1, length(text) + 1, 2),
                   i -> unicode(substr(text, CAST(i AS BIGINT), 1))),
               'sum') % 2147483647 AS BIGINT) AS resized_checksum,
           'stub-v1' AS codec
    FROM documents WHERE doc_id % 4 <> 0
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize with a REAL codec on real pixel data: payloads
    whose magic is ``P6`` are genuine PPM files
    (``stage_multimodal_payloads``); the operator parses the actual
    header bytes (``codecs.ppm_decode``), runs the vectorized integer
    2×2 box filter (``codecs.box_downsample2`` — floor mean of each
    block, numpy inside mapInPandas), re-encodes the resized image,
    and emits the resized FILE length plus first-pixel-byte and
    mod-2³¹−1 checksum of the resized raster. Payloads with any
    other magic keep the documented ``stub-v1`` every-2nd-byte
    contract. The oracle recomputes the PPM rows purely from the
    closed-form pixel law — every output byte of the box filter is
    predicted with integer arithmetic that never touches the codec,
    so a wrong filter round, stride, or header length mismatches.
    Map-only at any scale."""
    import pandas as pd

    from hadoop_deliver_spark import codecs

    M = 2147483647

    def resize(batches):
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "orig_bytes": [], "resized_bytes": [],
                "resized_first_byte": [], "resized_checksum": [],
                "codec": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                out["orig_bytes"].append(len(payload))
                if bytes(payload[:2]) == codecs.PPM_MAGIC:
                    w, h, px, _ = codecs.ppm_decode(payload)
                    w2, h2, small = codecs.box_downsample2(w, h, px)
                    resized = codecs.ppm_encode(w2, h2, small)
                    arr = np.frombuffer(small, dtype=np.uint8)
                    out["resized_bytes"].append(len(resized))
                    out["resized_first_byte"].append(int(small[0]))
                    out["resized_checksum"].append(
                        int(arr.astype(np.int64).sum()) % M
                    )
                    out["codec"].append("ppm-p6")
                else:
                    small = payload[::2]
                    out["resized_bytes"].append(len(small))
                    out["resized_first_byte"].append(
                        small[0] if small else None
                    )
                    out["resized_checksum"].append(sum(small) % M)
                    out["codec"].append("stub-v1")
            yield pd.DataFrame(out)

    d = tbl(spark, sf_dir, "documents")
    packed = stage_multimodal_payloads(d, text_prefix=None)
    return packed.mapInPandas(
        resize,
        "doc_id bigint, orig_bytes int, resized_bytes int, "
        "resized_first_byte int, resized_checksum bigint, codec string",
    ).orderBy("doc_id")


@register(
    "events_active_coverage",
    """
    WITH iv AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
               CAST(ts AS TIMESTAMP) + INTERVAL 15 MINUTE AS e
        FROM events
    ),
    pts AS (
        SELECT user_id, t, sum(d) AS net FROM (
            SELECT user_id, s AS t, 1 AS d FROM iv
            UNION ALL
            SELECT user_id, e AS t, -1 AS d FROM iv
        ) GROUP BY user_id, t
    ),
    swept AS (
        SELECT user_id, t,
               sum(net) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS conc,
               lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
        FROM pts
    ),
    flagged AS (
        SELECT user_id, t, conc, nt,
               coalesce(lag(conc) OVER (PARTITION BY user_id ORDER BY t),
                        0) AS prev_conc
        FROM swept
    )
    SELECT user_id,
           CAST(sum(CASE WHEN conc > 0
                         THEN epoch_us(nt) - epoch_us(t) ELSE 0 END)
                AS BIGINT) AS covered_us,
           CAST(sum(CASE WHEN conc > 0 AND prev_conc = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "interval"),
)
def events_active_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ACTIVE time as the measure of the UNION of that user's
    15-minute session intervals — overlapping sessions are counted
    once (the utilization/SLA-uptime number a naive
    sum(duration) overstates) — plus the count of maximal active
    spans. Built on api.concurrency_sweep (keyed, so the day-block
    carry-in is a partitioned window and nothing touches the driver):
    between consecutive boundary instants the concurrency is
    constant, so covered time = Σ (next_t − t) over segments with
    concurrency > 0, and a span starts exactly where concurrency
    steps off zero. Exact integer microseconds end to end — no float
    rounding surface."""
    from hadoop_deliver_spark.api import concurrency_sweep

    e = tbl(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    swept = concurrency_sweep(iv, "s", "e", ["user_id"], out="conc")
    w = Window.partitionBy("user_id").orderBy("t")
    seg = (
        swept.withColumn("nt", F.lead("t").over(w))
        .withColumn("prev_conc", F.coalesce(F.lag("conc").over(w), F.lit(0)))
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("conc") > 0,
                    F.unix_micros("nt") - F.unix_micros("t"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("covered_us"),
            F.sum(
                F.when(
                    (F.col("conc") > 0) & (F.col("prev_conc") == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_spans"),
        )
        .orderBy("user_id")
    )


@register(
    "join_asof_nearest",
    """
    WITH probes AS (
        SELECT DISTINCT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS probe_ts
        FROM events
    ), ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(value, event_id) AS value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    b AS (
        SELECT p.user_id, p.probe_ts, e.value AS bv, e.ts AS bts
        FROM probes p
        ASOF LEFT JOIN ev e
          ON e.user_id = p.user_id AND e.ts <= p.probe_ts
    ),
    f AS (
        SELECT p.user_id, p.probe_ts, e.value AS fv, e.ts AS fts
        FROM probes p
        ASOF LEFT JOIN ev e
          ON e.user_id = p.user_id AND e.ts >= p.probe_ts
    )
    SELECT b.user_id, b.probe_ts,
           CASE WHEN b.bts IS NULL THEN f.fv
                WHEN f.fts IS NULL THEN b.bv
                WHEN epoch_us(b.probe_ts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(b.probe_ts) THEN b.bv
                ELSE f.fv END AS nearest_value,
           CASE WHEN b.bts IS NULL THEN 'forward'
                WHEN f.fts IS NULL THEN 'backward'
                WHEN epoch_us(b.probe_ts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(b.probe_ts)
                    THEN 'backward'
                ELSE 'forward' END AS direction
    FROM b JOIN f ON f.user_id = b.user_id AND f.probe_ts = b.probe_ts
    WHERE b.bts IS NOT NULL OR f.fts IS NOT NULL
    ORDER BY b.user_id, b.probe_ts
    """,
    tags=("join",),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third standard direction (pandas
    merge_asof direction='nearest'): for each probe, the event value
    whose timestamp is closest in EITHER direction, ties broken
    toward the at-or-before side. Composed from two passes of the
    union+window core (api.asof_join) with the event ts PACKED into a
    struct alongside the value, so each pass carries its matched
    timestamp out and the distance compare is exact integer
    microseconds. Probes missing one side (e.g. nothing at-or-before
    the user's first day) take the other; the oracle is two DuckDB
    native ASOF LEFT JOINs — an independent implementation — with the
    identical tie rule. Two shuffles total, O(1) window state per
    key, no row explosion."""
    from hadoop_deliver_spark.api import asof_join

    ev = tbl(spark, sf_dir, "events")
    # one value per (user, ts) so both engines break ts ties identically
    e = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("value")
    )
    packed = e.select(
        "user_id", "ts", F.struct(F.col("ts").alias("ets"), "value").alias("pv")
    )
    probes = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("ts")
    ).distinct()
    back = asof_join(
        packed, probes, ["user_id"], "ts", "pv", forward=False, out="bp"
    ).select("user_id", F.col("ts").alias("probe_ts"), "bp")
    fwd = asof_join(
        packed, probes, ["user_id"], "ts", "pv", forward=True, out="fp"
    ).select("user_id", F.col("ts").alias("probe_ts"), "fp")
    j = back.join(fwd, ["user_id", "probe_ts"], "full_outer")
    bdist = F.unix_micros("probe_ts") - F.unix_micros("bp.ets")
    fdist = F.unix_micros("fp.ets") - F.unix_micros("probe_ts")
    take_back = F.col("fp").isNull() | (
        F.col("bp").isNotNull() & (bdist <= fdist)
    )
    return (
        j.filter(F.col("bp").isNotNull() | F.col("fp").isNotNull())
        .select(
            "user_id",
            "probe_ts",
            F.when(take_back, F.col("bp.value"))
            .otherwise(F.col("fp.value"))
            .alias("nearest_value"),
            F.when(take_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
        .orderBy("user_id", "probe_ts")
    )


@register(
    "llm_dedup_paragraphs",
    """
    WITH chunks AS (
        SELECT doc_id, array_to_string(
                   list_slice(string_split(text, ' '),
                              i * 10 + 1, i * 10 + 10), ' ') AS chunk
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(
                       len(string_split(text, ' ')) / 10.0) AS BIGINT)))
                       AS i
            FROM documents
        )
    ),
    freq AS (
        SELECT chunk, count(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST((count(*) - sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END))
                * 10000 // count(*) AS BIGINT) AS retained_bp
    FROM chunks c JOIN freq f ON f.chunk = c.chunk
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level CROSS-document dedup — the C4/CCNet line-dedup
    analog for a corpus without newlines: each document splits into
    consecutive 10-token chunks (trailing partial chunk kept — both
    engines clamp the slice identically), a chunk is duplicated iff
    it appears in ≥2 DISTINCT documents, and each doc reports its
    chunk counts plus the retained fraction in integer basis points
    (integer division on both engines — no float surface). This is
    the op that removes boilerplate shared ACROSS pages where
    document-level near-dup (jaccard/minhash) keeps both copies.
    Shape: one map-side chunk explode, one chunk-keyed count-distinct
    (map-side combined), one chunk-keyed join back — at 100 TB the
    chunk key is an ordinary shuffle key; cap chunk document-frequency
    accounting at a threshold (here exact, fixture-scale) the same way
    gram DF caps bound the near-dup joins."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chunks_arr = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks_arr - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * 10 + 1, 10), " "
                ),
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
        )
        .withColumn(
            "retained_bp",
            F.expr(
                "CAST((n_chunks - n_dup_chunks) * 10000 DIV n_chunks"
                " AS BIGINT)"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_dedup_paragraphs_scrub",
    """
    WITH chunks AS (
        SELECT doc_id, i, array_to_string(
                   list_slice(string_split(text, ' '),
                              i * 10 + 1, i * 10 + 10), ' ') AS chunk
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(
                       len(string_split(text, ' ')) / 10.0) AS BIGINT)))
                       AS i
            FROM documents
        )
    ),
    freq AS (
        SELECT chunk, count(DISTINCT doc_id) AS nd
        FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           coalesce(string_agg(CASE WHEN f.nd < 2 THEN c.chunk END,
                               ' ' ORDER BY c.i), '') AS clean_text,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks
    FROM chunks c JOIN freq f ON f.chunk = c.chunk
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_paragraphs_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable companion of llm_dedup_paragraphs: REWRITE each
    document with its cross-document duplicated chunks removed
    (retained chunks reassembled in original order; empty string when
    everything was boilerplate). The oracle rebuilds the same text
    with an ordered string_agg — byte-identical reassembly proves the
    position bookkeeping, not just the counts.

    Core: api.dedup_chunks (column-parameterized)."""
    from hadoop_deliver_spark.api import dedup_chunks

    d = tbl(spark, sf_dir, "documents")
    return dedup_chunks(
        d.select("doc_id", "text"), "doc_id", "text",
        chunk_tokens=10, min_docs=2,
    ).orderBy("doc_id")
