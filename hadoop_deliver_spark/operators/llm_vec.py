"""§2.K extensions, fourteenth wave — vector compression, dataset
splits, and gap-filling windows.

- llm_embedding_quantize: symmetric int8 quantization of the
  embedding column (per-vector absmax scale) — the standard vector
  compression before ANN index build at corpus scale (4× smaller,
  SIMD-friendly). Pure array algebra: one pass, no shuffle.
- llm_dataset_split: deterministic content-hash train/val/test
  assignment (first md5 nibble → 16 buckets → 12/2/2 split) — the
  reproducible, engine-independent split every training pipeline
  needs; no RNG, so re-runs and backfills land identically.
- win_ignore_nulls: lead/lag/first/last with IGNORE NULLS — the
  observation-carry window family (LOCF's general form) on a sparse
  column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_embedding_quantize",
    """
    WITH scaled AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(x))) AS absmax
        FROM embeddings
    ),
    q AS (
        SELECT e.vec_id,
               CAST(s.absmax AS REAL) AS scale,
               list_transform(
                   e.embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                                   / CAST(s.absmax AS DOUBLE))
                             AS BIGINT)
               ) AS qv
        FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id
    )
    SELECT vec_id, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(list_min(qv) AS BIGINT) AS q_min
    FROM q ORDER BY vec_id
    """,
    tags=("llm", "vector"),
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings: per-vector absmax
    scale, q_i = floor(x_i·127/absmax) — the 4× compression applied
    before ANN index build (recall llm_sim_ivf) at corpus scale.
    Map-only array algebra (transform/aggregate), no shuffle; the
    result surface is the quantized-value integer checksum + extrema
    per vector (floor of identical doubles is engine-stable where
    round-half would not be). Vectors are float32 on disk: both
    engines widen the SAME float32 values to double before the
    divide, so the arithmetic is bit-identical."""
    e = tbl(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x))
    ).cast("double")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 127.0 / F.col("am")),
    )
    return (
        e.withColumn("am", absmax)
        .withColumn("qv", qv)
        .select(
            "vec_id",
            F.col("am").cast("float").alias("scale"),
            F.aggregate(
                "qv", F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).alias("q_sum"),
            F.array_max("qv").alias("q_max"),
            F.array_min("qv").alias("q_min"),
        )
        .orderBy("vec_id")
    )


@register(
    "llm_dataset_split",
    """
    WITH assigned AS (
        SELECT lang,
               CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
                    WHEN substr(md5(text), 1, 1) IN ('e', 'f') THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs
    FROM assigned GROUP BY split, lang
    ORDER BY split, lang
    """,
    tags=("llm", "split"),
)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash dataset split: the first hex nibble
    of md5(text) maps each document into 16 equal buckets, assigned
    12/2/2 to train/val/test (75/12.5/12.5%). Content-keyed hashing
    — not RNG, not row position — makes the split reproducible
    across engines, re-runs, repartitions and incremental backfills,
    and keeps exact duplicates in the SAME split (no train/test
    leakage through dup pairs). Map-only + one tiny aggregate; md5
    is bit-identical everywhere. Core: api.dataset_split."""
    from hadoop_deliver_spark.api import dataset_split

    d = tbl(spark, sf_dir, "documents")
    return (
        dataset_split(d, "text")
        .select("lang", "split")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "win_ignore_nulls",
    """
    WITH sparse AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events
    )
    SELECT event_id,
           round(last_value(pv IGNORE NULLS) OVER w, 4) AS last_purchase,
           round(first_value(pv IGNORE NULLS) OVER w2, 4) AS next_purchase,
           round(lag(pv, 1 IGNORE NULLS) OVER w3, 4) AS prev_purchase
    FROM sparse
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
           w3 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
    tags=("window",),
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window family over a sparse column (purchase
    values, NULL elsewhere): last non-null so far (LOCF), first
    non-null ahead (NOCB), and the previous non-null via lag(…
    IGNORE NULLS) — the observation-carry primitives time-series
    pipelines build on (ts_interpolate_linear composes two of
    these). One user-keyed window pass serves all three frames; the
    (ts, event_id) total order keeps every engine's answer
    identical."""
    e = tbl(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # lag(… IGNORE NULLS) has no PySpark kwarg; last-non-null over the
    # strictly-preceding frame is the identical semantics.
    w3 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn("pv", pv)
        .select(
            "event_id",
            F.round(F.last("pv", ignorenulls=True).over(w), 4).alias(
                "last_purchase"
            ),
            F.round(F.first("pv", ignorenulls=True).over(w2), 4).alias(
                "next_purchase"
            ),
            F.round(F.last("pv", ignorenulls=True).over(w3), 4).alias(
                "prev_purchase"
            ),
        )
        .orderBy("event_id")
    )
