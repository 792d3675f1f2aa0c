"""§2 extensions, ninety-seventh wave — hash-matched twins for two
formerly rows-only surfaces (the agg_hll_firstprin precedent: the
engine-specific op keeps its rows-only entry, a first-principles twin
proves the same pipeline hash-exactly).

- llm_byte_entropy: per-document Shannon entropy of the character
  distribution — the first-principles information-density twin of
  llm_compression_ratio (zlib is a repetition detector; H is the
  quantity it approximates, and unlike deflate it has an exact
  closed form both engines can compute).
- sample_rows_tolerance: the count-in-tolerance contract of the
  seeded Bernoulli sample as a hash-matched query — the oracle pins
  the 3σ binomial envelope the engine's sampler must land in, so
  sampler drift breaks the gate even though the sampled ROWS stay
  engine-specific (those remain rows-only in sample_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_byte_entropy",
    """
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM ch GROUP BY 1, 2
    ),
    agg AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS nd,
               sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sclc
        FROM cnt GROUP BY 1
    )
    SELECT doc_id, n AS n_chars, nd AS n_distinct,
           round(log2(CAST(n AS DOUBLE)) - sclc / n, 4) AS entropy_bits,
           round(CASE WHEN nd = 1 THEN 1.0
                      ELSE 1.0 - (log2(CAST(n AS DOUBLE)) - sclc / n)
                               / log2(CAST(nd AS DOUBLE)) END,
                 4) AS redundancy,
           round(log2(CAST(n AS DOUBLE)) - sclc / n, 4) < 3.0
               AS low_entropy
    FROM agg ORDER BY doc_id
    """,
    tags=("llm", "quality"),
)
def llm_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution
    (bits/char): H = log2(n) − (Σ_c c·log2(c))/n over character
    counts c — the exact, closed-form quantity that
    llm_compression_ratio's zlib ratio approximates (a deflate
    stream cannot beat n·H/8 bytes, Shannon's source-coding bound),
    giving the repetition/boilerplate quality signal a HASH-MATCHED
    first-principles twin (round-11 verdict ask; zlib itself stays
    rows-only because no SQL engine exposes a bit-identical
    deflate). ``redundancy`` = 1 − H/log2(distinct) is the
    normalized form (0 = uniform use of the alphabet, 1 = a single
    repeated character, pinned exactly when distinct = 1), and
    ``low_entropy`` compares the ROUNDED H to a 3.0 bits/char
    threshold so the flag is stable across engines.

    Scale shape: one map-side explode of characters (row count =
    corpus bytes — the same order as any tokenizer pass), one
    map-side-combined (doc, char) count, one per-doc reduce;
    embarrassingly parallel, no window, no collect."""
    d = tbl(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.length("ch") > 0)
    cnt = ch.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum(
            F.col("c").cast("double") * F.log2(F.col("c").cast("double"))
        ).alias("sclc"),
    )
    h = F.log2(F.col("n").cast("double")) - F.col("sclc") / F.col("n")
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        F.col("nd").alias("n_distinct"),
        F.round(h, 4).alias("entropy_bits"),
        F.round(
            F.when(F.col("nd") == 1, F.lit(1.0)).otherwise(
                1.0 - h / F.log2(F.col("nd").cast("double"))
            ),
            4,
        ).alias("redundancy"),
        (F.round(h, 4) < 3.0).alias("low_entropy"),
    ).orderBy("doc_id")


@register(
    "sample_rows_tolerance",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(0.1 AS DOUBLE) AS frac,
           TRUE AS within_3sigma
    FROM lineitem
    """,
    tags=("sample", "quality"),
)
def sample_rows_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-in-tolerance contract of the seeded Bernoulli sampler as
    a HASH-MATCHED query (round-11 verdict ask — sample_rows itself
    stays rows-only because the sampled ROWS are engine-specific RNG
    by design): the sampled count k of ``lineitem.sample(0.1)`` must
    land inside the 3σ binomial envelope |k − pn| ≤ 3·√(np(1−p)),
    which a correct Bernoulli sampler leaves with probability ~0.3%
    — and Spark's is seeded, so the verdict is DETERMINISTIC here,
    not flaky. The oracle pins (n_total, frac, within_3sigma=TRUE):
    sampler drift or a fraction bug flips the boolean and fails the
    hash. The comparison is squared to one double cast per side:
    (10k − n)² ≤ 81·n·0.9 · ... evaluated directly in doubles (k, n
    exact longs; one subtraction, one multiply — no rounding
    boundary in play at any fixture scale since the slack is
    thousands of rows).

    Scale shape: two count aggregates (one over the sample — the
    sampler is map-only), a 1-row cross join."""
    li = tbl(spark, sf_dir, "lineitem")
    k = (
        li.sample(fraction=0.1, seed=42)
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    n = li.agg(F.count(F.lit(1)).cast("long").alias("n"))
    kk, nn = F.col("k").cast("double"), F.col("n").cast("double")
    return k.crossJoin(F.broadcast(n)).select(
        F.col("n").alias("n_total"),
        F.lit(0.1).cast("double").alias("frac"),
        (
            (kk - 0.1 * nn) * (kk - 0.1 * nn) <= 9.0 * nn * 0.1 * 0.9
        ).alias("within_3sigma"),
    )
