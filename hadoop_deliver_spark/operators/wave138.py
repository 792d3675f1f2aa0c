"""§2 extensions, hundred-thirty-eighth wave — corpus-card census
lines: duplication by source and label balance.

- llm_dup_rate_by_source: within-source and cross-source exact
  duplication census — the per-source line a corpus card prints
  above the MinHash near-dup numbers (llm_dedup_exact is the global
  pipeline op; this is the per-source accountability view).
- llm_label_balance: label distribution of the embeddings table —
  imbalance ratio, Shannon entropy, effective number of classes
  (exp H) — the class-balance line that decides whether a
  classifier needs reweighting before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_dup_rate_by_source",
    """
    WITH h AS (
        SELECT source, md5(text) AS sig FROM documents
    ),
    per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT sig) AS BIGINT) AS n_distinct
        FROM h GROUP BY 1
    ),
    xsrc AS (
        SELECT sig, CAST(count(DISTINCT source) AS BIGINT) AS n_src
        FROM h GROUP BY 1
    ),
    flag AS (
        SELECT h.source,
               CAST(sum(CASE WHEN x.n_src > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cross_docs
        FROM h JOIN xsrc x ON h.sig = x.sig
        GROUP BY 1
    )
    SELECT p.source, p.n_docs, p.n_distinct,
           p.n_docs - p.n_distinct AS dup_docs,
           round(1.0 - CAST(p.n_distinct AS DOUBLE) / p.n_docs, 6)
               AS dup_share,
           f.cross_docs,
           round(CAST(f.cross_docs AS DOUBLE) / p.n_docs, 6)
               AS cross_source_share
    FROM per p JOIN flag f ON p.source = f.source
    ORDER BY p.source
    """,
    tags=("llm", "governance"),
)
def llm_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplication census per source: within-source duplicate
    share (1 − distinct md5 texts / docs) and the share of a
    source's documents whose EXACT text also appears in another
    source — the 'who is re-crawling whom' accountability line that
    llm_dedup_exact's global dedup and llm_source_containment's
    shingle view bracket from either side. All counts PURE INTEGER
    on md5 signatures (the llm_dedup_exact key convention); two
    share divisions per source.

    Scale shape: one map-side hash projection, one per-source
    reduce, one per-signature source-count reduce joined back, one
    per-source flag reduce."""
    d = tbl(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("sig"))
    per = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("sig").cast("long").alias("n_distinct"),
    )
    xsrc = h.groupBy("sig").agg(
        F.countDistinct("source").cast("long").alias("n_src")
    )
    flag = (
        h.join(xsrc, "sig")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("n_src") > 1, 1).otherwise(0))
            .cast("long")
            .alias("cross_docs")
        )
    )
    return (
        per.join(flag, "source")
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("dup_docs"),
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_share"),
            "cross_docs",
            F.round(
                F.col("cross_docs").cast("double") / F.col("n_docs"), 6
            ).alias("cross_source_share"),
        )
        .orderBy("source")
    )


@register(
    "llm_label_balance",
    """
    WITH c AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n
        FROM embeddings GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(max(n) AS BIGINT) AS n_max,
               CAST(min(n) AS BIGINT) AS n_min,
               sum(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c)
                   * ln(CAST((SELECT sum(n) FROM c) AS DOUBLE) / n))
                   AS h
        FROM c
    )
    SELECT n_tot AS n_vectors, k AS n_labels, n_max, n_min,
           round(CAST(n_max AS DOUBLE) / n_min, 4) AS imbalance_ratio,
           round(h, 6) AS shannon_entropy_nats,
           round(exp(h), 4) AS effective_classes,
           round(h / ln(CAST(k AS DOUBLE)), 6) AS normalized_entropy,
           round(exp(h), 4) >= 0.9 * k AS well_balanced
    FROM tot
    """,
    tags=("llm", "embedding"),
)
def llm_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance census of the embeddings table: per-class
    counts reduced to the max/min imbalance ratio, Shannon entropy
    H = Σ(n/N)·ln(N/n), the effective number of classes e^H (Hill
    number of order 1 — '8 labels that act like 5.2'), and the
    ln(k)-normalized entropy — the one-row summary that decides
    whether class reweighting or resampling is needed before
    training on these labels. Counts PURE INTEGER; the entropy sum
    runs over ≤k label rows so float drift is k·ulp, far inside
    round-6; the verdict compares e^H to 0.9·k on the ROUNDED
    value.

    Scale shape: one keyed reduce to k label rows, one census
    reduce."""
    emb = tbl(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ntot = c.agg(F.sum("n").cast("long").alias("n_tot"))
    j = c.crossJoin(F.broadcast(ntot))
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n_tot").alias("n_tot"),
        F.max("n").cast("long").alias("n_max"),
        F.min("n").cast("long").alias("n_min"),
        F.sum(
            F.col("n").cast("double")
            / F.col("n_tot")
            * F.log(F.col("n_tot").cast("double") / F.col("n"))
        ).alias("h"),
    )
    return tot.select(
        F.col("n_tot").alias("n_vectors"),
        F.col("k").alias("n_labels"),
        "n_max",
        "n_min",
        F.round(F.col("n_max").cast("double") / F.col("n_min"), 4).alias(
            "imbalance_ratio"
        ),
        F.round(F.col("h"), 6).alias("shannon_entropy_nats"),
        F.round(F.exp(F.col("h")), 4).alias("effective_classes"),
        F.round(F.col("h") / F.log(F.col("k").cast("double")), 6).alias(
            "normalized_entropy"
        ),
        (F.round(F.exp(F.col("h")), 4) >= 0.9 * F.col("k")).alias(
            "well_balanced"
        ),
    )
