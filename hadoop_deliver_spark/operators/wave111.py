"""§2 extensions, hundred-eleventh wave — BLEU pair scoring.

- llm_bleu_pairs: BLEU-2 with brevity penalty over the MinHash
  near-duplicate pairs — the precision-oriented complement of
  llm_rouge_pairs' recall orientation, and the score that actually
  penalizes a short extract masquerading as a near-duplicate (high
  ROUGE precision, BLEU brevity-penalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.llm import _EXACT_JACCARD_SQL
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_bleu_pairs",
    f"""
    WITH pairs AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_EXACT_JACCARD_SQL})
        WHERE jaccard >= 0.5
    ),
    uni AS MATERIALIZED (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE length(text) > 0)
        GROUP BY 1, 2
    ),
    bi AS MATERIALIZED (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i + 1])) AS w
            FROM documents WHERE length(text) > 0
        )
        GROUP BY 1, 2
    ),
    ov1 AS (
        SELECT p.doc_a, p.doc_b,
               CAST(sum(least(ta.c, tb.c)) AS BIGINT) AS clip1
        FROM pairs p
        JOIN uni ta ON ta.doc_id = p.doc_a
        JOIN uni tb ON tb.doc_id = p.doc_b AND tb.w = ta.w
        GROUP BY 1, 2
    ),
    ov2 AS (
        SELECT p.doc_a, p.doc_b,
               CAST(sum(least(ta.c, tb.c)) AS BIGINT) AS clip2
        FROM pairs p
        JOIN bi ta ON ta.doc_id = p.doc_a
        JOIN bi tb ON tb.doc_id = p.doc_b AND tb.w = ta.w
        GROUP BY 1, 2
    ),
    dl AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok FROM uni
        GROUP BY doc_id
    )
    SELECT o1.doc_a AS doc_a, o1.doc_b AS doc_b, o1.clip1,
           coalesce(o2.clip2, 0) AS clip2,
           da.n_tok AS len_ref, db.n_tok AS len_cand,
           CASE WHEN o1.clip1 = 0 OR coalesce(o2.clip2, 0) = 0 THEN 0.0
                ELSE round(
                    least(1.0, exp(1.0 - CAST(da.n_tok AS DOUBLE)
                                         / db.n_tok))
                    * exp(0.5 * (ln(CAST(o1.clip1 AS DOUBLE) / db.n_tok)
                          + ln(CAST(coalesce(o2.clip2, 0) AS DOUBLE)
                               / (db.n_tok - 1)))), 4)
           END AS bleu2
    FROM ov1 o1
    LEFT JOIN ov2 o2 ON o2.doc_a = o1.doc_a AND o2.doc_b = o1.doc_b
    JOIN dl da ON da.doc_id = o1.doc_a
    JOIN dl db ON db.doc_id = o1.doc_b
    ORDER BY o1.doc_a, o1.doc_b
    """,
    tags=("llm", "quality"),
)
def llm_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 (Papineni 2002) over the MinHash near-duplicate pairs,
    doc_a as reference and doc_b as candidate: geometric mean of the
    clipped unigram and bigram precisions times the brevity penalty
    min(1, e^{{1 − len_ref/len_cand}}) — the precision-oriented
    complement of llm_rouge_pairs (ROUGE rewards a short extract's
    recall; BLEU's BP punishes exactly that). Clipped counts
    Σ min(c_a, c_b) over unigrams AND bigrams are exact integers
    (bigram universe built positionally — transform over the token
    index, no shuffle until the per-(doc, gram) count); pairs with a
    zero clipped count at either order get the conventional BLEU 0,
    pinned identically on both engines (no log of zero anywhere).
    The engine takes pairs from the deterministic MinHash pipeline;
    the oracle re-derives them from first-principles exact Jaccard
    (the llm_rouge_pairs contract).

    Scale shape: near-dup-sized pair set; two keyed gram-count
    equi-join families (map-side-combined inputs), a LEFT join to
    keep bigram-empty pairs, one broadcast-size length join."""
    d = tbl(spark, sf_dir, "documents")
    # r12: pin the (tiny, memoized-candidate) pair list once — it is
    # consumed three times below — and prefilter the gram-count base
    # to documents that actually appear in a pair (left-semi on the
    # ≤2·|pairs| id set): every downstream use is an inner/semi join
    # against pair ids, so the filter is lossless, and the uni/bi
    # explode+count passes shrink ~10× on this corpus.
    pairs = (
        api.minhash_pairs(d, "doc_id", "text", threshold=0.5)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .localCheckpoint(eager=True)
    )
    pdocs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    base = d.where(F.length("text") > 0).join(
        F.broadcast(pdocs), "doc_id", "left_semi"
    )
    toks = F.split("text", " ")
    uni = (
        base.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bi = (
        base.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i),
                        F.element_at(toks, i + 1),
                    ),
                )
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    def clipped(tok: DataFrame, out: str) -> DataFrame:
        ta = tok.select(
            F.col("doc_id").alias("doc_a"), "w", F.col("c").alias("ca")
        )
        tb = tok.select(
            F.col("doc_id").alias("doc_b"), "w", F.col("c").alias("cb")
        )
        return (
            pairs.join(ta, "doc_a")
            .join(tb, ["doc_b", "w"])
            .groupBy("doc_a", "doc_b")
            .agg(
                F.sum(F.least("ca", "cb")).cast("long").alias(out)
            )
        )

    ov1 = clipped(uni, "clip1")
    ov2 = clipped(bi, "clip2")
    dl = uni.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok")
    )
    da = dl.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("len_ref"))
    db = dl.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("len_cand"))
    j = (
        ov1.join(ov2, ["doc_a", "doc_b"], "left")
        .withColumn("clip2", F.coalesce("clip2", F.lit(0)))
        .join(F.broadcast(da), "doc_a")
        .join(F.broadcast(db), "doc_b")
    )
    bp = F.least(
        F.lit(1.0),
        F.exp(1.0 - F.col("len_ref").cast("double") / F.col("len_cand")),
    )
    core = F.exp(
        0.5
        * (
            F.log(F.col("clip1").cast("double") / F.col("len_cand"))
            + F.log(
                F.col("clip2").cast("double") / (F.col("len_cand") - 1)
            )
        )
    )
    return j.select(
        "doc_a",
        "doc_b",
        "clip1",
        "clip2",
        "len_ref",
        "len_cand",
        F.when((F.col("clip1") == 0) | (F.col("clip2") == 0), F.lit(0.0))
        .otherwise(F.round(bp * core, 4))
        .alias("bleu2"),
    ).orderBy("doc_a", "doc_b")
