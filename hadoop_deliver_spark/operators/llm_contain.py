"""§2.K extensions, eleventh wave (3/3) — shingle containment.

Near-dup detection by symmetric Jaccard (llm_dedup_ngram_jaccard)
misses the sub-document case: a short document wholly embedded in a
longer one scores low Jaccard but containment ≈ 1. Containment
C(A,B) = |A∩B| / |A| is the standard asymmetric complement (Broder's
resemblance/containment pair) and is what quote/boilerplate/
subset-crawl dedup keys on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_T = 0.85


@register(
    "llm_shingle_containment",
    f"""
    WITH grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, length(text) - 3),
                   i -> substr(text, i, 5)
               )) AS gs
        FROM documents WHERE doc_id % 4 = 0
    ),
    inv AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    inter AS (
        SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
               count(*) AS n_inter
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.inner_doc, i.outer_doc,
           CAST(CAST(i.n_inter AS DOUBLE) / len(ga.gs) AS REAL)
               AS containment
    FROM inter i
    JOIN grams ga ON ga.doc_id = i.inner_doc
    JOIN grams gb ON gb.doc_id = i.outer_doc
    WHERE CAST(i.n_inter AS DOUBLE) / len(ga.gs) >= {_T}
      AND (len(ga.gs) < len(gb.gs)
           OR (len(ga.gs) = len(gb.gs) AND i.inner_doc < i.outer_doc))
    ORDER BY inner_doc, outer_doc
    """,
    tags=("llm", "dedup"),
)
def llm_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document near-dup pairs by exact char-5-gram containment
    C(A,B) = |A∩B|/|A| ≥ 0.85, where A is the smaller gram set (ties
    broken by doc_id): catches documents embedded in longer ones that
    symmetric Jaccard misses. Inverted-index join with a prefix
    filter that is lossless FOR CONTAINMENT: A must share one of its
    ⌈(1−t)·|A|⌉+1 rarest grams with B (if all of A's prefix grams
    miss B, fewer than t·|A| grams can intersect), so only the
    contained side is prefix-pruned and the outer side keeps its full
    posting list. One gram-keyed shuffle + one pair-keyed count; at
    100 TB add a gram document-frequency cap exactly as in the
    Jaccard twin. Restricted to the doc_id % 4 slice — containment
    posting lists have no upper size-ratio bound, so the demo bounds
    corpus fan-out by sampling, not by weakening the algorithm.

    The ratio filters on the DOUBLE value with the same literal as
    the oracle (bit-identical comparison) and emits float32.

    Core: api.containment_pairs (column-parameterized; inner-side
    prefix filter + api.bitmap_sets refine)."""
    from hadoop_deliver_spark.api import containment_pairs

    d = tbl(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    return (
        containment_pairs(
            d.select("doc_id", "text"),
            "doc_id",
            "text",
            threshold=_T,
            char_k=5,
        )
        .withColumnsRenamed(
            {"inner_id": "inner_doc", "outer_id": "outer_doc"}
        )
        .orderBy("inner_doc", "outer_doc")
    )
