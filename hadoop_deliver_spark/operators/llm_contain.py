"""§2.K extensions, eleventh wave (3/3) — shingle containment.

Near-dup detection by symmetric Jaccard (llm_dedup_ngram_jaccard)
misses the sub-document case: a short document wholly embedded in a
longer one scores low Jaccard but containment ≈ 1. Containment
C(A,B) = |A∩B| / |A| is the standard asymmetric complement (Broder's
resemblance/containment pair) and is what quote/boilerplate/
subset-crawl dedup keys on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    corpus fan-out by sampling, not by weakening the algorithm."""
    from hadoop_deliver_spark.api import char_gram_sets

    d = tbl(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    grams = char_gram_sets(d, "doc_id", "text", k=5).cache()
    inv = grams.select(
        "doc_id", F.size("gs").alias("n"), F.explode("gs").alias("g")
    )
    # prefix filter on the contained side only (lossless for C ≥ t):
    # rarest-gram order, keep ⌈(1−t)·n⌉ + 1 slots (+1 margin).
    gdf = inv.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    wg = Window.partitionBy("doc_id").orderBy("gdf", "g")
    prefix = (
        inv.join(F.broadcast(gdf), "g")
        .withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") <= F.ceil(F.lit(1.0 - _T) * F.col("n")) + 2)
        .select(
            F.col("doc_id").alias("inner_doc"),
            F.col("n").alias("na"),
            "g",
        )
    )
    full_b = inv.select(
        F.col("doc_id").alias("outer_doc"), F.col("n").alias("nb"), "g"
    )
    cands = (
        prefix.join(full_b, "g")
        .where(F.col("inner_doc") != F.col("outer_doc"))
        .select("inner_doc", "outer_doc")
        .distinct()
    )
    # exact refine: |A∩B| per candidate pair on dictionary-encoded
    # bitmaps (api cores; same dense-small-vocabulary argument as the
    # Jaccard twin — the gram re-join refine spent ~50 s at sf0.1
    # re-exploding posting lists the bitmaps replace with ~n_chunks
    # AND+popcounts per pair)
    from hadoop_deliver_spark.api import (
        bitmap_intersect_count,
        bitmap_sets,
        encode_ids,
    )

    gid = encode_ids(gdf, "g", out="gid")
    max_gid = gid.agg(F.max("gid")).first()[0]
    n_chunks = ((max_gid if max_gid is not None else 0) + 64) // 64
    bitmaps = bitmap_sets(
        inv.join(F.broadcast(gid), "g"), "doc_id", "gid", n_chunks
    )
    ba = bitmaps.select(
        F.col("doc_id").alias("inner_doc"), F.col("bm").alias("bm_a")
    )
    bb = bitmaps.select(
        F.col("doc_id").alias("outer_doc"), F.col("bm").alias("bm_b")
    )
    inter = (
        cands.join(F.broadcast(ba), "inner_doc")
        .join(F.broadcast(bb), "outer_doc")
        .withColumn("n_inter", bitmap_intersect_count("bm_a", "bm_b"))
        .select("inner_doc", "outer_doc", "n_inter")
    )
    sizes = grams.select("doc_id", F.size("gs").alias("sz"))
    return (
        inter.join(
            sizes.withColumnsRenamed({"doc_id": "inner_doc", "sz": "na"}),
            "inner_doc",
        )
        .join(
            sizes.withColumnsRenamed({"doc_id": "outer_doc", "sz": "nb"}),
            "outer_doc",
        )
        # filter on the DOUBLE ratio (same IEEE divide + same literal
        # as the oracle — bit-identical comparison); emit as float
        .withColumn(
            "ratio_d", F.col("n_inter").cast("double") / F.col("na")
        )
        .withColumn("containment", F.col("ratio_d").cast("float"))
        .where(
            (F.col("ratio_d") >= _T)
            & (
                (F.col("na") < F.col("nb"))
                | (
                    (F.col("na") == F.col("nb"))
                    & (F.col("inner_doc") < F.col("outer_doc"))
                )
            )
        )
        .select("inner_doc", "outer_doc", "containment")
        .orderBy("inner_doc", "outer_doc")
    )
