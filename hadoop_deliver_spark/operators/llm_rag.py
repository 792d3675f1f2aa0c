"""§2 extensions, thirty-second wave — RAG context assembly and the
Hive-style distribution SQL surface.

- llm_rag_assemble: the retrieval-augmented-generation assembly step:
  per query term, the top-2 documents by an integer relevance key,
  truncated and concatenated into a budgeted context block.
- sql_cluster_by: DISTRIBUTE BY / SORT BY — the Hive-inherited
  physical-layout clauses (partition-by-key + partition-local sort)
  that delivery jobs use to shape output without changing content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_RAG_TERMS = ["table", "scan", "merge", "sort", "key"]


@register(
    "llm_rag_assemble",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf FROM toks
        WHERE term IN ('table', 'scan', 'merge', 'sort', 'key')
        GROUP BY term, doc_id
    ),
    ranked AS (
        SELECT term, doc_id, tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id) AS rnk
        FROM tf
    ),
    snips AS (
        SELECT r.term, r.rnk, r.doc_id,
               array_to_string(string_split(d.text, ' ')[1:20], ' ')
                   AS snippet
        FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
        WHERE r.rnk <= 2
    )
    SELECT term AS query_term,
           string_agg('[doc ' || CAST(doc_id AS VARCHAR) || '] ' || snippet,
                      ' || ' ORDER BY rnk) AS context,
           CAST(sum(len(string_split(snippet, ' '))) AS BIGINT)
               AS context_tokens
    FROM snips GROUP BY term ORDER BY query_term
    """,
    tags=("llm", "retrieval"),
)
def llm_rag_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: for each query term, retrieve the top-2
    documents by an INTEGER relevance key (term frequency, doc_id
    tiebreak — float BM25 stays a display column elsewhere precisely
    because a float top-k boundary can ulp-flip the retrieved set),
    truncate each hit to a 20-word snippet, and concatenate into the
    tagged context block a generator would consume, with its token
    budget. Rank runs per term over the tf aggregate; snippets come
    from a doc_id-keyed join that touches only the ≤10 retrieved
    docs — at corpus scale the retrieval side is the only fact-sized
    work."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(*_RAG_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id"))
    hits = tf.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 2)
    snips = hits.join(d.select("doc_id", "text"), "doc_id").select(
        "term",
        "rnk",
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 20), " ").alias("snippet"),
    )
    tagged = snips.select(
        "term",
        "rnk",
        F.concat(
            F.lit("[doc "), F.col("doc_id").cast("string"), F.lit("] "),
            F.col("snippet"),
        ).alias("piece"),
        F.size(F.split("snippet", " ")).alias("snip_tokens"),
    )
    return (
        tagged.groupBy(F.col("term").alias("query_term"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "piece"))
                    ),
                    lambda s: s.piece,
                ),
                " || ",
            ).alias("context"),
            F.sum("snip_tokens").cast("long").alias("context_tokens"),
        )
        .orderBy("query_term")
    )


@register(
    "sql_cluster_by",
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM orders
    """,
    tags=("sql",),
)
def sql_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (≡ CLUSTER BY): the Hive-inherited
    clauses that shape PHYSICAL layout — rows hash-distributed on the
    customer key, sorted within each partition — without changing
    content, which is exactly what the order-insensitive oracle
    verifies. This is how a SQL-surface user pre-shapes output for a
    bucketed write or a downstream merge join (the DataFrame twins
    are repartition + sortWithinPartitions, used by sink_bucketed and
    scan_binary_files). Plan: one hash exchange + partition-local
    sort, NO global range exchange — cheaper than ORDER BY when
    global order is not required."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_cb_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM hds_cb_orders
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """
    )


@register(
    "llm_split_leakage",
    None,  # filled below after import to reuse the exact-Jaccard CTE
    tags=("llm", "dq", "split"),
)
def llm_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit — operator #300 ties the dedup and
    split families together: every near-dup pair (the MinHash+refine
    pair set of llm_dedup_minhash) is joined to BOTH members' split
    assignments (llm_dataset_split's md5-nibble rule) and counted per
    ordered split pair. Exact duplicates cannot straddle splits
    (content-hash keying), but NEAR-duplicates can — those
    cross-split counts are exactly the contamination a held-out set
    must report before anyone trusts an eval number. The pair set is
    candidates-only (banded LSH), the split map is a map-side
    expression — the audit costs one small join more than the dedup
    run itself."""
    from hadoop_deliver_spark.operators.llm import llm_dedup_minhash

    d = tbl(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("text")), 1, 1)
    split = (
        F.when(nib.isin("c", "d"), "val")
        .when(nib.isin("e", "f"), "test")
        .otherwise("train")
    )
    assign = d.select("doc_id", split.alias("split"))
    pairs = llm_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    a = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("is_leakage", F.col("split_a") != F.col("split_b"))
        .orderBy("split_a", "split_b")
    )


def _install_split_leakage_oracle() -> None:
    """Reuse llm.py's exact-Jaccard pair CTE for the leakage oracle so
    the pair definition cannot drift between the two operators."""
    from hadoop_deliver_spark.operators.llm import _EXACT_JACCARD_SQL
    from hadoop_deliver_spark.registry import REGISTRY

    REGISTRY["llm_split_leakage"].oracle = f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_EXACT_JACCARD_SQL})
        WHERE jaccard >= 0.5
    ),
    assign AS (
        SELECT doc_id,
               CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
                    WHEN substr(md5(text), 1, 1) IN ('e', 'f') THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT a.split AS split_a, b.split AS split_b,
           count(*) AS n_pairs,
           (a.split != b.split) AS is_leakage
    FROM pairs p
    JOIN assign a ON a.doc_id = p.doc_a
    JOIN assign b ON b.doc_id = p.doc_b
    GROUP BY 1, 2 ORDER BY split_a, split_b
    """


_install_split_leakage_oracle()
