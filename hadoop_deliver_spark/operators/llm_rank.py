"""§2.K extensions, twenty-second wave (retrieval/curation half) —
BM25 ranking, vocabulary coverage, SFT formatting, code routing.

- llm_bm25: Okapi BM25 document scoring for a fixed query term set —
  the retrieval ranker a RAG/dedup pipeline runs over the corpus.
  Fully relational (explode → tf/df aggregates → broadcast joins);
  float32 surface absorbs last-ulp ln() differences like llm_tfidf.
- llm_oov_rate: per-document out-of-vocabulary rate against the
  corpus top-1000 vocabulary — the tokenizer-coverage gate run before
  committing to a vocab size.
- llm_chat_template: deterministic SFT example rendering — each doc
  split into a 15-word prompt and the completion remainder, assembled
  into a chat-special-token template, with per-field token counts.
- llm_code_detect: prose-vs-code routing over a mixed corpus
  (documents prose + events.props JSON payloads) using
  punctuation-density heuristics — the classifier that decides which
  quality pipeline a crawl shard enters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_QUERY_TERMS = ["table", "scan", "merge", "sort", "key"]


@register(
    "llm_bm25",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ('table', 'scan', 'merge', 'sort', 'key')
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks
        WHERE term IN ('table', 'scan', 'merge', 'sort', 'key')
        GROUP BY term
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT (SELECT count(*) FROM documents) AS n,
               (SELECT avg(dl) FROM dl) AS avgdl
    )
    SELECT tf.doc_id,
           CAST(sum(
               ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           ) AS REAL) AS bm25
    FROM tf
    JOIN df ON df.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY tf.doc_id
    """,
    tags=("llm", "retrieval"),
)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) scores per document for a fixed
    5-term query, composed entirely from relational primitives: one
    token explode feeds the tf (doc×term), df (term) and doclen (doc)
    aggregates; df and the scalar (N, avgdl) stats broadcast back
    onto tf. idf uses the +1 smoothing so scores stay positive. At
    100 TB the only fact-sized shuffles are the three keyed
    aggregates over the exploded tokens — df and stats are
    vocabulary- and 1-row-sized. The float32 surface absorbs the
    last-ulp ln() divergence between engines, the same contract
    llm_tfidf ships."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    qt = toks.filter(F.col("term").isin(*_QUERY_TERMS))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = qt.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = d.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    k1, b = 1.2, 0.75
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    score = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl))))
    )
    return (
        tf.join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(score).cast("float").alias("bm25"))
        .orderBy("doc_id")
    )


@register(
    "llm_oov_rate",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, row_number() OVER (ORDER BY count(*) DESC, term)
                       AS rnk
            FROM toks GROUP BY term
        ) WHERE rnk <= 1000
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           floor(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 10000) / 10000 AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.term = t.term
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    tags=("llm", "vocab"),
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage gate: per-document OOV rate against the
    corpus top-1000 vocabulary (ties at the cutoff broken by term
    string — deterministic on both engines). The vocabulary is
    |V|-bounded and broadcast into the membership LEFT JOIN; the
    fact-sized work is one token explode + one doc-keyed aggregate.
    The vocab cutoff rides TakeOrderedAndProject (bounded heap per
    partition, driver merge of 1000) — no global ranking window at
    any vocabulary size. Ratio surface floor-quantized."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # top-1000 via TakeOrderedAndProject (bounded heap per partition +
    # driver merge), NOT a global ranking window — no single-partition
    # stage at any vocabulary size
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("term"))
        .limit(1000)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (
                F.floor(F.col("n_oov").cast("double") / F.col("n_tokens") * 10000)
                / 10000
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_chat_template",
    """
    WITH parts AS (
        SELECT doc_id, lang,
               coalesce(array_to_string(string_split(text, ' ')[1:15], ' '),
                        '') AS prompt,
               coalesce(array_to_string(string_split(text, ' ')[16:], ' '),
                        '') AS completion
        FROM documents
    )
    SELECT doc_id, lang,
           '<|system|>helpful pipeline<|user|>' || prompt
               || '<|assistant|>' || completion || '<|end|>' AS rendered,
           CAST(len(string_split(prompt, ' ')) AS BIGINT)
               AS prompt_tokens,
           CAST(CASE WHEN completion = '' THEN 0
                ELSE len(string_split(completion, ' ')) END AS BIGINT)
               AS completion_tokens
    FROM parts ORDER BY doc_id
    """,
    tags=("llm", "sft"),
)
def llm_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT example rendering: each document becomes a deterministic
    (prompt = first 15 words, completion = remainder) pair assembled
    into a chat template with special tokens, plus per-field
    whitespace token counts (the loss-mask boundary the trainer
    needs: loss applies to completion_tokens only). Pure map-side
    array/string algebra — the 100 TB plan is a scan with zero
    shuffles; ordering exists only for the fixture-scale hash
    surface."""
    d = tbl(spark, sf_dir, "documents")
    words = F.split("text", " ")
    prompt = F.array_join(F.slice(words, 1, 15), " ")
    completion = F.array_join(
        F.slice(words, 16, F.greatest(F.size(words) - 15, F.lit(0))), " "
    )
    return (
        d.select(
            "doc_id",
            "lang",
            prompt.alias("prompt"),
            completion.alias("completion"),
        )
        .select(
            "doc_id",
            "lang",
            F.concat(
                F.lit("<|system|>helpful pipeline<|user|>"),
                F.col("prompt"),
                F.lit("<|assistant|>"),
                F.col("completion"),
                F.lit("<|end|>"),
            ).alias("rendered"),
            F.size(F.split("prompt", " ")).cast("long").alias("prompt_tokens"),
            F.when(F.col("completion") == "", F.lit(0))
            .otherwise(F.size(F.split("completion", " ")))
            .cast("long")
            .alias("completion_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_code_detect",
    """
    WITH corpus AS (
        SELECT 'doc' AS src, CAST(doc_id AS BIGINT) AS rec_id, text
        FROM documents
        UNION ALL
        SELECT 'props' AS src, event_id AS rec_id, props AS text
        FROM events
    ),
    scored AS (
        SELECT src, rec_id,
               len(text) - len(replace(replace(replace(replace(
                   text, '{', ''), '}', ''), ':', ''), '"', ''))
                   AS punct,
               len(text) AS chars
        FROM corpus
    )
    SELECT src,
           CASE WHEN punct * 20 >= chars THEN 'code' ELSE 'prose' END
               AS class,
           count(*) AS n,
           CAST(sum(punct) AS BIGINT) AS total_punct
    FROM scored GROUP BY 1, 2 ORDER BY src, class
    """,
    tags=("llm", "routing"),
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prose-vs-code corpus routing: a mixed stream (documents prose
    ∪ events.props JSON payloads) is classified by structural
    punctuation density ({, }, :, ") — ≥5% of characters ⇒ 'code'.
    This is the shard router that decides which cleaning pipeline a
    crawl segment enters; counting structural chars via
    length-difference after removal keeps it map-only and
    regex-free (identical on both engines, no dialect). One
    4-group aggregate after the union; the union itself is
    partition-preserving (no shuffle)."""
    d = tbl(spark, sf_dir, "documents").select(
        F.lit("doc").alias("src"),
        F.col("doc_id").cast("long").alias("rec_id"),
        "text",
    )
    e = tbl(spark, sf_dir, "events").select(
        F.lit("props").alias("src"),
        F.col("event_id").alias("rec_id"),
        F.col("props").alias("text"),
    )
    corpus = d.unionByName(e)
    stripped = F.col("text")
    for ch in ["{", "}", ":", '"']:
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    scored = corpus.select(
        "src",
        "rec_id",
        (F.length("text") - F.length(stripped)).alias("punct"),
        F.length("text").alias("chars"),
    )
    return (
        scored.select(
            "src",
            F.when(F.col("punct") * 20 >= F.col("chars"), "code")
            .otherwise("prose")
            .alias("class"),
            "punct",
        )
        .groupBy("src", "class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("punct").cast("long").alias("total_punct"),
        )
        .orderBy("src", "class")
    )
