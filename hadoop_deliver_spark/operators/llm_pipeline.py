"""§2.K extensions, second wave — the remaining operations a
production training-data pipeline runs between raw crawl and tokenizer:

- incremental (cross-snapshot) dedup: drop new documents whose content
  key already exists in the previous snapshot — the step that keeps a
  continuously-crawled corpus from re-ingesting itself. Anti-join on a
  32-byte normalized key: at 100 TB the key set, not the text, moves.
- repetition-based quality scoring: Rae et al.'s Gopher filters made
  "fraction of repeated n-grams" a standard corpus-quality signal;
  computed here per document from word-3-gram multisets.
- PII / pattern scrubbing: count + redact regex families (SSN-shaped,
  email-shaped, and a corpus-hitting entity stand-in) — pure
  `regexp_count`/`regexp_replace` column expressions, no UDF.
- sequence packing: assign documents to fixed-token-capacity packs
  (greedy contiguous fill per language shard) — the batch-shaping step
  before a tokenizer turns packs into training sequences.

All four are Column-expression plans with per-shard windows or
key-hash shuffles only — no global single-partition stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# Same normalized content key as llm_dedup_exact (llm.py): sha256 of
# the lowercased 60-char prefix — prefixes collide in the fixtures.
_KEY_SQL = "sha256(lower(trim(substr(text, 1, 60))))"


@register(
    "llm_dedup_incremental",
    f"""
    WITH prior AS (
        SELECT DISTINCT {_KEY_SQL} AS k FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
        SELECT doc_id, {_KEY_SQL} AS k FROM documents WHERE doc_id % 2 = 1
    )
    SELECT n.doc_id
    FROM new n WHERE NOT EXISTS (SELECT 1 FROM prior p WHERE p.k = n.k)
    ORDER BY n.doc_id
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: keep only new-snapshot
    documents (odd doc_id, standing in for "this crawl") whose
    normalized content key does NOT appear in the prior snapshot
    (even doc_id). Expressed as a left_anti equi-join on the 32-byte
    key, so the shuffle moves hashes, not documents; when the prior
    key set fits executor memory it broadcasts (the degenerate form
    of the bloom-filter pre-filter a 100 TB pipeline would add in
    front of the anti-join to skip the shuffle for the ~99% of new
    docs that are genuinely new)."""
    d = tbl(spark, sf_dir, "documents")
    key = F.sha2(F.lower(F.trim(F.substring("text", 1, 60))), 256)
    prior = d.filter(F.col("doc_id") % 2 == 0).select(key.alias("k")).distinct()
    new = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", key.alias("k"))
    return new.join(prior, "k", "left_anti").select("doc_id").orderBy("doc_id")


@register(
    "llm_quality_repetition",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) >= 3
                    THEN list_transform(
                        range(1, len(string_split(text, ' ')) - 1),
                        i -> array_to_string(
                            list_slice(string_split(text, ' '), i, i + 2), ' '))
                    ELSE [] END AS grams
        FROM documents
    ),
    per_gram AS (
        SELECT doc_id, unnest(grams) AS gram FROM g
    ),
    top AS (
        SELECT doc_id, max(c) AS top_c
        FROM (SELECT doc_id, gram, count(*) AS c FROM per_gram GROUP BY 1, 2)
        GROUP BY doc_id
    )
    SELECT g.doc_id,
           len(g.grams) AS n_grams,
           len(list_distinct(g.grams)) AS n_distinct,
           CAST(1.0 - CAST(len(list_distinct(g.grams)) AS DOUBLE)
                    / len(g.grams) AS REAL) AS rep_ratio,
           CAST(CAST(t.top_c AS DOUBLE) / len(g.grams) AS REAL) AS top_share
    FROM g JOIN top t ON g.doc_id = t.doc_id
    WHERE len(g.grams) > 0
    ORDER BY g.doc_id
    """,
)
def llm_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals per document (the Gopher-filter
    family): word-3-gram count, distinct count, repeated-gram ratio,
    and the most-frequent-gram share. n_grams/n_distinct come from
    array expressions (map-side, no shuffle); top_share needs the
    gram mode, one (doc_id, gram) groupBy — the shuffle key is the
    document, so the agg is embarrassingly parallel across docs.
    Short docs (<3 tokens) are excluded (no gram multiset to score;
    the guard also dodges F.sequence's descending-range gotcha)."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", grams.alias("grams")).filter(F.size("grams") > 0)
    g.cache()
    top = (
        g.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    return (
        g.join(top, "doc_id")
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
            (
                1.0
                - F.size(F.array_distinct("grams")).cast("double")
                / F.size("grams")
            )
            .cast("float")
            .alias("rep_ratio"),
            (F.col("top_c").cast("double") / F.size("grams"))
            .cast("float")
            .alias("top_share"),
        )
        .orderBy("doc_id")
    )


# Pattern families: real PII shapes (zero hits in the word-salad
# fixtures — the count being *verifiably* zero is the point of the
# oracle) plus a corpus-hitting entity stand-in so the redaction path
# is exercised on real rows. Both engines: no \b / lookaround, so the
# Java-regex and RE2 dialects agree.
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
_ENTITY = "customer"


@register(
    "llm_pii_scrub",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(text, '{_ENTITY}')) AS BIGINT) AS n_entity,
           substr(regexp_replace(regexp_replace(regexp_replace(
                      text, '{_PII_SSN}', '[SSN]', 'g'),
                      '{_PII_EMAIL}', '[EMAIL]', 'g'),
                      '{_ENTITY}', '[ENTITY]', 'g'), 1, 80) AS scrubbed_prefix
    FROM documents ORDER BY doc_id
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / pattern scrubbing: per-document match counts and a
    redacted text for three pattern families (SSN-shaped, email-shaped,
    and a corpus-hitting entity token standing in for an NER hit).
    Pure regexp_count/regexp_replace column expressions — JVM-side,
    codegen'd, no Python in the loop; at 100 TB this is a map-only
    pass, which is exactly why scrubbing belongs in the engine and not
    a sidecar script. Patterns avoid dialect-divergent syntax
    (no \\b, no lookaround) so Spark's Java regex and the oracle's
    RE2 agree."""
    d = tbl(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _PII_SSN, "[SSN]"),
            _PII_EMAIL,
            "[EMAIL]",
        ),
        _ENTITY,
        "[ENTITY]",
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_SSN)).cast("long").alias("n_ssn"),
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("text", F.lit(_ENTITY)).cast("long").alias("n_entity"),
        F.substring(scrub, 1, 80).alias("scrubbed_prefix"),
    ).orderBy("doc_id")


@register(
    "llm_pack_sequences",
    """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) - n_tok AS cum_before
        FROM t
    )
    SELECT lang,
           CAST(cum_before // 2048 AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-capacity packs
    (2048 whitespace tokens) by greedy contiguous fill in doc_id
    order, sharded per language — pack_id = floor(tokens-before/cap),
    so a pack may overflow by at most its last document (the standard
    streaming-packer semantics; the alternative, splitting documents
    across packs, is a tokenizer-side decision). Packing shards are
    per-language — the correct *semantics* for training shards — but
    the running token total is NOT computed with a bare lang-keyed
    window (5 partitions at any corpus size, the round-8
    low-cardinality-window guard's target shape): it rides
    api.exact_stratified_cumsum, the block-ranked per-stratum core —
    the cumsum window partitions by (lang, doc_id-block) and the tiny
    broadcast (lang × block) offset table shifts each block to its
    exact stratum prefix. One balanced shuffle, one groupBy on
    (lang, pack_id)."""
    from hadoop_deliver_spark import api

    d = tbl(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    c = api.exact_stratified_cumsum(
        t, "lang", "doc_id", "n_tok", "cum"
    ).withColumn("cum_before", F.col("cum") - F.col("n_tok"))
    return (
        c.groupBy("lang", F.floor(F.col("cum_before") / 2048).alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@register(
    "llm_vocab_pairs",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bigrams AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 2
                           THEN list_transform(range(1, len(t)),
                                i -> t[i] || ' ' || t[i + 1])
                           ELSE [] END) AS pair
        FROM toks
    ),
    counts AS (
        SELECT pair, count(*) AS n, count(DISTINCT doc_id) AS df
        FROM bigrams GROUP BY pair
    )
    SELECT pair, n, df
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, pair) AS rn FROM counts)
    WHERE rn <= 50 ORDER BY n DESC, pair
    """,
)
def llm_vocab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-merge statistics (the first BPE/WordPiece iteration
    at word granularity): corpus-wide adjacent-token-pair counts and
    document frequencies, top 50 by count with the pair string as the
    deterministic tiebreak. Shape at 100 TB: the bigram explode is
    map-side, the (pair) groupBy is the one shuffle with partial
    aggregation underneath, and the top-50 is a TakeOrderedAndProject
    bounded heap — the same plan a full BPE trainer runs per merge
    round, so this op IS the inner loop of distributed vocab
    construction."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


@register(
    "llm_mix_weights",
    """
    WITH per_source AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT *,
               CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
        FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           CAST(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                AS REAL) AS token_share,
           CAST(sqrt(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE))
                AS REAL) AS weight
    FROM tot ORDER BY source
    """,
)
def llm_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing weights with temperature rebalancing: per-source
    token share and sampling weight ∝ share^(1/2) (temperature τ=2 in
    the multinomial-sampling formulation used for multilingual/
    multi-source training mixes — upweights small sources, downweights
    the head; the trainer normalizes the weights to a distribution).
    Cross-engine determinism by construction: the only cross-row sum
    is the INTEGER token total (exact under any summation order — a
    float window-sum of the irrational sqrt values would re-introduce
    the last-ulp drift the dec2 convention exists to kill), and
    share/weight are then per-row IEEE ops on identical inputs. The
    per-source aggregate is one shuffle; the total is a ~20-row
    window."""
    d = tbl(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()  # whole-frame integer total: order-free, exact
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w).cast(
        "double"
    )
    return (
        per_source.select(
            "source",
            "n_docs",
            "n_tokens",
            share.cast("float").alias("token_share"),
            F.sqrt(share).cast("float").alias("weight"),
        )
        .orderBy("source")
    )


@register(
    "delivery_profile",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_flags,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           CAST(min(l_extendedprice) AS REAL) AS min_price,
           CAST(max(l_extendedprice) AS REAL) AS max_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS REAL) AS sum_price,
           count(DISTINCT l_returnflag) AS n_flags,
           count(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem
    """,
)
def delivery_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profile for a delivery manifest (the ANALYZE-before-ship
    step): row count, key cardinalities, null counts, value ranges and
    an exact money total, in ONE pass over the table. Everything is a
    partial→final aggregate — at 100 TB this is a single scan + one
    1-row-per-partition shuffle; the two exact count_distincts expand
    to a two-phase distinct agg (swap in approx_count_distinct when the
    profile tolerates ±2%, as agg_approx_count_distinct demonstrates)."""
    from hadoop_deliver_spark.tables import dec2

    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0)).alias(
            "null_flags"
        ),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_extendedprice").cast("float").alias("min_price"),
        F.max("l_extendedprice").cast("float").alias("max_price"),
        F.sum(dec2("l_extendedprice")).cast("double").cast("float").alias(
            "sum_price"
        ),
        F.count_distinct("l_returnflag").alias("n_flags"),
        F.count_distinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "llm_doc_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    ranked AS (
        SELECT doc_id, term, tf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tf DESC, term) AS rnk
        FROM tf
    )
    SELECT doc_id, rnk, term, tf FROM ranked
    WHERE rnk <= 3 ORDER BY doc_id, rnk
    """,
    tags=("llm",),
)
def llm_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by term frequency (keyword surface for
    routing/tagging): explode → (doc, term) count → per-doc window
    top-k. Ranked on the integer (tf DESC, term ASC) key so both
    engines pick identical rows — ranking on a computed double (e.g.
    raw tfidf) would let a last-ulp idf difference reorder near-ties.
    The window partitions on doc_id: per-doc state is |doc vocab|,
    embarrassingly parallel at any corpus size."""
    from hadoop_deliver_spark.operators.llm import _tokens

    d = tbl(spark, sf_dir, "documents")
    toks = _tokens(d).withColumnRenamed("tok", "term")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), "term")
    return (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf")
        .orderBy("doc_id", "rnk")
    )
