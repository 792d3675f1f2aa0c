"""§2 extensions, hundred-twenty-fourth wave — corpus information
geometry: pairwise source JSD and bigram conditional entropy.

- llm_source_jsd: the full pairwise Jensen–Shannon divergence
  matrix between source unigram distributions — the SYMMETRIC,
  bounded [0, 1]-bit distance llm_source_kl's corpus-anchored form
  cannot give; missing-token mass handled in closed form so only an
  INNER join on token is ever needed.
- llm_bigram_cond_entropy: corpus conditional entropy H(W₂|W₁) and
  the information gain H(W₁) − H(W₂|W₁) — how predictable the next
  token is; the corpus-level twin of llm_bigram_lm's per-context
  table and llm_token_entropy's per-doc unigram form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_source_jsd",
    """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ),
    n AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ),
    p AS (
        SELECT cnt.source, cnt.tok,
               CAST(cnt.c AS DOUBLE) / n.n AS p
        FROM cnt JOIN n ON cnt.source = n.source
    ),
    sh AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS shared_tokens,
               sum(a.p) AS pa_sh, sum(b.p) AS pb_sh,
               sum(a.p * log2(2 * a.p / (a.p + b.p))) AS ta,
               sum(b.p * log2(2 * b.p / (a.p + b.p))) AS tb
        FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, shared_tokens,
           round(0.5 * (ta + (1 - pa_sh)) + 0.5 * (tb + (1 - pb_sh)), 6)
               AS jsd_bits,
           round(1 - 0.5 * pa_sh - 0.5 * pb_sh, 6) AS disjoint_mass
    FROM sh ORDER BY source_a, source_b
    """,
    tags=("llm", "text"),
)
def llm_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (in bits, base 2) between
    every pair of source unigram distributions: JSD = ½KL(P‖M) +
    ½KL(Q‖M), M = (P+Q)/2 — symmetric, bounded by 1 bit, defined
    even where KL blows up. The closed-form trick that keeps the
    plan join-light: tokens missing from the OTHER source contribute
    exactly p·log₂2 = p, so JSD = ½[Σ_shared p·log₂(2p/(p+q)) +
    (1 − P_shared)] + the mirror — one INNER equi-join on token per
    pair instead of any full-outer/anti machinery. Token counts are
    exact int64; shares are one division each; per-pair sums are the
    identical float chain on both sides.

    Scale shape: one token-count reduce, one share projection, one
    self-equi-join on token grouped by (source_a, source_b) — the
    pair explosion is bounded by sources² but the JOIN is on token,
    so it shuffles token-partitioned, never all-pairs-of-rows."""
    d = tbl(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    p = cnt.join(n, "source").select(
        "source", "tok", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    a = p.select(
        F.col("source").alias("source_a"),
        F.col("tok").alias("tok"),
        F.col("p").alias("pa"),
    )
    b = p.select(
        F.col("source").alias("source_b"),
        F.col("tok").alias("tok"),
        F.col("p").alias("pb"),
    )
    sh = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_tokens"),
            F.sum("pa").alias("pa_sh"),
            F.sum("pb").alias("pb_sh"),
            F.sum(
                F.col("pa")
                * F.log2(2 * F.col("pa") / (F.col("pa") + F.col("pb")))
            ).alias("ta"),
            F.sum(
                F.col("pb")
                * F.log2(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("tb"),
        )
    )
    return sh.select(
        "source_a",
        "source_b",
        "shared_tokens",
        F.round(
            0.5 * (F.col("ta") + (1 - F.col("pa_sh")))
            + 0.5 * (F.col("tb") + (1 - F.col("pb_sh"))),
            6,
        ).alias("jsd_bits"),
        F.round(1 - 0.5 * F.col("pa_sh") - 0.5 * F.col("pb_sh"), 6).alias(
            "disjoint_mass"
        ),
    ).orderBy("source_a", "source_b")


@register(
    "llm_bigram_cond_entropy",
    """
    WITH d AS (
        SELECT string_split(text, ' ') AS arr
        FROM documents WHERE length(text) > 0
    ),
    bi AS (
        SELECT arr[i] AS w1, arr[i + 1] AS w2
        FROM d, LATERAL unnest(range(1, len(arr))) AS t(i)
    ),
    c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2
    ),
    c1 AS (
        SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM c2 GROUP BY 1
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2),
    hc AS (
        SELECT sum(CAST(c2.c AS DOUBLE) / n.n
                   * log2(CAST(c1.cw AS DOUBLE) / c2.c)) AS h_cond
        FROM c2 JOIN c1 ON c2.w1 = c1.w1 CROSS JOIN n
    ),
    hu AS (
        SELECT sum(CAST(c1.cw AS DOUBLE) / n.n
                   * log2(CAST(n.n AS DOUBLE) / c1.cw)) AS h_uni
        FROM c1 CROSS JOIN n
    )
    SELECT n.n AS n_bigrams,
           (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_contexts,
           (SELECT CAST(count(*) AS BIGINT) FROM c2) AS n_distinct_bigrams,
           round(hu.h_uni, 6) AS h_unigram,
           round(hc.h_cond, 6) AS h_conditional,
           round(hu.h_uni - hc.h_cond, 6) AS info_gain_bits,
           round(pow(2, hc.h_cond), 4) AS perplexity_cond
    FROM n, hc, hu
    """,
    tags=("llm", "text"),
)
def llm_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus conditional entropy H(W₂|W₁) = Σ p(w₁,w₂)·
    log₂(c(w₁·)/c(w₁,w₂)) over within-document adjacent bigram
    occurrences, against the context-marginal unigram entropy H(W₁)
    — their difference is the mutual information I(W₁;W₂), the bits
    one token of left context buys (Shannon 1951's printed-English
    experiment, run on the corpus); 2^H(W₂|W₁) is the bigram
    conditional perplexity floor a language model must beat. All
    probabilities are exact-int64-count ratios over the SAME bigram
    universe (the context marginal is the bigram table's own
    marginal, so H(W₁) and H(W₂|W₁) share a denominator and the
    chain rule holds exactly); floats enter at the log₂ chain.

    Scale shape: one positional bigram explode (map-side), one
    keyed bigram reduce, its context re-reduce, one broadcast join
    + reduce."""
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(F.split("text", " ").alias("arr"))
    )
    bi_expr = F.transform(
        F.sequence(F.lit(0), F.size("arr") - 2),
        lambda i: F.struct(
            F.element_at("arr", i + 1).alias("w1"),
            F.element_at("arr", i + 2).alias("w2"),
        ),
    )
    bi = d.select(
        F.explode(
            F.when(F.size("arr") >= 2, bi_expr).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    c1 = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("cw"))
    n = c2.agg(F.sum("c").cast("long").alias("n"))
    hc = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.col("c").cast("double")
                / F.col("n")
                * F.log2(F.col("cw").cast("double") / F.col("c"))
            ).alias("h_cond")
        )
    )
    hu = c1.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.col("cw").cast("double")
            / F.col("n")
            * F.log2(F.col("n").cast("double") / F.col("cw"))
        ).alias("h_uni")
    )
    nctx = c1.agg(F.count(F.lit(1)).cast("long").alias("n_contexts"))
    nbig = c2.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams")
    )
    return (
        n.crossJoin(F.broadcast(nctx))
        .crossJoin(F.broadcast(nbig))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hu))
        .select(
            F.col("n").alias("n_bigrams"),
            "n_contexts",
            "n_distinct_bigrams",
            F.round(F.col("h_uni"), 6).alias("h_unigram"),
            F.round(F.col("h_cond"), 6).alias("h_conditional"),
            F.round(F.col("h_uni") - F.col("h_cond"), 6).alias(
                "info_gain_bits"
            ),
            F.round(F.pow(F.lit(2), F.col("h_cond")), 4).alias(
                "perplexity_cond"
            ),
        )
    )
