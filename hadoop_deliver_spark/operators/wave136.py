"""§2 extensions, hundred-thirty-sixth wave — bounded-support fitting
and letter-based readability.

- agg_beta_fit_mom: Beta distribution method-of-moments fit of the
  discount rate (support pinned to [0, 0.10]) — completes the
  distribution-fit family (gamma/lognormal/weibull/GPD/gumbel) with
  the bounded-support case, plus the U-shape/J-shape verdicts the
  (α, β) quadrant encodes.
- llm_readability_panel: ARI and Coleman–Liau per source — the two
  LETTER-based readability grades (no syllable heuristic at all);
  the robustness complement of llm_flesch_kincaid, whose
  vowel-group syllable proxy is the weak link on noisy text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_beta_fit_mom",
    """
    WITH v AS (
        SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS pct
        FROM lineitem
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pct) AS BIGINT) AS s1,
               CAST(sum(CAST(pct AS HUGEINT) * pct) AS BIGINT) AS s2
        FROM v
    ),
    par AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / n / 10 AS m,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                   / (n - 1) / 100 AS var
        FROM mom
    ),
    ab AS (
        SELECT n, m, var,
               m * (m * (1 - m) / var - 1) AS alpha,
               (1 - m) * (m * (1 - m) / var - 1) AS beta
        FROM par
    )
    SELECT n AS n_rows,
           round(m, 6) AS mean_unit,
           round(var, 6) AS var_unit,
           round(alpha, 4) AS alpha,
           round(beta, 4) AS beta,
           round(alpha / (alpha + beta), 6) AS fitted_mean,
           alpha < 1 AND beta < 1 AS u_shaped,
           alpha < 1 AND beta >= 1 AS j_shaped_at_zero
    FROM ab
    """,
    tags=("aggregate", "stats"),
)
def agg_beta_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta method-of-moments fit of the discount rate rescaled to
    unit support (the schema caps discounts at 10 %, so u = d/0.10
    — a pinned support convention):
    α̂ = m(m(1−m)/v − 1), β̂ = (1−m)(m(1−m)/v − 1) from the exact
    integer first/second moments of the percent column. The (α, β)
    quadrant reads the SHAPE: both < 1 is U-shaped (mass at no
    discount AND max discount — a polarized pricing policy), α < 1 ≤
    β piles at zero, both > 1 is interior-modal. The fitted mean
    α/(α+β) returning the sample mean is the built-in MoM identity
    check. Bounded-support completion of the distribution-fit
    family; all moments PURE INTEGER, five float operations at the
    end.

    Scale shape: one map-side-combined 3-sum reduce, closed-form
    scalars."""
    li = tbl(spark, sf_dir, "lineitem")
    v = li.select((dec2("l_discount") * 100).cast("long").alias("pct"))
    mom = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pct").cast("long").alias("s1"),
        F.sum(F.col("pct").cast("decimal(38,0)") * F.col("pct"))
        .cast("long")
        .alias("s2"),
    )
    par = mom.select(
        "n",
        (F.col("s1").cast("double") / F.col("n") / 10).alias("m"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            )
            / (F.col("n") - 1)
            / 100
        ).alias("var"),
    )
    k = F.col("m") * (1 - F.col("m")) / F.col("var") - 1
    alpha = F.col("m") * k
    beta = (1 - F.col("m")) * k
    return par.select(
        F.col("n").alias("n_rows"),
        F.round(F.col("m"), 6).alias("mean_unit"),
        F.round(F.col("var"), 6).alias("var_unit"),
        F.round(alpha, 4).alias("alpha"),
        F.round(beta, 4).alias("beta"),
        F.round(alpha / (alpha + beta), 6).alias("fitted_mean"),
        ((alpha < 1) & (beta < 1)).alias("u_shaped"),
        ((alpha < 1) & (beta >= 1)).alias("j_shaped_at_zero"),
    )


@register(
    "llm_readability_panel",
    """
    WITH d AS (
        SELECT source, text FROM documents WHERE length(text) > 0
    ),
    per AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
               CAST(greatest(length(regexp_replace(text, '[^.!?]', '',
                    'g')), 1) AS BIGINT) AS sentences,
               CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                    AS BIGINT) AS letters
        FROM d
    ),
    agg AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(words) AS BIGINT) AS words,
               CAST(sum(sentences) AS BIGINT) AS sentences,
               CAST(sum(letters) AS BIGINT) AS letters
        FROM per GROUP BY 1
    )
    SELECT source, n_docs, words, sentences, letters,
           round(4.71 * (CAST(letters AS DOUBLE) / words)
                 + 0.5 * (CAST(words AS DOUBLE) / sentences)
                 - 21.43, 4) AS ari_grade,
           round(0.0588 * (100.0 * letters / words)
                 - 0.296 * (100.0 * sentences / words) - 15.8, 4)
               AS coleman_liau_grade
    FROM agg ORDER BY source
    """,
    tags=("llm", "text"),
)
def llm_readability_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI (Automated Readability Index, Senter & Smith 1967) and
    Coleman–Liau (1975) grades per source — the two readability
    formulas that use only LETTER counts, never syllables:
    ARI = 4.71·(chars/word) + 0.5·(words/sentence) − 21.43;
    CLI = 0.0588·L − 0.296·S − 15.8 with L = letters per 100 words,
    S = sentences per 100 words. On OCR-noisy or non-English text
    the vowel-group syllable proxy inside llm_flesch_kincaid
    degrades first — these two stay count-exact, which is why
    readability panels ship all three. Conventions pinned: letters
    = [a-zA-Z0-9] (strip-count), sentences = count of '.!?'
    characters floored at 1 per doc (a deliberate simpler convention
    than flesch's run-count — documented, shared by both engines),
    words = whitespace split. All counts PURE INTEGER.

    Scale shape: one map-side per-doc count projection, one keyed
    per-source reduce, two fixed-order formulas."""
    d = tbl(spark, sf_dir, "documents").filter(F.length("text") > 0)
    per = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.greatest(
            F.length(F.regexp_replace("text", "[^.!?]", "")), F.lit(1)
        )
        .cast("long")
        .alias("sentences"),
        F.length(F.regexp_replace("text", "[^a-zA-Z0-9]", ""))
        .cast("long")
        .alias("letters"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("sentences").cast("long").alias("sentences"),
        F.sum("letters").cast("long").alias("letters"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "letters",
        F.round(
            4.71 * (F.col("letters").cast("double") / F.col("words"))
            + 0.5 * (F.col("words").cast("double") / F.col("sentences"))
            - 21.43,
            4,
        ).alias("ari_grade"),
        F.round(
            0.0588 * (100.0 * F.col("letters") / F.col("words"))
            - 0.296 * (100.0 * F.col("sentences") / F.col("words"))
            - 15.8,
            4,
        ).alias("coleman_liau_grade"),
    ).orderBy("source")
