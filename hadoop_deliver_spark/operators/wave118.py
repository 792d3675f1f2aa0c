"""§2 extensions, hundred-eighteenth wave — NLG corpus diversity and
regularized regression in closed form.

- llm_distinct_n: distinct-1/2/3 ratios per source (Li et al. 2016)
  — the standard text-generation diversity metric (unique n-grams /
  total n-grams); the corpus-health complement of
  llm_lexical_diversity (whose TTR covers only unigrams per doc).
- agg_ridge_closed_form: 2-predictor ridge regression in
  correlation form — (Z'Z + λI)⁻¹Z'y via the 2×2 adjugate, exact
  integer moments underneath; OLS (λ=0) and ridge (λ/n = 0.1)
  side-by-side with the shrinkage they imply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "llm_distinct_n",
    """
    WITH d AS (
        SELECT source, text, string_split(text, ' ') AS arr
        FROM documents WHERE length(text) > 0
    ),
    uni AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS u_tokens
        FROM (SELECT source, unnest(arr) AS tok FROM d)
        GROUP BY 1
    ),
    big AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT g) AS BIGINT) AS u_bigrams
        FROM (
            SELECT source,
                   array_to_string(list_slice(arr, i, i + 1), ' ') AS g
            FROM d, LATERAL unnest(range(1, len(arr))) AS t(i)
        )
        GROUP BY 1
    ),
    tri AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(count(DISTINCT g) AS BIGINT) AS u_trigrams
        FROM (
            SELECT source,
                   array_to_string(list_slice(arr, i, i + 2), ' ') AS g
            FROM d, LATERAL unnest(range(1, len(arr) - 1)) AS t(i)
        )
        GROUP BY 1
    )
    SELECT u.source, u.n_tokens,
           round(CAST(u.u_tokens AS DOUBLE) / u.n_tokens, 6) AS distinct_1,
           b.n_bigrams,
           round(CAST(b.u_bigrams AS DOUBLE) / b.n_bigrams, 6)
               AS distinct_2,
           t.n_trigrams,
           round(CAST(t.u_trigrams AS DOUBLE) / t.n_trigrams, 6)
               AS distinct_3
    FROM uni u
    JOIN big b ON u.source = b.source
    JOIN tri t ON u.source = t.source
    ORDER BY u.source
    """,
    tags=("llm", "text"),
)
def llm_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (Li et al. 2016 "A Diversity-Promoting
    Objective") per source: unique-n-gram / total-n-gram ratios for
    n = 1, 2, 3 on the whitespace tokenization every llm_* text op
    shares — low distinct-2/3 flags the repetition-collapse failure
    mode that per-doc TTR (llm_lexical_diversity) misses because it
    never compares ACROSS documents. N-gram construction is pinned:
    positions 1..len−n+1, space-joined, empty texts excluded; all
    counts PURE INTEGER, three float divisions at the end.

    Scale shape: three explode→groupBy aggregates per source (the
    bigram/trigram explodes are map-side; distinct counts shuffle on
    (source, gram)), one 3-way small join on source."""
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("source", F.split("text", " ").alias("arr"))
    )

    def grams(n: int):
        if n == 1:
            return d.select("source", F.explode("arr").alias("g"))
        expr = F.transform(
            F.sequence(F.lit(0), F.size("arr") - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at("arr", i + j + 1) for j in range(n)]
            ),
        )
        return d.select(
            "source",
            F.explode(
                F.when(F.size("arr") >= n, expr).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("g"),
        )

    def counted(n: int, total: str, uniq: str):
        return grams(n).groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias(total),
            F.countDistinct("g").cast("long").alias(uniq),
        )

    uni = counted(1, "n_tokens", "u_tokens")
    big = counted(2, "n_bigrams", "u_bigrams")
    tri = counted(3, "n_trigrams", "u_trigrams")
    return (
        uni.join(big, "source")
        .join(tri, "source")
        .select(
            "source",
            "n_tokens",
            F.round(
                F.col("u_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("distinct_1"),
            "n_bigrams",
            F.round(
                F.col("u_bigrams").cast("double") / F.col("n_bigrams"), 6
            ).alias("distinct_2"),
            "n_trigrams",
            F.round(
                F.col("u_trigrams").cast("double") / F.col("n_trigrams"), 6
            ).alias("distinct_3"),
        )
        .orderBy("source")
    )


@register(
    "agg_ridge_closed_form",
    """
    WITH v AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x2,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
        FROM lineitem
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS DOUBLE) AS s1,
               CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
               CAST(sum(x2) AS DOUBLE) AS s2,
               CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
               CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
               CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y
        FROM v
    ),
    corr AS (
        SELECT n,
               (n * s12 - s1 * s2)
                   / sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2))
                   AS r12,
               (n * s1y - s1 * sy)
                   / sqrt((n * s11 - s1 * s1) * (n * syy - sy * sy))
                   AS r1y,
               (n * s2y - s2 * sy)
                   / sqrt((n * s22 - s2 * s2) * (n * syy - sy * sy))
                   AS r2y
        FROM mom
    )
    SELECT n AS n_rows,
           round(r12, 6) AS r12, round(r1y, 6) AS r1y,
           round(r2y, 6) AS r2y,
           round((r1y - r12 * r2y) / (1 - r12 * r12), 6) AS beta1_ols,
           round((r2y - r12 * r1y) / (1 - r12 * r12), 6) AS beta2_ols,
           round((1.1 * r1y - r12 * r2y) / (1.1 * 1.1 - r12 * r12), 6)
               AS beta1_ridge,
           round((1.1 * r2y - r12 * r1y) / (1.1 * 1.1 - r12 * r12), 6)
               AS beta2_ridge,
           round(((1.1 * r1y - r12 * r2y) / (1.1 * 1.1 - r12 * r12))
                 / ((r1y - r12 * r2y) / (1 - r12 * r12)), 4)
               AS shrink1
    FROM corr
    """,
    tags=("aggregate", "stats"),
)
def agg_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor ridge regression of extended price on quantity
    and discount, in correlation form: with standardized variables
    Z'Z/n is the correlation matrix, so
    β_ridge = ((1+k)·r_xy − r₁₂·r_other)/((1+k)² − r₁₂²) with
    k = λ/n pinned at 0.1 — the 2×2 adjugate inverse in one closed
    form (the agg_hotelling_t2 device applied to regularization),
    OLS as the k = 0 special case, and the shrinkage ratio
    β_ridge/β_OLS the regularization path implies. All three
    correlations come from EXACT integer moments (HUGEINT /
    DECIMAL(38,0) cross-products) cast to double once; both engines
    then run the identical scalar algebra.

    Scale shape: one map-side-combined moment reduce over lineitem
    (9 exact sums), closed-form scalars on 1 row."""
    li = tbl(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        (dec2("l_discount") * 100).cast("long").alias("x2"),
        (dec2("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    mom = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum(dec("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(dec("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(dec("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(dec("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(dec("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    n = F.col("n")
    r12 = (n * F.col("s12") - F.col("s1") * F.col("s2")) / F.sqrt(
        (n * F.col("s11") - F.col("s1") * F.col("s1"))
        * (n * F.col("s22") - F.col("s2") * F.col("s2"))
    )
    r1y = (n * F.col("s1y") - F.col("s1") * F.col("sy")) / F.sqrt(
        (n * F.col("s11") - F.col("s1") * F.col("s1"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    r2y = (n * F.col("s2y") - F.col("s2") * F.col("sy")) / F.sqrt(
        (n * F.col("s22") - F.col("s2") * F.col("s2"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    b1o = (r1y - r12 * r2y) / (1 - r12 * r12)
    b2o = (r2y - r12 * r1y) / (1 - r12 * r12)
    b1r = (1.1 * r1y - r12 * r2y) / (1.1 * 1.1 - r12 * r12)
    b2r = (1.1 * r2y - r12 * r1y) / (1.1 * 1.1 - r12 * r12)
    return mom.select(
        F.col("n").alias("n_rows"),
        F.round(r12, 6).alias("r12"),
        F.round(r1y, 6).alias("r1y"),
        F.round(r2y, 6).alias("r2y"),
        F.round(b1o, 6).alias("beta1_ols"),
        F.round(b2o, 6).alias("beta2_ols"),
        F.round(b1r, 6).alias("beta1_ridge"),
        F.round(b2r, 6).alias("beta2_ridge"),
        F.round(b1r / b1o, 4).alias("shrink1"),
    )
