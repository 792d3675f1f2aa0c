"""§2 extensions, hundred-twenty-seventh wave — corpus byte hygiene
and heavy-tailed activity.

- llm_charclass_profile: per-source character-class composition
  (letters/digits/whitespace/punctuation) by exact regex-strip
  counting — the byte-hygiene profile a corpus card leads with;
  complements llm_text_stats (token-level) at the character level.
- events_powerlaw_mle: discrete power-law fit of per-user activity
  (Clauset-Shalizi-Newman continuous MLE at pinned xmin) with the
  exact-count KS distance against the fitted CCDF — the
  degree-distribution twin of agg_pareto_tail_hill (which fits
  order VALUES, not user activity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_XMIN = 5  # pinned activity threshold


@register(
    "llm_charclass_profile",
    r"""
    WITH d AS (
        SELECT source, text, CAST(length(text) AS BIGINT) AS n
        FROM documents WHERE length(text) > 0
    ),
    cls AS (
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_chars,
               CAST(sum(n - length(regexp_replace(text, '[a-zA-Z]', '',
                    'g'))) AS BIGINT) AS n_alpha,
               CAST(sum(n - length(regexp_replace(text, '[0-9]', '',
                    'g'))) AS BIGINT) AS n_digit,
               CAST(sum(n - length(regexp_replace(text, ' ', '',
                    'g'))) AS BIGINT) AS n_space
        FROM d GROUP BY 1
    )
    SELECT source, n_chars,
           round(CAST(n_alpha AS DOUBLE) / n_chars, 6) AS alpha_share,
           round(CAST(n_digit AS DOUBLE) / n_chars, 6) AS digit_share,
           round(CAST(n_space AS DOUBLE) / n_chars, 6) AS space_share,
           round(CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE)
                 / n_chars, 6) AS other_share,
           n_chars - n_alpha - n_digit - n_space AS n_other
    FROM cls ORDER BY source
    """,
    tags=("llm", "text"),
)
def llm_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: letter, digit, space
    and other shares, each counted EXACTLY as
    len(text) − len(regexp_replace(text, class, '')) — integer
    subtraction, no tokenizer, no sampling; the byte-hygiene line of
    a corpus card (a source whose other_share spikes is shipping
    markup, control bytes, or mojibake into training). The class
    regexes are pinned ASCII ([a-zA-Z], [0-9], literal space) so
    both engines count identical code points; all counts PURE
    INTEGER, four divisions at the end.

    Scale shape: one map-side regex-strip projection, one keyed
    reduce per source."""
    d = tbl(spark, sf_dir, "documents").filter(F.length("text") > 0)

    def stripped(pat: str):
        return F.length("text") - F.length(
            F.regexp_replace("text", pat, "")
        )

    cls = d.groupBy("source").agg(
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(stripped("[a-zA-Z]")).cast("long").alias("n_alpha"),
        F.sum(stripped("[0-9]")).cast("long").alias("n_digit"),
        F.sum(stripped(" ")).cast("long").alias("n_space"),
    )
    other = (
        F.col("n_chars") - F.col("n_alpha") - F.col("n_digit")
        - F.col("n_space")
    )
    return cls.select(
        "source",
        "n_chars",
        F.round(F.col("n_alpha").cast("double") / F.col("n_chars"), 6).alias(
            "alpha_share"
        ),
        F.round(F.col("n_digit").cast("double") / F.col("n_chars"), 6).alias(
            "digit_share"
        ),
        F.round(F.col("n_space").cast("double") / F.col("n_chars"), 6).alias(
            "space_share"
        ),
        F.round(other.cast("double") / F.col("n_chars"), 6).alias(
            "other_share"
        ),
        other.alias("n_other"),
    ).orderBy("source")


@register(
    "events_powerlaw_mle",
    f"""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS k
        FROM events GROUP BY 1
    ),
    tail AS (SELECT k FROM u WHERE k >= {_XMIN}),
    mle AS (
        SELECT CAST(count(*) AS BIGINT) AS n_tail,
               1.0 + count(*) / sum(ln(CAST(k AS DOUBLE) / {_XMIN}))
                   AS alpha
        FROM tail
    ),
    grid AS (
        SELECT k, CAST(count(*) AS BIGINT) AS c FROM tail GROUP BY 1
    ),
    cdfk AS (
        SELECT k, CAST(sum(c) OVER (ORDER BY k
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    ks AS (
        SELECT max(abs(CAST(cum AS DOUBLE) / m.n_tail
                       - (1.0 - pow(CAST(k AS DOUBLE) / {_XMIN},
                                    1.0 - m.alpha)))) AS ks_d
        FROM cdfk, mle m
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
           m.n_tail, {_XMIN} AS xmin,
           round(m.alpha, 4) AS alpha_hat,
           round((m.alpha - 1) / sqrt(m.n_tail), 4) AS alpha_se,
           round(ks.ks_d, 6) AS ks_distance,
           round(ks.ks_d * sqrt(m.n_tail), 4) AS ks_scaled
    FROM mle m, ks
    """,
    tags=("events", "stats"),
)
def events_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law fit of per-user event counts above the pinned
    x_min = 5 (Clauset–Shalizi–Newman 2009 continuous MLE):
    α̂ = 1 + n/Σln(k/x_min), SE = (α̂−1)/√n, and the KS distance
    between the EXACT empirical tail CDF (integer counts on the
    block-ranked activity grid) and the fitted CCDF
    (k/x_min)^(1−α). √n·KS is reported as the scale-free
    goodness score (CSN reject ≈ when a bootstrap would place it
    high — the bootstrap itself is RNG and deliberately out of
    scope). The degree-distribution twin of agg_pareto_tail_hill:
    same Hill-style estimator family, but on per-user ACTIVITY —
    the "is engagement scale-free" question.

    Scale shape: one per-user reduce, a filtered tail, one log
    reduce, one block-ranked grid CDF, one 1-row KS reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    e = tbl(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("k"))
    tail = u.filter(F.col("k") >= _XMIN).select("k")
    mle = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("k").cast("double") / _XMIN))
        ).alias("alpha"),
    )
    grid = tail.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cdfk = exact_global_keyed_cumsum(grid, "k", "c", "k", "cum")
    ks = cdfk.crossJoin(F.broadcast(mle)).agg(
        F.max(
            F.abs(
                F.col("cum").cast("double") / F.col("n_tail")
                - (
                    1.0
                    - F.pow(
                        F.col("k").cast("double") / _XMIN,
                        1.0 - F.col("alpha"),
                    )
                )
            )
        ).alias("ks_d")
    )
    nu = u.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        nu.crossJoin(F.broadcast(mle))
        .crossJoin(F.broadcast(ks))
        .select(
            "n_users",
            "n_tail",
            F.lit(_XMIN).cast("int").alias("xmin"),
            F.round(F.col("alpha"), 4).alias("alpha_hat"),
            F.round(
                (F.col("alpha") - 1) / F.sqrt(F.col("n_tail")), 4
            ).alias("alpha_se"),
            F.round(F.col("ks_d"), 6).alias("ks_distance"),
            F.round(F.col("ks_d") * F.sqrt(F.col("n_tail")), 4).alias(
                "ks_scaled"
            ),
        )
    )
