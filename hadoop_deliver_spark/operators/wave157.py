"""§2 extensions, hundred-fifty-seventh wave — second-order digit
forensics and multiword term extraction.

- agg_benford_second_digit: Nigrini's second-digit Benford screen —
  the digit test auditors run AFTER the first-digit screen passes,
  because invented numbers that fake a plausible leading digit
  almost never fake the flatter second-digit law
  P(d) = Σ_k log₁₀(1 + 1/(10k+d)).
- llm_cvalue_terms: Frantzi–Ananiadou C-value multiword term
  extraction — the termhood score that DEMOTES n-grams which only
  occur as fragments of longer terms, the nesting correction that
  raw-frequency (llm_doc_top_terms) and graph (llm_textrank_keywords)
  extractors lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_B2_EXP = " + ".join(
    f"log10(1 + 1.0 / (10 * {k} + digit))" for k in range(1, 10)
)


@register(
    "agg_benford_second_digit",
    f"""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                    * 100 AS BIGINT) AS VARCHAR), 2, 1)
                    AS BIGINT) AS digit
        FROM orders
    ),
    d AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(count(*)) OVER () AS BIGINT) AS total
        FROM c GROUP BY digit
    ),
    x AS (
        SELECT digit, n,
               CAST(n AS DOUBLE) / total AS obs,
               {_B2_EXP} AS exp_share
        FROM d
    )
    SELECT digit, n,
           round(obs, 4) AS obs_share,
           round(exp_share, 4) AS exp_share,
           round(abs(obs - exp_share), 4) AS abs_dev,
           round((SELECT avg(abs(obs - exp_share)) FROM x), 4) AS mad
    FROM x ORDER BY digit
    """,
    tags=("agg", "dq"),
)
def agg_benford_second_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-digit Benford screen (Nigrini 1996) on exact order
    cents: the share of each SECOND significant digit d ∈ 0…9
    against P(d) = Σ_{{k=1..9}} log₁₀(1 + 1/(10k+d)) — a much
    flatter law (10.9% for 0 down to 8.5% for 9) that fabricated
    amounts rarely respect even when their first digits pass
    orders_benford, which is exactly why audit practice runs the
    two-digit battery in sequence. Digit extraction is exact string
    algebra on integer cents (every fixture amount has ≥ 5 digits,
    so position 2 always exists — at 10⁹ rows the same holds for any
    amount ≥ 10 cents); the 9-term expected-share sum is one shared
    textual expression, and MAD (Nigrini's conformity statistic)
    rides on every row as in the first-digit query.

    Scale shape: map-only digit extraction, one ≤10-row digit
    aggregate; the OVER () total and MAD run on the 10-row frame."""
    o = tbl(spark, sf_dir, "orders")
    c = o.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            2,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    d = c.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = d.agg(F.sum("n").cast("long").alias("total"))
    exp_share = None
    for k in range(1, 10):
        term = F.log10(1 + 1.0 / (10 * k + F.col("digit")))
        exp_share = term if exp_share is None else exp_share + term
    x = d.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("obs"),
        exp_share.alias("exp_share"),
    )
    mad = x.agg(
        F.avg(F.abs(F.col("obs") - F.col("exp_share"))).alias("mad")
    )
    return (
        x.crossJoin(F.broadcast(mad))
        .select(
            "digit",
            "n",
            F.round("obs", 4).alias("obs_share"),
            F.round("exp_share", 4).alias("exp_share"),
            F.round(F.abs(F.col("obs") - F.col("exp_share")), 4).alias(
                "abs_dev"
            ),
            F.round("mad", 4).alias("mad"),
        )
        .orderBy("digit")
    )


def _cvalue_oracle() -> str:
    grams = " UNION ALL ".join(
        f"""
        SELECT unnest(CASE WHEN len(t) >= {n}
                      THEN list_transform(range(1, len(t) - {n} + 2),
                           i -> array_to_string(t[i:i + {n} - 1], ' '))
                      ELSE [] END) AS g, {n} AS l
        FROM toks"""
        for n in (2, 3, 4)
    )
    subs = " UNION ALL ".join(
        f"""
        SELECT g AS b, l AS lb,
               unnest(list_transform(range(1, l - {m} + 2),
                      i -> array_to_string(
                          string_split(g, ' ')[i:i + {m} - 1], ' ')))
                   AS a
        FROM cand WHERE l > {m}"""
        for m in (2, 3)
    )
    return f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    allg AS ({grams}),
    cand AS (
        SELECT g, l, CAST(count(*) AS BIGINT) AS f
        FROM allg GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    sub AS ({subs}),
    nest0 AS (
        SELECT DISTINCT s.a, s.b, s.lb FROM sub s
        JOIN cand c ON c.g = s.a
    ),
    nest AS (
        SELECT n0.a AS g,
               CAST(count(*) AS BIGINT) AS n_sup,
               CAST(sum(c.f) AS BIGINT) AS f_sup
        FROM nest0 n0 JOIN cand c ON c.g = n0.b AND c.l = n0.lb
        GROUP BY 1
    ),
    scored AS (
        SELECT c.g AS term, c.l AS term_len, c.f AS freq,
               CAST(coalesce(n.n_sup, 0) AS BIGINT) AS nested_in,
               round(log2(CAST(c.l AS DOUBLE))
                     * (c.f - CASE WHEN n.n_sup IS NULL THEN 0.0
                              ELSE CAST(n.f_sup AS DOUBLE) / n.n_sup END),
                     4) AS cvalue
        FROM cand c LEFT JOIN nest n ON n.g = c.g
    )
    SELECT term, term_len, freq, nested_in, cvalue
    FROM (SELECT *, row_number() OVER (
              ORDER BY cvalue DESC, term) AS rn
          FROM scored)
    WHERE rn <= 20 ORDER BY cvalue DESC, term
    """


@register("llm_cvalue_terms", _cvalue_oracle(), tags=("llm", "text"))
def llm_cvalue_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-value multiword term extraction (Frantzi, Ananiadou & Mima
    1998) over the pooled documents corpus: candidates are 2-4-gram
    strings with corpus frequency ≥ 2; for a candidate a,
    C-value(a) = log₂|a| · f(a) when a is not nested in any longer
    candidate, and log₂|a| · (f(a) − (1/|T_a|)·Σ_{{b∈T_a}} f(b))
    otherwise, where T_a is the SET of longer candidates containing
    a contiguously (distinct (a,b) pairs — a term containing a twice
    still counts once, pinned). The nesting correction is what
    separates termhood from raw frequency: 'key order sort' occurring
    only inside 'fast key order sort' scores near zero here while
    topping llm_doc_top_terms. Top-20 by C-value with term-string
    tiebreak. Containment is enumerated, not searched: each longer
    candidate explodes its own ≤5 contiguous sub-grams and equi-joins
    the candidate set — no substring scans, no quadratic pairing.
    Counts are exact int64; log₂ of 2/3/4 and the division are one
    fixed textual expression rounded at 4.

    Scale shape: three bounded explodes (n-gram enumeration), one
    gram-keyed count with map-side combine, one sub-gram explode of
    the candidate table, two equi-joins, a 20-row bounded top-k."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = d.select(F.split("text", " ").alias("t"))
    gram_frames = []
    for n in (2, 3, 4):
        gram_frames.append(
            toks.select(
                F.explode(
                    F.expr(
                        f"CASE WHEN size(t) >= {n} THEN "
                        f"transform(sequence(1, size(t) - {n} + 1), "
                        f"i -> array_join(slice(t, i, {n}), ' ')) "
                        f"ELSE array() END"
                    )
                ).alias("g"),
                F.lit(n).alias("l"),
            )
        )
    allg = gram_frames[0].unionAll(gram_frames[1]).unionAll(gram_frames[2])
    cand = (
        allg.groupBy("g", "l")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .filter(F.col("f") >= 2)
    )
    sub_frames = []
    for m in (2, 3):
        sub_frames.append(
            cand.filter(F.col("l") > m).select(
                F.col("g").alias("b"),
                F.col("l").alias("lb"),
                F.explode(
                    F.expr(
                        f"transform(sequence(1, l - {m} + 1), "
                        f"i -> array_join(slice(split(g, ' '), i, {m}),"
                        f" ' '))"
                    )
                ).alias("a"),
            )
        )
    sub = sub_frames[0].unionAll(sub_frames[1])
    cand_g = cand.select(F.col("g").alias("a")).distinct()
    nest0 = sub.join(cand_g, "a").select("a", "b", "lb").distinct()
    cand_b = cand.select(
        F.col("g").alias("b"), F.col("l").alias("lb"), F.col("f").alias("fb")
    )
    nest = (
        nest0.join(cand_b, ["b", "lb"])
        .groupBy(F.col("a").alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sup"),
            F.sum("fb").cast("long").alias("f_sup"),
        )
    )
    scored = cand.join(nest, "g", "left").select(
        F.col("g").alias("term"),
        F.col("l").alias("term_len"),
        F.col("f").alias("freq"),
        F.coalesce(F.col("n_sup"), F.lit(0)).cast("long").alias("nested_in"),
        F.round(
            F.log2(F.col("l").cast("double"))
            * (
                F.col("f")
                - F.when(
                    F.col("n_sup").isNull(), F.lit(0.0)
                ).otherwise(
                    F.col("f_sup").cast("double") / F.col("n_sup")
                )
            ),
            4,
        ).alias("cvalue"),
    )
    return (
        scored.orderBy(F.col("cvalue").desc(), "term")
        .limit(20)
        .orderBy(F.col("cvalue").desc(), "term")
    )
