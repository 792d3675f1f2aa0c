"""§2 extensions, ninety-second wave — memorization measurement and
the PRE association measure.

- llm_ngram_novelty: the novel-n-gram fraction — THE standard
  train/validation memorization metric of the LM-eval literature
  (reported for GPT-2/Gopher-class corpora): what share of the
  validation split's distinct word trigrams never occur in training?
  FULLY exact.
- agg_goodman_kruskal_tau: Goodman-Kruskal's τ (1954) — the
  proportional-reduction-in-error association for nominal×nominal
  tables, the PRE companion of the shipped λ (wave69) that uses
  squared proportions instead of modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_ngram_novelty",
    """
    WITH lab AS (
        SELECT CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd')
                    THEN 'val' ELSE 'train' END AS split,
               text
        FROM documents
        WHERE length(text) > 0
          AND substr(md5(text), 1, 1) NOT IN ('e', 'f')
    ),
    grams AS (
        SELECT DISTINCT split, g
        FROM (
            SELECT split,
                   array_to_string(list_slice(string_split(text, ' '),
                                              i, i + 2), ' ') AS g
            FROM lab,
                 LATERAL unnest(range(1,
                     len(string_split(text, ' ')) - 1)) AS t(i)
        )
    ),
    wide AS (
        SELECT g,
               CAST(max(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                    AS BIGINT) AS in_val,
               CAST(max(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                    AS BIGINT) AS in_train
        FROM grams GROUP BY g
    ),
    s AS (
        SELECT CAST(sum(in_val) AS BIGINT) AS n_val,
               CAST(sum(CASE WHEN in_val = 1 AND in_train = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST(sum(in_train) AS BIGINT) AS n_train
        FROM wide
    )
    SELECT n_train AS train_trigrams, n_val AS val_trigrams,
           n_novel AS novel_trigrams,
           round(CAST(n_novel AS DOUBLE) / n_val, 6) AS novelty,
           2 * n_novel >= n_val AS mostly_novel
    FROM s
    """,
    tags=("llm", "stats"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novel-n-gram fraction between the md5-hash train/val splits
    (the llm_split_divergence split convention — deterministic,
    engine-shared, no RNG): of the validation split's DISTINCT word
    trigrams, what share never occurs in training? THE memorization
    metric of the LM-eval literature — low novelty means the val
    split can be "solved" by copying training text, and the
    complement (1 − novelty) is the n-gram overlap that
    contamination reports quote. All counts are exact integers from
    a distinct-(split, gram) reduce and a gram-keyed pivot; the
    display is one division, and the mostly_novel verdict clears the
    ½ exactly: 2·novel ≥ val. Completes the split-quality panel:
    llm_split_divergence (distributional JSD), llm_split_leakage
    (near-dup pairs across splits), this (verbatim n-gram overlap).

    Scale shape: map-side trigram explode → distinct reduce on the
    gram key (an ordinary shuffle key; DF-style caps bound skew the
    same way the dedup joins do) → gram-keyed pivot → 1-row
    reduce."""
    d = tbl(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5("text"), 1, 1)
    lab = d.filter(
        (F.length("text") > 0) & ~first_hex.isin("e", "f")
    ).select(
        F.when(first_hex.isin("c", "d"), "val")
        .otherwise("train")
        .alias("split"),
        "text",
    )
    toks = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.array_join(F.slice(toks, i, 3), " "),
    )
    grams = (
        lab.select(
            "split",
            F.explode(
                F.when(F.size(toks) >= 3, tri).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("g"),
        )
        .distinct()
    )
    wide = grams.groupBy("g").agg(
        F.max(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("in_val"),
        F.max(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("in_train"),
    )
    s = wide.agg(
        F.sum("in_val").cast("long").alias("n_val"),
        F.sum(
            F.when(
                (F.col("in_val") == 1) & (F.col("in_train") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_novel"),
        F.sum("in_train").cast("long").alias("n_train"),
    )
    return s.select(
        F.col("n_train").alias("train_trigrams"),
        F.col("n_val").alias("val_trigrams"),
        F.col("n_novel").alias("novel_trigrams"),
        F.round(
            F.col("n_novel").cast("double") / F.col("n_val"), 6
        ).alias("novelty"),
        (2 * F.col("n_novel") >= F.col("n_val")).alias("mostly_novel"),
    )


@register(
    "agg_goodman_kruskal_tau",
    f"""
    WITH cells AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS r,
               o_orderstatus AS c,
               CAST(count(*) AS BIGINT) AS k
        FROM orders GROUP BY 1, 2
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN r = {i} AND c = '{s}' "
                f"THEN k END), 0) AS BIGINT) AS k{i}{s}"
                for i in range(1, 6)
                for s in ("F", "O", "P")
            )},
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN r = {i} THEN k END), 0)"
                f" AS BIGINT) AS r{i}"
                for i in range(1, 6)
            )},
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN c = '{s}' THEN k END), 0)"
                f" AS BIGINT) AS c{s}"
                for s in ("F", "O", "P")
            )},
            CAST(sum(k) AS BIGINT) AS n
        FROM cells
    ),
    e AS (
        SELECT n,
               1.0 - (CAST(cF AS DOUBLE) * cF + CAST(cO AS DOUBLE) * cO
                      + CAST(cP AS DOUBLE) * cP)
                     / (CAST(n AS DOUBLE) * n) AS e1,
               1.0 - ({" + ".join(
                   " + ".join(
                       f"CAST(k{i}{s} AS DOUBLE) * k{i}{s} / r{i}"
                       for s in ("F", "O", "P")
                   )
                   for i in range(1, 6)
               )}) / CAST(n AS DOUBLE) AS e2
        FROM piv
    )
    SELECT n AS n_orders,
           round(e1, 6) AS err_marginal,
           round(e2, 6) AS err_conditional,
           round((e1 - e2) / e1, 6) AS gk_tau,
           e2 < e1 AS priority_predicts_status
    FROM e
    """,
    tags=("agg", "stats"),
)
def agg_goodman_kruskal_tau(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman-Kruskal τ (1954): the proportional-reduction-in-error
    association of order priority (5 rows) with order status (3
    columns F/O/P) under PROPORTIONAL prediction — guess a status
    with the marginal probabilities (error E₁ = 1 − Σ(c_j/n)²), then
    with the within-priority conditionals (E₂ = 1 − ΣΣc_ij²/(r_i·n));
    τ = (E₁−E₂)/E₁ is the error fraction that knowing the priority
    removes. The squared-proportion companion of the shipped
    modal-prediction λ (wave69) — λ can be 0 on a dependent table
    whose modes align; τ cannot (τ = 0 ⇔ exact independence of the
    proportions). The full 5×3 grid PIVOTS to one row and both error
    terms assemble in ONE fixed textual order of exact-integer
    ratios (the events_rayleigh_hours device), so the verdict
    E₂ < E₁ compares bit-identical doubles; τ displays round-6.

    Scale shape: one keyed reduce to 15 cells, a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("r"),
        F.col("o_orderstatus").alias("c"),
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))
    piv = cells.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("r") == i) & (F.col("c") == s), F.col("k")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"k{i}{s}")
            for i in range(1, 6)
            for s in ("F", "O", "P")
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col("r") == i, F.col("k"))), F.lit(0)
            )
            .cast("long")
            .alias(f"r{i}")
            for i in range(1, 6)
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col("c") == s, F.col("k"))), F.lit(0)
            )
            .cast("long")
            .alias(f"c{s}")
            for s in ("F", "O", "P")
        ],
        F.sum("k").cast("long").alias("n"),
    )
    n = F.col("n")
    e1 = 1.0 - (
        F.col("cF").cast("double") * F.col("cF")
        + F.col("cO").cast("double") * F.col("cO")
        + F.col("cP").cast("double") * F.col("cP")
    ) / (n.cast("double") * n)
    inner = None
    for i in range(1, 6):
        for s in ("F", "O", "P"):
            t = (
                F.col(f"k{i}{s}").cast("double")
                * F.col(f"k{i}{s}")
                / F.col(f"r{i}")
            )
            inner = t if inner is None else inner + t
    e2 = 1.0 - inner / n.cast("double")
    e = piv.select("n", e1.alias("e1"), e2.alias("e2"))
    return e.select(
        n.alias("n_orders"),
        F.round("e1", 6).alias("err_marginal"),
        F.round("e2", 6).alias("err_conditional"),
        F.round((F.col("e1") - F.col("e2")) / F.col("e1"), 6).alias(
            "gk_tau"
        ),
        (F.col("e2") < F.col("e1")).alias("priority_predicts_status"),
    )
