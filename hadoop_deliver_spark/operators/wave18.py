"""§2 extensions, forty-second wave — entropy inequality and
classifier calibration.

- agg_theil_index: the Theil-T inequality index of order value —
  the entropy-based, subgroup-DECOMPOSABLE companion to agg_gini
  (Gini can't attribute inequality to segments; Theil can).
- llm_calibration_ece: the reliability diagram + expected
  calibration error of the linear quality classifier against a
  deterministic outcome label — the eval that decides whether a
  filter's probabilities can be thresholded at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_theil_index",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    t AS (
        SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total FROM o
    )
    SELECT t.n, t.total,
           round(sum((CAST(o.cents AS DOUBLE) / t.total)
                     * ln(CAST(o.cents AS DOUBLE) * t.n / t.total)), 6)
               AS theil_t
    FROM o CROSS JOIN t
    GROUP BY t.n, t.total
    """,
    tags=("aggregate", "stats"),
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of order value: T = Σ (xᵢ/X)·
    ln(xᵢ·n/X) — zero under perfect equality, ln(n) under perfect
    concentration. The entropy-based companion to agg_gini with the
    property Gini lacks: T decomposes exactly into within-group +
    between-group terms, so a follow-up can ATTRIBUTE inequality to
    market segments. Inputs are exact cents and 1-row exact totals;
    the per-row share·ln term is the only float work (one pass,
    map-side, error ~1e-12 relative before the 1e-6 display
    rounding).

    Scale shape: one scalar reduce broadcast back onto one scan
    pass — no window, no keyed shuffle at all."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"))
    t = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    term = (F.col("cents").cast("double") / F.col("total")) * F.log(
        F.col("cents").cast("double") * F.col("n") / F.col("total")
    )
    return (
        base.crossJoin(F.broadcast(t))
        .groupBy("n", "total")
        .agg(F.round(F.sum(term), 6).alias("theil_t"))
    )


@register(
    "llm_calibration_ece",
    """
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               count(*) AS n_toks,
               CAST(sum((from_hex(substr(md5(term), 1, 2))::BIT::INT % 128)
                        * 37 % 101 - 50) AS BIGINT) AS score_num
        FROM toks GROUP BY doc_id, lang
    ),
    pr AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               1.0 / (1.0 + exp(-(CAST(score_num AS DOUBLE)
                                  / (101.0 * n_toks)))) AS p
        FROM scored
    ),
    binned AS (
        SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, y, p
        FROM pr
    ),
    b AS (
        SELECT bin,
               count(*) AS n,
               CAST(sum(y) AS BIGINT) AS pos,
               sum(p) AS psum
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM b)
    SELECT b.bin, b.n,
           round(CAST(b.pos AS DOUBLE) / b.n, 4) AS accuracy,
           round(b.psum / b.n, 4) AS confidence,
           round((SELECT sum(abs(CAST(b2.pos AS DOUBLE) / b2.n
                                 - b2.psum / b2.n) * b2.n / tot.nt)
                  FROM b b2 CROSS JOIN tot), 4) AS ece
    FROM b ORDER BY bin
    """,
    tags=("llm", "quality"),
)
def llm_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the
    linear quality classifier (llm_quality_classifier's scores)
    against the deterministic outcome 'document is English': decile
    confidence bins, per-bin accuracy vs mean confidence, and
    ECE = Σ |acc_b − conf_b|·n_b/N on every row — the eval that
    says whether a filter's probabilities mean anything before a
    pipeline thresholds on them (Guo et al. 2017 made ECE the
    standard readout). Scores are exact-integer-derived so the bin
    assignment (floor(p·10)) is cross-engine stable; only the
    per-bin confidence sums are float accumulations.

    Scale shape: one token explode + keyed aggregate (the
    classifier pass), one ≤10-row bin aggregate, 1-row total
    broadcast."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    bkt = (
        F.expr("cast(conv(substring(md5(term), 1, 2), 16, 10) as int)") % 128
    )
    w = (bkt * 37) % 101 - 50
    scored = toks.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum(w).cast("long").alias("score_num"),
    )
    p = 1.0 / (
        1.0
        + F.exp(
            -(F.col("score_num").cast("double") / (101.0 * F.col("n_toks")))
        )
    )
    pr = scored.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        p.alias("p"),
    )
    binned = pr.select(
        F.least(F.floor(F.col("p") * 10).cast("long"), F.lit(9)).alias(
            "bin"
        ),
        "y",
        "p",
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("p").alias("psum"),
    )
    tot = b.agg(F.sum("n").cast("long").alias("nt"))
    gap = F.abs(
        F.col("pos").cast("double") / F.col("n") - F.col("psum") / F.col("n")
    )
    ece = (
        b.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(gap * F.col("n") / F.col("nt")), 4
            ).alias("ece")
        )
    )
    return (
        b.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n",
            F.round(F.col("pos").cast("double") / F.col("n"), 4).alias(
                "accuracy"
            ),
            F.round(F.col("psum") / F.col("n"), 4).alias("confidence"),
            "ece",
        )
        .orderBy("bin")
    )
