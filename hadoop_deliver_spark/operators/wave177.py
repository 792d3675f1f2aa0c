"""§2 extensions, hundred-seventy-seventh wave — corpus drift and
the robust outlier rule.

- llm_corpus_drift: Jensen–Shannon drift of the term distribution
  between the first and second half of the corpus (doc_id order as
  ingestion time) — the single number a recurring-crawl pipeline
  watches to notice its input changing under it; llm_source_jsd
  compares SOURCES, this compares EPOCHS of the same feed.
- agg_hampel_identifier: the median ± 3·MADN outlier rule (Hampel
  1974) on order values — the 50%-breakdown robust identifier that
  replaces dq_outlier_iqr's Tukey fence when the data is already
  contaminated (the IQR fence's cutoffs move with the outliers it
  is hunting; MADN's barely do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_MADN = "1.482602218505602"  # 1/Φ⁻¹(3/4): MAD→σ consistency constant


@register(
    "llm_corpus_drift",
    """
    WITH med AS (
        SELECT CAST(max(doc_id) + min(doc_id) AS DOUBLE) / 2 AS mid
        FROM documents
    ),
    t AS (
        SELECT CASE WHEN d.doc_id < m.mid THEN 0 ELSE 1 END AS epoch,
               unnest(string_split(d.text, ' ')) AS w
        FROM documents d CROSS JOIN med m
        WHERE length(d.text) > 0
    ),
    cnt AS (
        SELECT w,
               CAST(count(*) FILTER (epoch = 0) AS BIGINT) AS c0,
               CAST(count(*) FILTER (epoch = 1) AS BIGINT) AS c1
        FROM t GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1,
               CAST(count(*) AS BIGINT) AS v
        FROM cnt
    ),
    terms AS (
        SELECT c.w,
               CAST(c.c0 AS DOUBLE) / t.n0 AS p,
               CAST(c.c1 AS DOUBLE) / t.n1 AS q
        FROM cnt c CROSS JOIN tot t
    ),
    kl AS (
        SELECT
            sum(CASE WHEN p > 0
                     THEN p * ln(p / ((p + q) / 2)) ELSE 0 END) AS kl_p,
            sum(CASE WHEN q > 0
                     THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) AS kl_q
        FROM terms
    )
    SELECT (SELECT n0 FROM tot) AS n_tokens_early,
           (SELECT n1 FROM tot) AS n_tokens_late,
           (SELECT v FROM tot) AS vocab_union,
           round((kl_p + kl_q) / 2 / ln(2.0), 6) AS jsd_bits,
           round(sqrt((kl_p + kl_q) / 2 / ln(2.0)), 6) AS js_distance,
           (kl_p + kl_q) / 2 / ln(2.0) > 0.05 AS drifted
    FROM kl
    """,
    tags=("llm", "text", "stats"),
)
def llm_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon drift between the corpus's two ingestion
    epochs (doc_id below/above the key-range midpoint — the pinned
    pseudo-time axis): JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M) with
    M = (P+Q)/2 over the UNION vocabulary (absent terms contribute
    only through the mixture — JSD needs no smoothing, which is why
    it is the drift metric of choice over raw KL for feeds whose
    vocabulary churns), reported in bits with its metric square root
    and a 0.05-bit screening flag (stated). llm_source_jsd asks
    whether SOURCES differ; a recurring-crawl pipeline watches THIS
    number per snapshot to notice the feed itself moving. Term
    counts are exact integers; probabilities and the KL sums are one
    fixed textual chain whose cross-term order wobble dies at
    round-6.

    Scale shape: one explode + one term-keyed two-count reduce with
    map-side combine, one 1-row total reduce, a broadcast second
    pass — the llm_source_kl plan."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    med = tbl(spark, sf_dir, "documents").agg(
        ((F.max("doc_id") + F.min("doc_id")).cast("double") / 2).alias(
            "mid"
        )
    )
    t = d.crossJoin(F.broadcast(med)).select(
        F.when(F.col("doc_id") < F.col("mid"), 0).otherwise(1).alias(
            "epoch"
        ),
        F.explode(F.split("text", " ")).alias("w"),
    )
    cnt = t.groupBy("w").agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = cnt.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        (F.col("c0").cast("double") / F.col("n0")).alias("p"),
        (F.col("c1").cast("double") / F.col("n1")).alias("q"),
        "n0",
        "n1",
        "v",
    )
    m = (F.col("p") + F.col("q")) / 2
    kl = terms.agg(
        F.max("n0").alias("n_tokens_early"),
        F.max("n1").alias("n_tokens_late"),
        F.max("v").alias("vocab_union"),
        F.sum(
            F.when(
                F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
            ).otherwise(0.0)
        ).alias("kl_p"),
        F.sum(
            F.when(
                F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
            ).otherwise(0.0)
        ).alias("kl_q"),
    )
    jsd = (F.col("kl_p") + F.col("kl_q")) / 2 / F.log(F.lit(2.0))
    return kl.select(
        "n_tokens_early",
        "n_tokens_late",
        "vocab_union",
        F.round(jsd, 6).alias("jsd_bits"),
        F.round(F.sqrt(jsd), 6).alias("js_distance"),
        (jsd > 0.05).alias("drifted"),
    )


@register(
    "agg_hampel_identifier",
    f"""
    WITH x AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderkey
        FROM orders
    ),
    rk AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS r,
               count(*) OVER () AS n
        FROM x
    ),
    med AS (
        SELECT max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN v END) AS med
        FROM rk
    ),
    dev AS (
        SELECT abs(x.v - m.med) AS ad, x.o_orderkey, m.med
        FROM x CROSS JOIN med m
    ),
    drk AS (
        SELECT ad, med, row_number() OVER (ORDER BY ad, o_orderkey) AS r,
               count(*) OVER () AS n
        FROM dev
    ),
    mad AS (
        SELECT max(med) AS med,
               max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN ad END) AS mad
        FROM drk
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS n_orders,
           round(m.med / 100.0, 2) AS median_dollars,
           round({_MADN} * m.mad / 100.0, 4) AS madn_dollars,
           CAST((SELECT count(*) FROM x
                 WHERE abs(x.v - m.med) > 3 * {_MADN} * m.mad)
                AS BIGINT) AS n_outliers,
           round(CAST((SELECT count(*) FROM x
                       WHERE abs(x.v - m.med) > 3 * {_MADN} * m.mad)
                      AS DOUBLE)
                 / (SELECT count(*) FROM x), 6) AS outlier_rate
    FROM mad m
    """,
    tags=("agg", "dq", "stats"),
)
def agg_hampel_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel's outlier identifier (1974) on order-value cents:
    flag x with |x − med| > 3·MADN where MADN = 1.4826·MAD (the
    shared consistency literal 1/Φ⁻¹(¾) rescales the median absolute
    deviation to a σ-equivalent). Both med and MAD are EXACT type-1
    order statistics at rank ⌈n/2⌉ (orderkey tiebreak, block-ranked
    core), so the rule has the full 50% breakdown the textbooks
    promise — while dq_outlier_iqr's Tukey fence quietly widens as
    contamination inflates the quartiles, Hampel's cutoffs are
    themselves robust, which is the entire argument for preferring
    it on already-dirty feeds. The deviation comparison is integer
    |Δcents| against one shared double threshold.

    Scale shape: two block-ranked scans (values, then absolute
    deviations about the 1-row median broadcast), one filtered count
    — no sort of the fact table, no windows beyond the block
    cores."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
        "o_orderkey",
    )
    rk = api.exact_global_rank(x, "v", "o_orderkey", "r")
    cnt = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        rk.crossJoin(F.broadcast(cnt))
        .agg(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("v"),
                )
            ).alias("med")
        )
    )
    dev = x.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("v") - F.col("med")).alias("ad"),
        "o_orderkey",
        "med",
        "v",
    )
    drk = api.exact_global_rank(
        dev.select("ad", "o_orderkey"), "ad", "o_orderkey", "r"
    )
    dcnt = drk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    mad = (
        drk.crossJoin(F.broadcast(dcnt))
        .agg(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("ad"),
                )
            ).alias("mad")
        )
    )
    madn = float(_MADN)
    j = dev.crossJoin(F.broadcast(mad))
    out = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.max("med") / 100.0, 2).alias("median_dollars"),
        F.round(madn * F.max("mad") / 100.0, 4).alias("madn_dollars"),
        F.sum(
            F.when(
                F.col("ad") > 3 * madn * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.round(
            F.sum(
                F.when(
                    F.col("ad") > 3 * madn * F.col("mad"), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("outlier_rate"),
    )
    return out
