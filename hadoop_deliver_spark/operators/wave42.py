"""§2 extensions, sixty-sixth wave — heavy-tail index estimation,
Bayesian corpus comparison, overlap scoring of near-duplicates, and
inventory classification.

- agg_pareto_tail_hill: the Hill tail-index estimator over the
  top order values — how heavy is the revenue tail?
- llm_fightin_words: Monroe–Colaresi–Quinn log-odds-with-prior
  keyword extraction — which words distinguish each source from the
  rest of the corpus, with proper shrinkage.
- llm_rouge_pairs: ROUGE-1 precision/recall/F1 over the MinHash
  near-duplicate pairs — how much do flagged near-dups actually
  overlap, unigram by unigram.
- orders_aging_schedule: the 30/60/90-day aging report of open
  orders — exact day buckets against a corpus-derived as-of anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.llm import _EXACT_JACCARD_SQL
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_pareto_tail_hill",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderkey
        FROM orders
    ),
    top AS (
        SELECT v FROM o ORDER BY v DESC, o_orderkey LIMIT 201
    ),
    thr AS (SELECT CAST(min(v) AS BIGINT) AS xmin FROM top),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(round(1e6 * ln(v)) AS BIGINT)) AS BIGINT)
                   AS sln,
               CAST(max(t.xmin) AS BIGINT) AS xmin,
               CAST(max(CAST(round(1e6 * ln(t.xmin)) AS BIGINT)) AS BIGINT)
                   AS lnxmin
        FROM top CROSS JOIN thr t
        WHERE v > t.xmin
    )
    SELECT k, xmin,
           round(CAST(k AS DOUBLE) * 1e6 / (sln - k * lnxmin), 4)
               AS hill_alpha
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_pareto_tail_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) of order value:
    α̂ = k / Σᵢ ln(xᵢ/x_min) over the k observations strictly above
    the 201st-largest value — the standard heavy-tail exponent
    (α ≲ 2: infinite-variance, whale-dominated revenue where means
    mislead; large α: thin tail, agg_gumbel-style models apply);
    the TAIL-law counterpart of agg_gini's whole-distribution
    inequality. The top set is an exact (value, key)-ordered top-201
    (TakeOrderedAndProject — no global sort); each log ships as the
    exact int64 round(10⁶·ln·)), so Σln(x/x_min) = Σln x − k·ln x_min
    is order-independent integer arithmetic and α̂ is one fixed-order
    division; ties at the threshold drop out by exact integer
    compare in both engines.

    Scale shape: one top-k pass with per-partition pruning, a 1-row
    threshold broadcast, a 201-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("v"), "o_orderkey"
    )
    top = base.orderBy(F.desc("v"), "o_orderkey").limit(201).select("v")
    thr = top.agg(F.min("v").cast("long").alias("xmin"))
    s = (
        top.crossJoin(F.broadcast(thr))
        .filter(F.col("v") > F.col("xmin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(
                F.round(F.lit(1e6) * F.log(F.col("v").cast("double")))
                .cast("long")
            )
            .cast("long")
            .alias("sln"),
            F.max("xmin").cast("long").alias("xmin_v"),
            F.max(
                F.round(F.lit(1e6) * F.log(F.col("xmin").cast("double")))
                .cast("long")
            )
            .cast("long")
            .alias("lnxmin"),
        )
    )
    return s.select(
        "k",
        F.col("xmin_v").alias("xmin"),
        F.round(
            F.col("k").cast("double")
            * 1e6
            / (F.col("sln") - F.col("k") * F.col("lnxmin")),
            4,
        ).alias("hill_alpha"),
    )


@register(
    "llm_fightin_words",
    """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS y
        FROM toks GROUP BY 1, 2
    ),
    wtot AS (SELECT w, CAST(sum(y) AS BIGINT) AS yw FROM cnt GROUP BY w),
    stot AS (
        SELECT source, CAST(sum(y) AS BIGINT) AS ns FROM cnt
        GROUP BY source
    ),
    gtot AS (
        SELECT CAST(sum(yw) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS v
        FROM wtot
    ),
    z AS (
        SELECT c.source, c.w,
               ln((c.y + 0.5)
                  / (s.ns + 0.5 * g.v - c.y - 0.5))
               - ln((t.yw - c.y + 0.5)
                    / (g.nn - s.ns + 0.5 * g.v - (t.yw - c.y) - 0.5))
                   AS delta,
               sqrt(1.0 / (c.y + 0.5) + 1.0 / (t.yw - c.y + 0.5)) AS sd
        FROM cnt c
        JOIN wtot t ON t.w = c.w
        JOIN stot s ON s.source = c.source
        CROSS JOIN gtot g
    ),
    ranked AS (
        SELECT source, w,
               CAST(round(1e6 * delta / sd) AS BIGINT) AS z_scaled,
               row_number() OVER (PARTITION BY source
                                  ORDER BY CAST(round(1e6 * delta / sd)
                                                AS BIGINT) DESC, w) AS rk
        FROM z
    )
    SELECT source, rk, w AS term,
           round(CAST(z_scaled AS DOUBLE) / 1e6, 4) AS zeta
    FROM ranked WHERE rk <= 3 ORDER BY source, rk
    """,
    tags=("llm", "text", "stats"),
)
def llm_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Fightin' Words' keyword extraction (Monroe, Colaresi & Quinn
    2008): for each source, the top-3 terms by the z-scored log-odds
    ratio of source-vs-rest word use under a Dirichlet(0.5) prior —
    the Bayesian fix for both raw-frequency lists (dominated by
    stopwords) and plain log-odds (dominated by rare words): the
    prior shrinks low-count noise and the variance term
    1/(y+a) + 1/(y'+a) damps what's left. Counts are exact int64;
    each term's ζ = δ/√var is one fixed-order float expression of
    those integers and the 0.5 literals, shipped as the scaled
    integer round(10⁶·ζ) so the per-source top-3 ranking key is
    exact; ties break on the term.

    Scale shape: explode → (source, term) counts with map-side
    combine, two keyed joins against the term and source margins, a
    1-row corpus total broadcast (the ts_resample_gapfill pattern);
    the per-source rank window is vocab-sized — swap in the
    win_topk_per_group_salted core if a source's vocabulary outgrows
    a task."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    wtot = cnt.groupBy("w").agg(F.sum("y").cast("long").alias("yw"))
    stot = cnt.groupBy("source").agg(F.sum("y").cast("long").alias("ns"))
    gtot = wtot.agg(
        F.sum("yw").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    j = (
        cnt.join(wtot, "w")
        .join(stot, "source")
        .crossJoin(F.broadcast(gtot))
    )
    y = F.col("y")
    delta = F.log(
        (y + 0.5) / (F.col("ns") + 0.5 * F.col("v") - y - 0.5)
    ) - F.log(
        (F.col("yw") - y + 0.5)
        / (
            F.col("nn")
            - F.col("ns")
            + 0.5 * F.col("v")
            - (F.col("yw") - y)
            - 0.5
        )
    )
    sd = F.sqrt(1.0 / (y + 0.5) + 1.0 / (F.col("yw") - y + 0.5))
    zs = j.select(
        "source",
        "w",
        F.round(F.lit(1e6) * delta / sd).cast("long").alias("z_scaled"),
    )
    wr = Window.partitionBy("source").orderBy(F.desc("z_scaled"), "w")
    return (
        zs.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            "rk",
            F.col("w").alias("term"),
            F.round(F.col("z_scaled").cast("double") / 1e6, 4).alias(
                "zeta"
            ),
        )
        .orderBy("source", "rk")
    )


@register(
    "llm_rouge_pairs",
    f"""
    WITH pairs AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_EXACT_JACCARD_SQL})
        WHERE jaccard >= 0.5
    ),
    tok AS MATERIALIZED (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE length(text) > 0)
        GROUP BY 1, 2
    ),
    ov AS (
        SELECT p.doc_a, p.doc_b,
               CAST(sum(least(ta.c, tb.c)) AS BIGINT) AS clipped
        FROM pairs p
        JOIN tok ta ON ta.doc_id = p.doc_a
        JOIN tok tb ON tb.doc_id = p.doc_b AND tb.w = ta.w
        GROUP BY 1, 2
    ),
    dl AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok FROM tok
        GROUP BY doc_id
    )
    SELECT o.doc_a, o.doc_b, o.clipped,
           da.n_tok AS len_a, db.n_tok AS len_b,
           round(CAST(o.clipped AS DOUBLE) / da.n_tok, 4) AS rouge1_recall,
           round(CAST(o.clipped AS DOUBLE) / db.n_tok, 4)
               AS rouge1_precision,
           round(2.0 * o.clipped / (da.n_tok + db.n_tok), 4) AS rouge1_f1
    FROM ov o
    JOIN dl da ON da.doc_id = o.doc_a
    JOIN dl db ON db.doc_id = o.doc_b
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "text"),
)
def llm_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 overlap scoring (Lin 2004) of the MinHash near-
    duplicate pairs: for every pair the shingle-LSH pipeline flags
    (api.minhash_pairs, J ≥ 0.5 — the llm_dedup_minhash set), the
    clipped-unigram recall, precision and F1 that summarization
    evaluation uses — grading HOW overlapping each flagged pair is
    token-by-token, which the set-level Jaccard hides (a doc wholly
    CONTAINED in a longer one scores high recall / low precision).
    Clipped counts Σ min(c_a, c_b) and both lengths are exact int64;
    the three scores are single divisions. The engine takes the
    pairs from the deterministic MinHash pipeline; the oracle
    derives the same set from first-principles exact Jaccard
    (equality up to the documented ~1e-8 banding-miss probability —
    the llm_dedup_minhash contract).

    Scale shape: the pair set is near-dup-sized (tiny); token counts
    join per pair id — two keyed equi-joins with map-side-combined
    count inputs."""
    d = tbl(spark, sf_dir, "documents")
    pairs = api.minhash_pairs(d, "doc_id", "text", threshold=0.5).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    tok = (
        d.where(F.length("text") > 0)
        .select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ta = tok.select(
        F.col("doc_id").alias("doc_a"), "w", F.col("c").alias("ca")
    )
    tb = tok.select(
        F.col("doc_id").alias("doc_b2"),
        F.col("w").alias("w_b"),
        F.col("c").alias("cb"),
    )
    ov = (
        pairs.join(ta, "doc_a")
        .join(
            tb,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("w") == F.col("w_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.least(F.col("ca"), F.col("cb")))
            .cast("long")
            .alias("clipped")
        )
    )
    dl = tok.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n_tok"))
    da = dl.select(
        F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("len_a")
    )
    db = dl.select(
        F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("len_b")
    )
    return (
        ov.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "clipped",
            "len_a",
            "len_b",
            F.round(F.col("clipped").cast("double") / F.col("len_a"), 4)
            .alias("rouge1_recall"),
            F.round(F.col("clipped").cast("double") / F.col("len_b"), 4)
            .alias("rouge1_precision"),
            F.round(
                2.0 * F.col("clipped") / (F.col("len_a") + F.col("len_b")),
                4,
            ).alias("rouge1_f1"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "orders_aging_schedule",
    """
    WITH anchor AS (
        SELECT CAST(max(o_orderdate) AS DATE) AS asof FROM orders
    ),
    open_orders AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               date_diff('day', o.o_orderdate, a.asof) AS age_days
        FROM orders o CROSS JOIN anchor a
        WHERE o.o_orderstatus <> 'F'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-030'
                WHEN age_days <= 60 THEN '031-060'
                WHEN age_days <= 90 THEN '061-090'
                ELSE '090+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS open_cents,
           CAST(min(age_days) AS BIGINT) AS min_age,
           CAST(max(age_days) AS BIGINT) AS max_age
    FROM open_orders
    GROUP BY age_bucket ORDER BY age_bucket
    """,
    tags=("analytics",),
)
def orders_aging_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging schedule of open (non-finalized) orders — the standard
    accounts-receivable/operations aging report: bucket every open
    order by its age at the corpus as-of date (the max order date)
    into the conventional 30/60/90-day brackets, with order counts
    and open value per bracket — the report that drives escalation
    and working-capital review; the OPEN-pipeline complement of
    delivery_sla_report's completed-delivery latencies. Ages are
    exact integer day differences against a 1-row as-of anchor
    (corpus-derived, so the query is deterministic with no wall
    clock); bucket membership is pure integer comparison; value sums
    are exact DECIMAL cents.

    Scale shape: one predicate-pruned scan, a 1-row anchor broadcast
    (the ts_resample_gapfill pattern), one 4-key aggregate with
    map-side combine."""
    o = tbl(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("asof"))
    open_orders = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(anchor))
        .select(
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
            F.datediff(F.col("asof"), F.col("o_orderdate")).alias(
                "age_days"
            ),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-030")
        .when(F.col("age_days") <= 60, "031-060")
        .when(F.col("age_days") <= 90, "061-090")
        .otherwise("090+")
    )
    return (
        open_orders.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("open_cents"),
            F.min("age_days").cast("long").alias("min_age"),
            F.max("age_days").cast("long").alias("max_age"),
        )
        .orderBy("age_bucket")
    )
