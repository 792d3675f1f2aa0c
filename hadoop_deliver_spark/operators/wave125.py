"""§2 extensions, hundred-twenty-fifth wave — embedding geometry and
distribution-free prediction.

- llm_embedding_anisotropy: Ethayarajh (2019)-style anisotropy
  diagnostic — the mean pairwise cosine of the normalized embedding
  cloud via the closed form (‖Σû‖² − n)/(n(n−1)): NO pairwise join,
  one component-wise sum; the geometry complement of
  llm_embedding_spectrum's eigenvalue view.
- agg_conformal_interval: split-conformal prediction interval
  (Vovk; Lei et al. 2018) for order value from a per-priority mean
  model — the distribution-free coverage guarantee, with the
  calibration quantile selected at EXACT integer rank on
  exactly-quantized residuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "llm_embedding_anisotropy",
    """
    WITH comp AS (
        SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    nrm AS (
        SELECT vec_id, sqrt(sum(x * x)) AS nv FROM comp GROUP BY 1
    ),
    unit AS (
        SELECT c.dim, c.x / n.nv AS ux
        FROM comp c JOIN nrm n ON c.vec_id = n.vec_id
    ),
    s AS (
        SELECT dim, sum(ux) AS sd, CAST(count(*) AS BIGINT) AS n
        FROM unit GROUP BY 1
    ),
    tot AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS d,
               sum(sd * sd) AS ss2,
               max(abs(sd)) AS max_abs_comp
        FROM s
    )
    SELECT n AS n_vectors, d AS dim,
           round((ss2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 6)
               AS mean_pairwise_cos,
           round(sqrt(ss2) / n, 6) AS mean_vector_norm,
           round(max_abs_comp / n, 6) AS max_mean_component,
           round((ss2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 6) > 0.5
               AS strongly_anisotropic
    FROM tot
    """,
    tags=("llm", "embedding"),
)
def llm_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding cloud (Ethayarajh 2019): the mean
    cosine between all n(n−1) ordered pairs of NORMALIZED vectors,
    computed without any pairwise join via the identity
    Σ_{i≠j} ûᵢ·ûⱼ = ‖Σû‖² − n — one per-dimension sum of unit
    components and a 64-term reduce. High mean cosine means the
    space collapsed toward a dominant direction (the common
    contextual-embedding pathology that makes raw cosine similarity
    uninformative); mean_vector_norm = ‖Σû‖/n is the same diagnosis
    as the centroid length. Float sums drift at summation-order ulp
    — round-6 absorbs; the verdict compares the ROUNDED statistic.

    Scale shape: one posexplode (map-side), one per-vector norm
    reduce, one broadcast-joined unit projection, one per-dim
    reduce (64 rows), one 1-row reduce. O(n·d) total, NO n² term."""
    emb = tbl(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    nrm = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv")
    )
    unit = comp.join(nrm, "vec_id").select(
        "dim", (F.col("x") / F.col("nv")).alias("ux")
    )
    s = unit.groupBy("dim").agg(
        F.sum("ux").alias("sd"), F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = s.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum(F.col("sd") * F.col("sd")).alias("ss2"),
        F.max(F.abs(F.col("sd"))).alias("max_abs_comp"),
    )
    mc = F.round(
        (F.col("ss2") - F.col("n"))
        / (F.col("n").cast("double") * (F.col("n") - 1)),
        6,
    )
    return tot.select(
        F.col("n").alias("n_vectors"),
        F.col("d").alias("dim"),
        mc.alias("mean_pairwise_cos"),
        F.round(F.sqrt(F.col("ss2")) / F.col("n"), 6).alias(
            "mean_vector_norm"
        ),
        F.round(F.col("max_abs_comp") / F.col("n"), 6).alias(
            "max_mean_component"
        ),
        (mc > 0.5).alias("strongly_anisotropic"),
    )


@register(
    "agg_conformal_interval",
    """
    WITH v AS (
        SELECT o_orderkey AS k, o_orderpriority AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'train' ELSE 'cal' END AS split
        FROM orders
    ),
    mdl AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(cents) AS BIGINT) AS sg
        FROM v WHERE split = 'train' GROUP BY 1
    ),
    res AS (
        SELECT v.k, v.split,
               CAST(abs(m.ng * v.cents - m.sg) * 1000 // m.ng AS BIGINT)
                   AS res_mc
        FROM v JOIN mdl m ON v.g = m.g
    ),
    calr AS (SELECT res_mc FROM res WHERE split = 'cal'),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calr),
    kq AS (SELECT n_cal, (9 * (n_cal + 1) + 9) // 10 AS kr FROM nc),
    grid AS (
        SELECT res_mc, CAST(count(*) AS BIGINT) AS c FROM calr GROUP BY 1
    ),
    cdf AS (
        SELECT res_mc, CAST(sum(c) OVER (ORDER BY res_mc
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    q AS (
        SELECT min(res_mc) AS qhat FROM cdf, kq WHERE cum >= kq.kr
    ),
    cov AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(CASE WHEN res_mc <= (SELECT qhat FROM q)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_in
        FROM res
    )
    SELECT (SELECT CAST(sum(ng) AS BIGINT) FROM mdl) AS n_train,
           kq.n_cal, kq.kr AS rank_k,
           round(q.qhat / 100000.0, 4) AS q_hat_dollars,
           round(2 * q.qhat / 100000.0, 4) AS interval_width,
           round(CAST(cov.n_in AS DOUBLE) / cov.n_all, 4)
               AS empirical_coverage
    FROM kq, q, cov
    """,
    tags=("aggregate", "stats"),
)
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90 % prediction interval for order value from
    the per-priority mean model: deterministic md5 half-split
    (train fits group means; calibration supplies residuals), then
    q̂ = the k-th smallest calibration residual at the EXACT integer
    rank k = ⌈0.9·(n_cal+1)⌉ — computed by the pure-integer formula
    (9(n+1)+9) div 10 (no float ceil) on a block-ranked residual
    CDF. The residual itself is exactly quantized BEFORE ranking:
    res = (|n_g·cents − s_g|·1000) div n_g millicents — integer
    products and one integer division, so the rank order is
    bit-identical across engines with no float-tie hazard. The
    distribution-free guarantee: P(|y − ŷ| ≤ q̂) ≥ 90 % for a fresh
    order; the empirical coverage over the full table is reported
    as the sanity check.

    Scale shape: one keyed train reduce (5 rows, broadcast back),
    one residual projection, one block-ranked CDF + 1-row rank
    probe, one coverage reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            "train",
        )
        .otherwise("cal")
        .alias("split"),
    )
    mdl = (
        v.filter(F.col("split") == "train")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("cents").cast("long").alias("sg"),
        )
    )
    res = v.join(F.broadcast(mdl), "g").select(
        "split",
        (
            F.abs(F.col("ng") * F.col("cents") - F.col("sg")) * 1000
        ).alias("num"),
        "ng",
    ).select(
        "split",
        F.expr("div(num, ng)").cast("long").alias("res_mc"),
    )
    calr = res.filter(F.col("split") == "cal")
    nc = calr.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    kq = nc.select(
        "n_cal",
        F.expr("div(9 * (n_cal + 1) + 9, 10)").cast("long").alias("kr"),
    )
    grid = calr.groupBy("res_mc").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cdf = exact_global_keyed_cumsum(grid, "res_mc", "c", "res_mc", "cum")
    q = (
        cdf.crossJoin(F.broadcast(kq))
        .filter(F.col("cum") >= F.col("kr"))
        .agg(F.min("res_mc").alias("qhat"))
    )
    cov = res.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.when(F.col("res_mc") <= F.col("qhat"), 1).otherwise(0))
        .cast("long")
        .alias("n_in"),
    )
    ntr = mdl.agg(F.sum("ng").cast("long").alias("n_train"))
    return (
        ntr.crossJoin(F.broadcast(kq))
        .crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(cov))
        .select(
            "n_train",
            "n_cal",
            F.col("kr").alias("rank_k"),
            F.round(F.col("qhat") / 100000.0, 4).alias("q_hat_dollars"),
            F.round(2 * F.col("qhat") / 100000.0, 4).alias(
                "interval_width"
            ),
            F.round(
                F.col("n_in").cast("double") / F.col("n_all"), 4
            ).alias("empirical_coverage"),
        )
    )
