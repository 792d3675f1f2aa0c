"""§2 extensions, hundred-fifteenth wave — robust M-estimation:
one-step Huber location and the Tukey biweight midvariance.

- agg_huber_one_step: the one-step Huber M-estimator of location
  (Huber 1964; the "one-step" form of Bickel 1975) — start at the
  exact median, scale by 1.4826·MAD, take ONE Newton step with the
  clipped ψ; the efficiency upgrade over the plain median that
  agg_trimmed_mean / agg_winsorized_mean approximate by quantile
  cutting.
- agg_biweight_midvariance: Tukey's biweight midvariance (Lax 1985,
  Mosteller & Tukey 1977) — the smooth-rejection robust scale whose
  Gaussian efficiency (~86 %) beats MAD (~37 %); the scale-side
  companion of the Huber location step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CENTS_SQL = """
    v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    grid AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1
    ),
    cdf AS (
        SELECT cents, CAST(sum(c) OVER (ORDER BY cents
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    med AS (
        SELECT min(cents) AS med FROM cdf, n WHERE 2 * cum >= n.n
    ),
    dgrid AS (
        SELECT abs(cents - (SELECT med FROM med)) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM v GROUP BY 1
    ),
    dcdf AS (
        SELECT d, CAST(sum(c) OVER (ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM dgrid
    ),
    mad AS (SELECT min(d) AS mad FROM dcdf, n WHERE 2 * cum >= n.n)
"""


def _median_mad(spark: SparkSession, sf_dir: str):
    """Shared exact-integer (n, median, MAD) core on order cents:
    type-1 lower medians selected by integer rank (2·cum ≥ n) on
    block-ranked CDFs — no float percentile anywhere."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    grid = v.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = grid.agg(F.sum("c").cast("long").alias("n"))
    cdf = exact_global_keyed_cumsum(grid, "cents", "c", "cents", "cum")
    med = (
        cdf.crossJoin(F.broadcast(n))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("cents").alias("med"))
    )
    dgrid = (
        v.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("cents") - F.col("med")).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    dcdf = exact_global_keyed_cumsum(dgrid, "d", "c", "d", "cum")
    mad = (
        dcdf.crossJoin(F.broadcast(n))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("d").alias("mad"))
    )
    base = v.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))
    return base, n


@register(
    "agg_huber_one_step",
    f"""
    WITH {_CENTS_SQL},
    u AS (
        SELECT v.cents, m.med, a.mad,
               (v.cents - m.med) / (1.4826 * a.mad) AS u
        FROM v, med m, mad a
    ),
    step AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               max(med) AS median_cents, max(mad) AS mad_cents,
               sum(greatest(-1.345, least(1.345, u))) AS psum,
               CAST(sum(CASE WHEN abs(u) <= 1.345 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_in
        FROM u
    )
    SELECT n_orders, median_cents, mad_cents,
           n_orders - n_in AS n_clipped,
           round(1.4826 * mad_cents / 100, 4) AS robust_scale,
           round((median_cents + 1.4826 * mad_cents * psum / n_in) / 100,
                 4) AS huber_mean,
           round(median_cents / 100.0, 2) AS median_dollars
    FROM step
    """,
    tags=("aggregate", "stats"),
)
def agg_huber_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step Huber M-estimator of mean order value: start at the
    EXACT integer-rank median M₀, scale s = 1.4826·MAD (MAD also an
    exact integer-rank median of integer deviations), then one
    Newton step T₁ = M₀ + s·Σψ(u)/#{|u| ≤ k} with the clipped
    ψ(u) = clamp(u, ±k), k = 1.345 (95 % Gaussian efficiency).
    Convention pinned on both sides: type-1 lower medians
    (2·cum ≥ n), denominator = count INSIDE the clip (the Newton
    form, ψ' = 1 inside / 0 outside). Every comparison and the
    clip boundary use only IEEE-exact ops (+,−,×,÷) on exact
    integers, so the inlier set is bit-identical across engines;
    n_clipped is PURE INTEGER.

    Scale shape: two block-ranked CDFs (cents grid, deviation
    grid) with 1-row rank probes, then one broadcast-scalar pass
    over orders."""
    base, _ = _median_mad(spark, sf_dir)
    u = (F.col("cents") - F.col("med")) / (1.4826 * F.col("mad"))
    step = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max("med").alias("median_cents"),
        F.max("mad").alias("mad_cents"),
        F.sum(F.greatest(F.lit(-1.345), F.least(F.lit(1.345), u))).alias(
            "psum"
        ),
        F.sum(F.when(F.abs(u) <= 1.345, 1).otherwise(0))
        .cast("long")
        .alias("n_in"),
    )
    return step.select(
        "n_orders",
        "median_cents",
        "mad_cents",
        (F.col("n_orders") - F.col("n_in")).alias("n_clipped"),
        F.round(1.4826 * F.col("mad_cents") / 100, 4).alias("robust_scale"),
        F.round(
            (
                F.col("median_cents")
                + 1.4826 * F.col("mad_cents") * F.col("psum") / F.col("n_in")
            )
            / 100,
            4,
        ).alias("huber_mean"),
        F.round(F.col("median_cents") / 100.0, 2).alias("median_dollars"),
    )


@register(
    "agg_biweight_midvariance",
    f"""
    WITH {_CENTS_SQL},
    u AS (
        SELECT v.cents, m.med, a.mad,
               (v.cents - m.med) / (9.0 * a.mad) AS u
        FROM v, med m, mad a
    ),
    parts AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               max(med) AS median_cents, max(mad) AS mad_cents,
               CAST(sum(CASE WHEN abs(u) < 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_used,
               sum(CASE WHEN abs(u) < 1 THEN
                       CAST(cents - med AS DOUBLE) * (cents - med)
                       * pow(1 - u * u, 4) ELSE 0.0 END) AS num,
               sum(CASE WHEN abs(u) < 1 THEN
                       (1 - u * u) * (1 - 5 * u * u) ELSE 0.0 END) AS den
        FROM u
    ),
    sd AS (
        SELECT CAST(count(*) AS BIGINT) AS n2,
               CAST(sum(cents) AS BIGINT) AS s1,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2
        FROM v
    )
    SELECT p.n_orders, p.median_cents, p.mad_cents, p.n_used,
           round(sqrt(p.n_orders * p.num) / abs(p.den) / 100, 4)
               AS biweight_sd,
           round(sqrt((d.s2 - CAST(d.s1 AS DOUBLE) * d.s1 / d.n2) / d.n2)
                 / 100, 4) AS classic_sd,
           round(sqrt(p.n_orders * p.num) / abs(p.den)
                 / sqrt((d.s2 - CAST(d.s1 AS DOUBLE) * d.s1 / d.n2) / d.n2),
                 4) AS sd_ratio
    FROM parts p, sd d
    """,
    tags=("aggregate", "stats"),
)
def agg_biweight_midvariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey biweight midvariance of order value (Lax 1985): with
    u = (x − M)/(9·MAD) and only |u| < 1 contributing,
    BWMV = n·Σ(x−M)²(1−u²)⁴ / (Σ(1−u²)(1−5u²))² — the smooth
    down-weighting robust scale (~86 % Gaussian efficiency vs MAD's
    37 %), reported as a σ alongside the classical population σ and
    their ratio (≈1 on clean data, ≪1 under heavy tails). M and MAD
    are EXACT integer-rank medians; u and the inlier mask use only
    IEEE-exact ops so membership is bit-identical across engines;
    the classical σ comes from exact integer moments (HUGEINT /
    DECIMAL(38,0) squares).

    Scale shape: the shared two-CDF median/MAD core, then one
    broadcast-scalar pass plus one exact-moment reduce."""
    base, _ = _median_mad(spark, sf_dir)
    u = (F.col("cents") - F.col("med")) / (9.0 * F.col("mad"))
    inl = F.abs(u) < 1
    parts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max("med").alias("median_cents"),
        F.max("mad").alias("mad_cents"),
        F.sum(F.when(inl, 1).otherwise(0)).cast("long").alias("n_used"),
        F.sum(
            F.when(
                inl,
                (F.col("cents") - F.col("med")).cast("double")
                * (F.col("cents") - F.col("med"))
                * F.pow(1 - u * u, F.lit(4)),
            ).otherwise(0.0)
        ).alias("num"),
        F.sum(
            F.when(inl, (1 - u * u) * (1 - 5 * u * u)).otherwise(0.0)
        ).alias("den"),
    )
    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    sd = v.agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2"),
    )
    bi = F.sqrt(F.col("n_orders") * F.col("num")) / F.abs(F.col("den"))
    cl = F.sqrt(
        (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n2"))
        / F.col("n2")
    )
    return parts.crossJoin(F.broadcast(sd)).select(
        "n_orders",
        "median_cents",
        "mad_cents",
        "n_used",
        F.round(bi / 100, 4).alias("biweight_sd"),
        F.round(cl / 100, 4).alias("classic_sd"),
        F.round(bi / cl, 4).alias("sd_ratio"),
    )
