"""§2 extensions, hundred-seventy-fourth wave — completing the
normality battery's CDF wing.

- agg_anderson_darling_normal: the one-sample Anderson–Darling test
  against the FITTED normal with Stephens' small-sample factor —
  the tail-weighted quadratic CDF distance (AD weights deviations
  by 1/(F(1−F)), so it sees tail misfit that Lilliefors' sup-norm
  and CvM's unweighted quadratic both discount).
- agg_zhang_zk: Zhang's (2002) Z_K statistic — the
  likelihood-ratio-based re-weighting of KS that dominates the
  classical EDF tests in power across most alternatives; the modern
  member of the battery.

Both ride wave173's generated Φ polynomial; with wave51's moment
tests and wave172/173's PPCC/Lilliefors, the engine now carries the
full classical normality battery: moments, Q-Q correlation, sup-CDF,
quadratic-CDF, and likelihood-weighted CDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.wave173 import phi_sql
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_MOM_SQL = """
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
        FROM x
    ),
    rk AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS r
        FROM x
    ),
    z AS (
        SELECT rk.r, mom.n,
               (CAST(rk.v AS DOUBLE) - CAST(mom.s1 AS DOUBLE) / mom.n)
               / sqrt((CAST(mom.s2 AS DOUBLE)
                       - CAST(mom.s1 AS DOUBLE) * mom.s1 / mom.n)
                      / (mom.n - 1)) AS zz
        FROM rk CROSS JOIN mom
    )
"""


@register(
    "agg_anderson_darling_normal",
    f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v, o_orderkey
        FROM orders
    ),
    {_MOM_SQL},
    p AS (
        SELECT r, n,
               least(greatest({phi_sql("zz")}, 1e-15), 1.0 - 1e-15) AS ph
        FROM z
    ),
    terms AS (
        SELECT a.n,
               (2.0 * a.r - 1) * (ln(a.ph) + ln(1.0 - b.ph)) AS t
        FROM p a JOIN p b ON b.r = a.n - a.r + 1
    ),
    s AS (
        SELECT max(n) AS n, -max(n) - sum(t) / max(n) AS a2
        FROM terms
    )
    SELECT n AS n_orders,
           round(a2, 6) AS ad_a2,
           round(a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)),
                 6) AS ad_a2_star,
           round(a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)),
                 6) > 0.752 AS non_normal
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_anderson_darling_normal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Anderson–Darling one-sample test (1952) against the FITTED
    normal on whole-dollar order values:
    A² = −n − (1/n)·Σ(2i−1)·[ln Φ(z₍ᵢ₎) + ln(1−Φ(z₍ₙ₊₁₋ᵢ₎))], with
    Stephens' (1974) case-3 small-sample factor
    A*² = A²(1 + 0.75/n + 2.25/n²) and his 0.752 5% critical. The
    1/(F(1−F)) implicit weight makes AD the TAIL-sensitive member of
    the battery — a distribution matching in the body but thin/fat
    in the tails passes Lilliefors and fails here. The mirror term
    pairs rank i with n+1−i by an exact self-equi-join on the rank
    key; Φ is the shared generated polynomial clamped to
    [1e-15, 1−1e-15] (identically on both engines — ln of the
    far-tail zero would −inf otherwise); moments are exact integers.

    Scale shape: one moment reduce broadcast onto a block-ranked
    scan, a rank-mirror self-equi-join, one 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(
        F.floor("o_totalprice").cast("long").alias("v"), "o_orderkey"
    )
    vd = F.col("v").cast("decimal(38,0)")
    mom = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
    )
    rk = api.exact_global_rank(x, "v", "o_orderkey", "r")
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / n
        )
        / (n - 1)
    )
    z = rk.crossJoin(F.broadcast(mom)).select(
        "r", n.alias("n"), ((F.col("v").cast("double") - mu) / sd).alias("zz")
    )
    ph = F.least(
        F.greatest(F.expr(phi_sql("zz")), F.lit(1e-15)),
        F.lit(1.0 - 1e-15),
    )
    p = z.select("r", "n", ph.alias("ph"))
    a = p.select("r", "n", F.col("ph").alias("pha"))
    b = p.select(F.col("r").alias("rm"), F.col("ph").alias("phb"))
    terms = a.join(
        b, F.col("rm") == F.col("n") - F.col("r") + 1
    ).select(
        "n",
        (
            (2.0 * F.col("r") - 1)
            * (F.log(F.col("pha")) + F.log(1.0 - F.col("phb")))
        ).alias("t"),
    )
    s = terms.agg(
        F.max("n").alias("n"),
        (-F.max("n") - F.sum("t") / F.max("n")).alias("a2"),
    )
    star = F.col("a2") * (
        1.0
        + 0.75 / F.col("n")
        + 2.25 / (F.col("n").cast("double") * F.col("n"))
    )
    return s.select(
        F.col("n").alias("n_orders"),
        F.round("a2", 6).alias("ad_a2"),
        F.round(star, 6).alias("ad_a2_star"),
        (F.round(star, 6) > 0.752).alias("non_normal"),
    )


@register(
    "agg_zhang_zk",
    f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v, o_orderkey
        FROM orders
    ),
    {_MOM_SQL},
    p AS (
        SELECT r, n,
               least(greatest({phi_sql("zz")}, 1e-15), 1.0 - 1e-15) AS ph
        FROM z
    ),
    terms AS (
        SELECT n,
               (r - 0.5) * ln((r - 0.5) / (n * ph))
               + (n - r + 0.5) * ln((n - r + 0.5) / (n * (1.0 - ph)))
                   AS zk
        FROM p
    )
    SELECT max(n) AS n_orders,
           round(max(zk), 6) AS zhang_zk,
           round(max(zk), 6) > 3.3 AS non_normal
    FROM terms
    """,
    tags=("agg", "stats"),
)
def agg_zhang_zk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zhang's Z_K test (Jin Zhang 2002, JRSS-B) against the fitted
    normal: Z_K = maxᵢ [(i−½)·ln((i−½)/(n·Φ(z₍ᵢ₎))) +
    (n−i+½)·ln((n−i+½)/(n·(1−Φ(z₍ᵢ₎))))] — the likelihood-ratio
    re-weighting of the KS supremum that Zhang showed dominates
    KS/CvM/AD in power against most alternatives (each order
    statistic contributes its own binomial log-likelihood ratio
    rather than a raw ECDF gap). The 3.3 flag approximates Zhang's
    tabulated 5% point for large n (his Z_K criticals drift slowly
    in ln n; stated as the screening convention). Same fitted-z
    frame, clamped generated Φ, and block-ranked ranks as
    agg_anderson_darling_normal — the battery's modern member is a
    one-expression delta on the same plan.

    Scale shape: one moment reduce broadcast onto a block-ranked
    scan, a map-only Φ/likelihood projection, one max reduce."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(
        F.floor("o_totalprice").cast("long").alias("v"), "o_orderkey"
    )
    vd = F.col("v").cast("decimal(38,0)")
    mom = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
    )
    rk = api.exact_global_rank(x, "v", "o_orderkey", "r")
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / n
        )
        / (n - 1)
    )
    z = rk.crossJoin(F.broadcast(mom)).select(
        "r", n.alias("n"), ((F.col("v").cast("double") - mu) / sd).alias("zz")
    )
    ph = F.least(
        F.greatest(F.expr(phi_sql("zz")), F.lit(1e-15)),
        F.lit(1.0 - 1e-15),
    )
    p = z.select("r", "n", ph.alias("ph"))
    zk = (F.col("r") - 0.5) * F.log(
        (F.col("r") - 0.5) / (F.col("n") * F.col("ph"))
    ) + (F.col("n") - F.col("r") + 0.5) * F.log(
        (F.col("n") - F.col("r") + 0.5)
        / (F.col("n") * (1.0 - F.col("ph")))
    )
    terms = p.select("n", zk.alias("zk"))
    return terms.agg(
        F.max("n").alias("n_orders"),
        F.round(F.max("zk"), 6).alias("zhang_zk"),
        (F.round(F.max("zk"), 6) > 3.3).alias("non_normal"),
    )
