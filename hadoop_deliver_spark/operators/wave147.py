"""§2 extensions, hundred-forty-seventh wave — shape-of-distribution
screens.

Two classic normality/shape statistics that read the SAME exact
integer power sums the moment family already trusts, each answering a
question agg_jarque_bera / agg_dagostino_k2 do not:

- agg_bimodality_coeff: Sarle's bimodality coefficient — is the
  distribution ONE hump or two? (JB only asks "is it Gaussian"; a
  symmetric 50/50 mixture sails through skewness yet screams here.)
- agg_geary_ratio: Geary's a = MAD/σ — the mean-absolute-deviation
  ratio test, historically MORE powerful than moment tests against
  kurtosis alternatives (D'Agostino 1970), with an exact-integer MAD
  core: Σ|n·v − Σv| is an integer, so a is one division of
  bit-identical quantities on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_bimodality_coeff",
    """
    WITH x AS (
        SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM customer
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
               CAST(sum(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS s3,
               CAST(sum(CAST(v AS HUGEINT) * v * v * v) AS HUGEINT) AS s4
        FROM x
    ),
    m AS (
        SELECT n,
               CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   AS m2,
               CAST(s3 AS DOUBLE) / n
                   - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                   + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n) AS m3,
               CAST(s4 AS DOUBLE) / n
                   - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                   + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s2 AS DOUBLE) / n)
                   - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   AS m4
        FROM s
    ),
    g AS (
        SELECT n,
               m3 / sqrt(m2 * m2 * m2)
                   * sqrt(CAST(n AS DOUBLE) * (n - 1)) / (n - 2) AS g1,
               ((n + 1.0) * (m4 / (m2 * m2) - 3) + 6)
                   * (n - 1.0) / ((n - 2.0) * (n - 3.0)) AS g2
        FROM m
    )
    SELECT n AS n_customers,
           round(g1, 4) AS skew_g1,
           round(g2, 4) AS ex_kurtosis_g2,
           round((g1 * g1 + 1)
                 / (g2 + 3 * (n - 1.0) * (n - 1.0)
                        / ((n - 2.0) * (n - 3.0))), 4) AS bimodality_b,
           round((g1 * g1 + 1)
                 / (g2 + 3 * (n - 1.0) * (n - 1.0)
                        / ((n - 2.0) * (n - 3.0))), 4)
               > 0.5556 AS bimodal_hint
    FROM g
    """,
    tags=("agg", "stats"),
)
def agg_bimodality_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sarle's bimodality coefficient (SAS 1990) on account-balance
    cents: b = (g₁² + 1) / (g₂ + 3(n−1)²/((n−2)(n−3))) from the
    bias-corrected sample skewness g₁ = m₃/m₂^1.5 · √(n(n−1))/(n−2)
    and excess kurtosis g₂ = ((n+1)(m₄/m₂² − 3) + 6)(n−1)/((n−2)(n−3)).
    b > 5/9 (the uniform distribution's value, pinned as the rounded
    0.5556 literal) hints at bimodality — the one shape question the
    Gaussian-referenced agg_jarque_bera / agg_dagostino_k2 cannot ask:
    a symmetric two-hump mixture has zero skew and LOW kurtosis, which
    is exactly what drives b up. Raw power sums Σv..Σv⁴ accumulate as
    exact DECIMAL(38)/HUGEINT integers (cents ≤ 10⁶ ⇒ Σv⁴ ≤ 10³³ at
    10⁹ rows — inside the 38-digit envelope), so every moment is one
    fixed textual expression over bit-identical inputs; the verdict
    compares the ROUNDED b against the shared literal.

    Scale shape: ONE global reduce (four power sums + count), then
    1-row closed-form scalars."""
    c = tbl(spark, sf_dir, "customer")
    x = c.select((dec2("c_acctbal") * 100).cast("long").alias("v"))
    vd = F.col("v").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
        F.sum(vd * F.col("v") * F.col("v")).alias("s3"),
        F.sum(vd * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    s2d = F.col("s2").cast("double") / n
    s3d = F.col("s3").cast("double") / n
    s4d = F.col("s4").cast("double") / n
    m = s.select(
        n.alias("n"),
        (s2d - mu * mu).alias("m2"),
        (s3d - 3 * mu * s2d + 2 * mu * mu * mu).alias("m3"),
        (
            s4d - 4 * mu * s3d + 6 * mu * mu * s2d - 3 * mu * mu * mu * mu
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    g1 = (
        m3
        / F.sqrt(m2 * m2 * m2)
        * F.sqrt(n.cast("double") * (n - 1))
        / (n - 2)
    )
    g2 = (
        ((n + F.lit(1.0)) * (m4 / (m2 * m2) - 3) + 6)
        * (n - F.lit(1.0))
        / ((n - F.lit(2.0)) * (n - F.lit(3.0)))
    )
    g = m.select(n.alias("n"), g1.alias("g1"), g2.alias("g2"))
    b = (F.col("g1") * F.col("g1") + 1) / (
        F.col("g2")
        + 3
        * (n - F.lit(1.0))
        * (n - F.lit(1.0))
        / ((n - F.lit(2.0)) * (n - F.lit(3.0)))
    )
    return g.select(
        n.alias("n_customers"),
        F.round(F.col("g1"), 4).alias("skew_g1"),
        F.round(F.col("g2"), 4).alias("ex_kurtosis_g2"),
        F.round(b, 4).alias("bimodality_b"),
        (F.round(b, 4) > 0.5556).alias("bimodal_hint"),
    )


@register(
    "agg_geary_ratio",
    """
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
        FROM x
    ),
    a AS (
        SELECT s.n, s.s1, s.s2,
               CAST(sum(CAST(abs(s.n * x.v - s.s1) AS HUGEINT))
                    AS HUGEINT) AS sad
        FROM x CROSS JOIN s
        GROUP BY 1, 2, 3
    ),
    r AS (
        SELECT n,
               CAST(sad AS DOUBLE)
                   / (n * sqrt(CAST(n AS DOUBLE) * s2
                               - CAST(s1 AS DOUBLE) * s1)) AS a_stat
        FROM a
    )
    SELECT n AS n_orders,
           round(a_stat, 6) AS geary_a,
           round((a_stat - 0.7978845608028654)
                 * sqrt(CAST(n AS DOUBLE)) / 0.21229776600008768, 4)
               AS z_stat,
           abs(round((a_stat - 0.7978845608028654)
                 * sqrt(CAST(n AS DOUBLE)) / 0.21229776600008768, 4))
               > 1.96 AS non_normal
    FROM r
    """,
    tags=("agg", "stats"),
)
def agg_geary_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's ratio test of normality (Geary 1935) on whole-dollar
    order totals: a = MAD/σ (population mean absolute deviation over
    population standard deviation), which equals √(2/π) ≈ 0.7979 under
    normality; z = (a − √(2/π))·√n / √(1 − 3/π) with the two constants
    pinned as shared 17-digit literals. Historically more powerful
    than moment tests against kurtosis alternatives (D'Agostino 1970)
    — the MAD numerator reacts to tail mass linearly where m₄ reacts
    quartically. The core is EXACT-integer by clearing denominators:
    MAD = Σ|n·v − Σv| / n² with Σ|n·v − Σv| an integer (n·v ≤ 6·10¹⁴
    even at 10⁹ rows — inside long; its sum inside the 38-digit
    envelope), and σ = √(n·Σv² − (Σv)²)/n, so a divides bit-identical
    integer-derived quantities on both engines; only the final display
    rounds. The two-pass shape (mean first, then |·| scan) is the
    1-row-broadcast cross-join pattern the NLJ guard allowlists.

    Scale shape: ONE global reduce for (n, Σv, Σv²), broadcast of that
    1-row frame onto a second scan for the absolute-deviation sum,
    then closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(F.floor("o_totalprice").cast("long").alias("v"))
    vd = F.col("v").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
    )
    a = (
        x.crossJoin(F.broadcast(s))
        .groupBy("n", "s1", "s2")
        .agg(
            F.sum(
                F.abs(F.col("n") * F.col("v") - F.col("s1")).cast(
                    "decimal(38,0)"
                )
            ).alias("sad")
        )
    )
    n = F.col("n")
    a_stat = F.col("sad").cast("double") / (
        n
        * F.sqrt(
            n.cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
    )
    r = a.select(n.alias("n"), a_stat.alias("a_stat"))
    z = (
        (F.col("a_stat") - 0.7978845608028654)
        * F.sqrt(n.cast("double"))
        / 0.21229776600008768
    )
    return r.select(
        n.alias("n_orders"),
        F.round(F.col("a_stat"), 6).alias("geary_a"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) > 1.96).alias("non_normal"),
    )
