"""§2 extensions, hundred-seventy-third wave — the textual normal
CDF and two more normal-scores classics.

`phi_sql(x)` generates the Abramowitz–Stegun 26.2.17 normal-CDF
approximation (|ε| < 7.5e-8) as one textual SQL expression — the
forward companion of wave172's probit generator, same device, same
property-test discipline.

- agg_lilliefors: the Lilliefors (1967) normality test — KS against
  the FITTED normal, the correction the plain agg_ks_test cannot
  make (estimating μ̂, σ̂ from the data shrinks the null distribution;
  using raw KS criticals there is anti-conservative).
- agg_gaussian_rank_corr: the Gaussian rank correlation (Boudt,
  Cornelissen & Croux 2012) between account balance and realized
  spend — a correlation with Spearman's 50% breakdown robustness
  but FULL efficiency at the bivariate normal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.wave172 import probit_sql
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_PHI_B = (
    "0.319381530", "-0.356563782", "1.781477937",
    "-1.821255978", "1.330274429",
)
_PHI_P = "0.2316419"
_INV_SQRT_2PI = "0.3989422804014327"


def phi_sql(x: str) -> str:
    """Standard normal CDF Φ(x) as one textual SQL expression
    (Abramowitz & Stegun 26.2.17, |error| < 7.5e-8), shared verbatim
    by Spark `F.expr` and DuckDB."""
    ax = f"abs({x})"
    t = f"(1.0/(1.0+{_PHI_P}*{ax}))"
    poly = (
        f"((((({_PHI_B[4]})*{t}+({_PHI_B[3]}))*{t}+({_PHI_B[2]}))*{t}"
        f"+({_PHI_B[1]}))*{t}+({_PHI_B[0]}))*{t}"
    )
    upper = f"(1.0 - {_INV_SQRT_2PI}*exp(-0.5*{ax}*{ax})*({poly}))"
    return f"(CASE WHEN ({x}) >= 0 THEN {upper} ELSE 1.0 - {upper} END)"


@register(
    "agg_lilliefors",
    f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v, o_orderkey
        FROM orders
    ),
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
    ),
    dev AS (
        SELECT n,
               greatest(CAST(r AS DOUBLE) / n - {phi_sql("zz")},
                        {phi_sql("zz")} - (CAST(r AS DOUBLE) - 1) / n)
                   AS d
        FROM z
    )
    SELECT max(n) AS n_orders,
           round(max(d), 6) AS lilliefors_d,
           round(0.886 / sqrt(CAST(max(n) AS DOUBLE)), 6) AS crit_05,
           round(max(d), 6) > 0.886 / sqrt(CAST(max(n) AS DOUBLE))
               AS non_normal
    FROM dev
    """,
    tags=("agg", "stats"),
)
def agg_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors normality test (1967) on whole-dollar order
    values: the KS distance between the ECDF and the normal FITTED
    to the same data, D = maxᵢ max(i/n − Φ(z₍ᵢ₎), Φ(z₍ᵢ₎) − (i−1)/n)
    with z from exact integer moments (sample s), against the
    asymptotic 5% critical 0.886/√n (Lilliefors' Monte-Carlo table's
    large-n row — the point of the test: fitting μ̂, σ̂ SHRINKS the
    null KS distribution, so plain KS criticals over-accept; this is
    the corrected screen, complementing the moment-based
    agg_jarque_bera and the correlation-based agg_ppcc_filliben
    with the CDF-distance view). Φ is the generated A&S 26.2.17
    polynomial evaluated textually identically by both engines
    (property-tested against the stdlib CDF); ranks are the
    block-ranked exact core.

    Scale shape: one exact-moment reduce broadcast onto a
    block-ranked scan, a map-only Φ projection, one max reduce."""
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
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n)
        / (n - 1)
    )
    z = rk.crossJoin(F.broadcast(mom)).select(
        "r",
        n.alias("n"),
        ((F.col("v").cast("double") - mu) / sd).alias("zz"),
    )
    phi = F.expr(phi_sql("zz"))
    dev = z.select(
        "n",
        F.greatest(
            F.col("r").cast("double") / F.col("n") - phi,
            phi - (F.col("r").cast("double") - 1) / F.col("n"),
        ).alias("d"),
    )
    return dev.agg(
        F.max("n").alias("n_orders"),
        F.round(F.max("d"), 6).alias("lilliefors_d"),
        F.round(0.886 / F.sqrt(F.max("n").cast("double")), 6).alias(
            "crit_05"
        ),
        (
            F.round(F.max("d"), 6)
            > 0.886 / F.sqrt(F.max("n").cast("double"))
        ).alias("non_normal"),
    )


@register(
    "agg_gaussian_rank_corr",
    f"""
    WITH spend AS (
        SELECT o_custkey AS ck,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS sp
        FROM orders GROUP BY 1
    ),
    pair AS (
        SELECT c.c_custkey AS ck,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS bal,
               s.sp
        FROM customer c JOIN spend s ON s.ck = c.c_custkey
    ),
    rx AS (
        SELECT ck, row_number() OVER (ORDER BY bal, ck) AS rb,
               row_number() OVER (ORDER BY sp, ck) AS rs,
               count(*) OVER () AS n
        FROM pair
    ),
    sc AS (
        SELECT {probit_sql("CAST(rb AS DOUBLE) / (n + 1)")} AS qb,
               {probit_sql("CAST(rs AS DOUBLE) / (n + 1)")} AS qs,
               {probit_sql("CAST(rb AS DOUBLE) / (n + 1)")}
                 * {probit_sql("CAST(rb AS DOUBLE) / (n + 1)")} AS qb2
        FROM rx
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(qb * qs) / sum(qb2), 6) AS gauss_rank_corr,
           abs(round(sum(qb * qs) / sum(qb2), 6)) > 0.05
               AS correlated_hint
    FROM sc
    """,
    tags=("agg", "stats"),
)
def agg_gaussian_rank_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gaussian rank correlation (Boudt, Cornelissen & Croux 2012)
    between customer account balance and realized total spend:
    r_G = Σ Φ⁻¹(rᵢˣ/(n+1))·Φ⁻¹(rᵢʸ/(n+1)) / Σ Φ⁻¹(i/(n+1))² — the
    normal-scores correlation whose denominator is the same score
    sum for any margin (computed here as Σqb² — identical by rank
    bijection). It keeps Spearman's qualitative robustness (ranks
    first) yet is FULLY efficient at the bivariate normal and, unlike
    Kendall/Spearman, needs no consistency transform to estimate the
    normal ρ. Ranks per margin are block-ranked exact cores (ck
    tiebreak); Φ⁻¹ is wave172's shared Acklam polynomial; the 0.05
    flag is a stated screening literal.

    Scale shape: one keyed spend reduce + one equi-join, two
    block-ranked scans, a map-only probit projection, one 1-row
    reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sp")
    )
    pair = c.join(spend, c.c_custkey == spend.ck).select(
        F.col("c_custkey").alias("ck2"),
        (dec2("c_acctbal") * 100).cast("long").alias("bal"),
        "sp",
    )
    r1 = api.exact_global_rank(pair, "bal", "ck2", "rb")
    r2 = api.exact_global_rank(r1, "sp", "ck2", "rs")
    cnt = r2.agg(F.count(F.lit(1)).cast("long").alias("n"))
    qb = F.expr(probit_sql("CAST(rb AS DOUBLE) / (n + 1)"))
    qs = F.expr(probit_sql("CAST(rs AS DOUBLE) / (n + 1)"))
    sc = r2.crossJoin(F.broadcast(cnt)).select(
        qb.alias("qb"), qs.alias("qs"), (qb * qb).alias("qb2")
    )
    rg = F.sum(F.col("qb") * F.col("qs")) / F.sum("qb2")
    return sc.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(rg, 6).alias("gauss_rank_corr"),
        (F.abs(F.round(rg, 6)) > 0.05).alias("correlated_hint"),
    )
