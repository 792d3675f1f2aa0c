"""§2 extensions, hundred-seventy-second wave — the textual probit
and the normal-scores family it unlocks.

`probit_sql(p)` generates Acklam's (2003) piecewise-rational
inverse-normal approximation (|ε| < 1.15e-9 everywhere) as ONE
textual SQL expression — the wave155 generator device applied to a
special function neither engine ships. Both engines evaluate the
same polynomial string, and the generator is property-tested against
Python's statistics.NormalDist().inv_cdf (tests/test_hypothesis.py).
With Φ⁻¹ textual, per-row normal scores become computable at ANY
cardinality (the pinned-literal device of wave47/102 only worked for
bounded grids):

- agg_ppcc_filliben: the probability-plot correlation coefficient
  (Filliben 1975) normality test on order values — the
  quantile-quantile straightness number behind every Q-Q plot.
- agg_vanderwaerden: the van der Waerden normal-scores two-sample
  test — the rank test that recovers FULL Pitman efficiency 1.0
  against the t-test at the normal while keeping rank robustness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_A = (
    "-3.969683028665376e+01", "2.209460984245205e+02",
    "-2.759285104469687e+02", "1.383577518672690e+02",
    "-3.066479806614716e+01", "2.506628277459239e+00",
)
_B = (
    "-5.447609879822406e+01", "1.615858368580409e+02",
    "-1.556989798598866e+02", "6.680131188771972e+01",
    "-1.328068155288572e+01",
)
_C = (
    "-7.784894002430293e-03", "-3.223964580411365e-01",
    "-2.400758277161838e+00", "-2.549732539343734e+00",
    "4.374664141464968e+00", "2.938163982698783e+00",
)
_D = (
    "7.784695709041462e-03", "3.224671290700398e-01",
    "2.445134137142996e+00", "3.754408661907416e+00",
)
_P_LOW = "0.02425"


def _horner(coeffs, var: str) -> str:
    expr = f"({coeffs[0]})"
    for c in coeffs[1:]:
        expr = f"(({expr})*({var})+({c}))"
    return expr


def probit_sql(p: str) -> str:
    """Acklam's inverse-normal Φ⁻¹(p) as one textual SQL expression
    (shared verbatim by Spark `F.expr` and DuckDB). Valid for
    0 < p < 1; |error| < 1.15e-9."""
    qc = f"(({p}) - 0.5)"
    rc = f"({qc}*{qc})"
    central = (
        f"({qc}) * {_horner(_A, rc)} / ({_horner(_B, rc)}*({rc})+1.0)"
    )
    ql = f"sqrt(-2.0*ln({p}))"
    lower = f"{_horner(_C, ql)} / ({_horner(_D, ql)}*({ql})+1.0)"
    qu = f"sqrt(-2.0*ln(1.0-({p})))"
    upper = f"-({_horner(_C, qu)} / ({_horner(_D, qu)}*({qu})+1.0))"
    return (
        f"(CASE WHEN ({p}) < {_P_LOW} THEN {lower}"
        f" WHEN ({p}) > 1.0 - {_P_LOW} THEN {upper}"
        f" ELSE {central} END)"
    )


_PPCC_M = (
    "(CASE WHEN r = 1 THEN 1.0 - pow(0.5, 1.0/n)"
    " WHEN r = n THEN pow(0.5, 1.0/n)"
    " ELSE (r - 0.3175) / (n + 0.365) END)"
)


@register(
    "agg_ppcc_filliben",
    f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v, o_orderkey
        FROM orders
    ),
    rk AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS r,
               count(*) OVER () AS n
        FROM x
    ),
    sc AS (
        SELECT CAST(v AS DOUBLE) AS v,
               {probit_sql(_PPCC_M)} AS q
        FROM rk
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               avg(v) AS mv, avg(q) AS mq,
               sum(v * q) AS svq, sum(v * v) AS svv, sum(q * q) AS sqq
        FROM sc
    )
    SELECT n AS n_orders,
           round((svq - n * mv * mq)
                 / sqrt((svv - n * mv * mv) * (sqq - n * mq * mq)), 6)
               AS ppcc,
           round((svq - n * mv * mq)
                 / sqrt((svv - n * mv * mv) * (sqq - n * mq * mq)), 6)
               < 0.987 AS non_normal
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_ppcc_filliben(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filliben's probability-plot correlation coefficient (1975) on
    whole-dollar order values: the Pearson correlation between the
    sorted sample and the normal order-statistic medians
    Φ⁻¹(mᵢ) with Filliben's plotting positions (m₁ = 1−0.5^{{1/n}},
    mₙ = 0.5^{{1/n}}, else (i−0.3175)/(n+0.365)) — literally 'how
    straight is the Q-Q plot', the test statistic NIST's EDA
    handbook tabulates. PPCC near 1 = normal; the 0.987 screening
    literal is the tabulated 5% point for n≈1000, stated as a
    convention (the exact critical drifts slowly with n). Ranks come
    from the block-ranked exact core (orderkey tiebreak); Φ⁻¹ is the
    generated Acklam polynomial evaluated TEXTUALLY identically by
    both engines — the first unbounded-cardinality normal-scores
    computation in the registry (the earlier pinned-literal device
    only reached fixed grids).

    Scale shape: one block-ranked scan, a map-only probit
    projection, one 6-sum moment reduce."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(
        F.floor("o_totalprice").cast("long").alias("v"), "o_orderkey"
    )
    rk = api.exact_global_rank(x, "v", "o_orderkey", "r")
    cnt = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sc = rk.crossJoin(F.broadcast(cnt)).select(
        F.col("v").cast("double").alias("v"),
        F.expr(probit_sql(_PPCC_M)).alias("q"),
    )
    m = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("v").alias("mv"),
        F.avg("q").alias("mq"),
        F.sum(F.col("v") * F.col("q")).alias("svq"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    n, mv, mq = F.col("n"), F.col("mv"), F.col("mq")
    ppcc = (F.col("svq") - n * mv * mq) / F.sqrt(
        (F.col("svv") - n * mv * mv) * (F.col("sqq") - n * mq * mq)
    )
    return m.select(
        n.alias("n_orders"),
        F.round(ppcc, 6).alias("ppcc"),
        (F.round(ppcc, 6) < 0.987).alias("non_normal"),
    )


@register(
    "agg_vanderwaerden",
    f"""
    WITH x AS (
        SELECT c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               c_mktsegment = 'AUTOMOBILE' AS is_a
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    rk AS (
        SELECT is_a,
               row_number() OVER (ORDER BY cents, c_custkey) AS r,
               count(*) OVER () AS n
        FROM x
    ),
    sc AS (
        SELECT is_a,
               {probit_sql("CAST(r AS DOUBLE) / (n + 1)")} AS a
        FROM rk
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (is_a) AS BIGINT) AS na,
               CAST(count(*) FILTER (NOT is_a) AS BIGINT) AS nb,
               sum(CASE WHEN is_a THEN a ELSE 0 END) AS t1,
               sum(a * a) AS s2
        FROM sc
    )
    SELECT n AS n_pooled, na AS n_a, nb AS n_b,
           round(t1, 6) AS vdw_t,
           round(t1 / sqrt(CAST(na AS DOUBLE) * nb
                           / (CAST(n AS DOUBLE) * (n - 1)) * s2), 4)
               AS z_stat,
           abs(round(t1 / sqrt(CAST(na AS DOUBLE) * nb
                               / (CAST(n AS DOUBLE) * (n - 1)) * s2), 4))
               > 1.96 AS locations_differ
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_vanderwaerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Van der Waerden normal-scores two-sample test (1952/1953) on
    AUTOMOBILE vs BUILDING account balances: pooled ranks map to
    normal scores a(r) = Φ⁻¹(r/(n+1)), the statistic is
    T₁ = Σ_A a(rᵢ) with Var(T₁) = n_A·n_B/(n(n−1))·Σ a(r)² under the
    null (Σa(r) ≈ 0 by score symmetry), and z = T₁/√Var with the
    1.96 verdict on the ROUNDED z. The normal-scores transform is
    what makes this the asymptotically FULLY efficient rank test at
    the Gaussian (Pitman ARE = 1.0 vs the t-test, where
    agg_mann_whitney's Wilcoxon sits at 0.955) without surrendering
    rank robustness — the textbook reason to keep both in the
    toolbox. Ranks are the block-ranked exact core (custkey
    tiebreak); Φ⁻¹ is the shared generated Acklam polynomial.

    Scale shape: one block-ranked pooled scan, a map-only probit
    projection, one 1-row moment reduce."""
    c = tbl(spark, sf_dir, "customer")
    x = c.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    ).select(
        "c_custkey",
        (dec2("c_acctbal") * 100).cast("long").alias("cents"),
        (F.col("c_mktsegment") == "AUTOMOBILE").alias("is_a"),
    )
    rk = api.exact_global_rank(x, "cents", "c_custkey", "r")
    cnt = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sc = rk.crossJoin(F.broadcast(cnt)).select(
        "is_a",
        F.expr(probit_sql("CAST(r AS DOUBLE) / (n + 1)")).alias("a"),
    )
    s = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("is_a"), F.col("a")).otherwise(0.0)).alias("t1"),
        F.sum(F.col("a") * F.col("a")).alias("s2"),
    )
    n, na, nb = F.col("n"), F.col("na"), F.col("nb")
    z = F.col("t1") / F.sqrt(
        na.cast("double") * nb / (n.cast("double") * (n - 1)) * F.col("s2")
    )
    return s.select(
        n.alias("n_pooled"),
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round("t1", 6).alias("vdw_t"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) > 1.96).alias("locations_differ"),
    )
