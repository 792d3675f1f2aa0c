"""§2 extensions, ninety-second wave — paired-marginal and
stratified-association homogeneity classics (published-method
cadence).

- customers_stuart_maxwell: the Stuart-Maxwell test (1955/1970) of
  marginal homogeneity on the 3×3 spend-tercile transition matrix —
  the k-category McNemar, fully exact-integer.
- agg_breslow_day: the Breslow-Day test (1980) of odds-ratio
  homogeneity across the agg_mantel_haenszel strata — the check
  that the MH pooled odds ratio is even meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₂ 5% ×10⁶ (Stuart-Maxwell exact verdict), χ²₄ 5% (Breslow-Day,
# 5 strata − 1)
_CHI2_2_95_1E6 = 5991465
_CHI2_4_95 = "9.487729"

_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")


@register(
    "customers_stuart_maxwell",
    f"""
    WITH spend AS (
        SELECT o_custkey,
               CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
                    THEN 1 ELSE 2 END AS half,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    both_halves AS (
        SELECT o_custkey FROM spend GROUP BY o_custkey
        HAVING count(*) = 2
    ),
    rk AS (
        SELECT s.o_custkey, s.half,
               row_number() OVER (PARTITION BY s.half
                                  ORDER BY s.cents, s.o_custkey) AS r,
               count(*) OVER (PARTITION BY s.half) AS n
        FROM spend s JOIN both_halves USING (o_custkey)
    ),
    ter AS (
        SELECT o_custkey, half, 1 + (3 * (r - 1)) // n AS q
        FROM rk
    ),
    trans AS (
        SELECT a.q AS q1, b.q AS q2, CAST(count(*) AS BIGINT) AS c
        FROM ter a JOIN ter b
          ON a.o_custkey = b.o_custkey AND a.half = 1 AND b.half = 2
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN q1 = {i} AND q2 = {j}"
                f" THEN c END), 0) AS BIGINT) AS n{i}{j}"
                for i in range(1, 4)
                for j in range(1, 4)
            )},
            CAST(sum(c) AS BIGINT) AS nn
        FROM trans
    ),
    dv AS (
        SELECT nn,
               CAST(n11 + n12 + n13 - n11 - n21 - n31 AS HUGEINT) AS d1,
               CAST(n21 + n22 + n23 - n12 - n22 - n32 AS HUGEINT) AS d2,
               CAST(n11 + n12 + n13 + n11 + n21 + n31
                    - 2 * n11 AS HUGEINT) AS v11,
               CAST(n21 + n22 + n23 + n12 + n22 + n32
                    - 2 * n22 AS HUGEINT) AS v22,
               CAST(-(n12 + n21) AS HUGEINT) AS v12
        FROM piv
    )
    SELECT nn AS n_customers,
           round(CAST(v22 * d1 * d1 - 2 * v12 * d1 * d2
                      + v11 * d2 * d2 AS DOUBLE)
                 / CAST(v11 * v22 - v12 * v12 AS DOUBLE), 4)
               AS chi2_stat,
           1000000 * (v22 * d1 * d1 - 2 * v12 * d1 * d2
                      + v11 * d2 * d2)
               > {_CHI2_2_95_1E6} * (v11 * v22 - v12 * v12)
               AS marginals_shifted
    FROM dv
    """,
    tags=("analytics", "stats"),
)
def customers_stuart_maxwell(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stuart-Maxwell test (Stuart 1955, Maxwell 1970) of marginal
    homogeneity on the customers' spend-TERCILE transition matrix
    between the two fixture halves (boundary literal 1998-01-01,
    the customers_shorrocks_mobility frame with k = 3) — the
    k-category McNemar: did the tercile DISTRIBUTION itself shift,
    as opposed to individual churn (Shorrocks) or symmetric
    disagreement (McNemar)? With d_i = n_i· − n_·i and the 2×2
    covariance V11 = n1·+n·1−2n11, V22 = n2·+n·2−2n22, V12 =
    −(n12+n21), χ² = (V22d1² − 2V12d1d2 + V11d2²)/(V11V22 − V12²)
    ~ χ²₂ — and because every ingredient is an exact transition
    count, BOTH the statistic's numerator/denominator AND the
    verdict 10⁶·num > 5991465·den are fully EXACT integers — no
    float anywhere. Terciles use the balanced exact cut
    1 + 3(r−1)÷n (the agg_fleiss_kappa discretization) on
    stratified block-ranked ranks (api.exact_stratified_rank — the
    per-half window never caps parallelism at 2).

    Scale shape: one keyed reduce to per-(customer, half) spend,
    stratified block-ranked ranks, a 9-cell transition reduce, a
    1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    both = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 2)
        .select("o_custkey")
    )
    joined = spend.join(both, "o_custkey")
    ranked = api.exact_stratified_rank(
        joined, "half", "cents", ["cents", "o_custkey"], "r"
    )
    cnt = ranked.groupBy("half").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ter = ranked.join(F.broadcast(cnt), "half").select(
        "o_custkey",
        "half",
        (1 + F.expr("(3 * (r - 1)) div n")).alias("q"),
    )
    t1 = ter.filter(F.col("half") == 1).select(
        "o_custkey", F.col("q").alias("q1")
    )
    t2 = ter.filter(F.col("half") == 2).select(
        "o_custkey", F.col("q").alias("q2")
    )
    trans = (
        t1.join(t2, "o_custkey")
        .groupBy("q1", "q2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    piv = trans.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("q1") == i) & (F.col("q2") == j),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n{i}{j}")
            for i in range(1, 4)
            for j in range(1, 4)
        ],
        F.sum("c").cast("long").alias("nn"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    r1 = F.col("n11") + F.col("n12") + F.col("n13")
    r2 = F.col("n21") + F.col("n22") + F.col("n23")
    k1 = F.col("n11") + F.col("n21") + F.col("n31")
    k2 = F.col("n12") + F.col("n22") + F.col("n32")
    dv = piv.select(
        "nn",
        (r1 - k1).cast("decimal(38,0)").alias("d1"),
        (r2 - k2).cast("decimal(38,0)").alias("d2"),
        (r1 + k1 - 2 * F.col("n11")).cast("decimal(38,0)").alias("v11"),
        (r2 + k2 - 2 * F.col("n22")).cast("decimal(38,0)").alias("v22"),
        (-(F.col("n12") + F.col("n21")))
        .cast("decimal(38,0)")
        .alias("v12"),
    )
    d1, d2 = F.col("d1"), F.col("d2")
    v11, v22, v12 = F.col("v11"), F.col("v22"), F.col("v12")
    num = v22 * d1 * d1 - 2 * v12 * d1 * d2 + v11 * d2 * d2
    den = v11 * v22 - v12 * v12
    return dv.select(
        F.col("nn").alias("n_customers"),
        F.round(num.cast("double") / den.cast("double"), 4).alias(
            "chi2_stat"
        ),
        (1000000 * num > _CHI2_2_95_1E6 * den).alias(
            "marginals_shifted"
        ),
    )


def _bd_sql() -> str:
    """Generate the Breslow-Day oracle — per-region expanded columns
    in fixed region order (textual twin of the Spark assembly)."""
    piv_cols = ", ".join(
        f"max(CASE WHEN region = '{r}' THEN {m} END) AS {m}_{i}"
        for i, r in enumerate(_REGIONS)
        for m in ("a", "b", "c", "d", "n")
    )
    adn = " + ".join(
        f"CAST(a_{i} AS DOUBLE) * d_{i} / n_{i}" for i in range(5)
    )
    bcn = " + ".join(
        f"CAST(b_{i} AS DOUBLE) * c_{i} / n_{i}" for i in range(5)
    )
    per = []
    for i in range(5):
        r1 = f"CAST(a_{i} + b_{i} AS DOUBLE)"
        c1 = f"CAST(a_{i} + c_{i} AS DOUBLE)"
        nd = f"CAST(n_{i} AS DOUBLE)"
        per.append(
            f"({nd} - {r1} - {c1}) + psi * ({r1} + {c1}) AS qb_{i}, "
            f"1 - psi AS qa_{i}, "
            f"-psi * {r1} * {c1} AS qc_{i}, "
            f"{r1} AS r1_{i}, {c1} AS c1_{i}, {nd} AS nd_{i}, "
            f"CAST(a_{i} AS DOUBLE) AS ad_{i}"
        )
    roots = []
    for i in range(5):
        disc = f"sqrt(qb_{i} * qb_{i} - 4 * qa_{i} * qc_{i})"
        x1 = f"((-qb_{i} + {disc}) / (2 * qa_{i}))"
        x2 = f"((-qb_{i} - {disc}) / (2 * qa_{i}))"
        lo = f"greatest(0.0, r1_{i} + c1_{i} - nd_{i})"
        hi = f"least(r1_{i}, c1_{i})"
        lin = f"(-qc_{i} / qb_{i})"
        roots.append(
            f"CASE WHEN abs(qa_{i}) < 1e-12 THEN {lin} "
            f"WHEN {x1} >= {lo} AND {x1} <= {hi} THEN {x1} "
            f"ELSE {x2} END AS at_{i}"
        )
    terms = " + ".join(
        f"(ad_{i} - at_{i}) * (ad_{i} - at_{i})"
        f" * (1 / at_{i} + 1 / (r1_{i} - at_{i})"
        f" + 1 / (c1_{i} - at_{i})"
        f" + 1 / (nd_{i} - r1_{i} - c1_{i} + at_{i}))"
        for i in range(5)
    )
    return f"""
    WITH base AS (
        SELECT r.r_name AS region,
               (c.c_acctbal >= 4500) AS exposed,
               (substr(o.o_orderpriority, 1, 1) IN ('1', '2')) AS hit
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    strata AS (
        SELECT region,
               CAST(count(*) FILTER (exposed AND hit) AS BIGINT) AS a,
               CAST(count(*) FILTER (exposed AND NOT hit) AS BIGINT) AS b,
               CAST(count(*) FILTER (NOT exposed AND hit) AS BIGINT) AS c,
               CAST(count(*) FILTER (NOT exposed AND NOT hit) AS BIGINT)
                   AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY region
    ),
    piv AS (SELECT {piv_cols} FROM strata),
    psi_t AS (
        SELECT *, ({adn}) / ({bcn}) AS psi FROM piv
    ),
    quad AS (
        SELECT psi, {", ".join(per)} FROM psi_t
    ),
    sol AS (
        SELECT psi,
               {", ".join(f"ad_{i}, r1_{i}, c1_{i}, nd_{i}"
                          for i in range(5))},
               {", ".join(roots)}
        FROM quad
    ),
    bd AS (
        SELECT psi, {terms} AS x2 FROM sol
    )
    SELECT round(psi, 4) AS mh_odds_ratio,
           round(x2, 4) AS bd_stat,
           x2 > {_CHI2_4_95} AS odds_ratios_heterogeneous
    FROM bd
    """


@register(
    "agg_breslow_day",
    _bd_sql(),
    tags=("agg", "stats"),
)
def agg_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day test (1980) of odds-ratio HOMOGENEITY across the
    agg_mantel_haenszel strata — the mandatory companion: MH pools a
    common odds ratio over the five regions, Breslow-Day asks
    whether one common ratio even exists (heterogeneous strata make
    the pooled ψ̂ meaningless). Per stratum the expected count ã
    under ψ̂_MH solves the quadratic (1−ψ)ã² + ((n−r1−c1) +
    ψ(r1+c1))ã − ψr1c1 = 0, taking the admissible root in
    [max(0, r1+c1−n), min(r1, c1)] (selection by the SAME textual
    CASE on both engines; |1−ψ| < 1e-12 falls back to the linear
    root r1c1/n, shared guard); Ṽ = (1/ã + 1/(r1−ã) + 1/(c1−ã) +
    1/(n−r1−c1+ã))⁻¹ and X² = Σ(a−ã)²/Ṽ ~ χ²₄. The five (a,b,c,d,n)
    tables are exact int64 pivots of the MH frame (acctbal ≥ 4500
    exposure × urgent-or-high outcome, stratified by region);
    ψ̂_MH = Σ(ad/n)/Σ(bc/n) and the whole quadratic/root/variance
    chain assemble in ONE fixed textual order of doubles (the
    agg_mantel_haenszel fixed-sum device). Verdict X² > χ²₄(0.95)
    shared literal. No Tarone correction (stated knob: the
    uncorrected 1980 statistic; the correction term is O(1/ΣṼ)).

    Scale shape: the fact table reduces through broadcast dimension
    joins to FIVE stratum rows; everything after is a 1-row
    pivot."""
    o = tbl(spark, sf_dir, "orders")
    cst = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(cst), o["o_custkey"] == cst["c_custkey"])
        .join(F.broadcast(nat), cst["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            (F.col("c_acctbal") >= 4500).alias("exposed"),
            F.substring("o_orderpriority", 1, 1)
            .isin("1", "2")
            .alias("hit"),
        )
    )
    strata = base.groupBy("region").agg(
        F.count(F.when(F.col("exposed") & F.col("hit"), F.lit(1)))
        .cast("long")
        .alias("a"),
        F.count(F.when(F.col("exposed") & ~F.col("hit"), F.lit(1)))
        .cast("long")
        .alias("b"),
        F.count(F.when(~F.col("exposed") & F.col("hit"), F.lit(1)))
        .cast("long")
        .alias("c"),
        F.count(F.when(~F.col("exposed") & ~F.col("hit"), F.lit(1)))
        .cast("long")
        .alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    piv = strata.agg(
        *[
            F.max(F.when(F.col("region") == r, F.col(m))).alias(
                f"{m}_{i}"
            )
            for i, r in enumerate(_REGIONS)
            for m in ("a", "b", "c", "d", "n")
        ]
    )
    adn = bcn = None
    for i in range(5):
        t1 = (
            F.col(f"a_{i}").cast("double")
            * F.col(f"d_{i}")
            / F.col(f"n_{i}")
        )
        t2 = (
            F.col(f"b_{i}").cast("double")
            * F.col(f"c_{i}")
            / F.col(f"n_{i}")
        )
        adn = t1 if adn is None else adn + t1
        bcn = t2 if bcn is None else bcn + t2
    psi_t = piv.select("*", (adn / bcn).alias("psi"))
    quad_cols = [F.col("psi")]
    for i in range(5):
        r1 = (F.col(f"a_{i}") + F.col(f"b_{i}")).cast("double")
        c1 = (F.col(f"a_{i}") + F.col(f"c_{i}")).cast("double")
        nd = F.col(f"n_{i}").cast("double")
        quad_cols += [
            ((nd - r1 - c1) + F.col("psi") * (r1 + c1)).alias(f"qb_{i}"),
            (1 - F.col("psi")).alias(f"qa_{i}"),
            (-F.col("psi") * r1 * c1).alias(f"qc_{i}"),
            r1.alias(f"r1_{i}"),
            c1.alias(f"c1_{i}"),
            nd.alias(f"nd_{i}"),
            F.col(f"a_{i}").cast("double").alias(f"ad_{i}"),
        ]
    quad = psi_t.select(*quad_cols)
    sol_cols = [F.col("psi")] + [
        F.col(c)
        for i in range(5)
        for c in (f"ad_{i}", f"r1_{i}", f"c1_{i}", f"nd_{i}")
    ]
    for i in range(5):
        qa, qb, qc = F.col(f"qa_{i}"), F.col(f"qb_{i}"), F.col(f"qc_{i}")
        disc = F.sqrt(qb * qb - 4 * qa * qc)
        x1 = (-qb + disc) / (2 * qa)
        x2 = (-qb - disc) / (2 * qa)
        lo = F.greatest(
            F.lit(0.0), F.col(f"r1_{i}") + F.col(f"c1_{i}") - F.col(f"nd_{i}")
        )
        hi = F.least(F.col(f"r1_{i}"), F.col(f"c1_{i}"))
        lin = -qc / qb
        sol_cols.append(
            F.when(F.abs(qa) < 1e-12, lin)
            .when((x1 >= lo) & (x1 <= hi), x1)
            .otherwise(x2)
            .alias(f"at_{i}")
        )
    sol = quad.select(*sol_cols)
    x2sum = None
    for i in range(5):
        at = F.col(f"at_{i}")
        r1, c1, nd = F.col(f"r1_{i}"), F.col(f"c1_{i}"), F.col(f"nd_{i}")
        ad = F.col(f"ad_{i}")
        term = (ad - at) * (ad - at) * (
            1 / at
            + 1 / (r1 - at)
            + 1 / (c1 - at)
            + 1 / (nd - r1 - c1 + at)
        )
        x2sum = term if x2sum is None else x2sum + term
    bd = sol.select("psi", x2sum.alias("x2"))
    return bd.select(
        F.round(F.col("psi"), 4).alias("mh_odds_ratio"),
        F.round(F.col("x2"), 4).alias("bd_stat"),
        (F.col("x2") > float(_CHI2_4_95)).alias(
            "odds_ratios_heterogeneous"
        ),
    )
