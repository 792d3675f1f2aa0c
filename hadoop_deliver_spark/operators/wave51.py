"""§2 extensions, seventy-fifth wave — weighted blocked ranks, ordered
proportions, stratified association, and a normality test
(published-method cadence).

- agg_quade: the Quade test (1979) — Friedman's blocked rank ANOVA
  with blocks weighted by their range rank; more powerful when block
  spreads differ (weekly revenue across the five priorities).
- agg_cochran_armitage: the Cochran-Armitage trend test (1955) — do
  high-value-order proportions trend across the five ORDERED
  priorities? Pure-integer hypergeometric verdict.
- agg_mantel_haenszel: the Mantel-Haenszel / CMH test (1959) of
  account-balance exposure vs urgent-order outcome stratified by the
  five regions, plus the MH common odds ratio.
- agg_jarque_bera: the Jarque-Bera normality test (1980) on order
  totals — exact DECIMAL(38) power sums, shared χ²₂ literal verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₄ / χ²₁ / χ²₂ upper-5% critical values — shared literals between
# the Spark plan and the oracle SQL (the agg_friedman device)
_CHI2_4_95 = "9.487729"
_CHI2_1_95 = "3.841459"
_CHI2_2_95 = "5.991465"

# fixed high-value threshold for the trend test (cents)
_HIVAL_CENTS = 20_000_000

_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")


@register(
    "agg_quade",
    f"""
    WITH cell AS (
        SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-05') // 7 AS wk,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    grid AS (
        SELECT w.wk, p.g, CAST(coalesce(cell.cents, 0) AS BIGINT) AS cents
        FROM (SELECT DISTINCT wk FROM cell) w
        CROSS JOIN (VALUES (1), (2), (3), (4), (5)) p(g)
        LEFT JOIN cell ON cell.wk = w.wk AND cell.g = p.g
    ),
    rk AS (
        SELECT wk, g, cents,
               row_number() OVER (PARTITION BY wk ORDER BY cents, g) AS r
        FROM grid
    ),
    mid AS (
        SELECT rk.wk, rk.g, b.mn + b.mx AS r2
        FROM rk JOIN (
            SELECT wk, cents, CAST(min(r) AS BIGINT) AS mn,
                   CAST(max(r) AS BIGINT) AS mx
            FROM rk GROUP BY wk, cents
        ) b ON b.wk = rk.wk AND b.cents = rk.cents
    ),
    rng AS (
        SELECT wk, max(cents) - min(cents) AS range_c
        FROM grid GROUP BY wk
    ),
    qrk AS (
        SELECT wk, range_c,
               row_number() OVER (ORDER BY range_c, wk) AS qr
        FROM rng
    ),
    q2 AS (
        SELECT qrk.wk, b.mn + b.mx AS q2
        FROM qrk JOIN (
            SELECT range_c, CAST(min(qr) AS BIGINT) AS mn,
                   CAST(max(qr) AS BIGINT) AS mx
            FROM qrk GROUP BY range_c
        ) b ON b.range_c = qrk.range_c
    ),
    s4 AS (
        SELECT mid.g, CAST(q2.q2 * (mid.r2 - 6) AS BIGINT) AS s4
        FROM mid JOIN q2 USING (wk)
    ),
    agg AS (
        SELECT CAST(sum(s4 * s4) AS BIGINT) AS a16,
               CAST(count(*) // 5 AS BIGINT) AS b
        FROM s4
    ),
    colsum AS (
        SELECT CAST(sum(sj * sj) AS BIGINT) AS sb
        FROM (SELECT g, CAST(sum(s4) AS BIGINT) AS sj
              FROM s4 GROUP BY g) x
    )
    SELECT b AS n_blocks, CAST(5 AS INT) AS k, sb, a16,
           round((b - 1.0) * sb / (CAST(b AS DOUBLE) * a16 - sb), 4)
               AS f_stat,
           4.0 * (b - 1) * sb
               > {_CHI2_4_95} * (CAST(b AS DOUBLE) * a16 - sb)
               AS significant
    FROM agg, colsum
    """,
    tags=("agg", "stats"),
)
def agg_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade's weighted blocked rank test (Quade 1979): blocks =
    epoch-anchored weeks, treatments = the five priorities, response =
    weekly revenue (dense grid, missing cell = 0). Each block is
    weighted by the rank of its RANGE, so wide-spread weeks count
    more than flat ones — the advantage over agg_friedman when block
    scales differ. With DOUBLED midranks everywhere (within-block
    ranks r2, across-block range ranks Q2), S4_ij = Q2_i(r2_ij − 6) =
    4·S_ij is an exact int64, and Quade's F = (b−1)·B/(A−B) reduces to
    the all-integer ratio (b−1)·SB/(b·A16 − SB) with SB = Σ_j S4_j²,
    A16 = ΣΣ S4_ij². The verdict compares 4(b−1)·SB against the
    shared χ²₄ literal × (b·A16 − SB) — the asymptotic F(4,∞) = χ²₄/4
    form, textually identical on both engines.

    Scale shape: one keyed fact reduce to the (week × 5) grid; the
    within-block rank window partitions by WEEK and the range rank
    runs over the calendar-bounded week axis; SinglePartitions are
    the 5-row column and 1-row reduces."""
    o = tbl(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.floor(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-05").cast("date")
            )
            / 7
        ).alias("wk"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    grid = (
        cell.select("wk")
        .distinct()
        .select("wk", F.explode(F.sequence(F.lit(1), F.lit(5))).alias("g"))
        .join(cell, ["wk", "g"], "left")
        .select(
            "wk",
            "g",
            F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
        )
    )
    w_in = Window.partitionBy("wk").orderBy("cents", "g")
    rk = grid.withColumn("r", F.row_number().over(w_in))
    blocks = rk.groupBy("wk", "cents").agg(
        F.min("r").cast("long").alias("mn"),
        F.max("r").cast("long").alias("mx"),
    )
    mid = rk.join(blocks, ["wk", "cents"]).select(
        "wk", "g", (F.col("mn") + F.col("mx")).alias("r2")
    )
    rng = grid.groupBy("wk").agg(
        (F.max("cents") - F.min("cents")).alias("range_c")
    )
    w_q = Window.orderBy("range_c", "wk")
    qrk = rng.withColumn("qr", F.row_number().over(w_q))
    qblocks = qrk.groupBy("range_c").agg(
        F.min("qr").cast("long").alias("mn"),
        F.max("qr").cast("long").alias("mx"),
    )
    q2 = qrk.join(F.broadcast(qblocks), "range_c").select(
        "wk", (F.col("mn") + F.col("mx")).alias("q2")
    )
    s4 = mid.join(F.broadcast(q2), "wk").select(
        "g", (F.col("q2") * (F.col("r2") - 6)).cast("long").alias("s4")
    )
    agg = s4.agg(
        F.sum(F.col("s4") * F.col("s4")).cast("long").alias("a16"),
        (F.count(F.lit(1)) / 5).cast("long").alias("b"),
    )
    colsum = (
        s4.groupBy("g")
        .agg(F.sum("s4").cast("long").alias("sj"))
        .agg(F.sum(F.col("sj") * F.col("sj")).cast("long").alias("sb"))
    )
    st = agg.crossJoin(F.broadcast(colsum))
    b, sb, a16 = F.col("b"), F.col("sb"), F.col("a16")
    return st.select(
        b.alias("n_blocks"),
        F.lit(5).cast("int").alias("k"),
        "sb",
        "a16",
        F.round(
            (b - 1.0) * sb / (b.cast("double") * a16 - sb), 4
        ).alias("f_stat"),
        (
            4.0 * (b - 1) * sb
            > float(_CHI2_4_95) * (b.cast("double") * a16 - sb)
        ).alias("significant"),
    )


@register(
    "agg_cochran_armitage",
    f"""
    WITH g AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) > {_HIVAL_CENTS}) AS BIGINT) AS a
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(a) AS BIGINT) AS aa,
               CAST(sum(s * a) AS BIGINT) AS t,
               CAST(sum(n * s) AS BIGINT) AS sw1,
               CAST(sum(n * s * s) AS BIGINT) AS sw2
        FROM g
    )
    SELECT nn AS n_orders, aa AS n_hival, t AS t_stat,
           round((CAST(nn AS DOUBLE) * t - CAST(aa AS DOUBLE) * sw1)
                 / sqrt(CAST(aa AS DOUBLE) * (nn - aa)
                        * (CAST(nn AS DOUBLE) * sw2
                           - CAST(sw1 AS DOUBLE) * sw1)
                        / (nn - 1.0)), 4) AS z,
           CAST(625 AS HUGEINT) * (nn - 1)
               * (CAST(nn AS HUGEINT) * t - CAST(aa AS HUGEINT) * sw1)
               * (CAST(nn AS HUGEINT) * t - CAST(aa AS HUGEINT) * sw1)
               > CAST(2401 AS HUGEINT) * aa * (nn - aa)
                 * (CAST(nn AS HUGEINT) * sw2
                    - CAST(sw1 AS HUGEINT) * sw1) AS significant
    FROM tot
    """,
    tags=("agg", "stats"),
)
def agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Cochran 1954, Armitage 1955): does
    the proportion of high-value orders (> $200k, fixed cents literal)
    trend across the five ORDERED priorities scored s = 1…5? With
    T = Σ s·a_s, Sw1 = Σ n_s·s, Sw2 = Σ n_s·s² all exact int64s, the
    conditional (hypergeometric) null gives
    z² = (N·T − A·Sw1)²(N−1) / (A(N−A)(N·Sw2 − Sw1²)), and the
    two-sided 5% verdict clears every denominator:
    625(N−1)(NT − A·Sw1)² > 2401·A(N−A)(N·Sw2 − Sw1²) — N⁴-scale
    cross-products promoted to DECIMAL(38)/HUGEINT, so no float ever
    decides; z is display-only (round-4).

    Scale shape: ONE keyed reduce of the fact table to five (n, a)
    rows, then a 1-row pivot — nothing else touches the data."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(cents > _HIVAL_CENTS).cast("long").alias("a"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("a").cast("long").alias("aa"),
        F.sum(F.col("s") * F.col("a")).cast("long").alias("t"),
        F.sum(F.col("n") * F.col("s")).cast("long").alias("sw1"),
        F.sum(F.col("n") * F.col("s") * F.col("s"))
        .cast("long")
        .alias("sw2"),
    )
    nn, aa, t, sw1, sw2 = (
        F.col("nn"),
        F.col("aa"),
        F.col("t"),
        F.col("sw1"),
        F.col("sw2"),
    )
    num38 = nn.cast("decimal(38,0)") * t - aa.cast("decimal(38,0)") * sw1
    den38 = (
        aa.cast("decimal(38,0)")
        * (nn - aa)
        * (nn.cast("decimal(38,0)") * sw2 - sw1.cast("decimal(38,0)") * sw1)
    )
    return tot.select(
        nn.alias("n_orders"),
        aa.alias("n_hival"),
        t.alias("t_stat"),
        F.round(
            (nn.cast("double") * t - aa.cast("double") * sw1)
            / F.sqrt(
                aa.cast("double")
                * (nn - aa)
                * (
                    nn.cast("double") * sw2
                    - sw1.cast("double") * sw1
                )
                / (nn - 1.0)
            ),
            4,
        ).alias("z"),
        (625 * (nn - 1).cast("decimal(38,0)") * num38 * num38 > 2401 * den38).alias(
            "significant"
        ),
    )


def _mh_fixed_sum(expr_by_region):
    """Add the five per-region doubles in FIXED region order (textual
    parity with the oracle's pivoted sum — float addition is not
    associative, so the order is part of the contract)."""
    total = None
    for r in _REGIONS:
        term = expr_by_region(r)
        total = term if total is None else total + term
    return total


@register(
    "agg_mantel_haenszel",
    f"""
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
    terms AS (
        SELECT region,
               CAST(a AS DOUBLE) AS a_d,
               CAST(a + b AS DOUBLE) * (a + c) / n AS e_d,
               CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                   / (CAST(n AS DOUBLE) * n * (n - 1)) AS v_d,
               CAST(a AS DOUBLE) * d / n AS adn,
               CAST(b AS DOUBLE) * c / n AS bcn
        FROM strata
    ),
    piv AS (
        SELECT
            {", ".join(
                "max(CASE WHEN region = '" + r + "' THEN " + m + " END) AS "
                + m + "_" + str(i)
                for i, r in enumerate(_REGIONS)
                for m in ("a_d", "e_d", "v_d", "adn", "bcn")
            )}
        FROM terms
    )
    SELECT
        CAST({" + ".join("a_d_" + str(i) for i in range(5))} AS BIGINT)
            AS sum_a,
        round({" + ".join("e_d_" + str(i) for i in range(5))}, 4)
            AS sum_e,
        round(({" + ".join("adn_" + str(i) for i in range(5))})
              / ({" + ".join("bcn_" + str(i) for i in range(5))}), 4)
            AS mh_odds_ratio,
        round(({" + ".join("a_d_" + str(i) for i in range(5))}
               - ({" + ".join("e_d_" + str(i) for i in range(5))}))
              * ({" + ".join("a_d_" + str(i) for i in range(5))}
                 - ({" + ".join("e_d_" + str(i) for i in range(5))}))
              / ({" + ".join("v_d_" + str(i) for i in range(5))}), 4)
            AS chi2,
        ({" + ".join("a_d_" + str(i) for i in range(5))}
         - ({" + ".join("e_d_" + str(i) for i in range(5))}))
        * ({" + ".join("a_d_" + str(i) for i in range(5))}
           - ({" + ".join("e_d_" + str(i) for i in range(5))}))
        > {_CHI2_1_95} * ({" + ".join("v_d_" + str(i) for i in range(5))})
            AS significant
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel / Cochran-Mantel-Haenszel test (1959) of the
    association between account-balance exposure (c_acctbal ≥ 4500)
    and urgent-or-high order priority, stratified by the customer's
    REGION so regional mix cannot confound. Per stratum the 2×2 cell
    counts (a,b,c,d,n) are exact int64s; E_i = r1c1/n and
    V_i = r1r2c1c2/(n²(n−1)) are per-stratum doubles PIVOTED to the
    five fixed region columns and added in one fixed textual order on
    both engines (float addition is not associative — the fixed-order
    pivot is the agg_mood_median device), so χ²_MH = (Σa − ΣE)²/ΣV and
    the MH common odds ratio Σ(ad/n)/Σ(bc/n) are bit-identical. The
    verdict compares against the shared χ²₁ literal.

    Scale shape: the fact table reduces through broadcast dimension
    joins to FIVE stratum rows; everything after is a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            (F.col("c_acctbal") >= 4500).alias("exposed"),
            F.substring("o_orderpriority", 1, 1).isin("1", "2").alias(
                "hit"
            ),
        )
    )
    ex, hit = F.col("exposed"), F.col("hit")
    strata = base.groupBy("region").agg(
        F.count_if(ex & hit).cast("long").alias("a"),
        F.count_if(ex & ~hit).cast("long").alias("b"),
        F.count_if(~ex & hit).cast("long").alias("c"),
        F.count_if(~ex & ~hit).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a, b, cc, d, nn = (
        F.col("a"),
        F.col("b"),
        F.col("c"),
        F.col("d"),
        F.col("n"),
    )
    terms = strata.select(
        "region",
        a.cast("double").alias("a_d"),
        ((a + b).cast("double") * (a + cc) / nn).alias("e_d"),
        (
            (a + b).cast("double")
            * (cc + d)
            * (a + cc)
            * (b + d)
            / (nn.cast("double") * nn * (nn - 1))
        ).alias("v_d"),
        (a.cast("double") * d / nn).alias("adn"),
        (b.cast("double") * cc / nn).alias("bcn"),
    )
    piv = terms.agg(
        *[
            F.max(
                F.when(F.col("region") == reg, F.col(m))
            ).alias(f"{m}_{i}")
            for i, reg in enumerate(_REGIONS)
            for m in ("a_d", "e_d", "v_d", "adn", "bcn")
        ]
    )
    sum_a = _mh_fixed_sum(lambda reg: F.col(f"a_d_{_REGIONS.index(reg)}"))
    sum_e = _mh_fixed_sum(lambda reg: F.col(f"e_d_{_REGIONS.index(reg)}"))
    sum_v = _mh_fixed_sum(lambda reg: F.col(f"v_d_{_REGIONS.index(reg)}"))
    sum_adn = _mh_fixed_sum(lambda reg: F.col(f"adn_{_REGIONS.index(reg)}"))
    sum_bcn = _mh_fixed_sum(lambda reg: F.col(f"bcn_{_REGIONS.index(reg)}"))
    return piv.select(
        sum_a.cast("long").alias("sum_a"),
        F.round(sum_e, 4).alias("sum_e"),
        F.round(sum_adn / sum_bcn, 4).alias("mh_odds_ratio"),
        F.round((sum_a - sum_e) * (sum_a - sum_e) / sum_v, 4).alias(
            "chi2"
        ),
        (
            (sum_a - sum_e) * (sum_a - sum_e)
            > float(_CHI2_1_95) * sum_v
        ).alias("significant"),
    )


@register(
    "agg_jarque_bera",
    f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
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
               CAST(s1 AS DOUBLE) / n AS mu,
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
    )
    SELECT n AS n_orders,
           round(m3 / sqrt(m2 * m2 * m2), 4) AS skewness,
           round(m4 / (m2 * m2), 4) AS kurtosis,
           round(n * (m3 * m3 / (m2 * m2 * m2) / 6.0
                      + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3)
                        / 24.0), 4) AS jb,
           n * (m3 * m3 / (m2 * m2 * m2) / 6.0
                + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 24.0)
               > {_CHI2_2_95} AS non_normal
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera 1980) on order totals
    quantized to whole dollars (floor — keeps every power sum an exact
    integer): JB = n(S²/6 + (K−3)²/24) from the sample skewness
    S = m₃/m₂^1.5 and kurtosis K = m₄/m₂². The four raw power sums
    Σv, Σv², Σv³, Σv⁴ accumulate as exact DECIMAL(38)/HUGEINT integers
    (v ≤ ~6·10⁵ dollars ⇒ Σv⁴ ≤ ~10³² even at 10⁹ rows — inside the
    38-digit envelope at any plausible corpus scale), so the float
    moment assembly starts from bit-identical inputs and is one fixed
    textual expression on both engines; the verdict compares against
    the shared χ²₂ literal. Skew/kurtosis/JB are display round-4.

    Scale shape: ONE global reduce of the fact table — four sums and
    a count; everything after is a 1-row projection."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(F.floor("o_totalprice").cast("long").alias("v"))
    v = F.col("v").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(v * F.col("v")).alias("s2"),
        F.sum(v * F.col("v") * F.col("v")).alias("s3"),
        F.sum(v * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
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
    jb = n * (
        m3 * m3 / (m2 * m2 * m2) / 6.0
        + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 24.0
    )
    return m.select(
        n.alias("n_orders"),
        F.round(m3 / F.sqrt(m2 * m2 * m2), 4).alias("skewness"),
        F.round(m4 / (m2 * m2), 4).alias("kurtosis"),
        F.round(jb, 4).alias("jb"),
        (jb > float(_CHI2_2_95)).alias("non_normal"),
    )
