"""§2 extensions, eighty-eighth wave — parametric dispersion,
normality, and residual-diagnostic classics (published-method
cadence).

- agg_bartlett_test: Bartlett's variance-homogeneity test (1937) —
  the parametric member of the Levene/Brown-Forsythe trio.
- agg_dagostino_k2: the D'Agostino-Pearson K² omnibus normality
  test (1971/1990) — transformed skewness + kurtosis, χ²₂.
- ts_breusch_pagan: Breusch-Pagan/Koenker heteroskedasticity test
  (1979/1981) of squared daily residuals against calendar time.

Shared determinism note for this wave: every moment/covariance sum
is exact DECIMAL(38)/HUGEINT and cast to double ONCE; statistics
assemble in one fixed textual order. Bartlett and K² additionally
pass through ln/cbrt, which unlike +·/√ are not IEEE
correctly-rounded and may differ between libm implementations by
~1 ulp — the verdicts compare O(1) statistics against literals, so a
flip would need the statistic within ~1e-14 of the threshold
(documented envelope, same spirit as the Wilcoxon DECIMAL(38)
note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# shared 5% critical literals: χ²₄ (Bartlett, 5 groups), χ²₂
# (D'Agostino K²), χ²₁ (Breusch-Pagan)
_CHI2_4_95 = "9.487729"
_CHI2_2_95 = "5.991465"
_CHI2_1_95 = "3.841459"


@register(
    "agg_bartlett_test",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    g AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sm,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
        FROM base GROUP BY s
    ),
    piv AS (
        SELECT
            {", ".join(
                f"max(CASE WHEN s = {i} THEN {m} END) AS {m}{i}"
                for i in range(1, 6)
                for m in ("n", "sm", "q")
            )}
        FROM g
    ),
    v AS (
        SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS nn,
            {", ".join(
                f"CAST(CAST(n{i} AS HUGEINT) * q{i}"
                f" - CAST(sm{i} AS HUGEINT) * sm{i} AS DOUBLE)"
                f" / (CAST(n{i} AS DOUBLE) * (n{i} - 1)) AS s2_{i},"
                f" n{i}"
                for i in range(1, 6)
            )}
        FROM piv
    ),
    m AS (
        SELECT nn,
               ({" + ".join(
                   f"(n{i} - 1) * s2_{i}" for i in range(1, 6)
               )}) / (nn - 5) AS sp2,
               {" + ".join(
                   f"(n{i} - 1) * ln(s2_{i})" for i in range(1, 6)
               )} AS sum_ln,
               1 + ({" + ".join(
                   f"1.0 / (n{i} - 1)" for i in range(1, 6)
               )} - 1.0 / (nn - 5)) / 12 AS corr
        FROM v
    )
    SELECT nn AS n_orders,
           round(((nn - 5) * ln(sp2) - sum_ln) / corr, 4) AS t_stat,
           (nn - 5) * ln(sp2) - sum_ln > {_CHI2_4_95} * corr
               AS variances_differ
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-homogeneity test (1937) across the five
    priorities — the parametric (normal-theory) member of the trio
    with agg_levene_mean and agg_brown_forsythe, most powerful under
    normality and the one heavy tails wreck (which is WHY the robust
    twins exist; shipping all three is the textbook battery). T =
    ((N−k)·ln s_p² − Σ(n_i−1)·ln s_i²)/C with Bartlett's small-sample
    correction C = 1 + (Σ1/(n_i−1) − 1/(N−k))/(3(k−1)). Each s_i² =
    (n_i·Q_i − S_i²)/(n_i(n_i−1)) comes from exact
    DECIMAL(38)/HUGEINT sums divided ONCE to double; the five-group
    pivot assembles T in one fixed textual order. ln is ~1-ulp
    library-dependent (module note) — the χ²₄ verdict compares
    T·C-form sides a finite distance apart, so the envelope is
    ~1e-14 relative.

    Scale shape: ONE keyed reduce over the fact table to five
    (n, S, Q) triples, a 1-row pivot — map-side-combinable, no
    window, no second scan."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sm"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(m))).alias(f"{m}{i}")
            for i in range(1, 6)
            for m in ("n", "sm", "q")
        ]
    )
    nn = (
        sum(F.col(f"n{i}") for i in range(2, 6)) + F.col("n1")
    ).cast("long")
    v_cols = [nn.alias("nn")]
    for i in range(1, 6):
        n_i = F.col(f"n{i}")
        s2 = (
            n_i.cast("decimal(38,0)") * F.col(f"q{i}")
            - F.col(f"sm{i}").cast("decimal(38,0)") * F.col(f"sm{i}")
        ).cast("double") / (n_i.cast("double") * (n_i - 1))
        v_cols.append(s2.alias(f"s2_{i}"))
        v_cols.append(n_i.alias(f"n{i}"))
    v = piv.select(*v_cols)
    nn = F.col("nn")
    sp2 = wsum = None
    for i in range(1, 6):
        t = (F.col(f"n{i}") - 1) * F.col(f"s2_{i}")
        w = (F.col(f"n{i}") - 1) * F.log(F.col(f"s2_{i}"))
        sp2 = t if sp2 is None else sp2 + t
        wsum = w if wsum is None else wsum + w
    recip = None
    for i in range(1, 6):
        r = F.lit(1.0) / (F.col(f"n{i}") - 1)
        recip = r if recip is None else recip + r
    m = v.select(
        "nn",
        (sp2 / (nn - 5)).alias("sp2"),
        wsum.alias("sum_ln"),
        (1 + (recip - F.lit(1.0) / (nn - 5)) / 12).alias("corr"),
    )
    lhs = (nn - 5) * F.log(F.col("sp2")) - F.col("sum_ln")
    return m.select(
        nn.alias("n_orders"),
        F.round(lhs / F.col("corr"), 4).alias("t_stat"),
        (lhs > float(_CHI2_4_95) * F.col("corr")).alias(
            "variances_differ"
        ),
    )


@register(
    "agg_dagostino_k2",
    f"""
    WITH base AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS d
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS HUGEINT) AS s1,
               CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS s2,
               CAST(sum(CAST(d AS HUGEINT) * d * d) AS HUGEINT) AS s3,
               CAST(sum(CAST(d AS HUGEINT) * d * d * d) AS HUGEINT) AS s4
        FROM base
    ),
    c AS (
        SELECT n, CAST(s1 AS DOUBLE) / n AS mu,
               CAST(s2 AS DOUBLE) / n AS r2,
               CAST(s3 AS DOUBLE) / n AS r3,
               CAST(s4 AS DOUBLE) / n AS r4
        FROM m
    ),
    cm AS (
        SELECT n,
               r2 - mu * mu AS m2,
               r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
               r4 - 4 * mu * r3 + 6 * mu * mu * r2
                   - 3 * mu * mu * mu * mu AS m4
        FROM c
    ),
    gb AS (
        SELECT n,
               m3 / sqrt(m2 * m2 * m2) AS g1,
               m4 / (m2 * m2) AS b2
        FROM cm
    ),
    sk AS (
        SELECT n, g1, b2,
               g1 * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3)
                         / (6.0 * (n - 2))) AS y,
               3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1)
                   * (n + 3)
                   / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7)
                      * (n + 9)) AS beta2
        FROM gb
    ),
    sk2 AS (
        SELECT n, g1, b2, y,
               sqrt(2 * (beta2 - 1)) - 1 AS w2
        FROM sk
    ),
    z1t AS (
        SELECT n, g1, b2,
               (1 / sqrt(ln(sqrt(w2))))
                   * ln(y / sqrt(2 / (w2 - 1))
                        + sqrt((y / sqrt(2 / (w2 - 1)))
                               * (y / sqrt(2 / (w2 - 1))) + 1)) AS z1
        FROM sk2
    ),
    kt AS (
        SELECT n, g1, b2, z1,
               (b2 - 3.0 * (n - 1) / (n + 1))
                   / sqrt(24.0 * n * (n - 2) * (n - 3)
                          / ((CAST(n AS DOUBLE) + 1) * (n + 1)
                             * (n + 3) * (n + 5))) AS x,
               6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2)
                   / ((n + 7) * (n + 9))
                   * sqrt(6.0 * (n + 3) * (n + 5)
                          / (CAST(n AS DOUBLE) * (n - 2) * (n - 3)))
                   AS sb1
        FROM z1t
    ),
    kt2 AS (
        SELECT n, g1, b2, z1, x,
               6 + 8 / sb1 * (2 / sb1 + sqrt(1 + 4 / (sb1 * sb1))) AS a
        FROM kt
    ),
    z2t AS (
        SELECT n, g1, b2, z1,
               ((1 - 2 / (9 * a))
                - cbrt((1 - 2 / a) / (1 + x * sqrt(2 / (a - 4)))))
                   * sqrt(9 * a / 2) AS z2
        FROM kt2
    )
    SELECT n AS n_orders,
           round(g1, 6) AS skewness,
           round(b2, 6) AS kurtosis,
           round(z1 * z1 + z2 * z2, 4) AS k2_stat,
           z1 * z1 + z2 * z2 > {_CHI2_2_95} AS non_normal
    FROM z2t
    """,
    tags=("agg", "stats"),
)
def agg_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino-Pearson K² omnibus normality test (1971; the 1990
    Belanger-D'Agostino Jr form implemented here): K² = Z(√b₁)² +
    Z(b₂)² ~ χ²₂, combining the Johnson-SU-transformed sample
    skewness (D'Agostino 1970) with the Anscombe-Glynn (1983)
    cube-root-transformed kurtosis — the finite-n exact-moment
    transforms, not the naive √(6/n)/√(24/n) z-scores, so the test
    is usable at any n ≥ 20. Raw power sums Σd..Σd⁴ are exact
    HUGEINT/DECIMAL(38) on FLOOR-DOLLAR values (cents⁴ would burst
    38 digits past sf1 — stated knob; the ~1e-5 relative coarsening
    is far below the moment sampling noise); central moments,
    g1 = m3/m2^(3/2), b2 = m4/m2², and both transform chains
    assemble in ONE fixed textual order of doubles. ln/cbrt carry
    the module's ~1-ulp library envelope; the χ²₂ verdict literal
    5.991465 is shared textually. TPC-H order totals are a
    right-skewed sum-of-uniforms — K² rejects decisively, which is
    the point: the op certifies the whole moment→transform chain
    against the oracle.

    Scale shape: ONE map-side-combinable power-sum reduce over the
    fact table to a single row; no join, no window."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(F.floor("o_totalprice").cast("long").alias("d"))
    d38 = F.col("d").cast("decimal(38,0)")
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d38).alias("s1"),
        F.sum(d38 * F.col("d")).alias("s2"),
        F.sum(d38 * F.col("d") * F.col("d")).alias("s3"),
        F.sum(d38 * F.col("d") * F.col("d") * F.col("d")).alias("s4"),
    )
    n = F.col("n")
    nd = n.cast("double")
    c = m.select(
        "n",
        (F.col("s1").cast("double") / n).alias("mu"),
        (F.col("s2").cast("double") / n).alias("r2"),
        (F.col("s3").cast("double") / n).alias("r3"),
        (F.col("s4").cast("double") / n).alias("r4"),
    )
    mu, r2, r3, r4 = F.col("mu"), F.col("r2"), F.col("r3"), F.col("r4")
    cm = c.select(
        "n",
        (r2 - mu * mu).alias("m2"),
        (r3 - 3 * mu * r2 + 2 * mu * mu * mu).alias("m3"),
        (r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu).alias(
            "m4"
        ),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    gb = cm.select(
        "n",
        (m3 / F.sqrt(m2 * m2 * m2)).alias("g1"),
        (m4 / (m2 * m2)).alias("b2"),
    )
    g1, b2 = F.col("g1"), F.col("b2")
    sk = gb.select(
        "n",
        "g1",
        "b2",
        (g1 * F.sqrt((nd + 1) * (n + 3) / (6.0 * (n - 2)))).alias("y"),
        (
            3.0
            * (nd * n + 27 * n - 70)
            * (n + 1)
            * (n + 3)
            / ((nd - 2) * (n + 5) * (n + 7) * (n + 9))
        ).alias("beta2"),
    )
    sk2 = sk.select(
        "n",
        "g1",
        "b2",
        "y",
        (F.sqrt(2 * (F.col("beta2") - 1)) - 1).alias("w2"),
    )
    y, w2 = F.col("y"), F.col("w2")
    ya = y / F.sqrt(2 / (w2 - 1))
    z1t = sk2.select(
        "n",
        "g1",
        "b2",
        (
            (1 / F.sqrt(F.log(F.sqrt(w2))))
            * F.log(ya + F.sqrt(ya * ya + 1))
        ).alias("z1"),
    )
    kt = z1t.select(
        "n",
        "g1",
        "b2",
        "z1",
        (
            (b2 - 3.0 * (n - 1) / (n + 1))
            / F.sqrt(
                24.0
                * n
                * (n - 2)
                * (n - 3)
                / ((nd + 1) * (n + 1) * (n + 3) * (n + 5))
            )
        ).alias("x"),
        (
            6.0
            * (nd * n - 5 * n + 2)
            / ((n + 7) * (n + 9))
            * F.sqrt(
                6.0 * (n + 3) * (n + 5) / (nd * (n - 2) * (n - 3))
            )
        ).alias("sb1"),
    )
    sb1 = F.col("sb1")
    kt2 = kt.select(
        "n",
        "g1",
        "b2",
        "z1",
        "x",
        (6 + 8 / sb1 * (2 / sb1 + F.sqrt(1 + 4 / (sb1 * sb1)))).alias("a"),
    )
    a, x = F.col("a"), F.col("x")
    z2t = kt2.select(
        "n",
        "g1",
        "b2",
        "z1",
        (
            (
                (1 - 2 / (9 * a))
                - F.cbrt((1 - 2 / a) / (1 + x * F.sqrt(2 / (a - 4))))
            )
            * F.sqrt(9 * a / 2)
        ).alias("z2"),
    )
    z1, z2 = F.col("z1"), F.col("z2")
    return z2t.select(
        n.alias("n_orders"),
        F.round(g1, 6).alias("skewness"),
        F.round(b2, 6).alias("kurtosis"),
        F.round(z1 * z1 + z2 * z2, 4).alias("k2_stat"),
        (z1 * z1 + z2 * z2 > float(_CHI2_2_95)).alias("non_normal"),
    )


_DAILY_RESID_SQL = """
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    resid AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(CAST(count(*) OVER () AS BIGINT) * y
                    - sum(y) OVER () AS BIGINT) AS e
        FROM daily
    )
"""


@register(
    "ts_breusch_pagan",
    f"""
    WITH {_DAILY_RESID_SQL},
    q AS (
        SELECT CAST(power(10, GREATEST(3,
                   length(CAST(max(abs(e)) AS VARCHAR)) - 7))
               AS BIGINT) AS qd
        FROM resid
    ),
    z AS (
        SELECT t, (e // qd) * (e // qd) AS z
        FROM resid, q
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS sx,
               CAST(sum(CAST(z AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
               CAST(sum(CAST(t AS HUGEINT) * z) AS HUGEINT) AS sxy,
               CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS syy
        FROM z
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
               CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy
        FROM m
    )
    SELECT n AS n_days,
           round(CAST(n AS DOUBLE) * cxy * cxy / (cxx * cyy), 4)
               AS lm_stat,
           CAST(n AS DOUBLE) * cxy * cxy > {_CHI2_1_95} * cxx * cyy
               AS heteroskedastic
    FROM c
    """,
    tags=("timeseries", "stats"),
)
def ts_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test (1979) in Koenker's
    studentized LM form (1981): regress the squared residuals of the
    mean-only daily-revenue model on CALENDAR TIME (day index t) —
    LM = n·R² ~ χ²₁ under homoskedasticity. Where ts_arch_lm asks
    "does variance cluster on ITSELF (lag)?", this asks "does
    variance TREND over the calendar?" — the other standard
    variance diagnostic. The tested series z_t = (ẽ_t div q)² is the
    n-scaled integer residual quantized BEFORE squaring by a
    DATA-ADAPTIVE exact-integer quantizer q = 10^max(3, d−7) where
    d = decimal-digit count of max|ẽ| (length of its VARCHAR form —
    an exact integer on both engines, no float log10). This keeps
    ẽ div q under 10^7 digits-by-construction at ANY corpus scale,
    so z < 10^14 (int64-safe), Σz² < n·10^28 ≈ 2.4·10^31 on the
    calendar-bounded n≈2400 days (DECIMAL(38)-safe), and the
    residual ẽ itself stays int64 to ~sf 3·10^6 — unlike the fixed
    10³ literal this op used pre-round-11, which overflowed z
    around sf100. At the test fixtures d−7 ≤ 3 so q = 10³ exactly
    and all recorded values are unchanged. The q scalar attaches via
    a broadcast 1-row cross join (the standard scalar device); the
    coarsening stays ≤ ~1e-7 of the residual scale by construction.
    All centered moments C_ab = n·Σab −
    Σa·Σb are exact, cast once to double; LM and its χ²₁ verdict
    assemble in ONE fixed textual order (the agg_oneway_anova
    device, literal 3.841459 shared with ts_arch_lm).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one bounded-axis row_number window, a 1-row moment
    reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_all = Window.partitionBy()
    resid = daily.select(
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("t"),
        (
            F.count(F.lit(1)).over(w_all) * F.col("y")
            - F.sum("y").over(w_all)
        )
        .cast("long")
        .alias("e"),
    )
    qd = resid.agg(
        F.pow(
            F.lit(10.0),
            F.greatest(
                F.lit(3),
                F.length(F.max(F.abs(F.col("e"))).cast("string"))
                - F.lit(7),
            ),
        )
        .cast("long")
        .alias("qd")
    )
    z = resid.crossJoin(F.broadcast(qd)).select(
        "t",
        (F.expr("e div qd") * F.expr("e div qd")).alias("z"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("sx"),
        F.sum(d38("z")).alias("sy"),
        F.sum(d38("t") * F.col("t")).alias("sxx"),
        F.sum(d38("t") * F.col("z")).alias("sxy"),
        F.sum(d38("z") * F.col("z")).alias("syy"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    c = m.select(
        "n",
        (n38 * F.col("sxx") - d38("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("sxy") - d38("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (n38 * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
    )
    cxx, cxy, cyy = F.col("cxx"), F.col("cxy"), F.col("cyy")
    return c.select(
        n.alias("n_days"),
        F.round(n.cast("double") * cxy * cxy / (cxx * cyy), 4).alias(
            "lm_stat"
        ),
        (n.cast("double") * cxy * cxy > float(_CHI2_1_95) * cxx * cyy).alias(
            "heteroskedastic"
        ),
    )
