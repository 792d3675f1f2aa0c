"""§2 extensions, eighty-seventh wave — omnibus two-sample classics
(published-method cadence, the round-9 verdict's absent-classics
list, part 2).

- agg_cucconi_test: the Cucconi joint location-scale test (1968) —
  the ORIGINAL single-quadratic-form alternative to Lepage, here in
  the tie-robust general score-moment form with an EMPIRICAL score
  correlation (exact cross-moments replace the no-ties closed-form
  ρ(N)).
- agg_ad_2sample: the two-sample Anderson-Darling test (Pettitt
  1976) — the tail-weighted omnibus EDF test, with every per-j
  rational term floor-div quantized to exact integers so the sum is
  order-free.

Both run on the URGENT-vs-LOW daily-revenue frame (the
agg_lepage/agg_siegel_tukey samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# 5% critical values: exp(-C) tail of the Cucconi null (−ln 0.05) and
# the asymptotic one-sample Anderson-Darling point (Pettitt 1976 shows
# the two-sample statistic shares it), scaled 1000× for the exact
# integer verdict
_CUCCONI_95 = "2.995732"
_AD_95_X1000 = 2492

_DAILY_2SAMPLE_SQL = """
    daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    )
"""


def _daily_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URGENT-vs-LOW daily revenue cents — the agg_lepage frame."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("smp"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )


@register(
    "agg_cucconi_test",
    f"""
    WITH {_DAILY_2SAMPLE_SQL},
    rc AS (
        SELECT smp, cents,
               CAST(row_number() OVER (ORDER BY cents, smp, day)
                    AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nn
        FROM daily
    ),
    b AS (
        SELECT cents,
               CAST(min(rn) AS BIGINT) AS mn,
               CAST(max(rn) AS BIGINT) AS mx
        FROM rc GROUP BY cents
    ),
    sc AS (
        SELECT rc.smp, rc.nn,
               (b.mn + b.mx) * (b.mn + b.mx) AS u,
               (2 * (rc.nn + 1) - (b.mn + b.mx))
                   * (2 * (rc.nn + 1) - (b.mn + b.mx)) AS v
        FROM rc JOIN b USING (cents)
    ),
    s AS (
        SELECT CAST(max(nn) AS BIGINT) AS nn,
               CAST(count(CASE WHEN smp = 1 THEN 1 END) AS BIGINT) AS n1,
               CAST(count(CASE WHEN smp = 2 THEN 1 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN smp = 1 THEN u ELSE 0 END) AS BIGINT)
                   AS tu,
               CAST(sum(CASE WHEN smp = 1 THEN v ELSE 0 END) AS BIGINT)
                   AS tv,
               CAST(sum(u) AS BIGINT) AS su,
               CAST(sum(v) AS BIGINT) AS sv,
               CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
               CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS suv
        FROM sc
    ),
    c AS (
        SELECT nn, n1, n2,
               CAST(CAST(nn AS HUGEINT) * tu
                    - CAST(n1 AS HUGEINT) * su AS DOUBLE) AS au,
               CAST(CAST(nn AS HUGEINT) * tv
                    - CAST(n1 AS HUGEINT) * sv AS DOUBLE) AS av,
               CAST(CAST(nn AS HUGEINT) * suu
                    - CAST(su AS HUGEINT) * su AS DOUBLE) AS cuu,
               CAST(CAST(nn AS HUGEINT) * svv
                    - CAST(sv AS HUGEINT) * sv AS DOUBLE) AS cvv,
               CAST(CAST(nn AS HUGEINT) * suv
                    - CAST(su AS HUGEINT) * sv AS DOUBLE) AS cuv
        FROM s
    ),
    z AS (
        SELECT nn, n1, n2,
               au / sqrt(CAST(n1 AS DOUBLE) * n2 * cuu / (nn - 1)) AS zu,
               av / sqrt(CAST(n1 AS DOUBLE) * n2 * cvv / (nn - 1)) AS zv,
               cuv / sqrt(cuu * cvv) AS rho
        FROM c
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round(zu, 4) AS z_u,
           round(zv, 4) AS z_v,
           round((zu * zu + zv * zv - 2 * rho * zu * zv)
                 / (2 * (1 - rho * rho)), 4) AS c_stat,
           (zu * zu + zv * zv - 2 * rho * zu * zv)
               > {_CUCCONI_95} * (2 * (1 - rho * rho))
               AS location_scale_differ
    FROM z
    """,
    tags=("agg", "stats"),
)
def agg_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi joint location-scale test (1968) — predates and
    complements Lepage: C = (Z_U² + Z_V² − 2ρZ_UZ_V)/(2(1−ρ²)) where
    U scores squared ranks and V squared CONTRARY ranks, so one
    quadratic form catches shift and spread at once; under H₀
    P(C ≥ c) → exp(−c), giving the 5% verdict C > 2.995732 = −ln .05.
    Both components use the Lepage GENERAL score-moment form
    (tie-robust for any scores) on doubled combined midranks r2:
    u = r2², v = (2(N+1) − r2)² — exact int64 scores (the uniform
    ×4 cancels in standardization). ρ is the EMPIRICAL score
    correlation C_uv/√(C_uu·C_vv) from exact cross-moments — the
    textbook closed-form ρ(N) assumes no ties; the moment form is
    exact under the realized tie pattern. All score sums/squares are
    exact DECIMAL(38)/HUGEINT (Σu² ≤ N·(2N)⁴ is calendar-bounded);
    Z_U = (N·T_U − n1·Σu)/√(n1n2·C_uu/(N−1)) and the verdict
    assemble in ONE fixed textual order of doubles (the
    agg_oneway_anova device), comparing C's numerator against
    literal × denominator to dodge the division.

    Scale shape: one keyed reduce to ≤2·days rows, one bounded-axis
    rank window, a distinct-value tie reduce, a 1-row moment
    reduce."""
    daily = _daily_2sample(spark, sf_dir)
    rc = daily.select(
        "smp",
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("nn"),
    )
    b = rc.groupBy("cents").agg(
        F.min("rn").cast("long").alias("mn"),
        F.max("rn").cast("long").alias("mx"),
    )
    r2 = F.col("mn") + F.col("mx")
    sc = rc.join(F.broadcast(b), "cents").select(
        "smp",
        "nn",
        (r2 * r2).alias("u"),
        (
            (2 * (F.col("nn") + 1) - r2)
            * (2 * (F.col("nn") + 1) - r2)
        ).alias("v"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = sc.agg(
        F.max("nn").cast("long").alias("nn"),
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .cast("long")
        .alias("n1"),
        F.count(F.when(F.col("smp") == 2, F.lit(1)))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("smp") == 1, F.col("u")).otherwise(0))
        .cast("long")
        .alias("tu"),
        F.sum(F.when(F.col("smp") == 1, F.col("v")).otherwise(0))
        .cast("long")
        .alias("tv"),
        F.sum("u").cast("long").alias("su"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(d38("u") * F.col("u")).alias("suu"),
        F.sum(d38("v") * F.col("v")).alias("svv"),
        F.sum(d38("u") * F.col("v")).alias("suv"),
    )
    nn38 = F.col("nn").cast("decimal(38,0)")
    c = s.select(
        "nn",
        "n1",
        "n2",
        (nn38 * F.col("tu") - d38("n1") * F.col("su"))
        .cast("double")
        .alias("au"),
        (nn38 * F.col("tv") - d38("n1") * F.col("sv"))
        .cast("double")
        .alias("av"),
        (nn38 * F.col("suu") - d38("su") * F.col("su"))
        .cast("double")
        .alias("cuu"),
        (nn38 * F.col("svv") - d38("sv") * F.col("sv"))
        .cast("double")
        .alias("cvv"),
        (nn38 * F.col("suv") - d38("su") * F.col("sv"))
        .cast("double")
        .alias("cuv"),
    )
    n1d = F.col("n1").cast("double")
    z = c.select(
        "nn",
        "n1",
        "n2",
        (
            F.col("au")
            / F.sqrt(n1d * F.col("n2") * F.col("cuu") / (F.col("nn") - 1))
        ).alias("zu"),
        (
            F.col("av")
            / F.sqrt(n1d * F.col("n2") * F.col("cvv") / (F.col("nn") - 1))
        ).alias("zv"),
        (F.col("cuv") / F.sqrt(F.col("cuu") * F.col("cvv"))).alias("rho"),
    )
    zu, zv, rho = F.col("zu"), F.col("zv"), F.col("rho")
    qform = zu * zu + zv * zv - 2 * rho * zu * zv
    return z.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.round(zu, 4).alias("z_u"),
        F.round(zv, 4).alias("z_v"),
        F.round(qform / (2 * (1 - rho * rho)), 4).alias("c_stat"),
        (qform > float(_CUCCONI_95) * (2 * (1 - rho * rho))).alias(
            "location_scale_differ"
        ),
    )


@register(
    "agg_ad_2sample",
    f"""
    WITH {_DAILY_2SAMPLE_SQL},
    rc AS (
        SELECT smp,
               CAST(row_number() OVER (ORDER BY cents, smp, day)
                    AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nn,
               CAST(count(CASE WHEN smp = 1 THEN 1 END) OVER ()
                    AS BIGINT) AS n1
        FROM daily
    ),
    cum AS (
        SELECT rn, nn, n1,
               CAST(count(CASE WHEN smp = 1 THEN 1 END)
                    OVER (ORDER BY rn) AS BIGINT) AS m1
        FROM rc
    ),
    terms AS (
        SELECT nn, n1,
               ((nn * m1 - rn * n1) * (nn * m1 - rn * n1) * 1024)
                   // (rn * (nn - rn)) AS t
        FROM cum WHERE rn < nn
    ),
    s AS (
        SELECT CAST(max(nn) AS BIGINT) AS nn,
               CAST(max(n1) AS BIGINT) AS n1,
               CAST(max(nn) - max(n1) AS BIGINT) AS n2,
               CAST(sum(t) AS BIGINT) AS tt
        FROM terms
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round(CAST(tt AS DOUBLE) / 1024 / n1 / n2, 6) AS a2_stat,
           1000 * tt > {_AD_95_X1000} * 1024 * n1 * n2
               AS distributions_differ
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_ad_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling test (Pettitt 1976) — the
    tail-weighted omnibus EDF test (where Cramér-von Mises weighs
    the middle, AD's 1/(j(N−j)) weight makes it the tail-sensitive
    complement of the existing agg_cvm_test): A² = (1/(n1·n2))
    Σ_(j=1)^(N−1) (N·M_j − j·n1)²/(j(N−j)) with M_j the count of
    sample-1 values among the j smallest pooled. The pooled order is
    the (cents, smp, day) TOTAL order (stated knob: daily-revenue
    cents make ties measure-zero, and both engines break any by the
    same key). Each rational term is floor-div QUANTIZED to the
    exact integer t_j = (N·M_j − j·n1)²·2¹⁰ div (j(N−j)) — int64 at
    any corpus scale since the frame is calendar-bounded (N⁴·2¹⁰ ≈
    6e17) — so Σt_j is an order-free integer sum and the downward
    quantization error is < (N−1)/(2¹⁰n1n2) ≈ 8e−7, identical on
    both engines (the ts_arch_lm device, floor-div form). Verdict
    A² > 2.492 (the asymptotic 5% point; Pettitt shows the
    two-sample statistic shares the one-sample null) as the EXACT
    integer predicate 1000·Σt > 2492·2¹⁰·n1·n2.

    Scale shape: one keyed reduce to ≤2·days rows, one bounded-axis
    rank window + one bounded-axis cumulative count, a 1-row
    reduce."""
    daily = _daily_2sample(spark, sf_dir)
    w_all = Window.partitionBy()
    rc = daily.select(
        "smp",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("nn"),
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .over(w_all)
        .cast("long")
        .alias("n1"),
    )
    cum = rc.select(
        "rn",
        "nn",
        "n1",
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .over(Window.orderBy("rn"))
        .cast("long")
        .alias("m1"),
    )
    terms = cum.where(F.col("rn") < F.col("nn")).select(
        "nn",
        "n1",
        F.expr(
            "((nn * m1 - rn * n1) * (nn * m1 - rn * n1) * 1024)"
            " div (rn * (nn - rn))"
        ).alias("t"),
    )
    s = terms.agg(
        F.max("nn").cast("long").alias("nn"),
        F.max("n1").cast("long").alias("n1"),
        (F.max("nn") - F.max("n1")).cast("long").alias("n2"),
        F.sum("t").cast("long").alias("tt"),
    )
    return s.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.round(
            F.col("tt").cast("double") / 1024 / F.col("n1") / F.col("n2"),
            6,
        ).alias("a2_stat"),
        (
            1000 * F.col("tt")
            > _AD_95_X1000 * 1024 * F.col("n1") * F.col("n2")
        ).alias("distributions_differ"),
    )
