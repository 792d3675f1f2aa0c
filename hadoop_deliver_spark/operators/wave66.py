"""§2 extensions, ninetieth wave — multivariate screening, circular
EDF part 2, information-theoretic sequence structure, and spectral
detection classics (published-method cadence).

- agg_mahalanobis_outliers: the Mahalanobis-distance bivariate
  outlier screen (1936) over lineitem (price, quantity) — closed-form
  2×2 inverse from exact moments.
- orders_watson_u2: Watson's U² circular Cramér-von Mises test
  (1961) of weekday uniformity — Kuiper's quadratic sibling.
- ts_schuster_weekly: Schuster's periodogram test (1898) for a
  7-day cycle in daily revenue — exact weekday-bucket sums against
  textually shared cos/sin literals, χ²₂ verdict.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₂: 99% (Mahalanobis per-point screen) and 95% (Schuster verdict);
# Watson's asymptotic U² 5% point 0.187 enters ×1000 in the exact
# integer verdict
_CHI2_2_99 = "9.21034"
_CHI2_2_95 = "5.991465"
_WATSON_1000 = 187

# cos/sin(2πk/7), k = 0..6, rounded to 15 decimals — the SAME literal
# text reaches both engines (never a library cos, which would differ
# from these by representation)
_COS7 = [f"{math.cos(2 * math.pi * k / 7):.15f}" for k in range(7)]
_SIN7 = [f"{math.sin(2 * math.pi * k / 7):.15f}" for k in range(7)]


@register(
    "agg_mahalanobis_outliers",
    f"""
    WITH base AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS x,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(q) AS HUGEINT) AS sq,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq,
               CAST(sum(CAST(x AS HUGEINT) * q) AS HUGEINT) AS sxq
        FROM base
    ),
    c AS (
        SELECT n, sx, sq,
               CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * sqq - sq * sq AS DOUBLE) AS cqq,
               CAST(CAST(n AS HUGEINT) * sxq - sx * sq AS DOUBLE) AS cxq
        FROM m
    ),
    scored AS (
        SELECT c.n,
               CASE WHEN (c.n - 1)
                         * (CAST(CAST(c.n AS HUGEINT) * b.x - c.sx
                                 AS DOUBLE)
                            * CAST(CAST(c.n AS HUGEINT) * b.x - c.sx
                                   AS DOUBLE) * c.cqq
                            - 2 * CAST(CAST(c.n AS HUGEINT) * b.x - c.sx
                                       AS DOUBLE)
                              * CAST(CAST(c.n AS HUGEINT) * b.q - c.sq
                                     AS DOUBLE) * c.cxq
                            + CAST(CAST(c.n AS HUGEINT) * b.q - c.sq
                                   AS DOUBLE)
                              * CAST(CAST(c.n AS HUGEINT) * b.q - c.sq
                                     AS DOUBLE) * c.cxx)
                        > {_CHI2_2_99} * c.n
                          * (c.cxx * c.cqq - c.cxq * c.cxq)
                    THEN 1 ELSE 0 END AS is_out
        FROM base b, c
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(is_out) AS BIGINT) AS n_outliers,
           round(CAST(sum(is_out) AS DOUBLE) / max(n), 6) AS outlier_rate
    FROM scored
    """,
    tags=("agg", "stats"),
)
def agg_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mahalanobis-distance outlier screen (1936) on the bivariate
    (extendedprice, quantity) cloud: flag rows with d² > χ²₂(0.99),
    the standard multivariate QC gate that catches jointly-unusual
    points a per-column z-screen misses (price and quantity are
    strongly correlated — the ellipse matters). With u = n·x − Σx,
    v = n·q − Σq (exact ints) and centered moments C, the 2×2
    inverse is closed-form: d² = (n−1)(u²C_qq − 2uvC_xq + v²C_xx)/
    (n(C_xxC_qq − C_xq²)) — the quadratic form would burst
    DECIMAL(38) (u²·C ≈ 10⁵⁸), so each row evaluates it in doubles
    from exact integer inputs in ONE fixed textual order — identical
    IEEE ops on identical inputs give identical per-row verdicts on
    both engines, and the outlier COUNT is then exact. Moments
    broadcast as a 1-row frame; two scans total.

    Scale shape: one map-side-combinable moment reduce over the
    BIGGEST fact table, one broadcast-join screening scan — no
    shuffle of the fact table, no window, no sort."""
    li = tbl(spark, sf_dir, "lineitem")
    base = li.select(
        (dec2("l_extendedprice") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    x38 = F.col("x").cast("decimal(38,0)")
    q38 = F.col("q").cast("decimal(38,0)")
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x38).alias("sx"),
        F.sum(q38).alias("sq"),
        F.sum(x38 * F.col("x")).alias("sxx"),
        F.sum(q38 * F.col("q")).alias("sqq"),
        F.sum(x38 * F.col("q")).alias("sxq"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    c = m.select(
        "n",
        "sx",
        "sq",
        (n38 * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("sqq") - F.col("sq") * F.col("sq"))
        .cast("double")
        .alias("cqq"),
        (n38 * F.col("sxq") - F.col("sx") * F.col("sq"))
        .cast("double")
        .alias("cxq"),
    )
    scored = base.crossJoin(F.broadcast(c))
    u = (n38 * F.col("x") - F.col("sx")).cast("double")
    v = (n38 * F.col("q") - F.col("sq")).cast("double")
    cxx, cqq, cxq = F.col("cxx"), F.col("cqq"), F.col("cxq")
    lhs = (F.col("n") - 1) * (
        u * u * cqq - 2 * u * v * cxq + v * v * cxx
    )
    rhs = (
        float(_CHI2_2_99) * F.col("n") * (cxx * cqq - cxq * cxq)
    )
    flagged = scored.select(
        "n", F.when(lhs > rhs, 1).otherwise(0).alias("is_out")
    )
    return flagged.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.sum("is_out").cast("long").alias("n_outliers"),
        F.round(
            F.sum("is_out").cast("double") / F.max("n"), 6
        ).alias("outlier_rate"),
    )


@register(
    "orders_watson_u2",
    f"""
    WITH base AS (
        SELECT CAST(CAST(o_orderdate AS DATE)
                    - DATE '1992-01-01' AS BIGINT) % 7 AS wd
        FROM orders
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN wd = {j} THEN 1 END) AS BIGINT)"
                f" AS c{j}"
                for j in range(7)
            )},
            CAST(count(*) AS BIGINT) AS n
        FROM base
    ),
    nums AS (
        SELECT n,
            {", ".join(
                f"CAST(7 * ({' + '.join(f'c{i}' for i in range(j + 1))})"
                f" - {j + 1} * n AS HUGEINT) AS d{j}"
                for j in range(7)
            )}
        FROM piv
    ),
    ab AS (
        SELECT n,
               {" + ".join(f"d{j} * d{j}" for j in range(7))} AS a,
               {" + ".join(f"d{j}" for j in range(7))} AS b
        FROM nums
    )
    SELECT n AS n_orders,
           round(CAST(7 * a - b * b AS DOUBLE) / (2401 * n), 6)
               AS u2_stat,
           1000 * (7 * a - b * b) > {_WATSON_1000} * 2401
               * CAST(n AS HUGEINT) AS nonuniform
    FROM ab
    """,
    tags=("agg", "stats"),
)
def orders_watson_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watson's U² test (1961) of weekday uniformity — the CIRCULAR
    Cramér-von Mises, the quadratic sibling of agg_kuiper_weekday
    (Kuiper integrates the sup-deviations, U² the mean-square
    deviation around its own mean, making it rotation-invariant and
    more powerful against diffuse multi-cell departures). Same
    engine-shared weekday (date − 1992-01-01) mod 7 and equal-cell
    discrete convention (weights 1/7, stated knob): with num_j =
    7C_j − (j+1)n (exact ints from the 7-cell pivot),
    U² = (7Σnum² − (Σnum)²)/(2401·n) is an exact integer ratio and
    the asymptotic 5% verdict U² > 0.187 is the EXACT predicate
    1000·(7Σnum² − (Σnum)²) > 187·2401·n — no float anywhere near
    the decision. Fixed literal-order 7-term assembly; no window,
    no sort.

    Scale shape: ONE map-side-combinable reduce over the fact table
    to a 1-row 7-cell pivot."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            % 7
        ).alias("wd")
    )
    piv = base.agg(
        *[
            F.count(F.when(F.col("wd") == j, F.lit(1)))
            .cast("long")
            .alias(f"c{j}")
            for j in range(7)
        ],
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    n = F.col("n")
    num_cols = [n]
    for j in range(7):
        s = F.col("c0")
        for i in range(1, j + 1):
            s = s + F.col(f"c{i}")
        num_cols.append(
            (7 * s - (j + 1) * n).cast("decimal(38,0)").alias(f"d{j}")
        )
    nums = piv.select(*num_cols)
    a = b = None
    for j in range(7):
        d = F.col(f"d{j}")
        a = d * d if a is None else a + d * d
        b = d if b is None else b + d
    ab = nums.select("n", a.alias("a"), b.alias("b"))
    a, b = F.col("a"), F.col("b")
    n38 = F.col("n").cast("decimal(38,0)")
    return ab.select(
        F.col("n").alias("n_orders"),
        F.round(
            (7 * a - b * b).cast("double") / (2401 * F.col("n")), 6
        ).alias("u2_stat"),
        (1000 * (7 * a - b * b) > _WATSON_1000 * 2401 * n38).alias(
            "nonuniform"
        ),
    )


@register(
    "ts_schuster_weekly",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(o_orderdate AS DATE)
                    - DATE '1992-01-01' AS BIGINT) % 7 AS wd,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1, 2
    ),
    resid AS (
        SELECT wd,
               CAST(CAST(count(*) OVER () AS BIGINT) * y
                    - sum(y) OVER () AS BIGINT) AS e
        FROM daily
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS c0,
               {", ".join(
                   f"CAST(sum(CASE WHEN wd = {w} THEN CAST(e AS HUGEINT)"
                   f" ELSE 0 END) AS HUGEINT) AS ew{w}"
                   for w in range(7)
               )}
        FROM resid
    ),
    p AS (
        SELECT n, c0,
               {" + ".join(
                   f"({_COS7[w]}) * CAST(ew{w} AS DOUBLE)"
                   for w in range(7)
               )} AS pc,
               {" + ".join(
                   f"({_SIN7[w]}) * CAST(ew{w} AS DOUBLE)"
                   for w in range(7)
               )} AS ps
        FROM m
    )
    SELECT n AS n_days,
           round(2 * (pc * pc + ps * ps)
                 / CAST(c0 AS DOUBLE), 6)
               AS z_stat,
           2 * (pc * pc + ps * ps)
               > {_CHI2_2_95} * CAST(c0 AS DOUBLE)
               AS weekly_cycle
    FROM p
    """,
    tags=("timeseries", "stats"),
)
def ts_schuster_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster's periodogram TEST (1898) for a 7-day cycle in daily
    revenue — where ts_weekly_periodogram (events, per-type) reports
    the raw power and variance share, this op supplies the missing
    SIGNIFICANCE decision on the revenue series: the
    periodogram ordinate at the weekly frequency, z = 2·I(1/7)/σ̂²
    = 2(P_c² + P_s²)/Σe² ~ χ²₂ under white noise. The residuals are
    n-SCALED integers (e_t = n·y_t − Σy = n·(y_t − ȳ), exact), and
    the n² scale cancels BETWEEN numerator and denominator: P_c²+P_s²
    = n²·(P̃_c²+P̃_s²) while Σe² = n²·Σε², so 2(P_c²+P_s²)/Σe² equals
    the textbook 2(P̃_c²+P̃_s²)/Σε² with no residual n factor — an
    extra ÷n here would deflate z by ~n and zero the test's power
    (the round-10 advisor caught exactly that defect).
    Because the frequency is exactly one cycle per 7 days,
    cos/sin(2πt/7) take only SEVEN values: P_c = Σ_w cos_w·E_w with
    E_w = Σ_(t≡w) e_t EXACT DECIMAL(38)/HUGEINT weekday-bucket sums
    and cos_w/sin_w 15-digit literals shared TEXTUALLY by both
    engines (never a library cos — those differ between libms; a
    literal cannot). The whole spectral statistic therefore reduces
    to a 7-cell exact pivot and a fixed-order 7-term double dot
    product; verdict z > χ²₂(0.95) with the shared literal. Weekday
    = (date − 1992-01-01) mod 7, the agg_kuiper_weekday convention.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, two bounded count/sum windows, a 1-row 7-bucket
    reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            % 7
        ).alias("wd"),
    ).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_all = Window.partitionBy()
    resid = daily.select(
        "wd",
        (
            F.count(F.lit(1)).over(w_all) * F.col("y")
            - F.sum("y").over(w_all)
        )
        .cast("long")
        .alias("e"),
    )
    e38 = F.col("e").cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    m = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(e38 * F.col("e")).alias("c0"),
        *[
            F.sum(
                F.when(F.col("wd") == w, e38).otherwise(zero)
            ).alias(f"ew{w}")
            for w in range(7)
        ],
    )
    pc = ps = None
    for w in range(7):
        cw = float(_COS7[w]) * F.col(f"ew{w}").cast("double")
        sw = float(_SIN7[w]) * F.col(f"ew{w}").cast("double")
        pc = cw if pc is None else pc + cw
        ps = sw if ps is None else ps + sw
    p = m.select("n", "c0", pc.alias("pc"), ps.alias("ps"))
    n, c0 = F.col("n"), F.col("c0")
    pwr = F.col("pc") * F.col("pc") + F.col("ps") * F.col("ps")
    return p.select(
        n.alias("n_days"),
        F.round(2 * pwr / c0.cast("double"), 6).alias("z_stat"),
        (2 * pwr > float(_CHI2_2_95) * c0.cast("double")).alias(
            "weekly_cycle"
        ),
    )
