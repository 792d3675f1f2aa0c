"""§2 extensions, seventy-seventh wave — robust two-sample location,
pocket counting, and level-stationarity / homogeneity of the revenue
series (published-method cadence).

- agg_brunner_munzel: the Brunner-Munzel generalized Wilcoxon test
  (2000) — does 5-LOW's daily revenue stochastically dominate
  1-URGENT's, without assuming equal variances?
- agg_tukey_quick: Tukey's quick ("pocket") two-sample test (1959)
  — the count-the-overhangs test with the famous ≥7 rule (doubled
  to ≥14 for half-credit ties).
- ts_kpss: the KPSS level-stationarity test (Kwiatkowski, Phillips,
  Schmidt & Shin 1992) on the daily-revenue series with a Bartlett
  long-run variance at fixed bandwidth 4.
- ts_buishand_range: Buishand's range test (1982) for homogeneity
  of the monthly-revenue series — the rescaled-partial-sum
  changepoint detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_brunner_munzel",
    """
    WITH daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT smp, day, cents,
               row_number() OVER (ORDER BY cents, smp, day) AS rn_c,
               row_number() OVER (PARTITION BY smp
                                  ORDER BY cents, day) AS rn_w
        FROM daily
    ),
    mid AS (
        SELECT rc.smp, bc.mn + bc.mx AS r2c, bw.mnw + bw.mxw AS r2w
        FROM rc
        JOIN (SELECT cents, CAST(min(rn_c) AS BIGINT) AS mn,
                     CAST(max(rn_c) AS BIGINT) AS mx
              FROM rc GROUP BY cents) bc ON bc.cents = rc.cents
        JOIN (SELECT smp, cents, CAST(min(rn_w) AS BIGINT) AS mnw,
                     CAST(max(rn_w) AS BIGINT) AS mxw
              FROM rc GROUP BY smp, cents) bw
          ON bw.smp = rc.smp AND bw.cents = rc.cents
    ),
    st AS (
        SELECT smp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r2c) AS BIGINT) AS t
        FROM mid GROUP BY smp
    ),
    v AS (
        SELECT mid.smp,
               CAST(sum(CAST(st.n * (mid.r2c - mid.r2w) - st.t
                             + st.n * (st.n + 1) AS HUGEINT)
                        * (st.n * (mid.r2c - mid.r2w) - st.t
                           + st.n * (st.n + 1))) AS HUGEINT) AS v
        FROM mid JOIN st ON st.smp = mid.smp
        GROUP BY mid.smp
    ),
    piv AS (
        SELECT max(CASE WHEN st.smp = 1 THEN st.n END) AS n1,
               max(CASE WHEN st.smp = 1 THEN st.t END) AS t1,
               max(CASE WHEN st.smp = 1 THEN v.v END) AS v1,
               max(CASE WHEN st.smp = 2 THEN st.n END) AS n2,
               max(CASE WHEN st.smp = 2 THEN st.t END) AS t2,
               max(CASE WHEN st.smp = 2 THEN v.v END) AS v2
        FROM st JOIN v ON v.smp = st.smp
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round((CAST(t2 AS DOUBLE) - CAST(n2 AS DOUBLE) * (n2 + 1))
                 / (2.0 * n1 * n2), 4) AS p_hat,
           round((CAST(n1 AS DOUBLE) * t2 - CAST(n2 AS DOUBLE) * t1)
                 / ((n1 + n2)
                    * sqrt(CAST(v1 AS DOUBLE) / (CAST(n1 AS DOUBLE)
                                                 * (n1 - 1))
                           + CAST(v2 AS DOUBLE) / (CAST(n2 AS DOUBLE)
                                                   * (n2 - 1)))), 4)
               AS w_stat,
           CAST(625 AS HUGEINT)
               * (CAST(n1 AS HUGEINT) * t2 - CAST(n2 AS HUGEINT) * t1)
               * (CAST(n1 AS HUGEINT) * t2 - CAST(n2 AS HUGEINT) * t1)
               * (CAST(n1 AS HUGEINT) * (n1 - 1))
               * (CAST(n2 AS HUGEINT) * (n2 - 1))
               > CAST(2401 AS HUGEINT)
                 * (CAST(n1 AS HUGEINT) + n2)
                 * (CAST(n1 AS HUGEINT) + n2)
                 * (CAST(v1 AS HUGEINT) * (CAST(n2 AS HUGEINT) * (n2 - 1))
                    + CAST(v2 AS HUGEINT)
                      * (CAST(n1 AS HUGEINT) * (n1 - 1)))
               AS significant
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test (Brunner & Munzel
    2000): does the daily revenue of 5-LOW priority stochastically
    dominate 1-URGENT's, WITHOUT the equal-variance assumption the
    plain Mann-Whitney needs? Samples are the calendar-bounded daily
    totals of the two priorities. With DOUBLED midranks (combined r2c
    and within-sample r2w) the per-sample rank sums T_i and the
    deviation square sums V_i = Σ(n_i·(r2c − r2w) − T_i + n_i(n_i+1))²
    are exact integers, where V_i = 4n_i²(n_i−1)·S_i² for Brunner-
    Munzel's tie-robust variance S_i². The statistic
    W = (n1·T2 − n2·T1) / (N·√(V1/(n1(n1−1)) + V2/(n2(n2−1)))) and
    the relative effect p̂ = (T2 − n2(n2+1))/(2n1n2) are display-only
    doubles assembled in one fixed textual order; the two-sided 5%
    verdict clears every root and denominator exactly:
    |W| > 49/25 ⇔ 625·(n1T2 − n2T1)²·n1(n1−1)·n2(n2−1)
                  > 2401·N²·(V1·n2(n2−1) + V2·n1(n1−1))
    — n⁶-scale cross-products in DECIMAL(38)/HUGEINT (≈10³⁷ at the
    7-year calendar span: bounded by days-of-history, not the corpus,
    so the envelope holds at any data scale).

    Scale shape: one keyed reduce of the fact table to ≤2·days rows,
    rank/tie windows over that bounded axis only (the ts_* bounded-
    window shape), then 2-row reduces."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
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
    rc = daily.select(
        "smp",
        "day",
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .alias("rn_c"),
        F.row_number()
        .over(Window.partitionBy("smp").orderBy("cents", "day"))
        .alias("rn_w"),
    )
    bc = rc.groupBy("cents").agg(
        F.min("rn_c").cast("long").alias("mn"),
        F.max("rn_c").cast("long").alias("mx"),
    )
    bw = rc.groupBy("smp", "cents").agg(
        F.min("rn_w").cast("long").alias("mnw"),
        F.max("rn_w").cast("long").alias("mxw"),
    )
    mid = (
        rc.join(F.broadcast(bc), "cents")
        .join(F.broadcast(bw), ["smp", "cents"])
        .select(
            "smp",
            (F.col("mn") + F.col("mx")).alias("r2c"),
            (F.col("mnw") + F.col("mxw")).alias("r2w"),
        )
    )
    st = mid.groupBy("smp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2c").cast("long").alias("t"),
    )
    dev = (
        F.col("n") * (F.col("r2c") - F.col("r2w"))
        - F.col("t")
        + F.col("n") * (F.col("n") + 1)
    ).cast("decimal(38,0)")
    v = (
        mid.join(F.broadcast(st), "smp")
        .groupBy("smp")
        .agg(F.sum(dev * dev).alias("v"))
    )
    piv = (
        st.join(v, "smp")
        .agg(
            *[
                F.max(F.when(F.col("smp") == i, F.col(c))).alias(f"{c}{i}")
                for i in (1, 2)
                for c in ("n", "t", "v")
            ]
        )
    )
    n1, t1, v1 = F.col("n1"), F.col("t1"), F.col("v1")
    n2, t2, v2 = F.col("n2"), F.col("t2"), F.col("v2")
    num38 = (
        n1.cast("decimal(38,0)") * t2 - n2.cast("decimal(38,0)") * t1
    )
    nn38 = (n1 + n2).cast("decimal(38,0)")
    return piv.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(
            (t2.cast("double") - n2.cast("double") * (n2 + 1))
            / (2.0 * n1 * n2),
            4,
        ).alias("p_hat"),
        F.round(
            (n1.cast("double") * t2 - n2.cast("double") * t1)
            / (
                (n1 + n2)
                * F.sqrt(
                    v1.cast("double") / (n1.cast("double") * (n1 - 1))
                    + v2.cast("double") / (n2.cast("double") * (n2 - 1))
                )
            ),
            4,
        ).alias("w_stat"),
        (
            625
            * num38
            * num38
            * (n1.cast("decimal(38,0)") * (n1 - 1))
            * (n2.cast("decimal(38,0)") * (n2 - 1))
            > 2401
            * nn38
            * nn38
            * (
                v1 * (n2.cast("decimal(38,0)") * (n2 - 1))
                + v2 * (n1.cast("decimal(38,0)") * (n1 - 1))
            )
        ).alias("significant"),
    )


@register(
    "agg_tukey_quick",
    """
    WITH daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    ),
    ext AS (
        SELECT CAST(min(CASE WHEN smp = 1 THEN cents END) AS BIGINT) mn1,
               CAST(max(CASE WHEN smp = 1 THEN cents END) AS BIGINT) mx1,
               CAST(min(CASE WHEN smp = 2 THEN cents END) AS BIGINT) mn2,
               CAST(max(CASE WHEN smp = 2 THEN cents END) AS BIGINT) mx2,
               CAST(count(CASE WHEN smp = 1 THEN 1 END) AS BIGINT) n1,
               CAST(count(CASE WHEN smp = 2 THEN 1 END) AS BIGINT) n2
        FROM daily
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           (mx1 > mx2 AND mn1 > mn2) OR (mx2 > mx1 AND mn2 > mn1)
               AS applicable,
           CAST(CASE
             WHEN mx1 > mx2 AND mn1 > mn2 THEN
               (SELECT sum(CASE WHEN smp = 1 AND cents > mx2 THEN 2
                                WHEN smp = 1 AND cents = mx2 THEN 1
                                WHEN smp = 2 AND cents < mn1 THEN 2
                                WHEN smp = 2 AND cents = mn1 THEN 1
                                ELSE 0 END) FROM daily)
             WHEN mx2 > mx1 AND mn2 > mn1 THEN
               (SELECT sum(CASE WHEN smp = 2 AND cents > mx1 THEN 2
                                WHEN smp = 2 AND cents = mx1 THEN 1
                                WHEN smp = 1 AND cents < mn2 THEN 2
                                WHEN smp = 1 AND cents = mn2 THEN 1
                                ELSE 0 END) FROM daily)
             ELSE 0 END AS BIGINT) AS t2_doubled,
           ((mx1 > mx2 AND mn1 > mn2) OR (mx2 > mx1 AND mn2 > mn1))
               AND CASE
                 WHEN mx1 > mx2 AND mn1 > mn2 THEN
                   (SELECT sum(CASE WHEN smp = 1 AND cents > mx2 THEN 2
                                    WHEN smp = 1 AND cents = mx2 THEN 1
                                    WHEN smp = 2 AND cents < mn1 THEN 2
                                    WHEN smp = 2 AND cents = mn1 THEN 1
                                    ELSE 0 END) FROM daily)
                 WHEN mx2 > mx1 AND mn2 > mn1 THEN
                   (SELECT sum(CASE WHEN smp = 2 AND cents > mx1 THEN 2
                                    WHEN smp = 2 AND cents = mx1 THEN 1
                                    WHEN smp = 1 AND cents < mn2 THEN 2
                                    WHEN smp = 1 AND cents = mn2 THEN 1
                                    ELSE 0 END) FROM daily)
                 ELSE 0 END >= 14 AS significant
    FROM ext
    """,
    tags=("agg", "stats"),
)
def agg_tukey_quick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's quick two-sample test (Tukey 1959, "A quick, compact,
    two-sample test to Duckworth's specifications"): if one sample
    holds the overall maximum and the other the overall minimum, the
    statistic is the count of values in the high sample above ALL of
    the low sample plus values in the low sample below ALL of the
    high sample — T ≥ 7 rejects at ≈5% for any near-equal sample
    sizes (Tukey's "seven-rule"; boundary ties count ½). Samples are
    the two priorities' daily revenue totals. Everything is exact
    integer counting: ties enter at half weight, so the DOUBLED count
    T2 compares against 14; `applicable` reports the overlap
    precondition (both extremes in one sample → the test is void).

    Scale shape: one keyed reduce to ≤2·days rows, a 1-row extremes
    aggregate broadcast back over the bounded daily axis, one more
    1-row reduce — no windows, no corpus-sized state."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
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
    ext = daily.agg(
        F.min(F.when(F.col("smp") == 1, F.col("cents")))
        .cast("long")
        .alias("mn1"),
        F.max(F.when(F.col("smp") == 1, F.col("cents")))
        .cast("long")
        .alias("mx1"),
        F.min(F.when(F.col("smp") == 2, F.col("cents")))
        .cast("long")
        .alias("mn2"),
        F.max(F.when(F.col("smp") == 2, F.col("cents")))
        .cast("long")
        .alias("mx2"),
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .cast("long")
        .alias("n1"),
        F.count(F.when(F.col("smp") == 2, F.lit(1)))
        .cast("long")
        .alias("n2"),
    )
    joined = daily.crossJoin(F.broadcast(ext))
    hi1 = (F.col("mx1") > F.col("mx2")) & (F.col("mn1") > F.col("mn2"))
    hi2 = (F.col("mx2") > F.col("mx1")) & (F.col("mn2") > F.col("mn1"))
    w1 = (
        F.when((F.col("smp") == 1) & (F.col("cents") > F.col("mx2")), 2)
        .when((F.col("smp") == 1) & (F.col("cents") == F.col("mx2")), 1)
        .when((F.col("smp") == 2) & (F.col("cents") < F.col("mn1")), 2)
        .when((F.col("smp") == 2) & (F.col("cents") == F.col("mn1")), 1)
        .otherwise(0)
    )
    w2 = (
        F.when((F.col("smp") == 2) & (F.col("cents") > F.col("mx1")), 2)
        .when((F.col("smp") == 2) & (F.col("cents") == F.col("mx1")), 1)
        .when((F.col("smp") == 1) & (F.col("cents") < F.col("mn2")), 2)
        .when((F.col("smp") == 1) & (F.col("cents") == F.col("mn2")), 1)
        .otherwise(0)
    )
    t2 = F.sum(
        F.when(hi1, w1).when(hi2, w2).otherwise(F.lit(0))
    ).cast("long")
    return joined.agg(
        F.max("n1").cast("long").alias("n_urgent"),
        F.max("n2").cast("long").alias("n_low"),
        F.max(hi1.cast("int") + hi2.cast("int") > 0).alias("applicable"),
        t2.alias("t2_doubled"),
        (
            F.max(hi1.cast("int") + hi2.cast("int") > 0)
            & (t2 >= 14)
        ).alias("significant"),
    )


@register(
    "ts_kpss",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS dollars
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, dollars,
               row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS n,
               sum(dollars) OVER () AS tot,
               sum(dollars) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pfx
        FROM daily
    ),
    e AS (
        SELECT t,
               CAST(n AS BIGINT) * dollars - tot AS ee,
               CAST(n AS BIGINT) * pfx - CAST(t AS BIGINT) * tot AS ss,
               n
        FROM seq
    ),
    lagged AS (
        SELECT ee, ss, n,
               lag(ee, 1) OVER (ORDER BY t) AS e1,
               lag(ee, 2) OVER (ORDER BY t) AS e2,
               lag(ee, 3) OVER (ORDER BY t) AS e3,
               lag(ee, 4) OVER (ORDER BY t) AS e4
        FROM e
    ),
    s AS (
        SELECT CAST(sum(CAST(ss AS HUGEINT) * ss) AS HUGEINT) AS s2,
               CAST(sum(CAST(ee AS HUGEINT) * ee) AS HUGEINT) AS g0,
               CAST(sum(CAST(ee AS HUGEINT) * e1) AS HUGEINT) AS g1,
               CAST(sum(CAST(ee AS HUGEINT) * e2) AS HUGEINT) AS g2,
               CAST(sum(CAST(ee AS HUGEINT) * e3) AS HUGEINT) AS g3,
               CAST(sum(CAST(ee AS HUGEINT) * e4) AS HUGEINT) AS g4,
               CAST(max(n) AS BIGINT) AS n
        FROM lagged
    )
    SELECT n AS n_days,
           round(5.0 * s2
                 / (CAST(n AS DOUBLE)
                    * (5.0 * g0 + 8.0 * g1 + 6.0 * g2 + 4.0 * g3
                       + 2.0 * g4)), 4) AS eta,
           CAST(5000 AS HUGEINT) * s2
               > CAST(463 AS HUGEINT) * n
                 * (5 * g0 + 8 * g1 + 6 * g2 + 4 * g3 + 2 * g4)
               AS nonstationary
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    Shin 1992) on the daily-revenue series: η = ΣS_t²/(n²·σ̂²_lrv)
    with S_t the partial sums of the demeaned series and σ̂²_lrv the
    Bartlett-kernel long-run variance at FIXED bandwidth m=4 (the
    data-dependent n^(1/4) rule lands at 4-8 for any multi-year daily
    span; the literal is shared textually by both engines). Scaling
    the residuals by n keeps everything integral: ẽ_t = n·y_t − T and
    S̃_t = n·P_t − t·T are exact int64s; ΣS̃² and the autocovariance
    cross-products Γ_j = Σẽ_tẽ_(t−j) promote to DECIMAL(38)/HUGEINT.
    Since η = 5ΣS̃²/(n·(5Γ0 + 8Γ1 + 6Γ2 + 4Γ3 + 2Γ4)), the 5%
    verdict (critical value 0.463 = 463/1000) is the exact integer
    cross-product 5000·ΣS̃² > 463·n·(5Γ0+8Γ1+6Γ2+4Γ3+2Γ4); η itself
    is a display-only double divided once. Envelope: ΣS̃² ≲ n³·maxẽ²
    ≈ 10³³ at the 7-year span and sf0.1 daily dollars — corpus-
    proportional values put the DECIMAL(38) ceiling near 10⁴× that
    revenue density; past it, re-quantize y to thousands (the
    agg_wilcoxon_signedrank envelope convention).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series; prefix/lag windows run over that bounded axis only (the
    ts_* bounded-window shape), then one 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("dollars")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("day")
    w_pfx = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    seq = daily.select(
        "day",
        "dollars",
        F.row_number().over(w_ord).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("dollars").over(w_all).alias("tot"),
        F.sum("dollars").over(w_pfx).alias("pfx"),
    )
    e = seq.select(
        "t",
        (F.col("n") * F.col("dollars") - F.col("tot"))
        .cast("long")
        .alias("ee"),
        (F.col("n") * F.col("pfx") - F.col("t") * F.col("tot"))
        .cast("long")
        .alias("ss"),
        "n",
    )
    lagged = e.select(
        "ee",
        "ss",
        "n",
        *[F.lag("ee", j).over(Window.orderBy("t")).alias(f"e{j}") for j in (1, 2, 3, 4)],
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = lagged.agg(
        F.sum(d38("ss") * F.col("ss")).alias("s2"),
        F.sum(d38("ee") * F.col("ee")).alias("g0"),
        F.sum(d38("ee") * F.col("e1")).alias("g1"),
        F.sum(d38("ee") * F.col("e2")).alias("g2"),
        F.sum(d38("ee") * F.col("e3")).alias("g3"),
        F.sum(d38("ee") * F.col("e4")).alias("g4"),
        F.max("n").cast("long").alias("n"),
    )
    s2, n = F.col("s2"), F.col("n")
    d5 = (
        5 * F.col("g0")
        + 8 * F.col("g1")
        + 6 * F.col("g2")
        + 4 * F.col("g3")
        + 2 * F.col("g4")
    )
    return s.select(
        n.alias("n_days"),
        F.round(
            5.0
            * s2.cast("double")
            / (
                n.cast("double")
                * (
                    5.0 * F.col("g0")
                    + 8.0 * F.col("g1")
                    + 6.0 * F.col("g2")
                    + 4.0 * F.col("g3")
                    + 2.0 * F.col("g4")
                )
            ),
            4,
        ).alias("eta"),
        (5000 * s2 > 463 * n.cast("decimal(38,0)") * d5).alias(
            "nonstationary"
        ),
    )


@register(
    "ts_buishand_range",
    """
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS dollars
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT m, dollars,
               row_number() OVER (ORDER BY m) AS t,
               count(*) OVER () AS n,
               sum(dollars) OVER () AS tot,
               sum(dollars) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pfx
        FROM monthly
    ),
    e AS (
        SELECT m, t, n,
               CAST(n AS BIGINT) * dollars - tot AS ee,
               CAST(n AS BIGINT) * pfx - CAST(t AS BIGINT) * tot AS ss
        FROM seq
    ),
    s AS (
        SELECT CAST(greatest(max(ss), 0) - least(min(ss), 0) AS BIGINT)
                   AS rng,
               CAST(sum(CAST(ee AS HUGEINT) * ee) AS HUGEINT) AS g0,
               CAST(max(n) AS BIGINT) AS n
        FROM e
    ),
    cp AS (
        SELECT min(m) AS change_month
        FROM e
        WHERE abs(ss) = (SELECT max(abs(ss)) FROM e)
    )
    SELECT s.n AS n_months,
           round(CAST(rng AS DOUBLE) / sqrt(CAST(g0 AS DOUBLE)), 4)
               AS r_over_sqrt_n,
           cp.change_month,
           CAST(400 AS HUGEINT) * rng * rng
               > CAST(961 AS HUGEINT) * g0 AS significant
    FROM s, cp
    """,
    tags=("timeseries", "stats"),
)
def ts_buishand_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buishand's range test for series homogeneity (Buishand 1982):
    rescaled partial sums S_k of the demeaned monthly-revenue series;
    R = (max S_k − min S_k)/D_y and R/√n exceeding the asymptotic 5%
    point 1.55 flags an inhomogeneity (mean shift), with the argmax
    month reported as the changepoint. With the n-scaled integers
    ẽ = n·y − T and S̃_k = n·P_k − k·T, the identity R/√n =
    (max S̃ − min S̃)/√Σẽ² clears both the n's and D_y, so the verdict
    is the exact cross-product 400·(ΔS̃)² > 961·Σẽ² (1.55 = 31/20
    shared textually; S̃_0 = S̃_n = 0 puts 0 in the range by
    construction). The changepoint is the earliest month attaining
    max|S̃_k| — an exact integer argmax. R/√n is a display-only
    double divided once. Calendar-bounded axis (months of history)
    at any corpus scale; the DECIMAL(38) envelope mirrors ts_kpss.

    Scale shape: one keyed reduce to the ≤hundreds-of-months series,
    prefix windows over that bounded axis, a 1-row range/Σẽ² reduce,
    and a broadcast argmax join."""
    o = tbl(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("dollars")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("m")
    w_pfx = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    seq = monthly.select(
        "m",
        "dollars",
        F.row_number().over(w_ord).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("dollars").over(w_all).alias("tot"),
        F.sum("dollars").over(w_pfx).alias("pfx"),
    )
    e = seq.select(
        "m",
        "n",
        (F.col("n") * F.col("dollars") - F.col("tot"))
        .cast("long")
        .alias("ee"),
        (F.col("n") * F.col("pfx") - F.col("t") * F.col("tot"))
        .cast("long")
        .alias("ss"),
    )
    s = e.agg(
        (
            F.greatest(F.max("ss"), F.lit(0))
            - F.least(F.min("ss"), F.lit(0))
        )
        .cast("long")
        .alias("rng"),
        F.sum(F.col("ee").cast("decimal(38,0)") * F.col("ee")).alias(
            "g0"
        ),
        F.max("n").cast("long").alias("n"),
        F.max(F.abs(F.col("ss"))).cast("long").alias("mxabs"),
    )
    cp = (
        e.crossJoin(F.broadcast(s.select("mxabs")))
        .filter(F.abs(F.col("ss")) == F.col("mxabs"))
        .agg(F.min("m").alias("change_month"))
    )
    rng, g0, n = F.col("rng"), F.col("g0"), F.col("n")
    return (
        s.crossJoin(F.broadcast(cp))
        .select(
            n.alias("n_months"),
            F.round(
                rng.cast("double") / F.sqrt(g0.cast("double")), 4
            ).alias("r_over_sqrt_n"),
            "change_month",
            (
                400 * rng.cast("decimal(38,0)") * rng > 961 * g0
            ).alias("significant"),
        )
    )
