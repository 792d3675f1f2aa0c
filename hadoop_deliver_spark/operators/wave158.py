"""§2 extensions, hundred-fifty-eighth wave — robust shape and scale
on the daily axis.

- ts_medcouple: the medcouple robust skewness (Brys, Hubert & Struyf
  2004) of the daily revenue distribution plus the Hubert–
  Vandervieren (2008) ADJUSTED boxplot fences it powers — the
  outlier rule that, unlike the ±1.5·IQR Tukey fence the dq family
  uses, does not flag half a skewed distribution's long tail.
- ts_sn_scale: Rousseeuw & Croux's (1993) Sₙ = c·med_i med_j |xᵢ−xⱼ|
  robust scale — the sibling of ts_qn_scale that keeps Qn's 50%
  breakdown and smooth influence WITHOUT Qn's order-statistic depth:
  an inner median per day, an outer median across days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_DAILY_SQL = """
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
"""


@register(
    "ts_medcouple",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    rk AS (
        SELECT dn, cents,
               row_number() OVER (ORDER BY cents, dn) AS r,
               count(*) OVER () AS n
        FROM daily
    ),
    q AS (
        SELECT max(n) AS n,
               max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN cents END) AS med,
               max(CASE WHEN r = CAST(ceil(0.25 * n) AS BIGINT)
                        THEN cents END) AS q1,
               max(CASE WHEN r = CAST(ceil(0.75 * n) AS BIGINT)
                        THEN cents END) AS q3
        FROM rk
    ),
    h AS (
        SELECT a.dn AS i, b.dn AS j,
               (CAST(a.cents - q.med AS DOUBLE) - (q.med - b.cents))
                   / (a.cents - b.cents) AS h,
               a.dn * 100000 + b.dn AS key
        FROM daily a
        JOIN daily b ON a.cents > b.cents
        CROSS JOIN q
        WHERE a.cents >= q.med AND b.cents <= q.med
    ),
    hm AS (
        SELECT CAST(count(*) AS BIGINT) AS m FROM h
    ),
    hrk AS (
        SELECT h, row_number() OVER (ORDER BY h, key) AS r
        FROM h
    ),
    mc AS (
        SELECT max(CASE WHEN hrk.r = CAST(ceil(0.5 * hm.m) AS BIGINT)
                        THEN hrk.h END) AS mc
        FROM hrk CROSS JOIN hm
    ),
    fen AS (
        SELECT q.n, q.q1, q.q3, mc.mc,
               q.q1 - 1.5 * exp(CASE WHEN mc.mc >= 0 THEN -4 * mc.mc
                                     ELSE -3 * mc.mc END)
                          * (q.q3 - q.q1) AS lo,
               q.q3 + 1.5 * exp(CASE WHEN mc.mc >= 0 THEN 3 * mc.mc
                                     ELSE 4 * mc.mc END)
                          * (q.q3 - q.q1) AS hi
        FROM q CROSS JOIN mc
    )
    SELECT fen.n AS n_days,
           round(fen.mc, 6) AS medcouple,
           fen.q1 AS q1_cents, fen.q3 AS q3_cents,
           round(fen.lo, 4) AS fence_lo,
           round(fen.hi, 4) AS fence_hi,
           CAST(count(*) FILTER (daily.cents < fen.lo
                                 OR daily.cents > fen.hi) AS BIGINT)
               AS n_outliers
    FROM daily CROSS JOIN fen
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
    tags=("timeseries", "stats"),
)
def ts_medcouple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medcouple robust skewness (Brys, Hubert & Struyf 2004) of the
    daily revenue distribution: MC = med{{h(xᵢ,xⱼ): xᵢ≥med, xⱼ≤med}}
    with h = ((xᵢ−med)−(med−xⱼ))/(xᵢ−xⱼ), plus the Hubert–
    Vandervieren (2008) adjusted boxplot fences
    [Q1 − 1.5e^(−4MC)·IQR, Q3 + 1.5e^(3MC)·IQR] (exponents swap to
    (−3, 4) for MC<0) and the day-count outside them. MC ∈ [−1,1]
    has a 25% breakdown and — unlike the moment skewness the
    agg_skew_kurtosis family reports — does not explode on one fat
    day; the adjusted fence is the outlier rule that stops flagging
    the healthy long tail of a skewed distribution (Tukey's ±1.5·IQR,
    as used by dq_outlier_iqr, flags up to ~15% of a lognormal).
    Pinned conventions: med/Q1/Q3 are type-1 order statistics at
    ranks ⌈n/2⌉, ⌈n/4⌉, ⌈3n/4⌉ (value-only selection — rank-tie
    permutations cannot change the selected VALUE), equal-value pairs
    xᵢ=xⱼ(=med) are excluded (the 0/0 kernel special-case of the
    original paper's sign rule — stated as the engine's convention),
    and the h-median picks rank ⌈m/2⌉ with (i,j)-key tiebreak. Each
    h divides exact integer differences, so both engines rank
    bit-identical doubles.

    Scale shape: one daily reduce, a ranked scan for three quantile
    probes, a TRUE pairwise join of the calendar-bounded daily
    series (≤days²/4 kernel pairs at ANY corpus scale — the
    ts_qn_scale envelope), one ranked scan of the bounded pair
    table, scalar assembly."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    rk = api.exact_global_rank(daily, "cents", "dn", "r")
    cnt = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    q = (
        rk.crossJoin(F.broadcast(cnt))
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("cents"),
                )
            ).alias("med"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.25 * F.col("n")).cast("long"),
                    F.col("cents"),
                )
            ).alias("q1"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.75 * F.col("n")).cast("long"),
                    F.col("cents"),
                )
            ).alias("q3"),
        )
    )
    a = daily.select(F.col("dn").alias("i"), F.col("cents").alias("xi"))
    b = daily.select(F.col("dn").alias("j"), F.col("cents").alias("xj"))
    h = (
        a.join(b, F.col("xi") > F.col("xj"))
        .crossJoin(F.broadcast(q.select("med")))
        .filter((F.col("xi") >= F.col("med")) & (F.col("xj") <= F.col("med")))
        .select(
            (
                (
                    (F.col("xi") - F.col("med")).cast("double")
                    - (F.col("med") - F.col("xj"))
                )
                / (F.col("xi") - F.col("xj"))
            ).alias("h"),
            (F.col("i") * 100000 + F.col("j")).alias("key"),
        )
    )
    hm = h.agg(F.count(F.lit(1)).cast("long").alias("m"))
    hrk = api.exact_global_rank(h, "h", "key", "r")
    mc = (
        hrk.crossJoin(F.broadcast(hm))
        .agg(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("m")).cast("long"),
                    F.col("h"),
                )
            ).alias("mc")
        )
    )
    fen = q.crossJoin(F.broadcast(mc)).select(
        "n",
        "q1",
        "q3",
        "mc",
        (
            F.col("q1")
            - 1.5
            * F.exp(
                F.when(F.col("mc") >= 0, -4 * F.col("mc")).otherwise(
                    -3 * F.col("mc")
                )
            )
            * (F.col("q3") - F.col("q1"))
        ).alias("lo"),
        (
            F.col("q3")
            + 1.5
            * F.exp(
                F.when(F.col("mc") >= 0, 3 * F.col("mc")).otherwise(
                    4 * F.col("mc")
                )
            )
            * (F.col("q3") - F.col("q1"))
        ).alias("hi"),
    )
    out = (
        daily.crossJoin(F.broadcast(fen))
        .groupBy("n", "mc", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(
                F.when(
                    (F.col("cents") < F.col("lo"))
                    | (F.col("cents") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return out.select(
        F.col("n").alias("n_days"),
        F.round("mc", 6).alias("medcouple"),
        F.col("q1").alias("q1_cents"),
        F.col("q3").alias("q3_cents"),
        F.round("lo", 4).alias("fence_lo"),
        F.round("hi", 4).alias("fence_hi"),
        F.col("n_outliers"),
    )


@register(
    "ts_sn_scale",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
        SELECT a.dn AS i, abs(a.cents - b.cents) AS d, b.dn AS j
        FROM daily a JOIN daily b ON a.dn <> b.dn
    ),
    inner_rk AS (
        SELECT i, d,
               row_number() OVER (PARTITION BY i ORDER BY d, j) AS r,
               count(*) OVER (PARTITION BY i) AS m
        FROM pairs
    ),
    inner_med AS (
        SELECT i,
               max(CASE WHEN r = CAST(ceil(0.5 * m) AS BIGINT)
                        THEN d END) AS di
        FROM inner_rk GROUP BY i
    ),
    outer_rk AS (
        SELECT di, row_number() OVER (ORDER BY di, i) AS r,
               count(*) OVER () AS n
        FROM inner_med
    )
    SELECT max(n) AS n_days,
           max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN di END) AS sn_raw_cents,
           round(1.1926 * max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                                   THEN di END) / 100.0, 4) AS sn_dollars
    FROM outer_rk
    """,
    tags=("timeseries", "stats"),
)
def ts_sn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rousseeuw–Croux Sₙ robust scale (1993) of the daily revenue
    series: Sₙ = 1.1926 · med_i ( med_{{j≠i}} |xᵢ − xⱼ| ) — for each
    day the median distance to every other day, then the median of
    those. Same 50% breakdown as ts_qn_scale's Qn but a different
    trade: Sn's nested medians need only rank-⌈m/2⌉ selections
    (both pinned type-1 with j / i tiebreaks), where Qn digs the
    k-th order statistic out of all C(n,2) pairwise differences —
    so Sn is the cheaper screen and Qn the higher-efficiency
    confirmatory number (82% vs 58% Gaussian efficiency runs the
    other way: Qn wins; the PAIR is the point). All distances are
    exact integer cents; 1.1926 is the published consistency
    constant, shared as a literal; the inner medians run in
    per-day window partitions (days partitions of ≤days rows), the
    outer median on the ≤days-row frame.

    Scale shape: one daily reduce, a TRUE pairwise join of the
    calendar-bounded daily series (the ts_qn_scale envelope),
    per-day partitioned rank windows, one bounded outer ranked
    scan."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    a = daily.select(F.col("dn").alias("i"), F.col("cents").alias("xi"))
    b = daily.select(F.col("dn").alias("j"), F.col("cents").alias("xj"))
    pairs = a.join(b, F.col("i") != F.col("j")).select(
        "i", F.abs(F.col("xi") - F.col("xj")).alias("d"), "j"
    )
    wi = Window.partitionBy("i").orderBy("d", "j")
    inner = pairs.select(
        "i",
        "d",
        F.row_number().over(wi).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("i")).alias("m"),
    )
    inner_med = inner.groupBy("i").agg(
        F.max(
            F.when(
                F.col("r") == F.ceil(0.5 * F.col("m")).cast("long"),
                F.col("d"),
            )
        ).alias("di")
    )
    outer = api.exact_global_rank(inner_med, "di", "i", "r")
    n = outer.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sel = F.max(
        F.when(
            F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"), F.col("di")
        )
    )
    return (
        outer.crossJoin(F.broadcast(n))
        .agg(
            F.max("n").alias("n_days"),
            sel.alias("sn_raw_cents"),
            F.round(1.1926 * sel / 100.0, 4).alias("sn_dollars"),
        )
    )
