"""§2 extensions, hundred-fifty-third wave — SPC pattern rules and
direction-run randomness.

- events_nelson_rules: the Nelson (1984) run-rules census on the
  daily error c-chart — rules 1 (beyond 3σ), 2 (9 same side),
  3 (6 trending), 4 (14 alternating). events_c_chart draws the
  limits; this counts the PATTERN signals an SPC operator actually
  reads, each as an exact integer window sum.
- ts_updown_runs: the runs-of-ups-and-downs test (Wallis & Moore
  1941) on the daily revenue series — randomness against short-term
  persistence using direction runs, where ts_runs_test's
  about-median split only sees level persistence and
  ts_turning_points counts extrema rather than runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_nelson_rules",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS t
        FROM daily
    ),
    sgn AS (
        SELECT dn, c, n, t,
               CASE WHEN n * c > t THEN 1
                    WHEN n * c < t THEN -1 ELSE 0 END AS side,
               CASE WHEN lag(c) OVER (ORDER BY dn) IS NULL THEN NULL
                    WHEN c > lag(c) OVER (ORDER BY dn) THEN 1
                    WHEN c < lag(c) OVER (ORDER BY dn) THEN -1
                    ELSE 0 END AS d
        FROM daily CROSS JOIN tot
    ),
    alt AS (
        SELECT dn, c, n, t, side, d,
               CASE WHEN d IS NULL
                         OR lag(d) OVER (ORDER BY dn) IS NULL THEN 0
                    WHEN d * lag(d) OVER (ORDER BY dn) = -1 THEN 1
                    ELSE 0 END AS a
        FROM sgn
    ),
    w AS (
        SELECT dn, c, n, t, side, d, a,
               sum(side) OVER (ORDER BY dn
                               ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
                   AS s9,
               count(*) OVER (ORDER BY dn
                              ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
                   AS k9,
               sum(CASE WHEN d = 1 THEN 1 WHEN d = -1 THEN -1 ELSE 0 END)
                   OVER (ORDER BY dn
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5,
               count(d) OVER (ORDER BY dn
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS k5,
               sum(a) OVER (ORDER BY dn
                            ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
                   AS a13,
               count(*) OVER (ORDER BY dn
                              ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
                   AS k13
        FROM alt
    )
    SELECT max(n) AS n_days,
           round(CAST(max(t) AS DOUBLE) / max(n), 4) AS cbar,
           CAST(count(*) FILTER (
                (c - CAST(t AS DOUBLE) / n)
                  * (c - CAST(t AS DOUBLE) / n)
                > 9 * CAST(t AS DOUBLE) / n) AS BIGINT) AS rule1_beyond_3sigma,
           CAST(count(*) FILTER (k9 = 9 AND abs(s9) = 9) AS BIGINT)
               AS rule2_nine_same_side,
           CAST(count(*) FILTER (k5 = 5 AND abs(s5) = 5) AS BIGINT)
               AS rule3_six_trending,
           CAST(count(*) FILTER (k13 = 13 AND a13 = 13) AS BIGINT)
               AS rule4_fourteen_alternating,
           count(*) FILTER (
                (c - CAST(t AS DOUBLE) / n)
                  * (c - CAST(t AS DOUBLE) / n)
                > 9 * CAST(t AS DOUBLE) / n)
             + count(*) FILTER (k9 = 9 AND abs(s9) = 9)
             + count(*) FILTER (k5 = 5 AND abs(s5) = 5)
             + count(*) FILTER (k13 = 13 AND a13 = 13) > 0 AS any_signal
    FROM w
    """,
    tags=("events", "stats"),
)
def events_nelson_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson run-rules census (Nelson 1984) on the daily error
    c-chart: with centerline c̄ = T/n and Poisson σ = √c̄, counts of
    rule-1 points beyond c̄±3σ (squared form (c−c̄)² > 9c̄ avoids the
    sqrt), rule-2 windows of 9 consecutive same-side points (side =
    sign(n·c − T), an EXACT integer comparison — the rational
    centerline never touches a float; |Σside over 9| = 9 ⟺ all nine
    strictly one side), rule-3 windows of 6 monotone points (5
    consecutive same-sign nonzero diffs), and rule-4 windows of 14
    alternating points (13 consecutive direction flips, d·d_prev =
    −1). events_c_chart draws the limits; these are the pattern
    alarms an SPC operator reads off the chart. Each rule is an
    integer window sum over the CALENDAR-BOUNDED daily axis; only
    rule 1's comparison uses the (identical textual) rational c̄.

    Scale shape: one daily reduce, a 1-row totals broadcast, lag +
    four rolling integer sums over the bounded daily axis (≤2.4k
    rows at any corpus scale), one scalar reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("t"),
    )
    w0 = Window.orderBy("dn")
    base = daily.crossJoin(F.broadcast(tot))
    side = (
        F.when(F.col("n") * F.col("c") > F.col("t"), 1)
        .when(F.col("n") * F.col("c") < F.col("t"), -1)
        .otherwise(0)
    )
    prev_c = F.lag("c").over(w0)
    d = (
        F.when(prev_c.isNull(), F.lit(None).cast("int"))
        .when(F.col("c") > prev_c, 1)
        .when(F.col("c") < prev_c, -1)
        .otherwise(0)
    )
    sgn = base.select("dn", "c", "n", "t", side.alias("side"), d.alias("d"))
    prev_d = F.lag("d").over(w0)
    a = (
        F.when(F.col("d").isNull() | prev_d.isNull(), 0)
        .when(F.col("d") * prev_d == -1, 1)
        .otherwise(0)
    )
    alt = sgn.withColumn("a", a)
    w9 = w0.rowsBetween(-8, 0)
    w5 = w0.rowsBetween(-4, 0)
    w13 = w0.rowsBetween(-12, 0)
    d5 = (
        F.when(F.col("d") == 1, 1).when(F.col("d") == -1, -1).otherwise(0)
    )
    w = alt.select(
        "dn",
        "c",
        "n",
        "t",
        F.sum("side").over(w9).alias("s9"),
        F.count(F.lit(1)).over(w9).alias("k9"),
        F.sum(d5).over(w5).alias("s5"),
        F.count("d").over(w5).alias("k5"),
        F.sum("a").over(w13).alias("a13"),
        F.count(F.lit(1)).over(w13).alias("k13"),
    )
    cbar = F.col("t").cast("double") / F.col("n")
    dev = F.col("c") - cbar
    r1 = F.sum(F.when(dev * dev > 9 * cbar, 1).otherwise(0)).cast("long")
    r2 = F.sum(
        F.when((F.col("k9") == 9) & (F.abs(F.col("s9")) == 9), 1).otherwise(0)
    ).cast("long")
    r3 = F.sum(
        F.when((F.col("k5") == 5) & (F.abs(F.col("s5")) == 5), 1).otherwise(0)
    ).cast("long")
    r4 = F.sum(
        F.when((F.col("k13") == 13) & (F.col("a13") == 13), 1).otherwise(0)
    ).cast("long")
    return w.agg(
        F.max("n").alias("n_days"),
        F.round(F.max("t").cast("double") / F.max("n"), 4).alias("cbar"),
        r1.alias("rule1_beyond_3sigma"),
        r2.alias("rule2_nine_same_side"),
        r3.alias("rule3_six_trending"),
        r4.alias("rule4_fourteen_alternating"),
        ((r1 + r2 + r3 + r4) > 0).alias("any_signal"),
    )


@register(
    "ts_updown_runs",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    d0 AS (
        SELECT dn,
               CASE WHEN cents > lag(cents) OVER (ORDER BY dn) THEN 1
                    WHEN cents < lag(cents) OVER (ORDER BY dn) THEN -1
                    ELSE 0 END AS d,
               lag(cents) OVER (ORDER BY dn) IS NULL AS is_first
        FROM daily
    ),
    dd AS (
        SELECT dn, d FROM d0 WHERE NOT is_first AND d <> 0
    ),
    runs AS (
        SELECT d,
               CASE WHEN lag(d) OVER (ORDER BY dn) IS NULL
                         OR d <> lag(d) OVER (ORDER BY dn)
                    THEN 1 ELSE 0 END AS new_run
        FROM dd
    ),
    s AS (
        SELECT CAST(count(*) + 1 AS BIGINT) AS n,
               CAST(sum(new_run) AS BIGINT) AS r
        FROM runs
    )
    SELECT n AS n_obs, r AS n_runs,
           round((2.0 * n - 1) / 3, 4) AS expected_runs,
           round((r - (2.0 * n - 1) / 3)
                 / sqrt((16.0 * n - 29) / 90), 4) AS z_stat,
           abs(round((r - (2.0 * n - 1) / 3)
                 / sqrt((16.0 * n - 29) / 90), 4)) > 1.96 AS non_random
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_updown_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs-of-ups-and-downs test (Wallis & Moore 1941; Gibbons 2003)
    on the daily revenue series: count maximal runs of consecutive
    same-direction day-over-day moves; under randomness
    E[R] = (2n−1)/3 and Var[R] = (16n−29)/90 (n = effective series
    length = nonzero moves + 1; exact-cent ties produce zero moves,
    which are DROPPED by the pinned convention on both sides), and
    z = (R − E)/√Var with the 1.96 verdict on the ROUNDED z. Too few
    runs ⇒ short-term persistence (momentum), too many ⇒ rapid
    oscillation — the direction-level randomness check beside
    ts_runs_test (level runs about the median) and ts_turning_points
    (extrema count, E = 2(n−2)/3): three different nulls, one
    family. Moves and run boundaries are exact integer comparisons
    of cent values; only the final z divides doubles built from one
    textual expression.

    Scale shape: one daily reduce, two lags over the
    calendar-bounded daily axis (≤2.4k rows at any scale), one
    scalar reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w0 = Window.orderBy("dn")
    prev = F.lag("cents").over(w0)
    d0 = daily.select(
        "dn",
        F.when(F.col("cents") > prev, 1)
        .when(F.col("cents") < prev, -1)
        .otherwise(0)
        .alias("d"),
        prev.isNull().alias("is_first"),
    )
    dd = d0.filter(~F.col("is_first") & (F.col("d") != 0))
    prev_d = F.lag("d").over(w0)
    runs = dd.select(
        F.when(prev_d.isNull() | (F.col("d") != prev_d), 1)
        .otherwise(0)
        .alias("new_run")
    )
    s = runs.agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n"),
        F.sum("new_run").cast("long").alias("r"),
    )
    n, r = F.col("n"), F.col("r")
    er = (2.0 * n - 1) / 3
    z = (r - er) / F.sqrt((16.0 * n - 29) / 90)
    return s.select(
        n.alias("n_obs"),
        r.alias("n_runs"),
        F.round(er, 4).alias("expected_runs"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) > 1.96).alias("non_random"),
    )
