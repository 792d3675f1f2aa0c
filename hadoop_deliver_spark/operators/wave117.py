"""§2 extensions, hundred-seventeenth wave — autocorrelation-robust
trend inference and two-sample Poisson rates.

- ts_newey_west_trend: OLS daily trend slope per event type with the
  Newey–West (1987) HAC standard error (Bartlett kernel, 5 lags) —
  the autocorrelation-honest t-statistic; complements
  ts_durbin_watson (which only DETECTS the autocorrelation that
  invalidates the iid SE this query also reports).
- events_rate_ratio: weekend-vs-weekday error rate comparison — the
  Poisson rate-ratio score test (conditional binomial form) with the
  log-Wald CI; the exposure-aware two-sample complement of
  events_poisson_dispersion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "ts_newey_west_trend",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY day) - 1 AS BIGINT) AS t
        FROM daily
    ),
    mom AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS m,
               avg(CAST(t AS DOUBLE)) AS tbar, avg(CAST(y AS DOUBLE)) AS ybar,
               sum(CAST(t AS DOUBLE) * y) AS sty,
               sum(CAST(t AS DOUBLE) * t) AS stt,
               sum(CAST(t AS DOUBLE)) AS st, sum(CAST(y AS DOUBLE)) AS sy
        FROM idx GROUP BY 1
    ),
    fit AS (
        SELECT event_type, m, tbar, ybar,
               (sty - st * sy / m) / (stt - st * st / m) AS b,
               stt - st * st / m AS sxx
        FROM mom
    ),
    sc AS (
        SELECT i.event_type, i.t,
               i.y - (f.ybar - f.b * f.tbar) - f.b * i.t AS e,
               (i.t - f.tbar)
                   * (i.y - (f.ybar - f.b * f.tbar) - f.b * i.t) AS x,
               f.m, f.b, f.sxx
        FROM idx i JOIN fit f ON i.event_type = f.event_type
    ),
    lagd AS (
        SELECT event_type, m, b, sxx, e, x,
               lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
               lag(x, 3) OVER w AS x3, lag(x, 4) OVER w AS x4,
               lag(x, 5) OVER w AS x5
        FROM sc
        WINDOW w AS (PARTITION BY event_type ORDER BY t)
    ),
    gam AS (
        SELECT event_type, max(m) AS m, max(b) AS b, max(sxx) AS sxx,
               sum(e * e) AS se2,
               sum(x * x) AS g0,
               sum(x * x1) AS g1, sum(x * x2) AS g2, sum(x * x3) AS g3,
               sum(x * x4) AS g4, sum(x * x5) AS g5
        FROM lagd GROUP BY event_type
    )
    SELECT event_type, m AS n_days,
           round(b / 100, 6) AS slope_per_day,
           round(sqrt(se2 / (m - 2) / sxx) / 100, 6) AS se_ols,
           round(sqrt((g0 + 2 * (5.0 / 6 * g1 + 4.0 / 6 * g2 + 3.0 / 6 * g3
                                 + 2.0 / 6 * g4 + 1.0 / 6 * g5))
                      / (sxx * sxx)) / 100, 6) AS se_nw,
           round(b / sqrt((g0 + 2 * (5.0 / 6 * g1 + 4.0 / 6 * g2
                                     + 3.0 / 6 * g3 + 2.0 / 6 * g4
                                     + 1.0 / 6 * g5)) / (sxx * sxx)), 4)
               AS t_nw
    FROM gam ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_newey_west_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-trend OLS slope per event type with the Newey–West
    (1987) heteroskedasticity-and-autocorrelation-consistent SE:
    with score xₜ = (t − t̄)·eₜ and autocovariances γ_l = Σ xₜxₜ₋ l,
    Var_NW(b) = (γ₀ + 2Σ_{l≤5}(1 − l/6)γ_l)/Sxx² — the Bartlett
    kernel at L = 5 — versus the iid OLS SE √(Σe²/(m−2)/Sxx) that
    ts_durbin_watson shows is untrustworthy under serial
    correlation. Conventions pinned on both sides: observation-index
    time (gaps collapse), identical moment-form algebra, γ_l sums
    skip the first l rows via NULL-lag (both engines drop NULL from
    SUM). Float chain is shared-ulp; round-6/4 absorbs.

    Scale shape: one daily reduce, a per-type lag window over the
    calendar-bounded day axis (5 types × ≤days rows), one 5-row
    reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("y")
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "day",
        "y",
        (F.row_number().over(wlag) - 1).cast("long").alias("t"),
    )
    mom = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg(F.col("t").cast("double")).alias("tbar"),
        F.avg(F.col("y").cast("double")).alias("ybar"),
        F.sum(F.col("t").cast("double") * F.col("y")).alias("sty"),
        F.sum(F.col("t").cast("double") * F.col("t")).alias("stt"),
        F.sum(F.col("t").cast("double")).alias("st"),
        F.sum(F.col("y").cast("double")).alias("sy"),
    )
    fit = mom.select(
        "event_type",
        "m",
        "tbar",
        "ybar",
        (
            (F.col("sty") - F.col("st") * F.col("sy") / F.col("m"))
            / (F.col("stt") - F.col("st") * F.col("st") / F.col("m"))
        ).alias("b"),
        (F.col("stt") - F.col("st") * F.col("st") / F.col("m")).alias("sxx"),
    )
    sc = idx.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "day",
        "t",
        "m",
        "b",
        "sxx",
        (
            F.col("y")
            - (F.col("ybar") - F.col("b") * F.col("tbar"))
            - F.col("b") * F.col("t")
        ).alias("e"),
        (
            (F.col("t") - F.col("tbar"))
            * (
                F.col("y")
                - (F.col("ybar") - F.col("b") * F.col("tbar"))
                - F.col("b") * F.col("t")
            )
        ).alias("x"),
    )
    wo = Window.partitionBy("event_type").orderBy("t")
    lagd = sc.select(
        "event_type",
        "m",
        "b",
        "sxx",
        "e",
        "x",
        *[F.lag("x", l).over(wo).alias(f"x{l}") for l in range(1, 6)],
    )
    gam = lagd.groupBy("event_type").agg(
        F.max("m").alias("m"),
        F.max("b").alias("b"),
        F.max("sxx").alias("sxx"),
        F.sum(F.col("e") * F.col("e")).alias("se2"),
        F.sum(F.col("x") * F.col("x")).alias("g0"),
        *[
            F.sum(F.col("x") * F.col(f"x{l}")).alias(f"g{l}")
            for l in range(1, 6)
        ],
    )
    nw_var = (
        F.col("g0")
        + 2
        * (
            5.0 / 6 * F.col("g1")
            + 4.0 / 6 * F.col("g2")
            + 3.0 / 6 * F.col("g3")
            + 2.0 / 6 * F.col("g4")
            + 1.0 / 6 * F.col("g5")
        )
    ) / (F.col("sxx") * F.col("sxx"))
    return gam.select(
        "event_type",
        F.col("m").alias("n_days"),
        F.round(F.col("b") / 100, 6).alias("slope_per_day"),
        F.round(
            F.sqrt(F.col("se2") / (F.col("m") - 2) / F.col("sxx")) / 100,
            6,
        ).alias("se_ols"),
        F.round(F.sqrt(nw_var) / 100, 6).alias("se_nw"),
        F.round(F.col("b") / F.sqrt(nw_var), 4).alias("t_nw"),
    ).orderBy("event_type")


@register(
    "events_rate_ratio",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END
                   AS wkend,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ),
    g AS (
        SELECT wkend,
               CAST(count(DISTINCT day) AS BIGINT) AS days,
               CAST(sum(is_err) AS BIGINT) AS x
        FROM d GROUP BY 1
    ),
    two AS (
        SELECT max(CASE WHEN wkend = 1 THEN x END) AS x1,
               max(CASE WHEN wkend = 1 THEN days END) AS t1,
               max(CASE WHEN wkend = 0 THEN x END) AS x2,
               max(CASE WHEN wkend = 0 THEN days END) AS t2
        FROM g
    )
    SELECT x1 AS x_weekend, t1 AS days_weekend,
           x2 AS x_weekday, t2 AS days_weekday,
           round(CAST(x1 AS DOUBLE) / t1, 4) AS rate_weekend,
           round(CAST(x2 AS DOUBLE) / t2, 4) AS rate_weekday,
           round(CAST(x1 AS DOUBLE) * t2 / (CAST(x2 AS DOUBLE) * t1), 4)
               AS rate_ratio,
           round((x1 - (x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))
                 / sqrt((x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2))
                        * (1 - CAST(t1 AS DOUBLE) / (t1 + t2))), 4)
               AS z_score,
           round(exp(ln(CAST(x1 AS DOUBLE) * t2 / (CAST(x2 AS DOUBLE) * t1))
                     - 1.96 * sqrt(1.0 / x1 + 1.0 / x2)), 4) AS rr_ci_lo,
           round(exp(ln(CAST(x1 AS DOUBLE) * t2 / (CAST(x2 AS DOUBLE) * t1))
                     + 1.96 * sqrt(1.0 / x1 + 1.0 / x2)), 4) AS rr_ci_hi,
           abs(round((x1 - (x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))
                 / sqrt((x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2))
                        * (1 - CAST(t1 AS DOUBLE) / (t1 + t2))), 4)) > 1.96
               AS significant
    FROM two
    """,
    tags=("events", "stats"),
)
def events_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday error-rate comparison as a two-sample
    Poisson problem: with x errors over t exposure days per bucket,
    the rate ratio (x₁/t₁)/(x₂/t₂), the conditional-binomial score
    z = (x₁ − (x₁+x₂)p₀)/√((x₁+x₂)p₀(1−p₀)) with p₀ = t₁/(t₁+t₂)
    (conditioning on the total makes the nuisance rate vanish —
    the classic two-rate test), and the log-Wald CI
    exp(ln RR ± 1.96√(1/x₁ + 1/x₂)). Exposure is counted from the
    data itself (distinct calendar days per bucket); weekend = ISO
    day-of-week ∈ {6, 7}, pinned to the same mapping on both sides
    (Spark's Sunday-first dayofweek is remapped). Counts are PURE
    INTEGER; the significance verdict compares the ROUNDED z.

    Scale shape: one map-side-combined 2-group reduce (distinct-day
    count inside), a 2-row pivot, closed-form scalars."""
    e = tbl(spark, sf_dir, "events")
    d = e.select(
        F.to_date("ts").alias("day"),
        # ISO dow: Spark dayofweek is 1=Sun..7=Sat -> remap so Mon=1..Sun=7
        F.when(
            ((F.dayofweek(F.to_date("ts")) + 5) % 7 + 1) >= 6, 1
        )
        .otherwise(0)
        .alias("wkend"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    g = d.groupBy("wkend").agg(
        F.countDistinct("day").cast("long").alias("days"),
        F.sum("is_err").cast("long").alias("x"),
    )
    two = g.agg(
        F.max(F.when(F.col("wkend") == 1, F.col("x"))).alias("x1"),
        F.max(F.when(F.col("wkend") == 1, F.col("days"))).alias("t1"),
        F.max(F.when(F.col("wkend") == 0, F.col("x"))).alias("x2"),
        F.max(F.when(F.col("wkend") == 0, F.col("days"))).alias("t2"),
    )
    p0 = F.col("t1").cast("double") / (F.col("t1") + F.col("t2"))
    z = ((F.col("x1") - (F.col("x1") + F.col("x2")) * p0)) / F.sqrt(
        (F.col("x1") + F.col("x2")) * p0 * (1 - p0)
    )
    rr = (
        F.col("x1").cast("double")
        * F.col("t2")
        / (F.col("x2").cast("double") * F.col("t1"))
    )
    half = 1.96 * F.sqrt(1.0 / F.col("x1") + 1.0 / F.col("x2"))
    return two.select(
        F.col("x1").alias("x_weekend"),
        F.col("t1").alias("days_weekend"),
        F.col("x2").alias("x_weekday"),
        F.col("t2").alias("days_weekday"),
        F.round(F.col("x1").cast("double") / F.col("t1"), 4).alias(
            "rate_weekend"
        ),
        F.round(F.col("x2").cast("double") / F.col("t2"), 4).alias(
            "rate_weekday"
        ),
        F.round(rr, 4).alias("rate_ratio"),
        F.round(z, 4).alias("z_score"),
        F.round(F.exp(F.log(rr) - half), 4).alias("rr_ci_lo"),
        F.round(F.exp(F.log(rr) + half), 4).alias("rr_ci_hi"),
        (F.abs(F.round(z, 4)) > 1.96).alias("significant"),
    )
