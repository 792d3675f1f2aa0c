"""§2 extensions, hundred-thirteenth wave — running-peak drawdown
and risk-adjusted return ratios.

- ts_max_drawdown: maximum drawdown + Ulcer index per event type on
  the daily value series — the risk headline of any monitoring
  dashboard (worst peak-to-trough decline, and Martin's RMS
  drawdown); the running-max complement of ts_cusum_changepoint's
  running-sum device.
- ts_sharpe_sortino: daily Sharpe and Sortino ratios per event
  type — risk-adjusted return (Sharpe 1966) and its downside-only
  refinement (Sortino & Price 1994); the return-side complement of
  ts_max_drawdown's path-risk pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "ts_max_drawdown",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    run AS (
        SELECT event_type, day, cents,
               CAST(max(cents) OVER (PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
        FROM daily
    ),
    dd AS (
        SELECT event_type, day, peak, peak - cents AS ddc FROM run
    ),
    pick AS (
        SELECT event_type, day, peak, ddc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ddc DESC, day) AS rn
        FROM dd
    ),
    agg AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(max(peak) AS BIGINT) AS peak_cents,
               CAST(max(ddc) AS BIGINT) AS mdd_cents,
               round(sqrt(avg(pow(100.0 * ddc / peak, 2))), 4)
                   AS ulcer_index
        FROM dd GROUP BY 1
    )
    SELECT a.event_type, a.n_days, a.peak_cents, a.mdd_cents,
           strftime(p.day, '%Y-%m-%d') AS mdd_day,
           round(100.0 * a.mdd_cents / p.peak, 4) AS mdd_pct,
           a.ulcer_index
    FROM agg a JOIN pick p ON a.event_type = p.event_type AND p.rn = 1
    ORDER BY a.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown and Ulcer index (Martin & McCann 1989) of
    each event type's daily value series: running peak = max-so-far
    of daily cents, drawdown = peak − value, MDD = the worst one,
    Ulcer = RMS of the percentage drawdowns — the standard
    peak-to-trough risk pair behind every equity-curve monitor.
    Exactness device: peak, drawdown, and MDD are PURE INTEGER
    (running max and differences of int64 cents — no float enters
    until the two displayed ratios); the MDD row is picked by exact
    integer rank (ddc DESC, day ASC tiebreak), so mdd_day and the
    peak it divides by are deterministic even when two days tie on
    drawdown.

    Scale shape: one map-side-combined daily reduce, a per-type
    running-max window over the calendar-bounded day axis, a 5-row
    rank pick broadcast back onto the per-type aggregate."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "event_type",
        "day",
        F.max("cents").over(wrun).cast("long").alias("peak"),
        (F.max("cents").over(wrun) - F.col("cents"))
        .cast("long")
        .alias("ddc"),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.desc("ddc"), F.asc("day")
    )
    pick = (
        dd.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("mdd_day"),
            F.col("peak").alias("mdd_peak"),
        )
    )
    agg = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").cast("long").alias("peak_cents"),
        F.max("ddc").cast("long").alias("mdd_cents"),
        F.round(
            F.sqrt(
                F.avg(
                    F.pow(
                        100.0 * F.col("ddc") / F.col("peak"), F.lit(2)
                    )
                )
            ),
            4,
        ).alias("ulcer_index"),
    )
    return (
        agg.join(F.broadcast(pick), "event_type")
        .select(
            "event_type",
            "n_days",
            "peak_cents",
            "mdd_cents",
            "mdd_day",
            F.round(100.0 * F.col("mdd_cents") / F.col("mdd_peak"), 4).alias(
                "mdd_pct"
            ),
            "ulcer_index",
        )
        .orderBy("event_type")
    )


@register(
    "ts_sharpe_sortino",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type,
               CAST(cents - lag(cents) OVER w AS DOUBLE)
                   / lag(cents) OVER w AS r
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    rv AS (SELECT event_type, r FROM r WHERE r IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_returns,
           CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down,
           round(avg(r), 6) AS mean_r,
           round(sqrt(sum(r * r) / count(*) - avg(r) * avg(r)), 6) AS sd_r,
           round(avg(r)
                 / sqrt(sum(r * r) / count(*) - avg(r) * avg(r)), 4)
               AS sharpe_daily,
           round(sqrt(avg(pow(least(r, 0.0), 2))), 6) AS downside_dev,
           round(avg(r) / sqrt(avg(pow(least(r, 0.0), 2))), 4)
               AS sortino_daily
    FROM rv GROUP BY 1 ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Sharpe (1966) and Sortino (1994) ratios of each event
    type's daily value series: simple returns r_t = Δcents/cents₋₁,
    Sharpe = μ/σ (population σ), Sortino = μ/downside-deviation
    where the downside deviation is the RMS of min(r, 0) — losses
    only, the refinement that stops upside volatility from
    penalizing the score. Conventions pinned on both sides: zero
    risk-free rate, UNANNUALIZED daily ratios (multiply by √365
    externally if needed), population moments in the SAME
    E[x²] − μ² algebra so float drift stays at the shared-ulp level
    round-4/6 absorbs; n_down (losing days) is PURE INTEGER.

    Scale shape: one map-side-combined daily reduce, a per-type lag
    over the calendar-bounded day axis, one 5-row reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    r = daily.select(
        "event_type",
        (
            (F.col("cents") - F.lag("cents").over(wlag)).cast("double")
            / F.lag("cents").over(wlag)
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    mu = F.avg("r")
    sd = F.sqrt(
        F.sum(F.col("r") * F.col("r")) / F.count(F.lit(1)) - mu * mu
    )
    ddev = F.sqrt(F.avg(F.pow(F.least(F.col("r"), F.lit(0.0)), F.lit(2))))
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_returns"),
            F.sum(F.when(F.col("r") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
            F.round(mu, 6).alias("mean_r"),
            F.round(sd, 6).alias("sd_r"),
            F.round(mu / sd, 4).alias("sharpe_daily"),
            F.round(ddev, 6).alias("downside_dev"),
            F.round(mu / ddev, 4).alias("sortino_daily"),
        )
        .orderBy("event_type")
    )
