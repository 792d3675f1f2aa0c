"""§2 extensions, eighty-fourth wave — forecast monitoring and
quantile-forecast scoring, completing the evaluation suite around
ts_diebold_mariano / ts_mase_backtest / ts_theil_u2.

- ts_tracking_signal: Trigg's tracking signal (1964) — cumulative
  forecast bias over MAD, THE operational forecast-monitoring alarm
  (demand-planning systems re-fit when |TS| leaves ±4), FULLY exact.
- ts_pinball_loss: the pinball (quantile) loss of a trailing-week
  75%-quantile forecast vs the naive point forecast — the scoring
  rule quantile forecasts are graded by (Koenker & Bassett 1978
  check function; the CRPS building block), FULLY exact with the
  τ = 3/4 denominator cleared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_DAILY_Y_SQL = """
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    )
"""


@register(
    "ts_tracking_signal",
    f"""
    WITH {_DAILY_Y_SQL},
    lagged AS (
        SELECT y,
               CAST(sum(y) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                   AS w,
               row_number() OVER (ORDER BY day) AS t
        FROM daily
    ),
    ee AS (
        SELECT CAST(7 * y - w AS BIGINT) AS e7, y
        FROM lagged WHERE t >= 8
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(e7) AS BIGINT) AS d,
               CAST(sum(abs(e7)) AS BIGINT) AS a,
               CAST(sum(y) AS BIGINT) AS sy
        FROM ee
    )
    SELECT m AS n_days,
           round(CAST(m AS DOUBLE) * d / a, 4) AS tracking_signal,
           round(CAST(d AS DOUBLE) / (7 * m), 4) AS mean_error_dollars,
           d > 0 AS underforecasting,
           CAST(m AS HUGEINT) * abs(d) > 4 * CAST(a AS HUGEINT)
               AS out_of_control,
           50 * CAST(abs(d) AS HUGEINT) > 7 * CAST(sy AS HUGEINT)
               AS biased_over_2pct
    FROM m
    """,
    tags=("timeseries", "stats"),
)
def ts_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigg's tracking signal (1964) for the trailing-week-mean
    forecast of daily revenue (the ts_diebold_mariano forecaster):
    TS = Σe / MAD = m·Σe/Σ|e| — the running bias-to-noise alarm
    every demand-planning system monitors, with the classical
    re-fit rule |TS| > 4 (Brown's control band). Clearing the /7
    forecast mean, e7 = 7y − W is a SIGNED exact integer and the 7s
    cancel in TS, so D = Σe7, A = Σ|e7| make EVERY decision exact:
    out_of_control ⇔ m·|D| > 4·A, underforecasting ⇔ D > 0 (e > 0
    means demand ran above forecast), and the 2%-of-level bias gate
    |D|/(7m) > (Σy/m)/50 clears to 50·|D| > 7·Σy — all
    DECIMAL(38)/HUGEINT, no double anywhere in the decisions.
    Displays are single divisions of exact integers. Complements
    ts_diebold_mariano (which forecaster wins) and ts_mase_backtest
    (scaled accuracy) with the MONITORING view (is the chosen
    forecaster drifting).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one bounded-axis rolling window, a 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_ord = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.sum("y").over(w_ord.rowsBetween(-7, -1)).cast("long").alias("w"),
        F.row_number().over(w_ord).alias("t"),
    )
    ee = lagged.filter(F.col("t") >= 8).select(
        (7 * F.col("y") - F.col("w")).cast("long").alias("e7"), "y"
    )
    m = ee.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("e7").cast("long").alias("d"),
        F.sum(F.abs("e7")).cast("long").alias("a"),
        F.sum("y").cast("long").alias("sy"),
    )
    mm, d, a, sy = F.col("m"), F.col("d"), F.col("a"), F.col("sy")
    return m.select(
        mm.alias("n_days"),
        F.round(mm.cast("double") * d / a, 4).alias("tracking_signal"),
        F.round(d.cast("double") / (7 * mm), 4).alias(
            "mean_error_dollars"
        ),
        (d > 0).alias("underforecasting"),
        (
            mm.cast("decimal(38,0)") * F.abs(d)
            > 4 * a.cast("decimal(38,0)")
        ).alias("out_of_control"),
        (
            50 * F.abs(d).cast("decimal(38,0)")
            > 7 * sy.cast("decimal(38,0)")
        ).alias("biased_over_2pct"),
    )


@register(
    "ts_pinball_loss",
    f"""
    WITH {_DAILY_Y_SQL},
    lagged AS (
        SELECT y,
               lag(y, 1) OVER (ORDER BY day) AS y1,
               list_sort(list(y) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))[6] AS q75,
               row_number() OVER (ORDER BY day) AS t
        FROM daily
    ),
    ee AS (
        SELECT CAST(3 * GREATEST(y - q75, 0) + GREATEST(q75 - y, 0)
                    AS BIGINT) AS l4q,
               CAST(3 * GREATEST(y - y1, 0) + GREATEST(y1 - y, 0)
                    AS BIGINT) AS l4n
        FROM lagged WHERE t >= 8
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(l4q) AS BIGINT) AS lq,
               CAST(sum(l4n) AS BIGINT) AS ln_
        FROM ee
    )
    SELECT m AS n_days,
           round(CAST(lq AS DOUBLE) / (4 * m), 4) AS pinball_q75,
           round(CAST(ln_ AS DOUBLE) / (4 * m), 4) AS pinball_naive,
           round(CAST(lq AS DOUBLE) / ln_, 6) AS loss_ratio,
           lq < ln_ AS quantile_beats_naive
    FROM m
    """,
    tags=("timeseries", "stats"),
)
def ts_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss — the Koenker-Bassett check function
    ρ_τ(y−f) = τ(y−f)⁺ + (1−τ)(f−y)⁺ that quantile forecasts are
    properly scored by — at τ = 3/4, comparing a trailing-week
    75%-quantile forecaster (f = 6th smallest of the prior 7 daily
    revenues: the exact type-1 ⌈0.75·7⌉ order statistic, selected by
    sorting a BOUNDED 7-element window list — deterministic integer
    selection, no percentile estimator) against the naive point
    forecast f = y₍ₜ₋₁₎. With τ = 3/4 the per-day loss clears to the
    exact integer 4L = 3(y−f)⁺ + (f−y)⁺, so both total losses are
    EXACT int64 sums and the headline verdict (the quantile
    forecaster achieves lower pinball loss than the naive baseline)
    is the pure-integer comparison Σ4L_q75 < Σ4L_naive. Displays are
    single divisions of exact integers. The proper-scoring
    complement of ts_diebold_mariano (squared-error point
    comparison): a forecaster can win MSE and lose the 75% pinball —
    tail calibration is a different contract.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, a bounded 7-element window list sort per row on that
    axis, a 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_ord = Window.orderBy("day")
    q75 = F.element_at(
        F.array_sort(
            F.collect_list("y").over(w_ord.rowsBetween(-7, -1))
        ),
        6,
    )
    lagged = daily.select(
        "y",
        F.lag("y", 1).over(w_ord).alias("y1"),
        q75.alias("q75"),
        F.row_number().over(w_ord).alias("t"),
    )
    ee = lagged.filter(F.col("t") >= 8).select(
        (
            3 * F.greatest(F.col("y") - F.col("q75"), F.lit(0))
            + F.greatest(F.col("q75") - F.col("y"), F.lit(0))
        )
        .cast("long")
        .alias("l4q"),
        (
            3 * F.greatest(F.col("y") - F.col("y1"), F.lit(0))
            + F.greatest(F.col("y1") - F.col("y"), F.lit(0))
        )
        .cast("long")
        .alias("l4n"),
    )
    m = ee.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("l4q").cast("long").alias("lq"),
        F.sum("l4n").cast("long").alias("ln_"),
    )
    mm, lq, ln_ = F.col("m"), F.col("lq"), F.col("ln_")
    return m.select(
        mm.alias("n_days"),
        F.round(lq.cast("double") / (4 * mm), 4).alias("pinball_q75"),
        F.round(ln_.cast("double") / (4 * mm), 4).alias("pinball_naive"),
        F.round(lq.cast("double") / ln_, 6).alias("loss_ratio"),
        (lq < ln_).alias("quantile_beats_naive"),
    )
