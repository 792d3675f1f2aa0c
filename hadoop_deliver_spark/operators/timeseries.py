"""§2.K extensions, fourth wave — time-series analytics.

Hypertable-style rollups and anomaly surfaces a delivery pipeline
runs over the event stream:

- OHLC bars: open/high/low/close per (event_type, 6h bucket) — the
  canonical time-bucket rollup; one shuffle, selection-only values
  (no float arithmetic at all).
- linear interpolation: the missing-bucket counterpart of
  ts_resample_gapfill's LOCF — fills interior gaps by interpolating
  between the nearest observed neighbors.
- z-score anomalies: per-type moments from exact DECIMAL sums, then
  a broadcast join back onto the stream — the standard two-pass
  outlier scan, one wide shuffle + one map pass.
- transition matrix: (prev event_type → event_type) counts per user
  ordering — the Markov-chain surface for session modeling; integer
  output only.

Float policy follows tables.dec2: every sum that feeds a checked
value goes through DECIMAL(18,2) so both engines aggregate
order-independently; per-row double arithmetic (interpolation ratio,
z-score) uses the *same expression shape* on both sides so IEEE-754
evaluation is bit-identical, then quantizes to 4 decimals via
floor(x*1e4 + 0.5)/1e4 — exact IEEE ops, unlike engine round() which
disagrees across engines on .xxxx5-edge doubles — and casts to
float32 for the hash surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_BUCKET_6H = "timestamp_seconds((unix_timestamp(ts) div 21600) * 21600)"
# DuckDB mirror of the same integer bucket math (µs → s → 6h floor).
_SQL_BUCKET_6H = (
    "make_timestamp(((epoch_us(ts) // 1000000 // 21600) * 21600) * 1000000)"
)


@register(
    "ts_ohlc_bars",
    f"""
    WITH e AS (
      SELECT event_type, {_SQL_BUCKET_6H} AS bucket, ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, bucket,
           CAST(min(CASE WHEN rn_a = 1 THEN value END) AS REAL) AS open,
           CAST(max(value) AS REAL) AS high,
           CAST(min(value) AS REAL) AS low,
           CAST(min(CASE WHEN rn_d = 1 THEN value END) AS REAL) AS close,
           count(*) AS n
    FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket
    """,
    tags=("timeseries",),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (event_type, 6-hour bucket): open and
    close picked by min_by/max_by on the total order (ts, event_id) —
    the unique event_id breaks ts ties deterministically — high/low by
    plain min/max. Every output value is a *selection* of a stored
    double, never arithmetic, so the float32 cast rounds the same
    parquet bits on both engines. One groupBy shuffle on a key whose
    cardinality grows with time × type — the classic hypertable rollup
    that parallelizes freely at 100 TB."""
    e = tbl(spark, sf_dir, "events").withColumn("bucket", F.expr(_BUCKET_6H))
    key = F.struct("ts", "event_id")
    return (
        e.groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", key).cast("float").alias("open"),
            F.max("value").cast("float").alias("high"),
            F.min("value").cast("float").alias("low"),
            F.max_by("value", key).cast("float").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ts_interpolate_linear",
    f"""
    WITH e AS (
      SELECT event_type, {_SQL_BUCKET_6H} AS bucket, value FROM events
    ),
    b AS (
      SELECT event_type, bucket,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(value) AS obs_v
      FROM e GROUP BY event_type, bucket
    ),
    bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 6 HOUR)) AS bucket
      ) g
    ),
    j AS (
      SELECT grid.event_type, grid.bucket, b.obs_v,
             last_value(b.obs_v IGNORE NULLS) OVER wa AS prev_v,
             last_value(CASE WHEN b.obs_v IS NOT NULL THEN grid.bucket END
                        IGNORE NULLS) OVER wa AS prev_t,
             first_value(b.obs_v IGNORE NULLS) OVER wd AS next_v,
             first_value(CASE WHEN b.obs_v IS NOT NULL THEN grid.bucket END
                         IGNORE NULLS) OVER wd AS next_t
      FROM grid LEFT JOIN b
        ON b.event_type = grid.event_type AND b.bucket = grid.bucket
      WINDOW wa AS (PARTITION BY grid.event_type ORDER BY grid.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wd AS (PARTITION BY grid.event_type ORDER BY grid.bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           CAST(floor(
             CASE
               WHEN obs_v IS NOT NULL THEN obs_v
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                 prev_v + (next_v - prev_v)
                   * (CAST(epoch(bucket) - epoch(prev_t) AS DOUBLE)
                      / CAST(epoch(next_t) - epoch(prev_t) AS DOUBLE))
               ELSE NULL
             END * 10000 + 0.5) / 10000 AS REAL) AS value_interp
    FROM j ORDER BY event_type, bucket
    """,
    tags=("timeseries",),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the 6-hour grid: observed buckets keep
    their (DECIMAL-exact) mean; interior gaps are filled by
    interpolating between the nearest observed neighbors; leading and
    trailing gaps stay null (no extrapolation). The neighbor lookups
    are two one-direction window passes per event_type — the same
    partitioned-window shape as gapfill, no self-join. The
    interpolation ratio is written identically on both engines
    (double sub/div/mul in the same order), so the pre-round doubles
    are bit-equal."""
    e = tbl(spark, sf_dir, "events").withColumn("bucket", F.expr(_BUCKET_6H))
    b = e.groupBy("event_type", "bucket").agg(
        (F.sum(dec2("value")).cast("double") / F.count("value")).alias("obs_v")
    )
    return _interpolate_grid(b)


def _interpolate_grid(b: DataFrame) -> DataFrame:
    """Linear-interpolation core over pre-aggregated observations
    (event_type, bucket timestamp, obs_v double); shared by
    ts_interpolate_linear and the randomized differential ring. The
    grid spans the global [min, max] bucket in 6-hour steps."""
    bounds = b.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        b.select("event_type")
        .distinct()
        .crossJoin(bounds)
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 6 hours"))).alias(
                "bucket"
            ),
        )
    )
    wa = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("obs_v").isNotNull(), F.col("bucket"))
    j = (
        grid.join(b, ["event_type", "bucket"], "left")
        .withColumn("prev_v", F.last("obs_v", ignorenulls=True).over(wa))
        .withColumn("prev_t", F.last(obs_t, ignorenulls=True).over(wa))
        .withColumn("next_v", F.first("obs_v", ignorenulls=True).over(wd))
        .withColumn("next_t", F.first(obs_t, ignorenulls=True).over(wd))
    )
    ratio = (
        (F.unix_timestamp("bucket") - F.unix_timestamp("prev_t")).cast("double")
        / (F.unix_timestamp("next_t") - F.unix_timestamp("prev_t")).cast(
            "double"
        )
    )
    interp = (
        F.when(F.col("obs_v").isNotNull(), F.col("obs_v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio,
        )
        .otherwise(F.lit(None))
    )
    # Quantize with floor(x*1e4 + 0.5)/1e4 instead of round(x, 4):
    # mul/add/floor/div are exact IEEE-754 ops, so identical input
    # doubles quantize identically on both engines. Engine round()
    # implementations disagree on .xxxx5-edge doubles (Spark rounds
    # the shortest decimal repr HALF_UP; DuckDB rounds a scaled
    # double) — measured: bucket mean 64.78875 → 64.7888 vs 64.7887.
    quant = F.floor(interp * 10000 + F.lit(0.5)) / 10000
    return j.select(
        "event_type",
        "bucket",
        quant.cast("float").alias("value_interp"),
    ).orderBy("event_type", "bucket")


@register(
    "events_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS m,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS m2,
             count(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, CAST(e.value AS REAL) AS value,
           CAST(floor((e.value - s.m) / sqrt(s.m2 - s.m * s.m)
                      * 10000 + 0.5) / 10000 AS REAL) AS zscore
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE abs((e.value - s.m) / sqrt(s.m2 - s.m * s.m)) > 3
    ORDER BY e.event_id
    """,
    tags=("timeseries",),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outliers (|z| > 3) per event_type. The
    moments come from DECIMAL(18,2) sums (value and value²), which are
    summation-order-independent, so mean/variance are the *same
    doubles* on both engines regardless of partitioning; the per-row z
    is then identical IEEE-754 arithmetic. Two passes at scale: one
    shuffle for the tiny per-type stats table, which broadcasts back
    onto a map-side scan — no second shuffle."""
    ev = tbl(spark, sf_dir, "events")
    d = dec2("value")
    stats = ev.groupBy("event_type").agg(
        (F.sum(d).cast("double") / F.count(F.lit(1))).alias("m"),
        (F.sum(d * d).cast("double") / F.count(F.lit(1))).alias("m2"),
    )
    z = (F.col("value") - F.col("m")) / F.sqrt(F.col("m2") - F.col("m") * F.col("m"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.col("value").cast("float").alias("value"),
            # floor-quantization, not round(): see ts_interpolate_linear.
            (F.floor(z * 10000 + F.lit(0.5)) / 10000)
            .cast("float")
            .alias("zscore"),
        )
        .orderBy("event_id")
    )


@register(
    "events_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT prev AS from_type, event_type AS to_type, count(*) AS n
    FROM o WHERE prev IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("timeseries",),
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each user's (ts, event_id)-
    ordered stream, count consecutive (prev → next) type pairs — the
    Markov surface behind session modeling and bot detection. One
    partitioned window pass (shuffle on user_id) plus a 25-cell
    aggregate; integer-only output."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


@register(
    "events_day_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      FROM events
    ),
    seq AS (
      SELECT user_id, d,
             date_diff('day', DATE '2024-01-01', CAST(d AS DATE))
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, count(*) AS len FROM seq GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           max(len) AS longest_streak, count(*) AS n_streaks
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
    tags=("timeseries",),
)
def events_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern on the calendar axis (engagement-streak
    analytics): distinct active days, then day-number minus row-number
    is constant within a run of consecutive days, so one groupBy on
    that constant measures every streak. Two user_id-partitioned
    shuffles total; integer-only output."""
    ev = tbl(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    return _day_streaks(days)


def _day_streaks(days: DataFrame) -> DataFrame:
    """Gaps-and-islands core over distinct (user_id, d) day rows;
    shared by events_day_streaks and the randomized differential
    ring."""
    w = Window.partitionBy("user_id").orderBy("d")
    seq = days.withColumn(
        "grp",
        F.datediff(F.to_date("d"), F.lit("2024-01-01")).cast("long")
        - F.row_number().over(w),
    )
    streaks = seq.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )
