"""§2 extensions, sixtieth wave — power-law fitting, categorical
association, forensic digit analysis, and volatility bands.

- events_fano_factor: the Fano dispersion index (variance-to-mean
  ratio) of each event type's daily counts — over/under-dispersion
  vs the Poisson benchmark from exact integer moment sums.
- agg_cramers_v: Cramér's V association between order priority and
  order status — the normalized effect size agg_chi2_independence's
  test statistic feeds.
- events_benford_check: first-significant-digit distribution of
  event values against Benford's law — the classic fabricated-data
  forensic, with exact digit counts and literal expected shares.
- ts_bollinger_bands: 20-day rolling mean ± 2σ bands per event
  type's daily value series, with the outside-band flag decided in
  exact integer arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# Benford expected first-digit shares log10(1 + 1/d), d = 1..9 —
# literals shared with the oracle so no engine log10 enters the test
_BENFORD_P = [math.log10(1 + 1 / d) for d in range(1, 10)]


@register(
    "events_fano_factor",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(c) AS BIGINT) AS total,
           round(CAST(sum(c) AS DOUBLE) / count(*), 4) AS mean_daily,
           round((CAST(count(*) AS DOUBLE) * sum(c * c)
                  - CAST(sum(c) AS DOUBLE) * sum(c))
                 / (CAST(count(*) AS DOUBLE) * sum(c)), 4) AS fano
    FROM daily GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "stats"),
)
def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano dispersion index (Fano 1947) of each event type's daily
    count series: F = Var/Mean — exactly 1 for a Poisson arrival
    process, >1 for bursty/clustered traffic (bots, campaigns), <1
    for rate-limited or quota-shaped traffic; the COUNT-side
    complement of events_burstiness's inter-arrival-gap statistic.
    Cross-multiplied population form: F = (n·Σc² − (Σc)²)/(n·Σc)
    with every moment an exact int64 sum (c² peaks far inside int64
    on daily counts; promote to DECIMAL(38,0) beyond), so both
    engines evaluate one identical fixed-order float division.

    Scale shape: one keyed daily aggregate with map-side combine,
    then a per-type scalar reduce over the calendar-bounded day
    axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = F.count(F.lit(1))
    s1 = F.sum("c")
    s2 = F.sum(F.col("c") * F.col("c"))
    return (
        daily.groupBy("event_type")
        .agg(
            n.cast("long").alias("n_days"),
            s1.cast("long").alias("total"),
            F.round(s1.cast("double") / n, 4).alias("mean_daily"),
            F.round(
                (n.cast("double") * s2 - s1.cast("double") * s1)
                / (n.cast("double") * s1),
                4,
            ).alias("fano"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_cramers_v",
    """
    WITH cells AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               CAST(count(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT pri, st, o,
               CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS r,
               CAST(sum(o) OVER (PARTITION BY st) AS BIGINT) AS c,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM cells
    ),
    terms AS (
        SELECT n,
               count(*) OVER () AS n_cells,
               CAST(round(1e6 * CAST((CAST(n AS DOUBLE) * o - CAST(r AS DOUBLE) * c) AS DOUBLE)
                          * (CAST(n AS DOUBLE) * o - CAST(r AS DOUBLE) * c)
                          / (CAST(n AS DOUBLE) * r * c)) AS BIGINT)
                   AS t_scaled,
               CAST(count(DISTINCT pri) OVER () AS BIGINT) AS nr,
               CAST(count(DISTINCT st) OVER () AS BIGINT) AS nc
        FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(max(n_cells) AS BIGINT) AS n_cells,
           round(CAST(sum(t_scaled) AS DOUBLE) / 1e6, 4) AS chi2,
           round(sqrt(CAST(sum(t_scaled) AS DOUBLE) / 1e6
                      / (CAST(max(n) AS DOUBLE)
                         * (least(max(nr), max(nc)) - 1))), 4) AS cramers_v
    FROM terms
    """,
    tags=("aggregate", "stats"),
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (Cramér 1946) between order priority and order
    status — the [0,1]-normalized effect size that
    agg_chi2_independence's raw test statistic lacks: V =
    √(χ²/(n·(min(r,c)−1))), comparable across tables of any shape.
    Cross-engine device: the contingency cells, row/column margins
    and n are exact int64; each cell's χ² term uses the
    cross-multiplied form (n·O − R·C)²/(n·R·C) evaluated as ONE
    fixed-order float expression and shipped as the scaled integer
    round(10⁶·term), so the 15-cell sum is order-independent exact
    arithmetic — the engines cannot disagree on χ² by more than the
    10⁻⁶ granularity, far inside round-4.

    Scale shape: one keyed count of the domain-bounded (priority ×
    status) grid; margins via windows over the ≤15-row cell table
    (domain-bounded — allowlisted like events_holm_correction's)."""
    o = tbl(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    wr = Window.partitionBy("pri")
    wc = Window.partitionBy("st")
    wall = Window.partitionBy()
    m = cells.select(
        "pri",
        "st",
        "o",
        F.sum("o").over(wr).cast("long").alias("r"),
        F.sum("o").over(wc).cast("long").alias("c"),
        F.sum("o").over(wall).cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    diff = nd * F.col("o") - F.col("r").cast("double") * F.col("c")
    terms = m.select(
        "n",
        F.count(F.lit(1)).over(wall).alias("n_cells"),
        F.round(F.lit(1e6) * diff * diff / (nd * F.col("r") * F.col("c")))
        .cast("long")
        .alias("t_scaled"),
        F.size(F.collect_set("pri").over(wall)).cast("long").alias("nr"),
        F.size(F.collect_set("st").over(wall)).cast("long").alias("nc"),
    )
    chi2 = F.sum("t_scaled").cast("double") / 1e6
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.max("n_cells").cast("long").alias("n_cells"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.max("n").cast("double")
                    * (F.least(F.max("nr"), F.max("nc")) - 1)
                )
            ),
            4,
        ).alias("cramers_v"),
    )


@register(
    "events_benford_check",
    """
    WITH cents AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events
        WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
    ),
    digits AS (
        SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit
        FROM cents
    ),
    obs AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS observed
        FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
    SELECT digit, observed,
           round(CAST((BENFORD_P)[digit] AS DOUBLE), 6) AS expected_share,
           round(CAST(observed AS DOUBLE) / n, 6) AS observed_share,
           round((observed - n * CAST((BENFORD_P)[digit] AS DOUBLE))
                 * (observed - n * CAST((BENFORD_P)[digit] AS DOUBLE))
                 / (n * CAST((BENFORD_P)[digit] AS DOUBLE)), 4) AS chi2_term
    FROM obs CROSS JOIN tot
    ORDER BY digit
    """.replace(
        "BENFORD_P",
        "[" + ", ".join(repr(v) for v in _BENFORD_P) + "]",
    ),
    tags=("analytics", "stats"),
)
def events_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881; Benford 1938;
    the fraud-detection use per Nigrini 1996) of event values: the
    first significant digit of naturally-occurring multi-scale
    quantities follows P(d) = log₁₀(1 + 1/d) — fabricated or
    truncated data flunks it, so the per-digit deviation table is a
    standard data-forensics screen. Digit extraction is string-based
    on the exact cents integer (identical in both engines, no float
    log); observed counts are exact int64; the nine expected shares
    are LITERALS shared with the oracle; each digit's χ² contribution
    is one fixed-order float expression from those exact inputs.

    Scale shape: map-only digit extraction, one 9-key aggregate with
    map-side combine, a 1-row total broadcast (the
    ts_resample_gapfill pattern)."""
    e = tbl(spark, sf_dir, "events")
    v = (dec2("value") * 100).cast("long")
    digits = e.select(v.alias("v")).filter(F.col("v") > 0).select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("int").alias(
            "digit"
        )
    )
    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("n"))
    p = F.element_at(F.array(*[F.lit(x) for x in _BENFORD_P]), F.col("digit"))
    dev = F.col("observed") - F.col("n") * p
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "observed",
            F.round(p, 6).alias("expected_share"),
            F.round(F.col("observed").cast("double") / F.col("n"), 6).alias(
                "observed_share"
            ),
            F.round(dev * dev / (F.col("n") * p), 4).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@register(
    "ts_bollinger_bands",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    roll AS (
        SELECT event_type, day, cents,
               CAST(count(*) OVER w AS BIGINT) AS n_w,
               CAST(sum(cents) OVER w AS BIGINT) AS s1,
               CAST(sum(cents * cents) OVER w AS BIGINT) AS s2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(cents / 100.0, 2) AS value,
           ((200 * s1 + n_w) // (2 * n_w)) / 10000.0 AS sma,
           round((CAST(s1 AS DOUBLE) / n_w
                  + 2 * sqrt(CAST(n_w * s2 - s1 * s1 AS DOUBLE)) / n_w)
                 / 100, 4) AS upper_band,
           round((CAST(s1 AS DOUBLE) / n_w
                  - 2 * sqrt(CAST(n_w * s2 - s1 * s1 AS DOUBLE)) / n_w)
                 / 100, 4) AS lower_band,
           (n_w * cents - s1) * (n_w * cents - s1)
               > 4 * (n_w * s2 - s1 * s1) AS outside
    FROM roll ORDER BY event_type, day
    """,
    tags=("timeseries",),
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (Bollinger 1992) on each event type's daily
    value series: 20-day rolling mean ± 2 population σ, with the
    outside-band flag — the volatility envelope behind mean-reversion
    monitors, the banded sibling of events_anomaly_zscore's global
    z-score. Exactness device: with s₁/s₂ the exact int64 rolling
    sums, |x − s₁/n| > 2σ cross-multiplies to the PURE INTEGER
    predicate (n·x − s₁)² > 4·(n·s₂ − s₁²) — the band flag cannot
    drift even when a value parks exactly on a band (products peak
    ~10¹⁷ on this fixture's cents scale, inside int64; promote to
    DECIMAL(38,0) for larger magnitudes). The displayed SMA uses the
    exact-integer HALF_UP device (2p+q) div 2q — a 20-day window
    parks s₁/n on .5-cent round-4 ties constantly, where float round
    diverges across engines — and the band edges contain a
    √(non-square) irrational, which never parks.

    Scale shape: one keyed daily aggregate, then a per-type ROWS
    window over the calendar-bounded day axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-19, 0)
    )
    roll = daily.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n_w"),
        F.sum("cents").over(w).cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias(
            "s2"
        ),
    )
    var_num = (F.col("n_w") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    mean = F.col("s1").cast("double") / F.col("n_w")
    half = 2 * F.sqrt(var_num) / F.col("n_w")
    dev = F.col("n_w") * F.col("cents") - F.col("s1")
    return roll.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("cents") / 100.0, 2).alias("value"),
        # exact integer HALF_UP of s1/(100·n_w) to 4 decimals: the
        # two-step float divide parks on round-4 ties (s1/n_w ends in
        # exact .5 cents constantly with 20-day windows)
        (F.expr("(200 * s1 + n_w) div (2 * n_w)") / 10000.0).alias("sma"),
        F.round((mean + half) / 100, 4).alias("upper_band"),
        F.round((mean - half) / 100, 4).alias("lower_band"),
        (
            dev * dev
            > 4 * (F.col("n_w") * F.col("s2") - F.col("s1") * F.col("s1"))
        ).alias("outside"),
    ).orderBy("event_type", "day")
