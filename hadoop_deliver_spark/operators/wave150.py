"""§2 extensions, hundred-fiftieth wave — zero-inflation and
recurrence structure.

- events_zip_score: van den Broek's (1995) score test for
  zero-inflation against the Poisson on the hourly error process —
  "are there MORE silent hours than a Poisson error rate explains?"
  The observed-zero count comes free from (total hours − hours with
  ≥1 error), so no calendar spine is ever materialized.
- ts_rqa_recurrence: recurrence-quantification analysis (Zbilut &
  Webber 1992) of the daily revenue series — recurrence rate RR and
  determinism DET at ε = σ/2, the dynamical-systems reading of the
  series that the linear ts_autocorr / ts_ljung_box family cannot
  see (DET is high for deterministic dynamics even when
  autocorrelation is zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CHI2_1_95 = "3.841459"


@register(
    "events_zip_score",
    f"""
    WITH b AS (
        SELECT CAST(min(epoch_us(ts) // 1000000 // 3600) AS BIGINT) AS lo,
               CAST(max(epoch_us(ts) // 1000000 // 3600) AS BIGINT) AS hi,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                   AS t_err,
               CAST(count(DISTINCT CASE WHEN event_type = 'error'
                          THEN epoch_us(ts) // 1000000 // 3600 END)
                    AS BIGINT) AS h_err
        FROM events
    ),
    m AS (
        SELECT hi - lo + 1 AS n, t_err, h_err,
               hi - lo + 1 - h_err AS n0,
               CAST(t_err AS DOUBLE) / (hi - lo + 1) AS lam,
               exp(-(CAST(t_err AS DOUBLE) / (hi - lo + 1))) AS p0
        FROM b
    )
    SELECT n AS n_hours, n0 AS n_zero_hours, t_err AS total_errors,
           round(lam, 6) AS lambda_hat,
           round(n * p0, 4) AS expected_zeros,
           round((n0 - n * p0) * (n0 - n * p0)
                 / (n * p0 * (1 - p0) - n * lam * p0 * p0), 4)
               AS score_stat,
           round((n0 - n * p0) * (n0 - n * p0)
                 / (n * p0 * (1 - p0) - n * lam * p0 * p0), 4)
               > {_CHI2_1_95} AS zero_inflated
    FROM m
    """,
    tags=("events", "stats"),
)
def events_zip_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Van den Broek's (1995) score test for zero-inflation of the
    hourly error process: with λ̂ = T/N (T errors over the N-hour
    observation window spanned by the WHOLE event stream) and
    p̂₀ = e^(−λ̂), the statistic
    S = (n₀ − N·p̂₀)² / (N·p̂₀(1−p̂₀) − N·λ̂·p̂₀²) ~ χ²₁
    asks whether the observed silent-hour count n₀ exceeds what a
    pure Poisson error rate predicts — the mechanism question behind
    events_poisson_dispersion's variance/mean headline (overdispersion
    CAN be pure clumping; excess zeros specifically indicate an
    on/off regime). n₀ = N − (hours with ≥1 error) falls out of one
    global reduce — no calendar spine is materialized on either
    engine. N, n₀, T are exact integers (hour = epoch//3600 integer
    floor); λ̂, p̂₀, S are one fixed textual float expression, and the
    verdict compares the ROUNDED S against the shared χ²₁ literal.

    Scale shape: ONE global reduce (min/max hour, one filtered count,
    one filtered distinct-count) then 1-row closed-form scalars."""
    e = tbl(spark, sf_dir, "events")
    hour = (F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    is_err = F.col("event_type") == "error"
    b = e.agg(
        F.min(hour).alias("lo"),
        F.max(hour).alias("hi"),
        F.sum(F.when(is_err, 1).otherwise(0)).cast("long").alias("t_err"),
        F.count_distinct(F.when(is_err, hour)).cast("long").alias("h_err"),
    )
    n = F.col("hi") - F.col("lo") + 1
    lam = F.col("t_err").cast("double") / n
    m = b.select(
        n.alias("n"),
        F.col("t_err"),
        F.col("h_err"),
        (n - F.col("h_err")).alias("n0"),
        lam.alias("lam"),
        F.exp(-lam).alias("p0"),
    )
    nn, n0, lam2, p0 = F.col("n"), F.col("n0"), F.col("lam"), F.col("p0")
    s = (
        (n0 - nn * p0)
        * (n0 - nn * p0)
        / (nn * p0 * (1 - p0) - nn * lam2 * p0 * p0)
    )
    return m.select(
        nn.alias("n_hours"),
        n0.alias("n_zero_hours"),
        F.col("t_err").alias("total_errors"),
        F.round(lam2, 6).alias("lambda_hat"),
        F.round(nn * p0, 4).alias("expected_zeros"),
        F.round(s, 4).alias("score_stat"),
        (F.round(s, 4) > float(_CHI2_1_95)).alias("zero_inflated"),
    )


@register(
    "ts_rqa_recurrence",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s1,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        FROM daily
    ),
    eps AS (
        SELECT n,
               0.5 * sqrt(CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n)) AS e
        FROM s
    ),
    rec AS (
        SELECT a.dn AS i, b.dn AS j
        FROM daily a JOIN daily b ON a.dn < b.dn
        CROSS JOIN eps
        WHERE abs(a.cents - b.cents) <= eps.e
    ),
    lined AS (
        SELECT i, j,
               CASE WHEN lag(i) OVER (PARTITION BY j - i ORDER BY i)
                         = i - 1
                     OR lead(i) OVER (PARTITION BY j - i ORDER BY i)
                         = i + 1
                    THEN 1 ELSE 0 END AS on_line
        FROM rec
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS r,
               CAST(sum(on_line) AS BIGINT) AS r_line
        FROM lined
    )
    SELECT s.n AS n_days, agg.r AS n_recurrent,
           round(2.0 * agg.r / (CAST(s.n AS DOUBLE) * (s.n - 1)), 6)
               AS recurrence_rate,
           round(CAST(agg.r_line AS DOUBLE) / agg.r, 6) AS determinism,
           CAST(agg.r_line AS DOUBLE) / agg.r > 0.5 AS deterministic
    FROM agg CROSS JOIN s
    """,
    tags=("timeseries", "stats"),
)
def ts_rqa_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurrence-quantification analysis (Zbilut & Webber 1992;
    Marwan 2007) of the daily total-value series: with threshold
    ε = σ/2 (population σ from exact integer cent moments — one fixed
    textual expression, so both engines compare against the
    bit-identical double), RR = 2·|{(i<j): |xᵢ−xⱼ| ≤ ε}| / (n(n−1))
    is the recurrence rate and DET the fraction of recurrent points
    lying on a diagonal line of length ≥ 2 (neighbor (i±1, j±1) also
    recurrent — computed by lag/lead over each j−i diagonal, many
    small partitions). High DET with low autocorrelation is the
    signature of nonlinear determinism the ts_autocorr / ts_ljung_box
    linear family cannot detect; the 0.5 'deterministic' literal is
    the conventional screening flag. The |xᵢ−xⱼ| distances are exact
    integer cents, so every indicator is an int≤double compare of
    identical values on both engines.

    Scale shape: one daily reduce; a TRUE pairwise join of the
    calendar-bounded daily series (≤days²/2 pairs at ANY corpus
    scale — the ts_qn_scale / agg_hl_shift_2sample envelope) with the
    1-row ε frame broadcast; diagonal-partitioned lag/lead windows;
    two scalar reduces."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    cd = F.col("cents").cast("decimal(38,0)")
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(cd * F.col("cents")).alias("s2"),
    )
    n = F.col("n")
    eps = s.select(
        n.alias("n"),
        (
            0.5
            * F.sqrt(
                F.col("s2").cast("double") / n
                - (F.col("s1").cast("double") / n)
                * (F.col("s1").cast("double") / n)
            )
        ).alias("e"),
    )
    a = daily.select(F.col("dn").alias("i"), F.col("cents").alias("ca"))
    b = daily.select(F.col("dn").alias("j"), F.col("cents").alias("cb"))
    rec = (
        a.join(b, F.col("i") < F.col("j"))
        .crossJoin(F.broadcast(eps))
        .filter(F.abs(F.col("ca") - F.col("cb")) <= F.col("e"))
        .select("i", "j")
    )
    diag = Window.partitionBy(F.col("j") - F.col("i")).orderBy("i")
    lined = rec.select(
        "i",
        "j",
        F.when(
            (F.lag("i").over(diag) == F.col("i") - 1)
            | (F.lead("i").over(diag) == F.col("i") + 1),
            1,
        )
        .otherwise(0)
        .alias("on_line"),
    )
    agg = lined.agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum("on_line").cast("long").alias("r_line"),
    )
    out = agg.crossJoin(F.broadcast(s.select("n")))
    det = F.col("r_line").cast("double") / F.col("r")
    return out.select(
        F.col("n").alias("n_days"),
        F.col("r").alias("n_recurrent"),
        F.round(
            2.0 * F.col("r") / (F.col("n").cast("double") * (F.col("n") - 1)),
            6,
        ).alias("recurrence_rate"),
        F.round(det, 6).alias("determinism"),
        (det > 0.5).alias("deterministic"),
    )
