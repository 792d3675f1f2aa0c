"""§2 extensions, hundred-nineteenth wave — tail risk and diffusion
fitting.

- ts_var_cvar: Value-at-Risk and Conditional VaR (expected
  shortfall) of daily value changes per event type — exact
  integer-rank 5 % tail selection, CVaR as the mean of the k worst
  days; the coherent-risk-measure pair (Artzner 1999) that
  ts_max_drawdown's path form complements.
- events_bass_diffusion: the Bass (1969) diffusion model fitted to
  daily signup adoption by the classic discrete-time OLS
  n_t = a + b·C_{t−1} + c·C²_{t−1} (Cramer 3×3 on exact integer
  moments), with (p, q, m) recovered from the quadratic roots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "ts_var_cvar",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, day,
               cents - lag(cents) OVER (PARTITION BY event_type
                                        ORDER BY day) AS delta
        FROM daily
    ),
    dv AS (SELECT event_type, day, delta FROM d WHERE delta IS NOT NULL),
    ranked AS (
        SELECT event_type, delta,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY delta, day) AS BIGINT)
                   AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        FROM dv
    ),
    k AS (
        SELECT event_type, max(m) AS m,
               min(CASE WHEN 20 * rn >= m THEN rn END) AS k
        FROM ranked GROUP BY 1
    )
    SELECT r.event_type, k.m AS n_deltas, k.k AS k_tail,
           round(max(CASE WHEN r.rn = k.k THEN r.delta END) / 100.0, 2)
               AS var95,
           round(sum(CASE WHEN r.rn <= k.k THEN r.delta ELSE 0 END)
                 / CAST(k.k AS DOUBLE) / 100, 4) AS cvar95,
           round(min(r.delta) / 100.0, 2) AS worst_delta
    FROM ranked r JOIN k ON r.event_type = k.event_type
    GROUP BY r.event_type, k.m, k.k
    ORDER BY r.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95 % Value-at-Risk and Conditional VaR (expected shortfall) of
    each event type's daily value CHANGES: the 5 % lower tail is
    selected by EXACT integer rank — k = min{rn : 20·rn ≥ m} on the
    (delta ASC, day ASC) total order — VaR₉₅ is the delta at rank k
    and CVaR₉₅ the mean of the k worst days (both from exact int64
    cents; the only floats are the two displayed divisions). CVaR is
    the coherent risk measure (subadditive, unlike VaR — Artzner et
    al. 1999); worst_delta is the built-in k = 1 extreme. Tie
    handling is deterministic via the day tiebreak, and the
    inclusive-rank tail definition is pinned identically on both
    sides.

    Scale shape: one daily reduce, per-type lag + rank windows over
    the calendar-bounded day axis, one keyed reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    dv = daily.select(
        "event_type",
        "day",
        (F.col("cents") - F.lag("cents").over(wlag)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    wrank = Window.partitionBy("event_type").orderBy("delta", "day")
    wall = Window.partitionBy("event_type")
    ranked = dv.select(
        "event_type",
        "delta",
        F.row_number().over(wrank).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wall).cast("long").alias("m"),
    )
    k = ranked.groupBy("event_type").agg(
        F.max("m").alias("m"),
        F.min(
            F.when(20 * F.col("rn") >= F.col("m"), F.col("rn"))
        ).alias("k"),
    )
    return (
        ranked.drop("m")
        .join(k, "event_type")
        .groupBy("event_type", "m", "k")
        .agg(
            F.round(
                F.max(
                    F.when(F.col("rn") == F.col("k"), F.col("delta"))
                )
                / 100.0,
                2,
            ).alias("var95"),
            F.round(
                F.sum(
                    F.when(F.col("rn") <= F.col("k"), F.col("delta")).otherwise(
                        0
                    )
                )
                / F.col("k").cast("double")
                / 100,
                4,
            ).alias("cvar95"),
            F.round(F.min("delta") / 100.0, 2).alias("worst_delta"),
        )
        .select(
            "event_type",
            F.col("m").alias("n_deltas"),
            F.col("k").alias("k_tail"),
            "var95",
            "cvar95",
            "worst_delta",
        )
        .orderBy("event_type")
    )


@register(
    "events_bass_diffusion",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_t
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    cumu AS (
        SELECT day, n_t,
               CAST(coalesce(sum(n_t) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS c
        FROM daily
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(c) AS DOUBLE) AS s1,
               CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2,
               CAST(sum(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS s3,
               CAST(sum(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS s4,
               CAST(sum(n_t) AS DOUBLE) AS t0,
               CAST(sum(CAST(n_t AS HUGEINT) * c) AS DOUBLE) AS t1,
               CAST(sum(CAST(n_t AS HUGEINT) * c * c) AS DOUBLE) AS t2
        FROM cumu
    ),
    fit AS (
        SELECT m, t0 AS adopters,
               (t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2)
                + s2 * (t1 * s3 - s2 * t2))
               / (m * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2)
                  + s2 * (s1 * s3 - s2 * s2)) AS a,
               (m * (t1 * s4 - t2 * s3) - t0 * (s1 * s4 - s2 * s3)
                + s2 * (s1 * t2 - s2 * t1))
               / (m * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2)
                  + s2 * (s1 * s3 - s2 * s2)) AS b,
               (m * (s2 * t2 - t1 * s3) - s1 * (s1 * t2 - t1 * s2)
                + t0 * (s1 * s3 - s2 * s2))
               / (m * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2)
                  + s2 * (s1 * s3 - s2 * s2)) AS cq
        FROM mom
    ),
    roots AS (
        SELECT m, adopters, a, b, cq,
               CASE WHEN cq < 0 AND b * b - 4 * a * cq > 0
                    THEN (-b - sqrt(b * b - 4 * a * cq)) / (2 * cq)
               END AS m_sat
        FROM fit
    )
    SELECT m AS n_days, CAST(adopters AS BIGINT) AS total_adopters,
           round(a, 6) AS coef_a, round(b, 6) AS coef_b,
           round(cq, 10) AS coef_c,
           round(m_sat, 2) AS market_size,
           round(CASE WHEN m_sat > 0 THEN a / m_sat END, 6)
               AS p_innovation,
           round(CASE WHEN m_sat > 0 THEN b + a / m_sat END, 6)
               AS q_imitation,
           round(CASE WHEN m_sat > 0 AND a / m_sat > 0
                      THEN (b + a / m_sat) / (a / m_sat) END, 4)
               AS q_over_p
    FROM roots
    """,
    tags=("events", "stats"),
)
def events_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass (1969) diffusion model fitted to daily signup adoption
    via the classic discrete-time OLS n_t = a + b·C_{t−1} + c·C²
    (Bass's own estimation scheme): the 3×3 normal equations are
    solved in closed form by Cramer's rule on EXACT integer moments
    (ΣCᵏ up to k = 4 and Σn·Cᵏ in HUGEINT/DECIMAL(38,0)), then the
    structural parameters are recovered — market size m̂ as the
    positive root of c·m² + b·m + a = 0, innovation p̂ = a/m̂,
    imitation q̂ = b + p̂, and the q/p word-of-mouth ratio. Root
    extraction is guarded (c < 0 and positive discriminant, else
    NULL — pinned identically on both sides: a synthetic fixture is
    not obliged to follow Bass). Cumulative adoption C uses the
    strictly-prior window (rows to 1 preceding, coalesce 0).

    Scale shape: one daily reduce, one cumulative window over the
    calendar-bounded signup day axis, one 8-sum exact-moment
    reduce, closed-form scalars."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    e = tbl(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_t"))
        .withColumn("daynum", F.datediff("day", F.lit("1990-01-01")))
    )
    # strictly-prior cumulative adoption = inclusive block-ranked
    # cumsum minus the day's own count (no single-partition window)
    cumu = exact_global_keyed_cumsum(
        daily, "daynum", "n_t", "daynum", "cumincl"
    ).select("n_t", (F.col("cumincl") - F.col("n_t")).cast("long").alias("c"))
    dec = lambda col: col.cast("decimal(38,0)")
    mom = cumu.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("c").cast("double").alias("s1"),
        F.sum(dec(F.col("c")) * F.col("c")).cast("double").alias("s2"),
        F.sum(dec(F.col("c")) * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s3"),
        F.sum(dec(F.col("c")) * F.col("c") * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s4"),
        F.sum("n_t").cast("double").alias("t0"),
        F.sum(dec(F.col("n_t")) * F.col("c")).cast("double").alias("t1"),
        F.sum(dec(F.col("n_t")) * F.col("c") * F.col("c"))
        .cast("double")
        .alias("t2"),
    )
    det = (
        F.col("m") * (F.col("s2") * F.col("s4") - F.col("s3") * F.col("s3"))
        - F.col("s1")
        * (F.col("s1") * F.col("s4") - F.col("s3") * F.col("s2"))
        + F.col("s2")
        * (F.col("s1") * F.col("s3") - F.col("s2") * F.col("s2"))
    )
    a = (
        F.col("t0") * (F.col("s2") * F.col("s4") - F.col("s3") * F.col("s3"))
        - F.col("s1")
        * (F.col("t1") * F.col("s4") - F.col("s3") * F.col("t2"))
        + F.col("s2")
        * (F.col("t1") * F.col("s3") - F.col("s2") * F.col("t2"))
    ) / det
    b = (
        F.col("m") * (F.col("t1") * F.col("s4") - F.col("t2") * F.col("s3"))
        - F.col("t0")
        * (F.col("s1") * F.col("s4") - F.col("s2") * F.col("s3"))
        + F.col("s2")
        * (F.col("s1") * F.col("t2") - F.col("s2") * F.col("t1"))
    ) / det
    cq = (
        F.col("m") * (F.col("s2") * F.col("t2") - F.col("t1") * F.col("s3"))
        - F.col("s1")
        * (F.col("s1") * F.col("t2") - F.col("t1") * F.col("s2"))
        + F.col("t0")
        * (F.col("s1") * F.col("s3") - F.col("s2") * F.col("s2"))
    ) / det
    fit = mom.select(
        "m",
        F.col("t0").alias("adopters"),
        a.alias("a"),
        b.alias("b"),
        cq.alias("cq"),
    )
    disc = F.col("b") * F.col("b") - 4 * F.col("a") * F.col("cq")
    m_sat = F.when(
        (F.col("cq") < 0) & (disc > 0),
        (-F.col("b") - F.sqrt(disc)) / (2 * F.col("cq")),
    )
    roots = fit.withColumn("m_sat", m_sat)
    p = F.col("a") / F.col("m_sat")
    return roots.select(
        F.col("m").alias("n_days"),
        F.col("adopters").cast("long").alias("total_adopters"),
        F.round(F.col("a"), 6).alias("coef_a"),
        F.round(F.col("b"), 6).alias("coef_b"),
        F.round(F.col("cq"), 10).alias("coef_c"),
        F.round(F.col("m_sat"), 2).alias("market_size"),
        F.round(F.when(F.col("m_sat") > 0, p), 6).alias("p_innovation"),
        F.round(F.when(F.col("m_sat") > 0, F.col("b") + p), 6).alias(
            "q_imitation"
        ),
        F.round(
            F.when((F.col("m_sat") > 0) & (p > 0), (F.col("b") + p) / p), 4
        ).alias("q_over_p"),
    )
