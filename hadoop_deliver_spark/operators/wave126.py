"""§2 extensions, hundred-twenty-sixth wave — causal jumps and
rare-event monitoring.

- events_rdd: sharp regression-discontinuity estimator at a pinned
  value cutoff — side-by-side local linear fits from exact integer
  moments, the jump τ and its z; completes the causal family
  (events_did, events_cuped, events_qini_uplift) with the
  running-variable design.
- events_t_chart: the t-chart (time-between-events control chart,
  Nelson 1994) on inter-error gaps — the rare-event chart that
  replaces events_c_chart when counts are mostly zero; Weibull-ish
  gaps normalized by the y = t^(1/3.6) transform, IMR-style limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CUT = 10_000  # cents: $100 cutoff
_BW = 5_000  # cents: ±$50 bandwidth


def _rdd_side_sql(name: str, lo: str, hi: str) -> str:
    return f"""
    {name} AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM base WHERE x >= {lo} AND x < {hi}
    )"""


@register(
    "events_rdd",
    f"""
    WITH base AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   - {_CUT} AS x,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    {_rdd_side_sql("l", str(-_BW), "0")},
    {_rdd_side_sql("r", "0", str(_BW))},
    fit AS (
        SELECT l.n AS nl, r.n AS nr,
               (l.sxy - CAST(l.sx AS DOUBLE) * l.sy / l.n)
                   / (l.sxx - CAST(l.sx AS DOUBLE) * l.sx / l.n) AS bl,
               (r.sxy - CAST(r.sx AS DOUBLE) * r.sy / r.n)
                   / (r.sxx - CAST(r.sx AS DOUBLE) * r.sx / r.n) AS br,
               CAST(l.sy AS DOUBLE) / l.n AS myl,
               CAST(r.sy AS DOUBLE) / r.n AS myr,
               CAST(l.sx AS DOUBLE) / l.n AS mxl,
               CAST(r.sx AS DOUBLE) / r.n AS mxr,
               l.sxx - CAST(l.sx AS DOUBLE) * l.sx / l.n AS sxxl,
               r.sxx - CAST(r.sx AS DOUBLE) * r.sx / r.n AS sxxr,
               CAST(l.sy AS DOUBLE) AS syl, CAST(r.sy AS DOUBLE) AS syr
        FROM l, r
    ),
    est AS (
        SELECT nl, nr,
               myl - bl * mxl AS al, myr - br * mxr AS ar,
               (myr - br * mxr) - (myl - bl * mxl) AS tau,
               (syl * (1 - syl / nl) / nl) / nl * (1 + nl * mxl * mxl / sxxl)
                   AS vl,
               (syr * (1 - syr / nr) / nr) / nr * (1 + nr * mxr * mxr / sxxr)
                   AS vr
        FROM fit
    )
    SELECT nl AS n_left, nr AS n_right,
           round(al, 6) AS p_left_at_cut,
           round(ar, 6) AS p_right_at_cut,
           round(tau, 6) AS rdd_jump,
           round(sqrt(vl + vr), 6) AS se_jump,
           round(tau / sqrt(vl + vr), 4) AS z_jump,
           abs(round(tau / sqrt(vl + vr), 4)) > 1.96 AS significant
    FROM est
    """,
    tags=("events", "stats"),
)
def events_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimator of the purchase-share
    jump at the pinned $100 value cutoff: separate local linear fits
    of 1{purchase} on the centered running variable within the ±$50
    bandwidth, τ̂ = α̂_right − α̂_left (the two intercepts AT the
    cutoff), with the binomial-variance intercept SE
    p(1−p)/n·(1 + n·x̄²/Sxx) per side and the z verdict off the
    ROUNDED statistic. A synthetic fixture has no built-in
    discontinuity — the estimator's job is to SAY so (τ ≈ 0,
    |z| < 1.96), which is itself the parity-checked behavior. All
    side moments are exact integers (HUGEINT/DECIMAL cross-products)
    cast once to double; pinned cutoff/bandwidth literals shared
    with the oracle.

    Scale shape: one filtered map + two 5-sum reduces (the bandwidth
    filter prunes at the scan), closed-form scalars."""
    e = tbl(spark, sf_dir, "events")
    base = e.select(
        ((dec2("value") * 100).cast("long") - _CUT).alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )

    def side(lo: int, hi: int):
        return base.filter(
            (F.col("x") >= lo) & (F.col("x") < hi)
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("double")
            .alias("sxx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
            .cast("double")
            .alias("sxy"),
        )

    l = side(-_BW, 0).select(*[F.col(c).alias(c + "l") for c in
                               ("n", "sx", "sxx", "sy", "sxy")])
    r = side(0, _BW).select(*[F.col(c).alias(c + "r") for c in
                              ("n", "sx", "sxx", "sy", "sxy")])
    j = l.crossJoin(F.broadcast(r))

    def est(sfx: str):
        n, sx, sxx, sy, sxy = (F.col(c + sfx) for c in
                               ("n", "sx", "sxx", "sy", "sxy"))
        sxxc = sxx - sx.cast("double") * sx / n
        b = (sxy - sx.cast("double") * sy / n) / sxxc
        mx = sx.cast("double") / n
        my = sy.cast("double") / n
        alpha = my - b * mx
        syd = sy.cast("double")
        var = (syd * (1 - syd / n) / n) / n * (1 + n * mx * mx / sxxc)
        return alpha, var, n

    al, vl, nl = est("l")
    ar, vr, nr = est("r")
    tau = ar - al
    se = F.sqrt(vl + vr)
    return j.select(
        nl.alias("n_left"),
        nr.alias("n_right"),
        F.round(al, 6).alias("p_left_at_cut"),
        F.round(ar, 6).alias("p_right_at_cut"),
        F.round(tau, 6).alias("rdd_jump"),
        F.round(se, 6).alias("se_jump"),
        F.round(tau / se, 4).alias("z_jump"),
        (F.abs(F.round(tau / se, 4)) > 1.96).alias("significant"),
    )


@register(
    "events_t_chart",
    """
    WITH err AS (
        SELECT epoch_us(ts) AS us, event_id FROM events
        WHERE event_type = 'error'
    ),
    ranked AS (
        SELECT us, row_number() OVER (ORDER BY us, event_id) AS r
        FROM err
    ),
    gaps AS (
        SELECT b.r - 1 AS gr, (b.us - a.us) // 1000000 AS gap_sec
        FROM ranked a JOIN ranked b ON b.r = a.r + 1
    ),
    ys AS (
        SELECT gr, gap_sec,
               pow(CAST(gap_sec AS DOUBLE), 1.0 / 3.6) AS y
        FROM gaps
    ),
    mr AS (
        SELECT abs(b.y - a.y) AS mrv
        FROM ys a JOIN ys b ON b.gr = a.gr + 1
    ),
    stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM ys) AS n_gaps,
               (SELECT avg(y) FROM ys) AS ybar,
               (SELECT avg(CAST(gap_sec AS DOUBLE)) FROM ys) AS mean_gap,
               (SELECT avg(mrv) FROM mr) AS mrbar
    )
    SELECT n_gaps,
           round(mean_gap / 60, 2) AS mean_gap_min,
           round(ybar, 6) AS ybar,
           round(mrbar, 6) AS mrbar,
           round(ybar + 2.66 * mrbar, 6) AS ucl_y,
           round(greatest(0.0, ybar - 2.66 * mrbar), 6) AS lcl_y,
           (SELECT CAST(sum(CASE WHEN round(y, 6) >
                   (SELECT round(ybar + 2.66 * mrbar, 6) FROM stats)
                   THEN 1 ELSE 0 END) AS BIGINT) FROM ys) AS n_above_ucl,
           (SELECT CAST(sum(CASE WHEN round(y, 6) <
                   (SELECT round(greatest(0.0, ybar - 2.66 * mrbar), 6)
                    FROM stats)
                   THEN 1 ELSE 0 END) AS BIGINT) FROM ys) AS n_below_lcl
    FROM stats
    """,
    tags=("events", "stats"),
)
def events_t_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-chart (time-between-events control chart, Nelson 1994) on
    the gaps between consecutive error events: inter-arrival seconds
    (integer, µs-floored), normalized by the y = t^(1/3.6) Nelson
    transform (a Weibull-shape compromise that makes exponential
    gaps near-normal), then Individuals-and-Moving-Range limits
    ȳ ± 2.66·M̄R. Shorter-than-LCL gaps = error bursts; above-UCL =
    unusually calm stretches. The error sequence is ordered by
    EXACT integer rank on (epoch µs, event_id) and both the gap and
    the moving range come from rank r ↔ r+1 equi-joins — no global
    lag window; out-of-control counts compare ROUND-6 values so
    both engines count identically.

    Scale shape: one filtered scan, block-ranked rank, two rank
    equi-joins, three 1-row reduces."""
    from hadoop_deliver_spark.api import exact_global_rank

    e = tbl(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    ranked = exact_global_rank(err, "us", "event_id", "r")
    nxt = ranked.select(
        (F.col("r") - 1).alias("r"), F.col("us").alias("us2")
    )
    gaps = ranked.join(nxt, "r").select(
        F.col("r").alias("gr"),
        F.expr("div(us2 - us, 1000000)").cast("long").alias("gap_sec"),
    )
    ys = gaps.select(
        "gr",
        "gap_sec",
        F.pow(F.col("gap_sec").cast("double"), F.lit(1.0 / 3.6)).alias("y"),
    )
    nxty = ys.select((F.col("gr") - 1).alias("gr"), F.col("y").alias("y2"))
    mr = ys.join(nxty, "gr").select(F.abs(F.col("y2") - F.col("y")).alias("mrv"))
    st = (
        ys.agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.avg("y").alias("ybar"),
            F.avg(F.col("gap_sec").cast("double")).alias("mean_gap"),
        )
        .crossJoin(F.broadcast(mr.agg(F.avg("mrv").alias("mrbar"))))
    )
    lim = st.select(
        "n_gaps",
        "ybar",
        "mean_gap",
        "mrbar",
        F.round(F.col("ybar") + 2.66 * F.col("mrbar"), 6).alias("ucl"),
        F.round(
            F.greatest(F.lit(0.0), F.col("ybar") - 2.66 * F.col("mrbar")), 6
        ).alias("lcl"),
    )
    counts = ys.crossJoin(F.broadcast(lim.select("ucl", "lcl"))).agg(
        F.sum(F.when(F.round(F.col("y"), 6) > F.col("ucl"), 1).otherwise(0))
        .cast("long")
        .alias("n_above_ucl"),
        F.sum(F.when(F.round(F.col("y"), 6) < F.col("lcl"), 1).otherwise(0))
        .cast("long")
        .alias("n_below_lcl"),
    )
    return lim.crossJoin(F.broadcast(counts)).select(
        "n_gaps",
        F.round(F.col("mean_gap") / 60, 2).alias("mean_gap_min"),
        F.round(F.col("ybar"), 6).alias("ybar"),
        F.round(F.col("mrbar"), 6).alias("mrbar"),
        F.col("ucl").alias("ucl_y"),
        F.col("lcl").alias("lcl_y"),
        "n_above_ucl",
        "n_below_lcl",
    )
