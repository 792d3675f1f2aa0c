"""§2 extensions, ninety-eighth wave — queueing conservation,
errors-in-variables regression, and sequential testing classics
(published-method cadence).

- orders_little_law: Little's law L = λW (1961) verified as an
  EXACT integer conservation identity between two very different
  distributed plans — a per-order duration reduce and a
  delta-cumsum piecewise backlog integral.
- agg_deming_regression: Deming's errors-in-variables regression
  (1943), orthogonal form — method comparison between an order's
  header total and its line-item sum.
- ts_sprt_wald: Wald's sequential probability ratio test (1945) on
  the daily URGENT-beats-LOW Bernoulli stream — integer micro-nat
  log-LR increments keep the sequential decision fully exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# SPRT design: H0 p=0.5 vs H1 p=0.6, α = β = 0.05. The per-observation
# log-LR increments and the Wald boundary are INTEGER micro-nats
# (⌊10⁶·ln(ratio)⌉ — design constants of THIS op, stated literals), so
# the running sum and every boundary crossing are exact integers:
# cumulative float windows associate differently across engines, an
# integer stream cannot.
_LLR_WIN = 182322       # round(1e6 * ln(0.6/0.5))
_LLR_LOSS = -223144     # round(1e6 * ln(0.4/0.5))
_WALD_A = 2944439       # round(1e6 * ln(0.95/0.05))


@register(
    "orders_little_law",
    """
    WITH span AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_orderdate AS DATE)
                    - DATE '1992-01-01' AS BIGINT) AS t0,
               CAST(max(CAST(l.l_shipdate AS DATE))
                    - DATE '1992-01-01' AS BIGINT) AS t1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    w AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(t1 - t0 + 1) AS BIGINT) AS order_days,
               CAST(min(t0) AS BIGINT) AS tmin,
               CAST(max(t1) AS BIGINT) AS tmax
        FROM span
    ),
    deltas AS (
        SELECT t0 AS t, CAST(1 AS BIGINT) AS d FROM span
        UNION ALL
        SELECT t1 + 1 AS t, CAST(-1 AS BIGINT) AS d FROM span
    ),
    pts AS (
        SELECT t, CAST(sum(d) AS BIGINT) AS d
        FROM deltas GROUP BY t
    ),
    segs AS (
        SELECT t,
               CAST(sum(d) OVER (ORDER BY t) AS BIGINT) AS open_cnt,
               lead(t) OVER (ORDER BY t) AS tn
        FROM pts
    ),
    backlog AS (
        SELECT CAST(sum(CASE WHEN tn IS NULL THEN 0
                             ELSE open_cnt * (tn - t) END) AS BIGINT)
                   AS backlog_days
        FROM segs
    )
    SELECT w.n_orders,
           CAST(w.tmax - w.tmin + 1 AS BIGINT) AS span_days,
           round(CAST(b.backlog_days AS DOUBLE)
                 / (w.tmax - w.tmin + 1), 4) AS l_avg_open,
           round(CAST(w.n_orders AS DOUBLE) / (w.tmax - w.tmin + 1), 4)
               AS lambda_per_day,
           round(CAST(w.order_days AS DOUBLE) / w.n_orders, 4)
               AS w_avg_days,
           w.order_days = b.backlog_days AS conservation_exact
    FROM w, backlog b
    """,
    tags=("orders", "stats"),
)
def orders_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (1961), L = λW, verified as an EXACT conservation
    identity: the time-integral of the instantaneous open-order
    count (the orders_open_backlog view) must equal the sum of
    per-order durations (the flow view) — both count the same
    order-day cells of the (order × day) incidence matrix: Fubini,
    made operational. The two sides come from DELIBERATELY different
    distributed plans — a per-order max-ship duration reduce vs a
    ±1 delta stream integrated piecewise (cumulative count over the
    calendar-bounded change-point axis × segment length; never a
    day-grid theta join) — so the exact integer verdict Σdurations =
    ∫backlog is a real cross-plan pipeline invariant: any
    off-by-one in interval bounds or the cumsum breaks it. L, λ, W
    display as exact-input divisions; in-system = orderdate ..
    max(l_shipdate), both ends inclusive (stated convention).

    Scale shape: one keyed header-lines reduce to per-order spans,
    a ±1 delta reduce to ≤2·days change points, one bounded-axis
    cumulative window — map-side-combinable everywhere else."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    epoch = F.lit("1992-01-01")
    span = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            o["o_orderkey"],
            F.datediff(F.to_date("o_orderdate"), epoch)
            .cast("long")
            .alias("t0"),
        )
        .agg(
            F.max(F.datediff(F.to_date("l_shipdate"), epoch))
            .cast("long")
            .alias("t1")
        )
    ).localCheckpoint()
    w = span.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("t1") - F.col("t0") + 1)
        .cast("long")
        .alias("order_days"),
        F.min("t0").cast("long").alias("tmin"),
        F.max("t1").cast("long").alias("tmax"),
    )
    deltas = span.select(
        F.col("t0").alias("t"), F.lit(1).cast("long").alias("d")
    ).unionAll(
        span.select(
            (F.col("t1") + 1).alias("t"),
            F.lit(-1).cast("long").alias("d"),
        )
    )
    pts = deltas.groupBy("t").agg(F.sum("d").cast("long").alias("d"))
    w_ord = Window.orderBy("t")
    segs = pts.select(
        "t",
        F.sum("d").over(w_ord).cast("long").alias("open_cnt"),
        F.lead("t").over(w_ord).alias("tn"),
    )
    backlog = segs.agg(
        F.sum(
            F.when(F.col("tn").isNull(), F.lit(0)).otherwise(
                F.col("open_cnt") * (F.col("tn") - F.col("t"))
            )
        )
        .cast("long")
        .alias("backlog_days")
    )
    m = w.crossJoin(F.broadcast(backlog))
    span_days = F.col("tmax") - F.col("tmin") + 1
    return m.select(
        "n_orders",
        span_days.cast("long").alias("span_days"),
        F.round(
            F.col("backlog_days").cast("double") / span_days, 4
        ).alias("l_avg_open"),
        F.round(F.col("n_orders").cast("double") / span_days, 4).alias(
            "lambda_per_day"
        ),
        F.round(
            F.col("order_days").cast("double") / F.col("n_orders"), 4
        ).alias("w_avg_days"),
        (F.col("order_days") == F.col("backlog_days")).alias(
            "conservation_exact"
        ),
    )


@register(
    "agg_deming_regression",
    """
    WITH pairs AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS x,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM pairs
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy,
               CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS cxy,
               CAST(sx AS DOUBLE) / n AS mx,
               CAST(sy AS DOUBLE) / n AS my
        FROM m
    ),
    d AS (
        SELECT n, mx, my,
               (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
                                 + 4 * cxy * cxy)) / (2 * cxy) AS slope
        FROM c
    )
    SELECT n AS n_orders,
           round(slope, 6) AS deming_slope,
           round(my - slope * mx, 2) AS deming_intercept_cents,
           slope > 0.95 AND slope < 1.10 AS methods_agree
    FROM d
    """,
    tags=("agg", "stats"),
)
def agg_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming's errors-in-variables regression (1943), orthogonal
    form (δ = 1, stated knob): the method-comparison line between
    two measurements of the same order — the header o_totalprice vs
    the line-item Σextendedprice (they differ by tax/discount
    roll-in, exactly the systematic-plus-noise disagreement Deming
    regression was built for; OLS of y on x is biased toward 0 when
    x itself carries error — agg_corr_regr's slope would understate
    the relation). Closed form: slope = (C_yy − C_xx + √((C_yy −
    C_xx)² + 4C_xy²))/(2C_xy), the positive root of the orthogonal
    eigenproblem. Every moment is exact DECIMAL(38)/HUGEINT; the
    slope/intercept and the verdict slope ∈ (0.95, 1.10) (the
    discount/tax envelope around 1) assemble in ONE fixed textual
    order of doubles.

    Scale shape: one keyed header-lines join reduce to per-order
    pairs, one map-side-combinable moment reduce to a single
    row."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            o["o_orderkey"],
            (dec2("o_totalprice") * 100).cast("long").alias("x"),
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d38("x")).alias("sx"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("x") * F.col("x")).alias("sxx"),
        F.sum(d38("y") * F.col("y")).alias("syy"),
        F.sum(d38("x") * F.col("y")).alias("sxy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    c = m.select(
        "n",
        (n38 * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
        (n38 * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
    )
    cxx, cyy, cxy = F.col("cxx"), F.col("cyy"), F.col("cxy")
    d = c.select(
        "n",
        "mx",
        "my",
        (
            (
                cyy
                - cxx
                + F.sqrt((cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)
            )
            / (2 * cxy)
        ).alias("slope"),
    )
    slope = F.col("slope")
    return d.select(
        F.col("n").alias("n_orders"),
        F.round(slope, 6).alias("deming_slope"),
        F.round(F.col("my") - slope * F.col("mx"), 2).alias(
            "deming_intercept_cents"
        ),
        ((slope > 0.95) & (slope < 1.10)).alias("methods_agree"),
    )


@register(
    "ts_sprt_wald",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(count(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 END) AS BIGINT) AS u,
               CAST(count(CASE WHEN o_orderpriority = '5-LOW'
                          THEN 1 END) AS BIGINT) AS l
        FROM orders GROUP BY 1
    ),
    obs AS (
        SELECT day, (u > l) AS win
        FROM daily WHERE u <> l
    ),
    cum AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(sum(CASE WHEN win THEN {_LLR_WIN}
                             ELSE {_LLR_LOSS} END)
                    OVER (ORDER BY day) AS BIGINT) AS llr
        FROM obs
    ),
    crossing AS (
        SELECT min(CASE WHEN llr >= {_WALD_A} THEN i END) AS hit_h1,
               min(CASE WHEN llr <= -{_WALD_A} THEN i END) AS hit_h0,
               CAST(max(i) AS BIGINT) AS n_obs,
               CAST(max(CASE WHEN i = (SELECT max(i) FROM cum)
                             THEN llr END) AS BIGINT) AS llr_end
        FROM cum
    )
    SELECT n_obs,
           CASE
               WHEN hit_h1 IS NOT NULL
                    AND (hit_h0 IS NULL OR hit_h1 < hit_h0)
                   THEN 'accept_h1'
               WHEN hit_h0 IS NOT NULL
                    AND (hit_h1 IS NULL OR hit_h0 <= hit_h1)
                   THEN 'accept_h0'
               ELSE 'continue'
           END AS decision,
           CAST(coalesce(least(hit_h1, hit_h0),
                         coalesce(hit_h1, hit_h0)) AS BIGINT)
               AS decision_at_obs,
           round(CAST(llr_end AS DOUBLE) / 1000000, 4) AS llr_final
    FROM crossing
    """,
    tags=("timeseries", "stats"),
)
def ts_sprt_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (1945) — the
    original always-valid sequential A/B test, run over the
    calendar on the Bernoulli stream x_t = [URGENT daily order
    count beats LOW's] (tie days dropped, stated knob): H₀ p = 0.5
    vs H₁ p = 0.6 at α = β = 0.05. The log-LR increments enter as
    INTEGER micro-nats (182322 = ⌊10⁶ln 1.2⌉, −223144 = ⌊10⁶ln
    0.8⌉ — design constants of this op, stated literals; the ~1e-6
    quantization is 10⁵× below the boundary scale), so the running
    sum is an EXACT integer cumulative over the bounded day axis
    and every boundary crossing against ±2944439 = ⌊10⁶ln 19⌉ is an
    exact integer comparison — a float cumsum would associate
    differently across engines near the boundary. Where
    events_abtest_proportions is the fixed-horizon test, SPRT stops
    early with guaranteed error rates — the 1945 result modern
    always-valid inference descends from. Decision = FIRST
    crossing; earliest boundary wins, H₀ on the (measure-zero)
    same-day tie.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one bounded-axis integer cumulative window, a 1-row
    crossing reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1)))
        .cast("long")
        .alias("u"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", F.lit(1)))
        .cast("long")
        .alias("l"),
    )
    obs = daily.where(F.col("u") != F.col("l")).select(
        "day", (F.col("u") > F.col("l")).alias("win")
    )
    w_ord = Window.orderBy("day")
    cum = obs.select(
        "day",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum(
            F.when(F.col("win"), F.lit(_LLR_WIN)).otherwise(
                F.lit(_LLR_LOSS)
            )
        )
        .over(w_ord)
        .cast("long")
        .alias("llr"),
    ).localCheckpoint()
    imax = cum.agg(F.max("i").alias("im"))
    crossing = cum.crossJoin(F.broadcast(imax)).agg(
        F.min(F.when(F.col("llr") >= _WALD_A, F.col("i"))).alias(
            "hit_h1"
        ),
        F.min(F.when(F.col("llr") <= -_WALD_A, F.col("i"))).alias(
            "hit_h0"
        ),
        F.max("i").cast("long").alias("n_obs"),
        F.max(F.when(F.col("i") == F.col("im"), F.col("llr")))
        .cast("long")
        .alias("llr_end"),
    )
    h1, h0 = F.col("hit_h1"), F.col("hit_h0")
    return crossing.select(
        "n_obs",
        F.when(h1.isNotNull() & (h0.isNull() | (h1 < h0)), "accept_h1")
        .when(h0.isNotNull() & (h1.isNull() | (h0 <= h1)), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.coalesce(F.least(h1, h0), F.coalesce(h1, h0))
        .cast("long")
        .alias("decision_at_obs"),
        F.round(F.col("llr_end").cast("double") / 1000000, 4).alias(
            "llr_final"
        ),
    )
