"""§2 extensions, eighty-sixth wave — calendar-uniformity GoF and the
marketing gains table.

- orders_ks_uniform_dates: one-sample Kolmogorov-Smirnov test of the
  order calendar against the uniform null — the goodness-of-fit
  complement of agg_ks_test (two-sample): "did demand arrive evenly
  over the fixture calendar?", with the sup taken over both sides of
  every step discontinuity.
- agg_cumulative_gains: the cumulative gains / decile lift table —
  THE standard targeting-model report (which top-scored slice
  captures which share of responders), on the llm_auc_roc frame so
  the table and the AUC grade the same score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# K_0.05 = 1.358 (two-sided asymptotic 5% Kolmogorov point), shipped
# squared so the verdict is one double comparison: 1.844164 = 1.358²
_KS_SQ = "1.844164"


@register(
    "orders_ks_uniform_dates",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    bounds AS (
        SELECT min(day) AS d0,
               CAST(max(day) - min(day) + 1 AS BIGINT) AS span,
               CAST(sum(cnt) AS BIGINT) AS n
        FROM daily
    ),
    steps AS (
        SELECT CAST(day - b.d0 + 1 AS BIGINT) AS r,
               cnt,
               CAST(sum(cnt) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
               b.span, b.n
        FROM daily, bounds b
    ),
    gaps AS (
        SELECT GREATEST(
                   abs(CAST(c AS HUGEINT) * span - CAST(r AS HUGEINT) * n),
                   abs(CAST(c - cnt AS HUGEINT) * span
                       - (CAST(r AS HUGEINT) - 1) * n)
               ) AS g, span, n
        FROM steps
    ),
    m AS (
        SELECT CAST(max(g) AS HUGEINT) AS mg,
               CAST(max(span) AS BIGINT) AS span,
               CAST(max(n) AS BIGINT) AS n
        FROM gaps
    )
    SELECT n AS n_orders, span AS n_days,
           round(CAST(mg AS DOUBLE) / (CAST(n AS DOUBLE) * span), 6)
               AS ks_d,
           CAST(mg AS DOUBLE) * CAST(mg AS DOUBLE) * n
               > {_KS_SQ} * (CAST(n AS DOUBLE) * span)
                 * (CAST(n AS DOUBLE) * span)
               AS nonuniform
    FROM m
    """,
    tags=("analytics", "stats"),
)
def orders_ks_uniform_dates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-sample Kolmogorov-Smirnov test of the order-arrival
    calendar against the uniform null F₀(d) = (d−d₀+1)/span: D =
    sup|F̂ − F₀|, with the sup evaluated on BOTH sides of every
    daily step (the empirical CDF jumps at day boundaries, so the
    largest gap is at either the post-jump value C_d/n or the
    pre-jump value C_{{d−1}}/n against the same F₀ — checking only
    one side under-reports D, the classical discrete-KS trap).
    Clearing denominators makes the whole sup ONE exact integer:
    M = max_d max(|C_d·span − R_d·n|, |(C_d−cnt_d)·span −
    (R_d−1)·n|) in DECIMAL(38)/HUGEINT, and D = M/(n·span) displays
    as a single division. The 5% verdict √n·D > 1.358 squares into
    M²·n > 1.358²·(n·span)² with ONE double cast per factor in
    fixed textual order (the events_poisson_dispersion device —
    M² would burst DECIMAL(38) past ~sf100; the literal 1.844164 =
    1.358² is the asymptotic Kolmogorov point, conservative on the
    discrete day grid — stated knob).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, the BLOCK-RANKED keyed cumsum core over the epoch-day
    axis (api.exact_global_keyed_cumsum — windows partition by
    block; no single-partition window in the plan, round-12
    conversion), a 1-row max reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bounds = daily.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1)
        .cast("long")
        .alias("span"),
        F.sum("cnt").cast("long").alias("n"),
    )
    cumd = exact_global_keyed_cumsum(
        daily.withColumn(
            "di", F.datediff("day", F.lit("1970-01-01").cast("date"))
        ),
        "di",
        "cnt",
        "di",
        "c",
    )
    steps = cumd.crossJoin(F.broadcast(bounds)).select(
        (F.datediff("day", "d0") + 1).cast("long").alias("r"),
        "cnt",
        F.col("c").cast("long").alias("c"),
        "span",
        "n",
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = F.greatest(
        F.abs(d38("c") * F.col("span") - d38("r") * F.col("n")),
        F.abs(
            (F.col("c") - F.col("cnt")).cast("decimal(38,0)")
            * F.col("span")
            - (d38("r") - 1) * F.col("n")
        ),
    )
    m = steps.select(g.alias("g"), "span", "n").agg(
        F.max("g").alias("mg"),
        F.max("span").cast("long").alias("span"),
        F.max("n").cast("long").alias("n"),
    )
    n, span, mg = F.col("n"), F.col("span"), F.col("mg")
    return m.select(
        n.alias("n_orders"),
        span.alias("n_days"),
        F.round(
            mg.cast("double") / (n.cast("double") * span), 6
        ).alias("ks_d"),
        (
            mg.cast("double") * mg.cast("double") * n
            > float(_KS_SQ)
            * (n.cast("double") * span)
            * (n.cast("double") * span)
        ).alias("nonuniform"),
    )


@register(
    "agg_cumulative_gains",
    """
    WITH base AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderpriority = '1-URGENT' AS resp,
               o_orderkey
        FROM orders
    ),
    dec AS (
        SELECT resp,
               ntile(10) OVER (ORDER BY cents DESC, o_orderkey) AS d
        FROM base
    ),
    cells AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n_d,
               CAST(count(*) FILTER (resp) AS BIGINT) AS r_d
        FROM dec GROUP BY d
    ),
    tot AS (
        SELECT CAST(sum(n_d) AS BIGINT) AS n, CAST(sum(r_d) AS BIGINT) AS r
        FROM cells
    ),
    cum AS (
        SELECT c.d, c.n_d, c.r_d, t.n, t.r,
               CAST(sum(c.r_d) OVER (ORDER BY c.d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cr,
               CAST(sum(c.n_d) OVER (ORDER BY c.d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
        FROM cells c CROSS JOIN tot t
    )
    SELECT d AS decile, n_d, r_d,
           round(CAST(r_d AS DOUBLE) * n / (CAST(n_d AS DOUBLE) * r), 4)
               AS lift,
           round(CAST(cr AS DOUBLE) / r, 6) AS cum_gain,
           round(CAST(cn AS DOUBLE) / n, 6) AS cum_share,
           CAST(r_d AS HUGEINT) * n > CAST(n_d AS HUGEINT) * r
               AS beats_base_rate
    FROM cum ORDER BY decile
    """,
    tags=("aggregate", "stats"),
)
def agg_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / decile lift table for order value as a
    predictor of urgency (the llm_auc_roc frame, so the table and
    the AUC grade the SAME score): orders sort by score descending
    into exact balanced deciles (ntile semantics — the
    api.exact_global_ntile block-ranked core on the Spark side, with
    the (−cents, orderkey) deterministic order, so NO
    single-partition window touches the fact table), then each
    decile reports its responder count, lift = (r_d/n_d)/(R/N), and
    the cumulative gain curve (share of all responders captured
    through this decile — the chart every targeting campaign is
    planned from). Counts are exact integers; lift and the gain
    curve are single divisions; the per-decile verdict lift > 1
    clears FULLY exactly to r_d·N > n_d·R (DECIMAL(38)/HUGEINT).
    The cumulative window runs over the 10-row decile table, not the
    data.

    Scale shape: one block-ranked decile pass (scalar split-probe +
    partitioned windows), one 10-cell reduce, a 10-row cumsum."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").alias("resp"),
        "o_orderkey",
    ).withColumn("neg", -F.col("cents"))
    dec = api.exact_global_ntile(base, "neg", "o_orderkey", 10, "d")
    cells = dec.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.count_if(F.col("resp")).cast("long").alias("r_d"),
    )
    tot = cells.agg(
        F.sum("n_d").cast("long").alias("n"),
        F.sum("r_d").cast("long").alias("r"),
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.crossJoin(F.broadcast(tot)).select(
        "d",
        "n_d",
        "r_d",
        "n",
        "r",
        F.sum("r_d").over(w_cum).cast("long").alias("cr"),
        F.sum("n_d").over(w_cum).cast("long").alias("cn"),
    )
    n_d, r_d, n, r = F.col("n_d"), F.col("r_d"), F.col("n"), F.col("r")
    return cum.select(
        F.col("d").alias("decile"),
        "n_d",
        "r_d",
        F.round(
            r_d.cast("double") * n / (n_d.cast("double") * r), 4
        ).alias("lift"),
        F.round(F.col("cr").cast("double") / r, 6).alias("cum_gain"),
        F.round(F.col("cn").cast("double") / n, 6).alias("cum_share"),
        (r_d.cast("decimal(38,0)") * n > n_d.cast("decimal(38,0)") * r).alias(
            "beats_base_rate"
        ),
    ).orderBy("decile")
