"""§2 extensions, ninety-eighth wave — SPC attribute/individuals
charts and classic 2×2 effect-size machinery.

- events_p_chart: Shewhart p-chart on the daily conversion proportion
  — completes the SPC set (x̄: ts_shewhart_xbar, counts:
  events_c_chart, proportions: here, individuals: events_imr_chart).
- events_imr_chart: individuals + moving-range (I-MR) chart — the SPC
  chart for ungroupable one-observation-per-period data.
- agg_cohen_h: Cohen's h arcsine effect size for two proportions —
  the effect-size companion the a/b panel lacked (d covers means).
- agg_yule_q: Yule's Q and Y for a 2×2 — the odds-ratio-based
  association pair predating Cramér's V.
- agg_odds_ratio_woolf: odds ratio with the Woolf logit CI — the
  epidemiology-standard interval the attributable-risk query implies
  but never reported.
- agg_moses_extreme: Moses test of extreme reactions — the
  rank-span two-sample test that detects EXTREME-value responses
  where location tests (Mann-Whitney) see nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_p_chart",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS x
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS e, CAST(sum(x) AS BIGINT) AS xx
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n AS n_events,
           x AS n_purchases,
           round(CAST(x AS DOUBLE) / n, 6) AS p,
           round(CAST(xx AS DOUBLE) / e, 6) AS p_bar,
           CAST(CAST(x AS HUGEINT) * e - CAST(xx AS HUGEINT) * n
                AS DOUBLE)
             * CAST(CAST(x AS HUGEINT) * e - CAST(xx AS HUGEINT) * n
                    AS DOUBLE)
             > 9.0 * CAST(xx AS DOUBLE) * (e - xx) * n AS ooc
    FROM daily CROSS JOIN tot ORDER BY day
    """,
    tags=("events", "spc"),
)
def events_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart (attribute SPC for proportions): daily
    purchase share p_i = x_i/n_i against 3σ binomial limits around
    the pooled center p̄ = X/E, with variable per-day limits
    (√(p̄(1−p̄)/n_i) — the defining p-chart feature vs a fixed-limit
    np-chart). The out-of-control flag is cleared of divisions:
    (p_i − p̄)² > 9·p̄(1−p̄)/n_i ⇔ (x_i·E − X·n_i)² > 9·X·(E−X)·n_i,
    with the exact integer difference built in HUGEINT/DECIMAL(38)
    and ONE double cast per factor in fixed textual order on both
    engines (the orders_ks_uniform_dates overflow device — squaring
    stays in double, the subtraction stays exact).

    Scale shape: one keyed reduce to the calendar-bounded day axis,
    a 1-row total, a broadcast cross join. No window at all."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("x"),
    )
    tot = daily.agg(
        F.sum("n").cast("long").alias("e"),
        F.sum("x").cast("long").alias("xx"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diff = (d38("x") * F.col("e") - d38("xx") * F.col("n")).cast("double")
    return (
        daily.crossJoin(F.broadcast(tot))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").alias("n_events"),
            F.col("x").alias("n_purchases"),
            F.round(F.col("x").cast("double") / F.col("n"), 6).alias("p"),
            F.round(F.col("xx").cast("double") / F.col("e"), 6).alias(
                "p_bar"
            ),
            (
                diff * diff
                > 9.0
                * F.col("xx").cast("double")
                * (F.col("e") - F.col("xx"))
                * F.col("n")
            ).alias("ooc"),
        )
        .orderBy("day")
    )


@register(
    "events_imr_chart",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    mr AS (
        SELECT day, x,
               abs(x - lag(x) OVER (ORDER BY day)) AS mr
        FROM daily
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(mr) AS BIGINT) AS smr
        FROM mr
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x, mr,
           abs(CAST(CAST(x AS HUGEINT) * nn - s AS DOUBLE)) * (nn - 1)
               * 1.128 > 3.0 * nn * CAST(smr AS DOUBLE) AS ooc_x,
           coalesce(CAST(mr AS DOUBLE) * (nn - 1) * 1000.0
                    > 3267.0 * CAST(smr AS DOUBLE), FALSE) AS ooc_mr
    FROM mr CROSS JOIN tot ORDER BY day
    """,
    tags=("events", "spc"),
)
def events_imr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Individuals + moving-range (I-MR) control chart — the SPC
    chart for one-observation-per-period data where no rational
    subgroup exists (daily totals). σ is estimated from the mean
    moving range MR̄/d₂ (d₂ = 1.128 for n = 2 — the published
    Shewhart constant), so the individuals limit |x − x̄| > 3·MR̄/d₂
    clears to |x·N − S|·(N−1)·1.128 > 3·N·ΣMR with the difference
    exact in HUGEINT/DECIMAL(38) and one double cast per factor in
    fixed order; the range limit MR > D₄·MR̄ (D₄ = 3.267) clears the
    same way via the ×1000 literal. First-day MR is NULL and its
    flag pinned FALSE on both engines.

    Scale shape: one keyed reduce to the calendar-bounded day axis;
    the single lag window runs over that bounded axis (the ts_*
    bounded-window shape, allowlisted) plus a 1-row moment reduce."""
    e = tbl(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    mr = daily.select(
        "day",
        "x",
        F.abs(F.col("x") - F.lag("x").over(w)).alias("mr"),
    )
    tot = mr.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("s"),
        F.sum("mr").cast("long").alias("smr"),
    )
    diff = F.abs(
        (F.col("x").cast("decimal(38,0)") * F.col("nn") - F.col("s")).cast(
            "double"
        )
    )
    return (
        mr.crossJoin(F.broadcast(tot))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            "mr",
            (
                diff * (F.col("nn") - 1) * 1.128
                > 3.0 * F.col("nn") * F.col("smr").cast("double")
            ).alias("ooc_x"),
            F.coalesce(
                F.col("mr").cast("double") * (F.col("nn") - 1) * 1000.0
                > 3267.0 * F.col("smr").cast("double"),
                F.lit(False),
            ).alias("ooc_mr"),
        )
        .orderBy("day")
    )


@register(
    "agg_cohen_h",
    """
    WITH g AS (
        SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6)
                    THEN 'weekend' ELSE 'weekday' END AS grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS x
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT
            max(CASE WHEN grp = 'weekend' THEN n END) AS n1,
            max(CASE WHEN grp = 'weekend' THEN x END) AS x1,
            max(CASE WHEN grp = 'weekday' THEN n END) AS n2,
            max(CASE WHEN grp = 'weekday' THEN x END) AS x2
        FROM g
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           round(CAST(x1 AS DOUBLE) / n1, 6) AS p_weekend,
           round(CAST(x2 AS DOUBLE) / n2, 6) AS p_weekday,
           round(2.0 * asin(sqrt(CAST(x1 AS DOUBLE) / n1))
                 - 2.0 * asin(sqrt(CAST(x2 AS DOUBLE) / n2)), 6) AS h,
           abs(round(2.0 * asin(sqrt(CAST(x1 AS DOUBLE) / n1))
                 - 2.0 * asin(sqrt(CAST(x2 AS DOUBLE) / n2)), 6)) >= 0.2
               AS at_least_small
    FROM p
    """,
    tags=("aggregate", "stats"),
)
def agg_cohen_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's h (1988) — the arcsine-stabilized effect size for two
    proportions, h = 2·asin√p₁ − 2·asin√p₂: unlike the raw
    difference p₁−p₂, equal h means equal detectability at any base
    rate (the variance-stabilizing property that makes it the power-
    analysis input for A/B tests of proportions; the panel's
    events_abtest_power consumes exactly this quantity implicitly).
    Frame: weekend vs weekday purchase conversion. Both engines
    evaluate the identical asin/sqrt composition in fixed textual
    order and round to 6; the smallness flag compares the ROUNDED h
    against Cohen's 0.2 benchmark so the verdict is
    rounding-stable. Weekday convention pinned explicitly per
    engine: Spark dayofweek ∈ {1=Sun, 7=Sat}, DuckDB ∈ {0=Sun,
    6=Sat} — the predicates differ textually to mean the SAME days.

    Scale shape: one 2-group aggregate, a 1-row pivot."""
    e = tbl(spark, sf_dir, "events")
    g = e.groupBy(
        F.when(F.dayofweek("ts").isin(1, 7), "weekend")
        .otherwise("weekday")
        .alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("x"),
    )
    p = g.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{i}")
            for i, grp in ((1, "weekend"), (2, "weekday"))
            for c in ("n", "x")
        ]
    )
    p1 = F.sqrt(F.col("x1").cast("double") / F.col("n1"))
    p2 = F.sqrt(F.col("x2").cast("double") / F.col("n2"))
    h = F.round(2.0 * F.asin(p1) - 2.0 * F.asin(p2), 6)
    return p.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(F.col("x1").cast("double") / F.col("n1"), 6).alias(
            "p_weekend"
        ),
        F.round(F.col("x2").cast("double") / F.col("n2"), 6).alias(
            "p_weekday"
        ),
        h.alias("h"),
        (F.abs(h) >= 0.2).alias("at_least_small"),
    )


@register(
    "agg_yule_q",
    """
    WITH c AS (
        SELECT
            CAST(count(*) FILTER (o_orderpriority = '1-URGENT'
                                  AND o_orderstatus = 'F') AS BIGINT) AS a,
            CAST(count(*) FILTER (o_orderpriority = '1-URGENT'
                                  AND o_orderstatus != 'F') AS BIGINT) AS b,
            CAST(count(*) FILTER (o_orderpriority != '1-URGENT'
                                  AND o_orderstatus = 'F') AS BIGINT) AS cc,
            CAST(count(*) FILTER (o_orderpriority != '1-URGENT'
                                  AND o_orderstatus != 'F') AS BIGINT) AS d
        FROM orders
    )
    SELECT a, b, cc AS c, d,
           round(CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * cc
                      AS DOUBLE)
                 / CAST(CAST(a AS HUGEINT) * d + CAST(b AS HUGEINT) * cc
                        AS DOUBLE), 6) AS yule_q,
           round((sqrt(CAST(a AS DOUBLE) * d) - sqrt(CAST(b AS DOUBLE) * cc))
                 / (sqrt(CAST(a AS DOUBLE) * d) + sqrt(CAST(b AS DOUBLE) * cc)),
                 6) AS yule_y,
           CAST(a AS HUGEINT) * d > CAST(b AS HUGEINT) * cc
               AS positive_association
    FROM c
    """,
    tags=("aggregate", "stats"),
)
def agg_yule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's Q (1900) and Y (colligation, 1912) for the 2×2 of
    urgency × finished status — the odds-ratio-based association
    pair predating Cramér's V: Q = (ad−bc)/(ad+bc) is the OR mapped
    to [−1, 1] (Q = (OR−1)/(OR+1)), Y the same through √OR (Y
    corrects Q's tendency to saturate). The direction verdict is
    FULLY exact — ad > bc in DECIMAL(38)/HUGEINT with no double
    anywhere in the decision; Q and Y carry one double cast per
    factor in fixed textual order, rounded to 6.

    Scale shape: one 4-cell filtered aggregate over the fact table —
    a single map-side-combined pass, no shuffle beyond the 1-row
    reduce."""
    o = tbl(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    fin = F.col("o_orderstatus") == "F"
    c = o.agg(
        F.sum((urgent & fin).cast("long")).cast("long").alias("a"),
        F.sum((urgent & ~fin).cast("long")).cast("long").alias("b"),
        F.sum((~urgent & fin).cast("long")).cast("long").alias("cc"),
        F.sum((~urgent & ~fin).cast("long")).cast("long").alias("d"),
    )
    d38 = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    ad = d38("a") * F.col("d")
    bc = d38("b") * F.col("cc")
    sad = F.sqrt(F.col("a").cast("double") * F.col("d"))
    sbc = F.sqrt(F.col("b").cast("double") * F.col("cc"))
    return c.select(
        "a",
        "b",
        F.col("cc").alias("c"),
        "d",
        F.round(
            (ad - bc).cast("double") / (ad + bc).cast("double"), 6
        ).alias("yule_q"),
        F.round((sad - sbc) / (sad + sbc), 6).alias("yule_y"),
        (ad > bc).alias("positive_association"),
    )


@register(
    "agg_odds_ratio_woolf",
    """
    WITH c AS (
        SELECT
            CAST(count(*) FILTER (o_orderdate < DATE '1995-07-01'
                                  AND o_orderstatus = 'F') AS BIGINT) AS a,
            CAST(count(*) FILTER (o_orderdate < DATE '1995-07-01'
                                  AND o_orderstatus != 'F') AS BIGINT) AS b,
            CAST(count(*) FILTER (o_orderdate >= DATE '1995-07-01'
                                  AND o_orderstatus = 'F') AS BIGINT) AS cc,
            CAST(count(*) FILTER (o_orderdate >= DATE '1995-07-01'
                                  AND o_orderstatus != 'F') AS BIGINT) AS d
        FROM orders
    ),
    m AS (
        SELECT a, b, cc, d,
               ln(CAST(a AS DOUBLE)) + ln(CAST(d AS DOUBLE))
               - ln(CAST(b AS DOUBLE)) - ln(CAST(cc AS DOUBLE)) AS lor,
               sqrt(1.0 / a + 1.0 / b + 1.0 / cc + 1.0 / d) AS se
        FROM c
    )
    SELECT a, b, cc AS c, d,
           round(exp(lor), 6) AS odds_ratio,
           round(exp(lor - 1.96 * se), 6) AS ci_lo,
           round(exp(lor + 1.96 * se), 6) AS ci_hi,
           round(exp(lor - 1.96 * se), 6) > 1.0
               OR round(exp(lor + 1.96 * se), 6) < 1.0 AS significant
    FROM m
    """,
    tags=("aggregate", "stats"),
)
def agg_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio with the Woolf (1955) logit confidence interval —
    the epidemiology-standard 2×2 interval (early-half order date ×
    finished status): ln OR carries se = √(1/a + 1/b + 1/c + 1/d),
    CI = exp(ln OR ± 1.96·se). ln OR is assembled as
    ln a + ln d − ln b − ln c in FIXED textual order (not
    ln(ad/(bc)) — the four-term form avoids the integer product
    entirely, so no overflow at any scale factor and identical float
    sequencing on both engines). The significance verdict compares
    the ROUNDED CI endpoints against 1, making it stable at the
    rounding boundary.

    Scale shape: one 4-cell filtered aggregate, 1-row math."""
    o = tbl(spark, sf_dir, "orders")
    early = F.col("o_orderdate") < F.lit("1995-07-01").cast("date")
    fin = F.col("o_orderstatus") == "F"
    c = o.agg(
        F.sum((early & fin).cast("long")).cast("long").alias("a"),
        F.sum((early & ~fin).cast("long")).cast("long").alias("b"),
        F.sum((~early & fin).cast("long")).cast("long").alias("cc"),
        F.sum((~early & ~fin).cast("long")).cast("long").alias("d"),
    )
    dd = lambda c_: F.col(c_).cast("double")  # noqa: E731
    lor = F.log(dd("a")) + F.log(dd("d")) - F.log(dd("b")) - F.log(dd("cc"))
    se = F.sqrt(1.0 / dd("a") + 1.0 / dd("b") + 1.0 / dd("cc") + 1.0 / dd("d"))
    lo = F.round(F.exp(lor - 1.96 * se), 6)
    hi = F.round(F.exp(lor + 1.96 * se), 6)
    return c.select(
        "a",
        "b",
        F.col("cc").alias("c"),
        "d",
        F.round(F.exp(lor), 6).alias("odds_ratio"),
        lo.alias("ci_lo"),
        hi.alias("ci_hi"),
        ((lo > 1.0) | (hi < 1.0)).alias("significant"),
    )


@register(
    "agg_moses_extreme",
    """
    WITH v AS (
        SELECT o_orderkey,
               o_orderpriority = '1-URGENT' AS ctl,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    rk AS (
        SELECT ctl, row_number() OVER (ORDER BY cents, o_orderkey)
                        AS r
        FROM v
    ),
    ctl AS (
        SELECT r, row_number() OVER (ORDER BY r) AS pos,
               count(*) OVER () AS nc
        FROM rk WHERE ctl
    ),
    h AS (
        SELECT CAST(max(nc) AS BIGINT) AS nc,
               CAST(ceil(max(nc) * 0.05) AS BIGINT) AS h
        FROM ctl
    ),
    span AS (
        SELECT max(CASE WHEN pos = h.h + 1 THEN r END) AS r_lo,
               max(CASE WHEN pos = h.nc - h.h THEN r END) AS r_hi,
               max(h.nc) AS nc, max(h.h) AS h
        FROM ctl CROSS JOIN h
    )
    SELECT nc AS n_control,
           (SELECT CAST(count(*) AS BIGINT) FROM rk WHERE NOT ctl)
               AS n_experimental,
           h AS n_trimmed_each_end,
           CAST(r_hi - r_lo + 1 AS BIGINT) AS span_h,
           CAST(nc - 2 * h AS BIGINT) AS min_possible_span,
           CAST(r_hi - r_lo + 1 - (nc - 2 * h) AS BIGINT) AS excess
    FROM span
    """,
    tags=("aggregate", "stats"),
)
def agg_moses_extreme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moses test of extreme reactions (1952) on order value, urgent
    (control) vs rest (experimental): rank the POOLED sample, trim
    the control group's h = ⌈0.05·n_c⌉ most extreme ranks from each
    end, and report the span of the remaining control ranks. A
    treatment that pushes subjects to BOTH tails (the
    extreme-reaction alternative every location test is blind to)
    inflates span_h above its minimum n_c − 2h; ``excess`` counts the
    experimental observations lodged inside the trimmed control
    range. All integers, fully exact.

    Scale shape: BOTH rank passes are block-ranked api cores (pooled
    rank over cents; position index over the control ranks) — no
    global window anywhere; the trim boundary probe is a 1-row
    reduce, the span a 4-cell pivot.

    Engine note: the oracle uses two global windows (DuckDB planner's
    business); the Spark side must stay block-ranked — enforced by
    the global-window plan guard."""
    from hadoop_deliver_spark.api import exact_global_rank

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("ctl"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rk = exact_global_rank(v, "cents", "o_orderkey", "r")
    ctl = rk.filter(F.col("ctl")).select("r")
    ctl = exact_global_rank(ctl, "r", "r", "pos")
    nstats = ctl.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    n_exp = rk.filter(~F.col("ctl")).agg(
        F.count(F.lit(1)).cast("long").alias("ne")
    )
    hdf = nstats.select(
        "nc", F.ceil(F.col("nc") * 0.05).cast("long").alias("h")
    )
    span = (
        ctl.crossJoin(F.broadcast(hdf))
        .agg(
            F.max(
                F.when(F.col("pos") == F.col("h") + 1, F.col("r"))
            ).alias("r_lo"),
            F.max(
                F.when(F.col("pos") == F.col("nc") - F.col("h"), F.col("r"))
            ).alias("r_hi"),
            F.max("nc").alias("nc"),
            F.max("h").alias("h"),
        )
        .crossJoin(F.broadcast(n_exp))
    )
    return span.select(
        F.col("nc").alias("n_control"),
        F.col("ne").alias("n_experimental"),
        F.col("h").alias("n_trimmed_each_end"),
        (F.col("r_hi") - F.col("r_lo") + 1)
        .cast("long")
        .alias("span_h"),
        (F.col("nc") - 2 * F.col("h")).cast("long").alias(
            "min_possible_span"
        ),
        (F.col("r_hi") - F.col("r_lo") + 1 - (F.col("nc") - 2 * F.col("h")))
        .cast("long")
        .alias("excess"),
    )
