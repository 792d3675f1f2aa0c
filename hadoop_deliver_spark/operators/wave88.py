"""§2 extensions, eighty-eighth wave — reliability prophecy,
attributable risk, and the survey-weighting design effect.

- agg_spearman_brown: the Spearman-Brown prophecy (1910) on the
  split-half customer-value "test" — completes the reliability suite
  (agg_cronbach_alpha: items; customers_krippendorff_alpha: interval
  agreement; this: split-half with the classical step-up formula).
- events_attributable_risk: Levin's population attributable risk
  (1953) — what share of purchases would vanish if the exposed
  behavior (landing on a view first) vanished, FULLY exact.
- agg_kish_design_effect: Kish's design effect and effective sample
  size (1965) under order-count weighting — THE survey-statistics
  number that says how much unequal weighting inflates variance,
  FULLY exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_spearman_brown",
    """
    WITH spend AS (
        SELECT o_custkey,
               CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 2 END
                   AS half,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    both_halves AS (
        SELECT o_custkey FROM spend GROUP BY o_custkey
        HAVING count(*) = 2
    ),
    w AS (
        SELECT a.cents AS x, b.cents AS y
        FROM spend a
        JOIN spend b ON a.o_custkey = b.o_custkey
                    AND a.half = 1 AND b.half = 2
        JOIN both_halves bh ON bh.o_custkey = a.o_custkey
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM w
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
               CAST(CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy
        FROM m
    )
    SELECT n AS n_customers,
           round(cxy / sqrt(cxx * cyy), 6) AS split_half_r,
           round(2 * (cxy / sqrt(cxx * cyy))
                 / (1 + cxy / sqrt(cxx * cyy)), 6) AS spearman_brown,
           cxy > 0 AND 9 * cxy * cxy > 4 * cxx * cyy AS reliable
    FROM c
    """,
    tags=("agg", "stats"),
)
def agg_spearman_brown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman-Brown prophecy (Spearman 1910; Brown 1910) on the
    split-half customer-value measure (the customers_krippendorff
    frame: first and second half-histories as the two test halves):
    the full-length reliability predicted from the split-half
    Pearson r is SB = 2r/(1+r) — the formula every test-construction
    pipeline steps up by. r comes from EXACT integer cents moments
    via the n-scaled centered sums (one double cast per centered
    moment, fixed textual order — the ts_breusch_pagan covariance
    device). The verdict SB > 0.8 algebraically REDUCES to r > 2/3
    (2r/(1+r) is monotone), which squares with a sign guard into
    C_xy > 0 AND 9·C_xy² > 4·C_xx·C_yy — evaluated on the same
    fixed-order doubles (the exact-integer products would burst
    DECIMAL(38) around sf3; double-cast-per-side is the stated
    device). Completes the reliability triptych: Cronbach α (item
    consistency), Krippendorff α (absolute agreement — sensitive to
    level shifts this r ignores, a documented contrast), SB
    (split-half prophecy).

    Scale shape: one keyed reduce per (customer, half), one
    equi-join, a 1-row moment reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    both = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 2)
        .select("o_custkey")
    )
    a = spend.filter(F.col("half") == 1).select(
        "o_custkey", F.col("cents").alias("x")
    )
    b = spend.filter(F.col("half") == 2).select(
        "o_custkey", F.col("cents").alias("y")
    )
    w = a.join(b, "o_custkey").join(both, "o_custkey")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38("x") * F.col("x")).alias("sxx"),
        F.sum(d38("y") * F.col("y")).alias("syy"),
        F.sum(d38("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    c = m.select(
        "n",
        (n38 * F.col("sxy") - d38("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (n38 * F.col("sxx") - d38("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("syy") - d38("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
    )
    cxy, cxx, cyy = F.col("cxy"), F.col("cxx"), F.col("cyy")
    r = cxy / F.sqrt(cxx * cyy)
    return c.select(
        n.alias("n_customers"),
        F.round(r, 6).alias("split_half_r"),
        F.round(2 * r / (1 + r), 6).alias("spearman_brown"),
        ((cxy > 0) & (9 * cxy * cxy > 4 * cxx * cyy)).alias("reliable"),
    )


@register(
    "events_attributable_risk",
    """
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               count(*) FILTER (event_type = 'view') > 0 AS exposed,
               count(*) FILTER (event_type = 'purchase') > 0 AS bought
        FROM events GROUP BY 1, 2
    ),
    cells AS (
        SELECT CAST(count(*) FILTER (exposed AND bought) AS BIGINT) AS a,
               CAST(count(*) FILTER (exposed AND NOT bought) AS BIGINT)
                   AS b,
               CAST(count(*) FILTER (NOT exposed AND bought) AS BIGINT)
                   AS c,
               CAST(count(*) FILTER (NOT exposed AND NOT bought)
                    AS BIGINT) AS d
        FROM ud
    )
    SELECT a + b AS n_exposed, c + d AS n_unexposed,
           round(CAST(a AS DOUBLE) / (a + b), 6) AS risk_exposed,
           round(CAST(c AS DOUBLE) / (c + d), 6) AS risk_unexposed,
           round((CAST(a AS DOUBLE) / (a + b))
                 / (CAST(c AS DOUBLE) / (c + d)), 6) AS relative_risk,
           round((CAST(a + c AS DOUBLE) / (a + b + c + d)
                  - CAST(c AS DOUBLE) / (c + d))
                 / (CAST(a + c AS DOUBLE) / (a + b + c + d)), 6)
               AS par_fraction,
           CAST(a AS HUGEINT) * (c + d) > CAST(c AS HUGEINT) * (a + b)
               AS exposure_raises_risk
    FROM cells
    """,
    tags=("events", "stats"),
)
def events_attributable_risk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Levin's population attributable risk (1953) at the user-day
    unit: exposure = the user VIEWED something that day, outcome =
    the user PURCHASED that day; PAR = (P − P₀)/P is the share of
    all purchase-days that would disappear if exposed days carried
    only the unexposed risk — the standard epidemiological
    accounting, repurposed as funnel attribution. (User-LEVEL 2×2s
    are degenerate on this fixture — every user eventually views and
    buys — so the day grain is the stated unit choice that gives
    the contrast real variation.) The 2×2 cells are exact integers,
    every display is a single fixed-order expression of exact
    integers, and the headline verdict RR > 1 clears FULLY exactly
    to a·(c+d) > c·(a+b) (DECIMAL(38)/HUGEINT — no double in the
    decision; PAR > 0 ⇔ RR > 1, so one exact comparison covers
    both).

    Scale shape: one keyed reduce over the event stream to user-day
    flags (an ordinary shuffle key), a 1-row 4-cell reduce —
    map-side-combinable."""
    e = tbl(spark, sf_dir, "events")
    ud = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.count_if(F.col("event_type") == "view") > 0).alias("exposed"),
        (F.count_if(F.col("event_type") == "purchase") > 0).alias(
            "bought"
        ),
    )
    exposed = F.col("exposed")
    bought = F.col("bought")
    cells = ud.agg(
        F.count_if(exposed & bought).cast("long").alias("a"),
        F.count_if(exposed & ~bought).cast("long").alias("b"),
        F.count_if(~exposed & bought).cast("long").alias("c"),
        F.count_if(~exposed & ~bought).cast("long").alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    p_all = (a + c).cast("double") / (a + b + c + d)
    p0 = c.cast("double") / (c + d)
    return cells.select(
        (a + b).alias("n_exposed"),
        (c + d).alias("n_unexposed"),
        F.round(a.cast("double") / (a + b), 6).alias("risk_exposed"),
        F.round(p0, 6).alias("risk_unexposed"),
        F.round(
            (a.cast("double") / (a + b)) / (c.cast("double") / (c + d)), 6
        ).alias("relative_risk"),
        F.round((p_all - p0) / p_all, 6).alias("par_fraction"),
        (
            a.cast("decimal(38,0)") * (c + d)
            > c.cast("decimal(38,0)") * (a + b)
        ).alias("exposure_raises_risk"),
    )


@register(
    "agg_kish_design_effect",
    """
    WITH w AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS wt
        FROM orders GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(wt) AS BIGINT) AS sw,
               CAST(sum(CAST(wt AS HUGEINT) * wt) AS HUGEINT) AS sww
        FROM w
    )
    SELECT n AS n_customers, sw AS n_orders,
           round(CAST(n AS DOUBLE) * CAST(sww AS DOUBLE)
                 / (CAST(sw AS DOUBLE) * sw), 6) AS kish_deff,
           round(CAST(sw AS DOUBLE) * sw / CAST(sww AS DOUBLE), 2)
               AS effective_n,
           2 * CAST(n AS HUGEINT) * sww > 3 * CAST(sw AS HUGEINT) * sw
               AS weighting_costly
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_kish_design_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kish's design effect (1965) for order-count weighting of the
    customer base: deff = n·Σw²/(Σw)² and the effective sample size
    n_eff = (Σw)²/Σw² — if each customer is weighted by their order
    count (the natural weight when order-level metrics are averaged
    over customers), how much variance does the unequal weighting
    cost relative to self-weighting? THE number every survey and
    every weighted-eval pipeline reports before trusting a weighted
    mean. All three moments are EXACT integers from a two-level
    keyed reduce; deff and n_eff are single fixed-order expressions,
    and the verdict deff > 1.5 clears FULLY exactly to 2·n·Σw² >
    3·(Σw)² (DECIMAL(38)/HUGEINT — no double in the decision; deff
    = 1 ⇔ perfectly equal weights by Cauchy-Schwarz).

    Scale shape: one keyed reduce over orders (customer key), a
    1-row moment reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    w = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("wt")
    )
    m = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("wt").cast("long").alias("sw"),
        F.sum(F.col("wt").cast("decimal(38,0)") * F.col("wt")).alias(
            "sww"
        ),
    )
    n, sw, sww = F.col("n"), F.col("sw"), F.col("sww")
    return m.select(
        n.alias("n_customers"),
        sw.alias("n_orders"),
        F.round(
            n.cast("double") * sww.cast("double")
            / (sw.cast("double") * sw),
            6,
        ).alias("kish_deff"),
        F.round(sw.cast("double") * sw / sww.cast("double"), 2).alias(
            "effective_n"
        ),
        (
            2 * n.cast("decimal(38,0)") * sww
            > 3 * sw.cast("decimal(38,0)") * sw
        ).alias("weighting_costly"),
    )
