"""§2 extensions, hundred-thirty-first wave — modern dependence and
cyclic phase.

- agg_chatterjee_xi: Chatterjee's ξ rank correlation (JASA 2021) —
  the modern dependence coefficient that detects ARBITRARY
  functional relationships (0 = independent, →1 = y is a measurable
  function of x), where Pearson/Spearman only see monotone trends;
  tie-robust form, exact integer ranks throughout.
- ts_weekly_phase: single-frequency Fourier phase comparison of the
  click and purchase weekly cycles — amplitude, phase, and the lead
  in days; the two-series complement of ts_schuster_weekly's
  one-series significance test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_chatterjee_xi",
    """
    WITH v AS (
        SELECT l_orderkey * 8 + l_linenumber AS k,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
        FROM lineitem
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    yg AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
    ycdf AS (
        SELECT y, c, CAST(sum(c) OVER (ORDER BY y
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_le
        FROM yg
    ),
    rr AS (
        SELECT v.k, v.x, yc.cum_le AS r,
               n.n - (yc.cum_le - yc.c) AS l
        FROM v JOIN ycdf yc ON v.y = yc.y CROSS JOIN n
    ),
    seq AS (
        SELECT k, r, l,
               row_number() OVER (ORDER BY x, k, r) AS s
        FROM rr
    ),
    num AS (
        SELECT CAST(sum(CAST(abs(b.r - a.r) AS HUGEINT)) AS DOUBLE)
            AS sum_abs_dr
        FROM seq a JOIN seq b ON b.s = a.s + 1
    ),
    den AS (
        SELECT CAST(sum(CAST(l AS HUGEINT) * (n.n - l)) AS DOUBLE) AS d
        FROM rr, n GROUP BY n.n
    )
    SELECT n.n AS n_rows,
           round(num.sum_abs_dr / n.n, 4) AS mean_abs_rank_step,
           round(1.0 - n.n * num.sum_abs_dr / (2.0 * den.d), 6)
               AS xi_qty_to_price
    FROM n, num, den
    """,
    tags=("aggregate", "stats"),
)
def agg_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ coefficient (JASA 2021) of extended price on
    quantity: sort rows by X (quantity; ties broken by the pinned
    key 8·orderkey + linenumber, then by the y-rank — the paper
    randomizes, determinism is pinned instead), take the
    y-ranks r_i = #{y_j ≤ y_i}, and
    ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) with
    l_i = #{y_j ≥ y_i} — the tie-robust form. Residual (x, key)
    ties (the fixture's line numbers are non-unique) are ordered by
    r itself, so tied rows carry equal consecutive steps and the
    sum is order-invariant — determinism without randomization. Detects ANY
    functional dependence, not just monotone: extendedprice =
    quantity × unit-price is strongly but not monotonically
    determined, exactly the case Pearson underreports. Every rank
    is an exact integer (y-grid inclusive cumsum; block-ranked
    x-order with rank r ↔ r+1 equi-join for the consecutive steps);
    HUGEINT/DECIMAL accumulation, two float divisions at the end.

    Scale shape: one y-grid CDF, one broadcast n, one block-ranked
    x-rank + rank equi-join, two reduces. O(n log n)-ish, no
    pairwise join."""
    from hadoop_deliver_spark.api import (
        exact_global_keyed_cumsum,
        exact_global_rank,
    )

    li = tbl(spark, sf_dir, "lineitem")
    v = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
        F.col("l_quantity").cast("long").alias("x"),
        (dec2("l_extendedprice") * 100).cast("long").alias("y"),
    )
    n = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    yg = v.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ycdf = exact_global_keyed_cumsum(yg, "y", "c", "y", "cum_le")
    rr = (
        v.join(ycdf, "y")
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            "x",
            F.col("cum_le").alias("r"),
            (F.col("n") - (F.col("cum_le") - F.col("c"))).alias("l"),
            "n",
        )
    )
    # The fixture's (orderkey, linenumber) is NOT unique, so the pinned
    # total order is (x, k, r): remaining ties share the SAME y-rank r,
    # making Σ|Δr| invariant under their internal order — the helper's
    # uniqueness contract relaxes safely. x is 1..50 and
    # k < 8·max_orderkey < 2^43 at any SF, so x·2^43 + k fits int64
    # and orders exactly as (x, k); r is the block-rank tiebreak.
    seq = exact_global_rank(
        rr.withColumn("xk", F.col("x") * F.lit(2**43) + F.col("k")),
        "xk",
        "r",
        "s",
    )
    nxt = seq.select((F.col("s") - 1).alias("s"), F.col("r").alias("r2"))
    num = (
        seq.join(nxt, "s")
        .agg(
            F.sum(F.abs(F.col("r2") - F.col("r")).cast("decimal(38,0)"))
            .cast("double")
            .alias("sum_abs_dr")
        )
    )
    den = rr.agg(
        F.sum(F.col("l").cast("decimal(38,0)") * (F.col("n") - F.col("l")))
        .cast("double")
        .alias("d")
    )
    return (
        n.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").alias("n_rows"),
            F.round(F.col("sum_abs_dr") / F.col("n"), 4).alias(
                "mean_abs_rank_step"
            ),
            F.round(
                1.0
                - F.col("n") * F.col("sum_abs_dr") / (2.0 * F.col("d")),
                6,
            ).alias("xi_qty_to_price"),
        )
    )


@register(
    "ts_weekly_phase",
    """
    WITH dx AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS xc
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    dy AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS yc
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    jd AS (
        SELECT datediff('day', DATE '1990-01-01', dx.day) AS t,
               CAST(dx.xc AS DOUBLE) / 100 AS x,
               CAST(dy.yc AS DOUBLE) / 100 AS y
        FROM dx JOIN dy ON dx.day = dy.day
    ),
    four AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               sum(x * cos(2 * pi() * t / 7)) AS cx,
               sum(x * sin(2 * pi() * t / 7)) AS sx,
               sum(y * cos(2 * pi() * t / 7)) AS cy,
               sum(y * sin(2 * pi() * t / 7)) AS sy
        FROM jd
    )
    SELECT m AS n_days,
           round(2 * sqrt(cx * cx + sx * sx) / m, 2) AS amp_click,
           round(2 * sqrt(cy * cy + sy * sy) / m, 2) AS amp_purchase,
           round(atan2(sx, cx), 4) AS phase_click,
           round(atan2(sy, cy), 4) AS phase_purchase,
           round(atan2(sin(atan2(sy, cy) - atan2(sx, cx)),
                       cos(atan2(sy, cy) - atan2(sx, cx)))
                 * 7 / (2 * pi()), 4) AS purchase_lead_days,
           round(sqrt(cy * cy + sy * sy) / sqrt(cx * cx + sx * sx), 4)
               AS amp_ratio
    FROM four
    """,
    tags=("timeseries", "stats"),
)
def ts_weekly_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cycle phase comparison of the click and purchase daily
    series: the single-frequency Fourier coefficients at f = 1/7
    (C = Σy·cos(2πt/7), S = Σy·sin(2πt/7) over the common calendar
    days — plain reduces, NO window), giving each series' weekly
    amplitude (2√(C²+S²)/m, in dollars), its phase, and the
    purchase-vs-click lead in DAYS — the phase difference wrapped to
    (−π, π] via atan2(sin Δ, cos Δ) and scaled by 7/2π. Answers
    'does the purchase weekly cycle lag the click cycle, and by how
    long' — the cross-series question ts_schuster_weekly (one-series
    significance) and ts_cross_correlation (integer-day lags only)
    each half-answer. trig is shared-ulp libm; round-4 absorbs.

    Scale shape: two daily reduces, one day equi-join, one 5-sum
    reduce, closed-form scalars."""
    import math

    e = tbl(spark, sf_dir, "events")

    def daily(et: str, col: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum((dec2("value") * 100).cast("long"))
                .cast("long")
                .alias(col)
            )
        )

    jd = (
        daily("click", "xc")
        .join(daily("purchase", "yc"), "day")
        .select(
            F.datediff("day", F.lit("1990-01-01")).alias("t"),
            (F.col("xc").cast("double") / 100).alias("x"),
            (F.col("yc").cast("double") / 100).alias("y"),
        )
    )
    w = 2 * math.pi * F.col("t") / 7
    four = jd.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("x") * F.cos(w)).alias("cx"),
        F.sum(F.col("x") * F.sin(w)).alias("sx"),
        F.sum(F.col("y") * F.cos(w)).alias("cy"),
        F.sum(F.col("y") * F.sin(w)).alias("sy"),
    )
    ph_x = F.atan2(F.col("sx"), F.col("cx"))
    ph_y = F.atan2(F.col("sy"), F.col("cy"))
    d = ph_y - ph_x
    return four.select(
        F.col("m").alias("n_days"),
        F.round(
            2 * F.sqrt(F.col("cx") * F.col("cx") + F.col("sx") * F.col("sx"))
            / F.col("m"),
            2,
        ).alias("amp_click"),
        F.round(
            2 * F.sqrt(F.col("cy") * F.col("cy") + F.col("sy") * F.col("sy"))
            / F.col("m"),
            2,
        ).alias("amp_purchase"),
        F.round(ph_x, 4).alias("phase_click"),
        F.round(ph_y, 4).alias("phase_purchase"),
        F.round(
            F.atan2(F.sin(d), F.cos(d)) * 7 / (2 * math.pi), 4
        ).alias("purchase_lead_days"),
        F.round(
            F.sqrt(F.col("cy") * F.col("cy") + F.col("sy") * F.col("sy"))
            / F.sqrt(F.col("cx") * F.col("cx") + F.col("sx") * F.col("sx")),
            4,
        ).alias("amp_ratio"),
    )
