"""§2 extensions, seventy-third wave — ordered blocked trend, a
dispersion test, and two sequence-randomness tests (published-method
cadence).

- agg_page_trend: Page's L test (1963) — does daily revenue trend
  monotonically across the five ORDERED priorities, day after day?
  The ordered-alternative sibling of agg_friedman.
- agg_ansari_bradley: the Ansari-Bradley dispersion test (1960) —
  are URGENT order values more spread than LOW ones? Pure rank-score
  integers, parity-exact null moments.
- ts_cox_stuart: the Cox-Stuart trend test (1955) — first-half vs
  second-half paired signs of the daily revenue series, decided by
  the exact-integer sign-test device.
- ts_turning_points: the turning-points randomness test (Kendall) —
  does the daily series have too few/many local extrema to be i.i.d.?
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_PRIO_VALS = ", ".join(f"({i})" for i in range(1, 6))


@register(
    "agg_page_trend",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, p.g, CAST(coalesce(daily.cents, 0) AS BIGINT) AS cents
        FROM (SELECT DISTINCT day FROM daily) d
        CROSS JOIN (VALUES (1), (2), (3), (4), (5)) p(g)
        LEFT JOIN daily ON daily.day = d.day AND daily.g = p.g
    ),
    rk AS (
        SELECT day, g, cents,
               row_number() OVER (PARTITION BY day
                                  ORDER BY cents, g) AS r
        FROM grid
    ),
    mid AS (
        SELECT rk.day, rk.g, b.mn + b.mx AS d2
        FROM rk JOIN (
            SELECT day, cents, CAST(min(r) AS BIGINT) AS mn,
                   CAST(max(r) AS BIGINT) AS mx
            FROM rk GROUP BY day, cents
        ) b ON b.day = rk.day AND b.cents = rk.cents
    ),
    s AS (
        SELECT CAST(sum(g * d2) AS BIGINT) AS l2,
               CAST(count(*) // 5 AS BIGINT) AS n
        FROM mid
    )
    SELECT n AS n_blocks, l2, CAST(90 * n AS BIGINT) AS e2,
           round((l2 - 90.0 * n) / (10.0 * sqrt(CAST(n AS DOUBLE))), 4)
               AS z,
           l2 > 90 * n AS increasing
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for ordered alternatives (Page 1963): blocks =
    order dates, treatments = the five priorities in their natural
    1-URGENT … 5-LOW order, response = that day's revenue in that
    class (dense grid; a missing cell is an explicit zero). L weights
    each treatment's rank sum by its hypothesized position:
    L = Σ_j j·R_j — strictly more powerful than Friedman when the
    alternative is a monotone ordering. With DOUBLED midranks the
    statistic is exact: L2 = Σ j·d2 (int64); E[L2] = n·k(k+1)²/2 =
    90n at k = 5 (exact integer), and the trend VERDICT l2 > 90n is
    a pure integer compare. z uses Page's null variance
    n(k³−k)²/(144(k−1)) — at k = 5 exactly 25n, so z =
    (L2 − 90n)/(10√n) in one fixed textual expression, round-4.

    Scale shape: one keyed fact reduce to the (date × 5) grid; the
    rank window partitions by DAY (calendar-bounded high-cardinality
    axis); the SinglePartition is the 1-row L reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    grid = (
        daily.select("day")
        .distinct()
        .select(
            "day",
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("g"),
        )
        .join(daily, ["day", "g"], "left")
        .select(
            "day",
            "g",
            F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("day").orderBy("cents", "g")
    rk = grid.withColumn("r", F.row_number().over(w))
    blocks = rk.groupBy("day", "cents").agg(
        F.min("r").cast("long").alias("mn"),
        F.max("r").cast("long").alias("mx"),
    )
    mid = rk.join(blocks, ["day", "cents"]).select(
        "day", "g", (F.col("mn") + F.col("mx")).alias("d2")
    )
    s = mid.agg(
        F.sum(F.col("g") * F.col("d2")).cast("long").alias("l2"),
        (F.count(F.lit(1)) / 5).cast("long").alias("n"),
    )
    return s.select(
        F.col("n").alias("n_blocks"),
        "l2",
        (90 * F.col("n")).cast("long").alias("e2"),
        F.round(
            (F.col("l2") - 90.0 * F.col("n"))
            / (10.0 * F.sqrt(F.col("n").cast("double"))),
            4,
        ).alias("z"),
        (F.col("l2") > 90 * F.col("n")).alias("increasing"),
    )


@register(
    "agg_ansari_bradley",
    """
    WITH x AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               o_orderkey
        FROM orders WHERE substr(o_orderpriority, 1, 1) IN ('1', '5')
    ),
    o AS (
        SELECT cents, g,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rk,
               count(*) OVER () AS nn
        FROM x
    ),
    byval AS (
        SELECT cents, CAST(min(rk) AS BIGINT) AS mn,
               CAST(max(rk) AS BIGINT) AS mx
        FROM o GROUP BY cents
    ),
    scored AS (
        SELECT o.g, o.nn,
               least(v.mn + v.mx, 2 * (o.nn + 1) - (v.mn + v.mx)) AS a2
        FROM o JOIN byval v USING (cents)
    ),
    s AS (
        SELECT CAST(sum(a2) FILTER (g = 1) AS BIGINT) AS a2,
               CAST(count(*) FILTER (g = 1) AS BIGINT) AS n1,
               CAST(count(*) FILTER (g = 5) AS BIGINT) AS n2,
               CAST(max(nn) AS BIGINT) AS nn
        FROM scored
    )
    SELECT n1, n2, a2,
           round(CASE WHEN nn % 2 = 0 THEN
               (a2 - n1 * (nn + 2) / 2.0)
               / (2 * sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2)
                           / (48.0 * (nn - 1))))
           ELSE
               (a2 - n1 * CAST((nn + 1) AS DOUBLE) * (nn + 1) / (2.0 * nn))
               / (2 * sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1)
                           * (3 + nn * nn) / (48.0 * nn * nn)))
           END, 4) AS z,
           CASE WHEN nn % 2 = 0 THEN 2 * a2 < n1 * (nn + 2)
                ELSE 2 * nn * a2 < n1 * (nn + 1) * (nn + 1)
           END AS urgent_more_dispersed
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley dispersion test (Ansari & Bradley 1960): do
    URGENT (1) and LOW (5) order values differ in SPREAD around a
    common center? Each pooled observation scores min(rank, N+1−rank)
    — extremes score low — and A = Σ scores over group 1; a small A
    means group 1 owns the tails. With DOUBLED midranks (mn+mx of the
    tie block) the score a2 = min(m2, 2(N+1)−m2) and the statistic A2
    are exact int64s. The null moments branch on the parity of N
    (Ansari-Bradley's exact forms): N even → E[A] = n1(N+2)/4,
    Var = n1n2(N+2)(N−2)/(48(N−1)); N odd → E[A] = n1(N+1)²/(4N),
    Var = n1n2(N+1)(3+N²)/(48N²). Both the z CASE and the dispersion
    VERDICT (2·A2 < n1(N+2) even / 2N·A2 < n1(N+1)² odd) evaluate as
    fixed textual expressions; the verdict is a pure integer compare.

    Scale shape: one block-ranked pass over the filtered two-group
    subset (the api core — rank windows partition by block), a
    per-distinct-value tie reduce, one 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        "o_orderkey",
    ).filter(F.col("g").isin(1, 5))
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    nn = ranked.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    byval = ranked.groupBy("cents").agg(
        F.min("rk").cast("long").alias("mn"),
        F.max("rk").cast("long").alias("mx"),
    )
    m2 = F.col("mn") + F.col("mx")
    scored = (
        ranked.join(F.broadcast(byval), "cents")
        .crossJoin(F.broadcast(nn))
        .select(
            "g",
            "nn",
            F.least(m2, 2 * (F.col("nn") + 1) - m2).alias("a2"),
        )
    )
    s = scored.agg(
        F.sum(F.when(F.col("g") == 1, F.col("a2")))
        .cast("long")
        .alias("a2"),
        F.count_if(F.col("g") == 1).cast("long").alias("n1"),
        F.count_if(F.col("g") == 5).cast("long").alias("n2"),
        F.max("nn").cast("long").alias("nn"),
    )
    n1, n2, a2, N = F.col("n1"), F.col("n2"), F.col("a2"), F.col("nn")
    z_even = (a2 - n1 * (N + 2) / F.lit(2.0)) / (
        2
        * F.sqrt(
            n1.cast("double")
            * n2
            * (N + 2)
            * (N - 2)
            / (48.0 * (N - 1))
        )
    )
    z_odd = (
        a2 - n1 * (N + 1).cast("double") * (N + 1) / (2.0 * N)
    ) / (
        2
        * F.sqrt(
            n1.cast("double")
            * n2
            * (N + 1)
            * (3 + N * N)
            / (48.0 * N * N)
        )
    )
    return s.select(
        "n1",
        "n2",
        "a2",
        F.round(
            F.when(N % 2 == 0, z_even).otherwise(z_odd), 4
        ).alias("z"),
        F.when(N % 2 == 0, 2 * a2 < n1 * (N + 2))
        .otherwise(2 * N * a2 < n1 * (N + 1) * (N + 1))
        .alias("urgent_more_dispersed"),
    )


@register(
    "ts_cox_stuart",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT cents,
               row_number() OVER (ORDER BY day) AS i,
               count(*) OVER () AS n
        FROM daily
    ),
    paired AS (
        SELECT a.cents AS va, b.cents AS vb
        FROM idx a JOIN idx b
          ON b.i = a.i + (a.n + 1) // 2
        WHERE a.i <= a.n - (a.n + 1) // 2
    ),
    s AS (
        SELECT CAST(count(*) FILTER (vb > va) AS BIGINT) AS plus,
               CAST(count(*) FILTER (vb <> va) AS BIGINT) AS n_eff
        FROM paired
    )
    SELECT plus, n_eff,
           round((2.0 * plus - n_eff) / sqrt(CAST(n_eff AS DOUBLE)), 4)
               AS z,
           625 * (2 * plus - n_eff) * (2 * plus - n_eff) > 2401 * n_eff
               AS significant
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test (Cox & Stuart 1955): pair day i of the
    daily-revenue series with day i+⌈n/2⌉ (the middle observation
    drops out when n is odd) and sign-test the pairs — a monotone
    trend makes the later half systematically exceed the earlier
    half. S = #{later > earlier} over the non-tied pairs; the
    two-sided 5% verdict reuses the exact-integer sign-test device:
    1.96 = 49/25 exactly, so |z| > 1.96 ⇔ 625(2S−n)² > 2401n — no
    float ever decides. z itself is displayed round-4.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series; the index window and the half-offset self-join run over
    that bounded axis only (the allowlisted bounded-window shape)."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w_i = Window.orderBy("day")
    w_n = Window.partitionBy()
    idx = daily.select(
        "cents",
        F.row_number().over(w_i).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    a = idx.select(
        F.col("cents").alias("va"),
        F.col("i").alias("ia"),
        F.col("n").alias("na"),
        (F.col("i") + F.floor((F.col("n") + 1) / 2)).alias("target"),
    ).filter(
        F.col("ia") <= F.col("na") - F.floor((F.col("na") + 1) / 2)
    )
    b = idx.select(F.col("cents").alias("vb"), F.col("i").alias("ib"))
    s = (
        a.join(b, F.col("target") == F.col("ib"))
        .agg(
            F.count_if(F.col("vb") > F.col("va"))
            .cast("long")
            .alias("plus"),
            F.count_if(F.col("vb") != F.col("va"))
            .cast("long")
            .alias("n_eff"),
        )
    )
    dev = 2 * F.col("plus") - F.col("n_eff")
    return s.select(
        "plus",
        "n_eff",
        F.round(
            (2.0 * F.col("plus") - F.col("n_eff"))
            / F.sqrt(F.col("n_eff").cast("double")),
            4,
        ).alias("z"),
        (625 * dev * dev > 2401 * F.col("n_eff")).alias("significant"),
    )


@register(
    "ts_turning_points",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT cents,
               lag(cents) OVER (ORDER BY day) AS prev,
               lead(cents) OVER (ORDER BY day) AS nxt,
               count(*) OVER () AS n
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) FILTER (
                   (cents > prev AND cents > nxt)
                   OR (cents < prev AND cents < nxt)) AS BIGINT) AS t,
               CAST(max(n) AS BIGINT) AS n
        FROM lagged WHERE prev IS NOT NULL AND nxt IS NOT NULL
    )
    SELECT n AS n_days, t AS turning_points,
           round((t - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90), 4) AS z,
           6250 * (3 * t - 2 * n + 4) * (3 * t - 2 * n + 4)
               > 2401 * (16 * n - 29) AS nonrandom
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test (Kendall's classical sequence
    diagnostic): count interior days that are a strict local maximum
    or minimum of the daily-revenue series. Under i.i.d. observations
    E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90 — too few turns means
    trend, too many means negative serial correlation. T and n are
    exact integers; z is one fixed textual expression (round-4), and
    the two-sided 5% verdict is the pure-integer cross-product
    6250·(3T−2n+4)² > 2401·(16n−29), derived from z² > (49/25)² with
    the 3 and 90 denominators cleared — no float ever decides.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series; the lag/lead windows run over that bounded axis (the
    allowlisted bounded-window shape)."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    w_n = Window.partitionBy()
    lagged = daily.select(
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    turn = (
        (F.col("cents") > F.col("prev")) & (F.col("cents") > F.col("nxt"))
    ) | ((F.col("cents") < F.col("prev")) & (F.col("cents") < F.col("nxt")))
    s = lagged.agg(
        F.count_if(turn).cast("long").alias("t"),
        F.max("n").cast("long").alias("n"),
    )
    dev = 3 * F.col("t") - 2 * F.col("n") + 4
    return s.select(
        F.col("n").alias("n_days"),
        F.col("t").alias("turning_points"),
        F.round(
            (F.col("t") - 2.0 * (F.col("n") - 2) / 3)
            / F.sqrt((16.0 * F.col("n") - 29) / 90),
            4,
        ).alias("z"),
        (6250 * dev * dev > 2401 * (16 * F.col("n") - 29)).alias(
            "nonrandom"
        ),
    )
