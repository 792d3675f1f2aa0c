"""§2 extensions, nineteenth wave — engagement ratios, period-over-
period deltas, and the wide delivery extract.

- events_wau_stickiness: rolling 7-day active users per day + the
  DAU/WAU stickiness ratio — the engagement KPI pair. Same exact
  recipe as events_sliding_uniques: the (day,user) grid is expanded
  to the 7 covering window days (explode→equi-join; no range join).
- ts_pct_change_daily: day-over-day percent change of daily revenue
  per event type. Daily totals go through exact DECIMAL sums
  (order-free), the ratio is per-row IEEE arithmetic on identical
  doubles, and the output surface is floor-quantized.
- delivery_wide_extract: THE genre deliverable — one wide
  denormalized row per order (customer, nation, region names inlined,
  lineitem rolled up) ready to getmerge/ship. Dims broadcast; the
  only shuffles are the lineitem rollup and the orders⋈agg equi-join
  on o_orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_wau_stickiness",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    contrib AS (
        SELECT u.user_id, u.day + CAST(x.o AS INTEGER) AS d
        FROM du u CROSS JOIN (
            SELECT unnest(range(0, 7)) AS o) x
    ),
    wau AS (
        SELECT c.d AS day, count(DISTINCT c.user_id) AS wau
        FROM contrib c JOIN days dd ON c.d = dd.day
        GROUP BY c.d
    ),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY day)
    SELECT strftime(w.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           floor(CAST(d.dau AS DOUBLE) / w.wau * 10000) / 10000
               AS stickiness
    FROM wau w JOIN dau d ON w.day = d.day
    ORDER BY day
    """,
    tags=("analytics", "events"),
)
def events_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement KPIs: daily actives (DAU), trailing-7-day actives
    (WAU) and the DAU/WAU stickiness ratio per day. COUNT(DISTINCT)
    does not slide, so each (day,user) grid row is EXPANDED to the 7
    window days it covers and equi-joined to the day list — one
    keyed shuffle whose volume is 7×|grid|, never a nested-loop
    range join. The ratio divides two identical BIGINTs per row
    (IEEE-identical) and floor-quantizes the display surface. The
    oracle's CROSS JOIN is a 7-row literal offset table — constant,
    not data-sized."""
    e = tbl(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct().cache()
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    contrib = du.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda o: F.date_add(F.col("day"), o),
            )
        ).alias("d"),
    )
    wau = (
        contrib.join(F.broadcast(days), "d")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        wau.join(dau, wau.d == dau.day)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (
                F.floor(
                    F.col("dau").cast("double") / F.col("wau") * 10000
                )
                / 10000
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "ts_pct_change_daily",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, rev_cents,
           floor(CASE WHEN prev_cents > 0 THEN
                   (CAST(rev_cents AS DOUBLE) - prev_cents) / prev_cents
                   * 10000 END) / 10000 AS pct_change
    FROM (
        SELECT *, lag(rev_cents) OVER (PARTITION BY event_type
                                       ORDER BY day) AS prev_cents
        FROM daily
    ) ORDER BY event_type, day
    """,
    tags=("analytics", "timeseries"),
)
def ts_pct_change_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period delta: day-over-day percent change of daily
    revenue per event type. Daily totals are exact integer cent sums
    (floor-then-BIGINT, order-free), the lag rides the existing
    (event_type, day) grid, and the ratio is per-row IEEE arithmetic
    on identical integers — floor-quantized for display. One keyed
    aggregate + one partitioned window; the grid's cardinality
    (types × days) bounds everything after the first shuffle."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    daily = (
        e.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "rev_cents",
            (
                F.floor(
                    F.when(
                        F.col("prev_cents") > 0,
                        (
                            F.col("rev_cents").cast("double")
                            - F.col("prev_cents")
                        )
                        / F.col("prev_cents")
                        * 10000,
                    )
                )
                / 10000
            ).alias("pct_change"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "delivery_wide_extract",
    """
    WITH li AS (
        SELECT l_orderkey, count(*) AS n_items,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS total_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) AS REAL) AS gross_value
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
           c.c_name, c.c_mktsegment, n.n_name AS nation, r.r_name AS region,
           li.n_items, li.total_qty, li.gross_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN li ON li.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey <= 5000
    ORDER BY o.o_orderkey
    """,
    tags=("delivery", "join"),
)
def delivery_wide_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE genre deliverable: one wide denormalized row per order —
    customer / nation / region names inlined, lineitems rolled up to
    (count, qty, exact-DECIMAL gross) — the flat extract a consumer
    getmerges and loads into a warehouse. Plan shape: lineitem
    pre-aggregates BEFORE joining (shuffles |orders| group rows, not
    |lineitem| rows), all three dimensions broadcast, so the only
    exchanges are the rollup and the orders⋈rollup equi-join on
    o_orderkey. Money totals ride exact DECIMAL sums; quantities are
    floored BIGINTs — no float summation anywhere."""
    o = tbl(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 5000)
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    li = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("total_qty"),
            F.sum(dec2("l_extendedprice"))
            .cast("double")
            .cast("float")
            .alias("gross_value"),
        )
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias(
                "order_day"
            ),
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "n_items",
            "total_qty",
            "gross_value",
        )
        .orderBy("o_orderkey")
    )
