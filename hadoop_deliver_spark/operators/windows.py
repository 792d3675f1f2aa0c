"""§2.E — Window functions.

All windows are `Window.partitionBy(...).orderBy(...)` with explicit
frames. Scale notes: a window shuffles once on its partition key and
sorts within partitions — state per group is O(frame), never O(n),
so every query here survives a 100× scale-up as long as the partition
key (custkey / user_id) is not pathologically skewed; AQE skew-split
does not apply inside window exchanges, so a truly hot key would need
pre-salting + two-phase reassembly (not needed for these fixtures).

Determinism: every orderBy carries a unique trailing key (orderkey /
event_id) so rank assignment, frame contents, and therefore the value
hash are identical across engines; computed double outputs follow the
engine float32 policy (see operators.projections docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "win_row_number_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (the dedup-rank pattern): one shuffle
    on custkey, per-partition sort, filter rn<=3 — no global sort and
    no per-group collect."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "win_rank_dense",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(rank() OVER (PARTITION BY l_returnflag
                             ORDER BY l_quantity DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity DESC) AS BIGINT) AS drnk
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank with real ties (integer-valued quantities
    repeat heavily) — tie groups share a rank, so no tiebreaker is
    needed for determinism."""
    li = tbl(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "win_ntile_pctile",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(percent_rank() OVER w AS REAL) AS pct_rank,
           CAST(cume_dist() OVER w AS REAL) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def win_ntile_pctile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + percent_rank + cume_dist per order status (unique
    (price, orderkey) ordering keeps ntile bucket edges identical
    across engines)."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).cast("float").alias("pct_rank"),
        F.cume_dist().over(w).cast("float").alias("cume"),
    ).orderBy("o_orderkey")


@register(
    "win_lag_lead",
    """
    SELECT event_id, user_id,
           CAST(value - lag(value) OVER w AS REAL) AS delta_prev,
           CAST(lead(value) OVER w AS REAL) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas via lag/lead over the (ts, event_id)
    timeline."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).cast("float").alias("delta_prev"),
        F.lead("value").over(w).cast("float").alias("next_value"),
    ).orderBy("event_id")


@register(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS REAL) AS running_spend
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer in order-date order (rows frame,
    unbounded preceding → current)."""
    o = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").cast("float")
        .alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "win_moving_avg",
    """
    SELECT event_id,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
                / count(value) OVER w7 AS REAL) AS mov_avg7
    FROM events
    WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of event value per user."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        (F.sum(dec2("value")).over(w).cast("double") / F.count("value").over(w))
        .cast("float")
        .alias("mov_avg7"),
    ).orderBy("event_id")


@register(
    "win_range_frame",
    """
    SELECT event_id,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS REAL) AS day_window_value,
           CAST(count(*) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS day_window_n
    FROM events ORDER BY event_id
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame by value offset: trailing-24h sum per user, ordered
    by epoch seconds. Range frames are value-based, so rows with equal
    order keys share a frame — no tiebreaker needed (or allowed).
    Engine gotcha encoded in the oracle: Spark's timestamp→long cast
    TRUNCATES to seconds while DuckDB's double→BIGINT cast ROUNDS, so
    the oracle wraps epoch() in floor() — without it, rows within
    0.5 s of a frame edge land in different 86400-second windows
    (2 rows flipped at sf0.1)."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(dec2("value")).over(w).cast("double").cast("float")
        .alias("day_window_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("day_window_n"),
    ).orderBy("event_id")


@register(
    "win_nth_first_last",
    """
    SELECT o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 3) OVER w AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
)
def win_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the whole partition (explicit
    unbounded-both frame: the SQL default frame for last_value stops
    at CURRENT ROW, which is almost never what anyone means). Raw
    value selections — exact float64 passthrough."""
    o = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    ).orderBy("o_orderkey")
