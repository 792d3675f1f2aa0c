"""§2.D — Aggregations.

All aggregation here is expressed declaratively so Catalyst plans
HashAggregateExec partial→final pairs (map-side combine before the
shuffle). At 100 TB the partial aggregate is what keeps shuffle volume
proportional to |groups|, not |rows| — nothing in this module ever
materializes rows on the driver.

Float policy: every *computed* double aggregate is cast to float32
(`FLOAT`/`REAL`) on both the Spark and DuckDB side; raw value
selections (min/max/min_by/...) pass through as float64. Money
SUMS/AVGS additionally go through `tables.dec2` (DECIMAL(18,2))
before summing: float32 only *probabilistically* absorbs the
summation-order ulp drift between engines (measured 2-in-15,000
groups landing on a float32 rounding boundary at sf0.1), while a
decimal sum is associative-exact — identical under any partitioning,
on any engine, at any scale. Quantity-like columns are integer-valued
doubles whose sums are already exact below 2^53.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, joined_str, tbl

_R = 4  # float rounding decimals, mirrored in every oracle


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the `entry()` flagship.

    scan → filter(shipdate) → hash-agg (5 aggregates) → sort. The
    filter and the 2-column-of-11 projection reach the parquet scan
    (PushedFilters/ReadSchema); the agg is partial→final so the
    shuffle carries ≤ |A,N,R|×|F,O| = 6 groups per partition.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("float").alias("sum_qty"),
            F.sum(dec2("l_extendedprice"))
            .cast("double")
            .cast("float")
            .alias("sum_base_price"),
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))
            )
            .cast("double")
            .cast("float")
            .alias("sum_disc_price"),
            F.avg("l_quantity").cast("float").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS REAL) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS REAL) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS REAL) AS sum_disc_price,
       CAST(avg(l_quantity) AS REAL) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register("agg_groupby_basic", FLAGSHIP_ORACLE)(flagship)


@register(
    "agg_global",
    f"""
    SELECT CAST(sum(l_quantity) AS REAL) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / count(l_extendedprice) AS REAL) AS avg_price,
           min(l_discount) AS min_disc,
           max(l_tax) AS max_tax,
           count(*) AS n_rows,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-group aggregate over the fact table (single reduce to 1 row)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum("l_quantity").cast("float").alias("sum_qty"),
        (F.sum(dec2("l_extendedprice")).cast("double") / F.count("l_extendedprice"))
        .cast("float")
        .alias("avg_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_tax").alias("max_tax"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS distinct_users,
           count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expands to a two-phase agg)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("agg_approx_count_distinct", None)  # rows-only: HLL++ sketch is Spark-specific
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path for cardinality.

    No oracle: DuckDB's approx sketch differs by design. The query
    also emits the exact count so the rows-only check still guards
    the pipeline (and a human can eyeball the rsd).
    """
    ev = tbl(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )


@register(
    "agg_stats",
    f"""
    SELECT l_returnflag,
           CAST(stddev_samp(l_extendedprice) AS REAL) AS sd_price,
           CAST(var_samp(l_extendedprice) AS REAL) AS var_price,
           CAST(corr(l_extendedprice, l_discount) AS REAL) AS corr_price_disc,
           CAST(covar_samp(l_extendedprice, l_discount) AS REAL) AS covar_price_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass moment computation)."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_extendedprice").cast("float").alias("sd_price"),
            F.var_samp("l_extendedprice").cast("float").alias("var_price"),
            F.corr("l_extendedprice", "l_discount").cast("float").alias(
                "corr_price_disc"
            ),
            F.covar_samp("l_extendedprice", "l_discount").cast("float").alias(
                "covar_price_disc"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentile",
    f"""
    SELECT o_orderstatus,
           CAST(median(o_totalprice) AS REAL) AS med_price,
           CAST(quantile_cont(o_totalprice, 0.25) AS REAL) AS p25_price,
           CAST(quantile_cont(o_totalprice, 0.90) AS REAL) AS p90_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + interpolated percentiles per group.

    Uses Spark's exact `percentile` (sort-based) so it hash-matches
    DuckDB's quantile_cont; `percentile_approx` (the t-digest scale
    path for 100 TB) is exercised rows-only in fn_misc company.
    """
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.median("o_totalprice").cast("float").alias("med_price"),
            F.percentile("o_totalprice", 0.25).cast("float").alias("p25_price"),
            F.percentile("o_totalprice", 0.90).cast("float").alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_collect",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT n_regionkey + n_nationkey)),
                           ',') AS key_set
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group array collection (ObjectHashAggregate), sorted for
    determinism. The arrays are surfaced as comma-joined strings so
    the driver's value hasher (which cannot canonicalize raw arrays)
    can verify them; the collect_list/collect_set aggregation itself
    is unchanged."""
    n = tbl(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            joined_str(F.array_sort(F.collect_list("n_name"))).alias("nations"),
            joined_str(
                F.array_sort(
                    F.collect_set(
                        (F.col("n_regionkey") + F.col("n_nationkey")).cast("long")
                    )
                )
            ).alias("key_set"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_first_last",
    f"""
    SELECT o_custkey,
           min_by(o_totalprice, o_orderkey) AS first_price,
           max_by(o_totalprice, o_orderkey) AS last_price,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last value per group under an explicit unique ordering
    (min_by/max_by on the unique orderkey — deterministic, unlike bare
    first()/last() whose result depends on partition arrival order)."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "agg_mode",
    """
    WITH counted AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ), ranked AS (
        SELECT c_nationkey, c_mktsegment, n,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY n DESC, c_mktsegment) AS rn
        FROM counted
    )
    SELECT c_nationkey, c_mktsegment AS mode_segment, n AS mode_count
    FROM ranked WHERE rn = 1 ORDER BY c_nationkey
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group, with a deterministic tie-break
    (count desc, value asc) — bare `mode()` is tie-arbitrary in both
    engines, so the engine computes it relationally: count → rank → 1.
    Scales as two hash aggs + one small shuffle (no row explosion)."""
    c = tbl(spark, sf_dir, "customer")
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "agg_rollup",
    f"""
    SELECT r_name, n_name,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS REAL)
               AS total_bal,
           count(*) AS n_cust,
           grouping(r_name) * 2 + grouping(n_name) AS gid
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY gid, r_name, n_name
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal hierarchy region → nation → grand total (expands to a
    3-grouping-set expand+agg; one shuffle regardless of set count)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(dec2("c_acctbal")).cast("double").cast("float").alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


@register(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS REAL) AS sum_qty,
           grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations over (returnflag, linestatus)."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("float").alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@register(
    "agg_grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(o_totalprice) AS REAL) AS total,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets: by-status and by-priority in one pass."""
    o = tbl(spark, sf_dir, "orders")
    o.createOrReplaceTempView("hds_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(sum(o_totalprice) AS FLOAT) AS total,
               count(*) AS n
        FROM hds_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@register(
    "agg_pivot",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type values into count columns. Values are listed
    explicitly — at 100 TB an unlisted pivot needs an extra distinct
    pass over the data just to discover the columns."""
    ev = tbl(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)  # absent combos: null in pivot, 0 in oracle
        .orderBy("user_id")
    )


@register(
    "dedup_exact",
    """
    WITH ranked AS (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
    FROM ranked WHERE rn = 1 ORDER BY user_id, event_type
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact keyed dedup keeping the earliest row per key — the
    deterministic form of dropDuplicates (whose survivor choice is
    arrival-order-dependent). One shuffle on the dedup key; state per
    group is O(1) via the rank-filter pattern. Core: api.keyed_dedup
    (column-parameterized, reusable on any table)."""
    from hadoop_deliver_spark.api import keyed_dedup

    ev = tbl(spark, sf_dir, "events")
    return (
        keyed_dedup(ev, ["user_id", "event_type"], ["ts", "event_id"])
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


@register(
    "agg_distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (Catalyst rewrites to a hash aggregate)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register("agg_hll_sketch_merge", None)  # rows-only: Datasketches HLL is Spark-specific
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB pre-aggregation
    pattern exact count-distinct cannot give you: build one Apache
    Datasketches HLL per (event_type, day) partial rollup, then
    `hll_union_agg` the per-day sketches into per-type totals WITHOUT
    rescanning the raw data. That re-aggregability (daily sketches →
    monthly/total estimates) is why warehouses persist sketch columns
    next to their rollups. Rows-only: the sketch encoding is
    Spark/Datasketches-specific, so DuckDB cannot replay it; the query
    instead surfaces both the merged estimate and the exact count, and
    the test ring asserts the documented <3% error envelope.

    Output: event_type, est_users (merged-sketch estimate),
    exact_users, within_3pct."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .withColumn(
            "within_3pct",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.03 * F.col("exact_users")
            ),
        )
        .orderBy("event_type")
    )
