"""§2 extensions, thirty-first wave — robust outliers, row quarantine,
margin analysis, bipartite projection.

- events_anomaly_mad: median-absolute-deviation outliers — the ROBUST
  twin of events_anomaly_zscore (one wild value cannot drag the
  threshold), with every comparison kept in exact scaled integers.
- dq_quarantine: row-level rule routing — each row tagged with the
  rules it violates, clean rows counted separately; the loader
  pattern that ships good rows and parks bad ones instead of failing
  the batch.
- parts_margin_analysis: retail-vs-realized margin per part type
  (exact cents), the pricing report on the part dimension's numeric
  columns.
- graph_bipartite_projection: the user↔event-type bipartite graph
  projected onto types — type pairs co-used by the same user, the
  co-engagement matrix (bounded |types|² output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_anomaly_mad",
    """
    WITH cents AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS c
        FROM events
    ),
    med AS (
        SELECT event_type,
               CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
        FROM cents GROUP BY event_type
    ),
    dev AS (
        SELECT c.event_id, c.event_type, c.c, m.med2,
               abs(2 * c.c - m.med2) AS dev2
        FROM cents c JOIN med m ON m.event_type = c.event_type
    ),
    mad AS (
        SELECT event_type,
               CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, count(*) AS n_outliers,
           CAST(sum(d.c) AS BIGINT) AS outlier_cents
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE 2 * d.dev2 * 2 > 3 * 2 * m.mad4
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    tags=("analytics", "dq"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type: |x − median| > 3·MAD —
    the median-absolute-deviation gate that, unlike
    events_anomaly_zscore's moment-based z, cannot be dragged by the
    outliers it is hunting. Exactness: cents are integers; a median
    of integers is integer or half-integer, so med·2 is an exact
    BIGINT, deviations scale to 2·|x−med| (integer), MAD·4 likewise,
    and the final test cross-multiplies integers — no float decides
    membership at any step. Two exact per-type percentiles (sorted
    within each small type group) + one broadcast-back join."""
    e = tbl(spark, sf_dir, "events")
    cents = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    med = cents.groupBy("event_type").agg(
        (F.percentile("c", F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    dev = cents.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(2 * F.col("c") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        (F.percentile("dev2", F.lit(0.5)) * 2).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(2 * F.col("dev2") * 2 > 3 * 2 * F.col("mad4"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.sum("c").cast("long").alias("outlier_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_quarantine",
    """
    WITH tagged AS (
        SELECT l_orderkey, l_linenumber,
               (l_quantity <= 0 OR l_quantity > 50) AS r_qty,
               (l_discount < 0 OR l_discount > 0.1) AS r_disc,
               (l_shipdate < TIMESTAMP '1990-01-01'
                OR l_shipdate > TIMESTAMP '2005-01-01') AS r_date,
               (l_extendedprice <= 0) AS r_price
        FROM lineitem
    )
    SELECT
        (SELECT count(*) FROM tagged) AS n_rows,
        (SELECT count(*) FROM tagged
         WHERE NOT (r_qty OR r_disc OR r_date OR r_price)) AS n_clean,
        (SELECT count(*) FROM tagged WHERE r_qty) AS n_bad_qty,
        (SELECT count(*) FROM tagged WHERE r_disc) AS n_bad_disc,
        (SELECT count(*) FROM tagged WHERE r_date) AS n_bad_date,
        (SELECT count(*) FROM tagged WHERE r_price) AS n_bad_price
    """,
    tags=("dq",),
)
def dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine routing: every row is tagged against the
    rule set (quantity band, discount band, sane date range, positive
    price) in ONE scan; clean rows would ship, violators park in a
    quarantine table WITH their rule tags (here the published surface
    is the per-rule ledger — conditional aggregates over the same
    tagged scan, so adding a rule costs a column, not a pass).
    dq_constraints validates the dataset wholesale and can only
    pass/fail the batch; quarantine is the loader behaviour that
    keeps good rows flowing. Fixture data is clean by construction —
    the zero violation counts ARE the assertion."""
    li = tbl(spark, sf_dir, "lineitem")
    tagged = li.select(
        ((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).alias("r_qty"),
        ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("r_disc"),
        (
            (F.col("l_shipdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("l_shipdate") > F.lit("2005-01-01").cast("timestamp"))
        ).alias("r_date"),
        (F.col("l_extendedprice") <= 0).alias("r_price"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return tagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        cnt(
            ~(
                F.col("r_qty")
                | F.col("r_disc")
                | F.col("r_date")
                | F.col("r_price")
            )
        ).alias("n_clean"),
        cnt(F.col("r_qty")).alias("n_bad_qty"),
        cnt(F.col("r_disc")).alias("n_bad_disc"),
        cnt(F.col("r_date")).alias("n_bad_date"),
        cnt(F.col("r_price")).alias("n_bad_price"),
    )


@register(
    "parts_margin_analysis",
    """
    SELECT p.p_type,
           count(*) AS n_items,
           CAST(sum(CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                         * CAST(l.l_quantity AS BIGINT) * 100 AS BIGINT))
               AS BIGINT) AS retail_cents,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS realized_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_type ORDER BY p.p_type
    """,
    tags=("analytics",),
)
def parts_margin_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail-vs-realized pricing per part type: list value
    (retailprice × quantity) against realized revenue
    (extendedprice), both exact cents — the discount-leakage report.
    quantity is an integer-valued double (FIXTURES), so the product
    stays inside DECIMAL exactness. Part broadcasts; one fact
    aggregate keyed by the 6-value type."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    retail = (
        dec2("p_retailprice") * F.col("l_quantity").cast("long") * 100
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(retail).cast("long").alias("retail_cents"),
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("realized_cents"),
        )
        .orderBy("p_type")
    )


@register(
    "graph_bipartite_projection",
    """
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_shared_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY type_a, type_b
    """,
    tags=("graph",),
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection: the user↔event-type graph collapsed onto
    the type side — for each type pair, how many users engage with
    BOTH (the co-engagement matrix behind 'users who click also
    purchase'). The projection self-joins the DISTINCT (user, type)
    grid on the user key with an ordered pair condition; fan-out per
    user is ≤ C(|types|,2) = 10, so the join output is bounded by
    10·|users| whatever the event volume — the distinct grid is what
    makes bipartite projections tractable at scale."""
    e = tbl(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a, b = ut.alias("a"), ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_users"))
        .orderBy("type_a", "type_b")
    )
