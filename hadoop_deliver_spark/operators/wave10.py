"""§2 extensions, thirty-fourth wave — experimentation variance
reduction, inequality measurement, and privacy auditing.

- events_cuped: CUPED variance reduction (Deng, Xu, Kohavi & Walker,
  WSDM 2013) — the pre-period covariate adjustment every mature
  experimentation platform applies before reading an A/B metric.
- agg_gini: the Gini concentration index of order value via the
  block-ranked global rank core, numerator summed in DECIMAL so the
  statistic is exact-integer until one final division.
- delivery_k_anonymity: the k-anonymity audit over quasi-identifier
  groups — the privacy gate a dataset delivery runs before handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_cuped",
    """
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS variant,
               CAST(count(*) FILTER (event_type = 'purchase'
                                     AND CAST(ts AS DATE) < DATE '2024-01-16')
                    AS BIGINT) AS x,
               CAST(count(*) FILTER (event_type = 'purchase'
                                     AND CAST(ts AS DATE) >= DATE '2024-01-16')
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
               CAST(sum(x) FILTER (variant = 0) AS BIGINT) AS sx_a,
               CAST(sum(y) FILTER (variant = 0) AS BIGINT) AS sy_a,
               CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b,
               CAST(sum(x) FILTER (variant = 1) AS BIGINT) AS sx_b,
               CAST(sum(y) FILTER (variant = 1) AS BIGINT) AS sy_b
        FROM u
    ),
    t AS (
        SELECT *,
               (sxy - CAST(sx AS DOUBLE) * sy / n)
                 / (sxx - CAST(sx AS DOUBLE) * sx / n) AS theta
        FROM m
    )
    SELECT n_a, n_b,
           round(theta, 4) AS theta,
           round(CAST(sy_a AS DOUBLE) / n_a
                 - CAST(sy_b AS DOUBLE) / n_b, 4) AS diff_raw,
           round((CAST(sy_a AS DOUBLE) / n_a
                  - theta * (CAST(sx_a AS DOUBLE) / n_a
                             - CAST(sx AS DOUBLE) / n))
                 - (CAST(sy_b AS DOUBLE) / n_b
                    - theta * (CAST(sx_b AS DOUBLE) / n_b
                               - CAST(sx AS DOUBLE) / n)), 4) AS diff_cuped
    FROM t
    """,
    tags=("events", "stats"),
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    2013): the A/B metric (second-half purchase count per user) is
    adjusted by the pre-period covariate (first-half purchase count)
    with θ = cov(X,Y)/var(X) pooled across arms, removing
    between-user variance uncorrelated with treatment. diff_cuped is
    the adjusted arm difference the experimentation readout reports
    next to the raw one. All moments (Σx, Σy, Σxy, Σx², per-arm
    splits) are exact integers from ONE per-user aggregate + one
    1-row reduce; θ and the adjusted means run in identically-ordered
    doubles — bit-stable across engines at any partitioning.

    Scale shape: one shuffle keyed on user_id (map-side partial
    combine), then a scalar reduce. No join, no window."""
    e = tbl(spark, sf_dir, "events")
    pur = F.col("event_type") == "purchase"
    pre = F.to_date("ts") < F.lit("2024-01-16").cast("date")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("long").alias("variant")
    ).agg(
        F.count_if(pur & pre).alias("x"),
        F.count_if(pur & ~pre).alias("y"),
    )
    a0 = F.col("variant") == 0
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.count_if(a0).alias("n_a"),
        F.sum(F.when(a0, F.col("x"))).cast("long").alias("sx_a"),
        F.sum(F.when(a0, F.col("y"))).cast("long").alias("sy_a"),
        F.count_if(~a0).alias("n_b"),
        F.sum(F.when(~a0, F.col("x"))).cast("long").alias("sx_b"),
        F.sum(F.when(~a0, F.col("y"))).cast("long").alias("sy_b"),
    )
    theta = (
        F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / (
        F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    t = m.withColumn("theta", theta)
    xbar = F.col("sx").cast("double") / F.col("n")
    adj_a = F.col("sy_a").cast("double") / F.col("n_a") - F.col("theta") * (
        F.col("sx_a").cast("double") / F.col("n_a") - xbar
    )
    adj_b = F.col("sy_b").cast("double") / F.col("n_b") - F.col("theta") * (
        F.col("sx_b").cast("double") / F.col("n_b") - xbar
    )
    return t.select(
        "n_a",
        "n_b",
        F.round("theta", 4).alias("theta"),
        F.round(
            F.col("sy_a").cast("double") / F.col("n_a")
            - F.col("sy_b").cast("double") / F.col("n_b"),
            4,
        ).alias("diff_raw"),
        F.round(adj_a - adj_b, 4).alias("diff_cuped"),
    )


@register(
    "agg_gini",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rk
        FROM o
    ),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS total,
               sum(rk * cents) AS s1
        FROM r
    )
    SELECT n, total,
           round(2.0 * CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * total)
                 - (CAST(n AS DOUBLE) + 1) / n, 6) AS gini
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of order value — how unequal is
    revenue across orders? G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the
    value-ascending total order. Ranks come from the block-ranked
    api.exact_global_rank core (no single-partition window touches
    the fact table) and Σ i·xᵢ is summed in DECIMAL(38,0) — per-term
    i·x fits int64 into the billions of rows, and the DECIMAL sum is
    associative-exact beyond it — so the statistic is exact integers
    until one final division in identically-ordered doubles.

    Scale shape: one block-ranked pass (the same machinery as
    orders_global_seq), one scalar reduce. The rank tiebreak
    (o_orderkey) does not affect G: a tie group holds one x across a
    fixed set of consecutive ranks, so its Σ i·x is x times a fixed
    rank total under ANY tiebreak permutation."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"), "o_orderkey")
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum((F.col("rk") * F.col("cents")).cast("decimal(38,0)")).alias(
            "s1"
        ),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        "total",
        F.round(
            2.0 * F.col("s1").cast("double") / (nd * F.col("total"))
            - (nd + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "delivery_k_anonymity",
    """
    WITH g AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               count(*) AS n
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, segment, n,
           CAST(20 AS BIGINT) AS k,
           n < 20 AS risky
    FROM g ORDER BY nation, segment
    """,
    tags=("delivery", "privacy"),
)
def delivery_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation,
    market segment): any group smaller than k=20 is a
    re-identification risk — a released row in such a group narrows
    to few real people even with direct identifiers stripped
    (Sweeney 2002). The audit lists every group with its population
    and risk flag; a delivery gate would block (or generalize /
    suppress) the risky ones before handoff.

    Scale shape: one keyed aggregate over the scan (dims broadcast);
    output bounded by the quasi-identifier domain, not the row
    count. Integer-only."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "nation",
            "segment",
            "n",
            F.lit(20).cast("long").alias("k"),
            (F.col("n") < 20).alias("risky"),
        )
        .orderBy("nation", "segment")
    )
