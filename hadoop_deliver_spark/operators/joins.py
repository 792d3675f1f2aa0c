"""§2.C — Joins.

Strategy notes for 100 TB (see also §4.2 of SURVEY.md):
  - dimension tables (region/nation/supplier, and customer at most
    scales) get explicit ``broadcast()`` hints — never shuffle a
    100 TB fact table to join a 25-row dimension;
  - big⋈big equi joins are left to the planner (SMJ/SHJ + AQE skew
    splitting);
  - theta/band joins have no native physical operator: the pure form
    falls back to BroadcastNestedLoop (kept to broadcast-able sides),
    the scalable form is the equi-prefilter pattern in join_interval
    (coarse bucket equi-join + exact range refine) — that one is the
    pattern that survives a 100× scale-up;
  - as-of join is the union+window trick: O(n log n) in the SMJ sort,
    no row explosion, state O(1) per key — scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_R = 4


@register(
    "join_inner_equi",
    f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS REAL) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi join (orders⋈lineitem): both sides shuffle on
    the join key, AQE picks SMJ/SHJ; revenue rolled up per priority."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))
            )
            .cast("double")
            .cast("float")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_broadcast",
    f"""
    SELECT n.n_name,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS REAL) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-way star join. All three dimensions are
    broadcast (explicit hints), so the only shuffle left is
    orders⋈lineitem — the plan a 1000-executor cluster wants."""
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation")
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))
            )
            .cast("double")
            .cast("float")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "join_left_outer",
    f"""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           CAST(CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS REAL) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer kept, orderless customers get
    count 0 / spend 0 (null-extension then aggregate)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec2("o_totalprice")).cast("double"), F.lit(0.0))
            .cast("float")
            .alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    """
    SELECT n.n_nationkey, n.n_name, count(s.s_suppkey) AS n_supp
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name ORDER BY n.n_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: all 25 nations kept even with zero suppliers."""
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
        .orderBy("n_nationkey")
    )


@register(
    "join_full_outer",
    """
    WITH c_by_nation AS (
        SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey
    ), s_by_nation AS (
        SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM c_by_nation c FULL JOIN s_by_nation s ON c.c_nationkey = s.s_nationkey
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two pre-aggregated sides (aggregate-before-join:
    shuffles |groups| rows instead of |rows| — the 100 TB ordering)."""
    c = (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        tbl(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: customers with a jumbo order; probe
    side never duplicates (semi joins emit each left row ≤ once)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join: customers with no orders at all."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    """
    SELECT r.r_name, seg.c_mktsegment
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    ORDER BY r.r_name, seg.c_mktsegment
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — deliberately small×small (5×5). At scale a
    cross join is only ever legitimate when one side is tiny and
    broadcast; anything else is a planning bug."""
    r = tbl(spark, sf_dir, "region").select("r_name")
    seg = tbl(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.crossJoin(F.broadcast(seg)).orderBy("r_name", "c_mktsegment")


@register(
    "join_theta_range",
    f"""
    SELECT s.s_suppkey,
           count(*) AS n_parts,
           CAST(CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                / count(*) AS REAL) AS avg_price
    FROM supplier s
    JOIN part p ON p.p_retailprice BETWEEN s.s_acctbal / 5.0 AND s.s_acctbal / 3.0
    GROUP BY s.s_suppkey ORDER BY s.s_suppkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (band) join: no equi key ⇒ BroadcastNestedLoop with
    the *small* side (supplier) broadcast. Kept broadcast-able by
    construction; the scalable alternative for big×big bands is the
    bucket-prefilter pattern in join_interval."""
    s = tbl(spark, sf_dir, "supplier")
    p = tbl(spark, sf_dir, "part")
    cond = F.col("p_retailprice").between(
        F.col("s_acctbal") / 5.0, F.col("s_acctbal") / 3.0
    )
    return (
        p.join(F.broadcast(s), cond)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum(dec2("p_retailprice")).cast("double") / F.count(F.lit(1)))
            .cast("float")
            .alias("avg_price"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "join_interval",
    f"""
    SELECT a.user_id,
           count(*) AS n_followups,
           CAST(CAST(sum(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) AS REAL)
               AS followup_value
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click'
    GROUP BY a.user_id ORDER BY a.user_id
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: follow-up events within 1h of each click, same
    user. The equi key (user_id) carries the shuffle; the time-range
    predicate refines inside the sort-merge join — this equi-prefilter
    shape is how interval joins stay off the nested-loop path at
    100 TB (plus coarse time-bucket keys when there is no natural
    equi key)."""
    ev = tbl(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    return (
        a.join(
            b,
            (F.col("b_user") == F.col("a_user"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_followups"),
            F.sum(dec2("b_value")).cast("double").cast("float")
            .alias("followup_value"),
        )
        .orderBy("user_id")
    )


def _asof_union_window(e: DataFrame, probes: DataFrame, forward: bool,
                       out: str) -> DataFrame:
    """Union+window as-of core, shared by join_asof / join_asof_forward
    and the randomized differential ring — thin binding of the public
    core api.asof_join (column-parameterized; the sort-direction and
    one-shuffle rationale live on that function). ``e`` carries one
    value per (user_id, ts); ``probes`` carries (user_id, ts)."""
    from hadoop_deliver_spark.api import asof_join

    return (
        asof_join(e, probes, ["user_id"], "ts", "value",
                  forward=forward, out=out)
        .select("user_id", F.col("ts").alias("probe_ts"), out)
        .orderBy("user_id", "probe_ts")
    )


@register(
    "join_asof",
    f"""
    WITH probes AS (
        SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS probe_ts
        FROM events
    ), ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(value, event_id) AS value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT p.user_id, p.probe_ts, e.value AS asof_value
    FROM probes p
    ASOF JOIN ev e ON e.user_id = p.user_id AND e.ts <= p.probe_ts
    ORDER BY p.user_id, p.probe_ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window trick (Spark has no native
    asof): tag probe rows, union with events, then
    ``last(value ignorenulls)`` over (user, ts) picks the latest event
    value at-or-before each probe. One shuffle, no row explosion —
    the oracle cross-checks against DuckDB's *native* ASOF JOIN, an
    independent implementation."""
    ev = tbl(spark, sf_dir, "events")
    # dedup to one value per (user, ts) so both engines break ts ties identically
    e = ev.groupBy("user_id", "ts").agg(F.max_by("value", "event_id").alias("value"))
    probes = ev.select("user_id", F.date_trunc("day", "ts").alias("ts")).distinct()
    return _asof_union_window(e, probes, forward=False, out="asof_value")


@register(
    "join_asof_forward",
    """
    WITH probes AS (
        SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS probe_ts
        FROM events
    ), ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(value, event_id) AS value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT p.user_id, p.probe_ts, e.value AS next_value
    FROM probes p
    ASOF JOIN ev e ON e.user_id = p.user_id AND e.ts >= p.probe_ts
    ORDER BY p.user_id, p.probe_ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each probe, the EARLIEST event value
    at-or-after it (the look-ahead twin of join_asof — e.g. "next
    reading after a deadline"). Same union+window shape mirrored:
    probes sort *before* same-ts events, and `first(value ignorenulls)`
    over [current, following] picks the next event. Still one shuffle,
    O(1) state per key; the oracle is DuckDB's native ASOF JOIN with
    the `>=` direction — an independent implementation."""
    ev = tbl(spark, sf_dir, "events")
    # dedup to one value per (user, ts) so both engines break ts ties identically
    e = ev.groupBy("user_id", "ts").agg(F.max_by("value", "event_id").alias("value"))
    probes = ev.select("user_id", F.date_trunc("day", "ts").alias("ts")).distinct()
    return _asof_union_window(e, probes, forward=True, out="next_value")


@register(
    "join_self",
    """
    SELECT a.l_orderkey, count(*) AS n_pairs
    FROM lineitem a
    JOIN lineitem b ON b.l_orderkey = a.l_orderkey
                   AND b.l_linenumber > a.l_linenumber
                   AND b.l_partkey <> a.l_partkey
    GROUP BY a.l_orderkey ORDER BY a.l_orderkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join: pairs of lines in the same order with different
    parts (aliased sides; linenumber ordering avoids double-count)."""
    li = tbl(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_orderkey").alias("a_ok"),
        F.col("l_linenumber").alias("a_ln"),
        F.col("l_partkey").alias("a_pk"),
    )
    b = li.select(
        F.col("l_orderkey").alias("b_ok"),
        F.col("l_linenumber").alias("b_ln"),
        F.col("l_partkey").alias("b_pk"),
    )
    return (
        a.join(
            b,
            (F.col("b_ok") == F.col("a_ok"))
            & (F.col("b_ln") > F.col("a_ln"))
            & (F.col("b_pk") != F.col("a_pk")),
        )
        .groupBy(F.col("a_ok").alias("l_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("l_orderkey")
    )


@register(
    "join_lateral",
    f"""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice AS top_price
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    ORDER BY c.c_custkey
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-row subquery (LATERAL): each customer's single
    most expensive order. Catalyst decorrelates this into a
    window-rank + join, so it runs as shuffles, not per-row loops."""
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("hds_lat_cust")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_lat_orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice AS top_price
        FROM hds_lat_cust c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM hds_lat_orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        ORDER BY c.c_custkey
        """
    )


@register(
    "join_time_bucket_range",
    """
    SELECT date_trunc('day', CAST(a.ts AS TIMESTAMP)) AS day,
           count(*) AS n_pairs,
           CAST(CAST(sum(CAST(b.value AS DECIMAL(18,2))
                         - CAST(a.value AS DECIMAL(18,2))) AS DOUBLE)
                / count(*) AS REAL) AS avg_value_delta
    FROM events a
    JOIN events b
      ON b.event_id <> a.event_id
     AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    GROUP BY 1 ORDER BY 1
    """,
)
def join_time_bucket_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO natural equi key (any two events within 5
    minutes, across all users) via the coarse-bucket prefilter
    (SURVEY §4.3): bucket ts into 5-minute cells, note that a match's
    bucket can only be the probe's own or the next one, explode those
    two candidates into an equi key, and refine with the exact range
    predicate inside the hash join. The planner gets an equi-join
    where the naive formulation is a nested-loop over all pairs —
    the transform that keeps no-key band joins off the O(n²) path at
    100 TB."""
    ev = tbl(spark, sf_dir, "events").select("event_id", "ts", "value")
    bucket = (F.col("ts").cast("long") / 300).cast("long")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("value").alias("a_value"),
        F.explode(F.array(bucket, bucket + 1)).alias("bk"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
        bucket.alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(
            (F.col("b_id") != F.col("a_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTE"))
        )
        # a row can meet its match in both candidate buckets only if
        # they coincide — the explode duplicates probes, so dedup the
        # pair before aggregating
        .select("a_id", "b_id", "a_ts", "a_value", "b_value")
        .distinct()
        .groupBy(F.date_trunc("day", "a_ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(dec2("b_value") - dec2("a_value")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("float")
            .alias("avg_value_delta"),
        )
        .orderBy("day")
    )


@register(
    "agg_salted_two_phase",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS REAL)
               AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-salting recipe, end to end: events.user_id is
    low-cardinality by construction (a hot-key aggregation), so phase
    1 salts each key into 16 sub-keys (deterministic hash of
    event_id) and aggregates (user_id, salt) partials; phase 2
    re-aggregates per user_id. The first shuffle spreads each hot key
    over 16 reducers; the second moves only |keys|×16 partial rows.
    Oracle = the direct single-phase group-by: the rewrite must be
    answer-identical. (Spark's partial aggregation makes this
    redundant for built-in aggs — the pattern matters for
    non-combinable custom aggregates and extreme skew.)"""
    ev = tbl(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(dec2("value")).alias("pv"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").cast("float").alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "join_skew_aqe",
    """
    SELECT d.grp, count(*) AS n_events,
           CAST(CAST(sum(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS REAL)
               AS total_value
    FROM (SELECT CASE WHEN user_id % 4 <> 0 THEN 0 ELSE user_id END
                     AS skew_key,
                 value
          FROM events) f
    LEFT JOIN (SELECT c_custkey AS skew_key, c_mktsegment AS grp
               FROM customer) d USING (skew_key)
    GROUP BY d.grp ORDER BY d.grp
    """,
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join twin of agg_salted_two_phase: the same hot-key
    problem handled by the RUNTIME instead of a hand-written salt.
    ~75% of fact rows are funneled onto one join key (user_id%4≠0→0),
    the dimension side stays a plain scan, and both sides carry a
    merge hint so the planner keeps the SortMergeJoin that AQE's
    OptimizeSkewedJoin rule rewrites: the oversized partition is
    split into mapper-range chunks and the matching dim partition is
    replicated per chunk (SortMergeJoin(skew=true), asserted by
    tests/test_properties.py::test_aqe_skew_join_splits).

    Two local-scale notes, both non-issues at 100 TB: (1) AQE splits
    a skewed partition along MAPPER boundaries, and the fixture
    parquet is a single scan split, so the upstream repartition(16)
    stands in for the thousands of map tasks a real fact scan has;
    (2) the default 256 MB skew threshold is sane in production, so
    the plan-guard test lowers the thresholds around its execution
    rather than this operator leaking demo confs into the session.
    The LEFT join keeps the hot key in the output (no customer 0
    exists) — the answer must be identical with and without the AQE
    rewrite, which is exactly what the oracle checks."""
    ev = tbl(spark, sf_dir, "events").repartition(16).select(
        F.when(F.col("user_id") % 4 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
        "value",
    )
    dim = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_key"),
        F.col("c_mktsegment").alias("grp"),
    )
    return (
        ev.hint("merge")
        .join(dim.hint("merge"), "skew_key", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast("double").cast("float").alias("total_value"),
        )
        .orderBy("grp")
    )
