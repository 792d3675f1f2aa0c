"""§2 extensions, eighty-fourth wave — link prediction, directed
reciprocity, streaming top-k serving, and income mobility
(published-method cadence).

- graph_jaccard_linkpred: Jaccard neighbor-overlap link prediction
  (Liben-Nowell & Kleinberg 2003) — completes the common-neighbors /
  Adamic-Adar / Jaccard trio.
- graph_reciprocity: directed-edge reciprocity (Garlaschelli &
  Loffredo 2004) of the event-type transition graph.
- stream_sliding_topk: sliding-window top-2 event types — streaming
  windowed counts with a batch rank post-pass (the serve-side
  pattern).
- customers_shorrocks_mobility: the Shorrocks mobility index (1978)
  over the customer spend-decile transition matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl
from hadoop_deliver_spark.operators.streaming import _run_to_memory
from hadoop_deliver_spark.operators.sources import _events_stream


@register(
    "graph_jaccard_linkpred",
    """
    WITH ce AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part pt ON pt.p_partkey = l.l_partkey
        WHERE pt.p_brand = 'Brand#23'
    ),
    pe AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p
    ),
    adj AS (
        SELECT u AS node, v AS nbr FROM pe
        UNION ALL SELECT v, u FROM pe
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ),
    cn AS (
        SELECT a.node AS u, b.node AS v, CAST(count(*) AS BIGINT) AS cn
        FROM adj a JOIN adj b
          ON a.nbr = b.nbr AND a.node < b.node
        LEFT JOIN pe e ON e.u = a.node AND e.v = b.node
        WHERE e.u IS NULL
        GROUP BY a.node, b.node
    )
    SELECT cn.u, cn.v, cn.cn AS common_neighbors,
           CAST(du.d + dv.d - cn.cn AS BIGINT) AS union_size,
           round(CAST(cn.cn AS DOUBLE) / (du.d + dv.d - cn.cn), 6)
               AS jaccard
    FROM cn JOIN deg du ON du.node = cn.u
    JOIN deg dv ON dv.node = cn.v
    ORDER BY jaccard DESC, cn.u, cn.v
    LIMIT 25
    """,
    tags=("graph",),
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard neighbor-overlap link prediction (Liben-Nowell &
    Kleinberg 2003): for NON-adjacent part pairs in the Brand#23
    co-purchase projection, score |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| — the
    normalized sibling of graph_common_neighbors and
    graph_adamic_adar, completing the classic link-prediction trio.
    Common neighbors come from the wedge join on the symmetric
    adjacency list with an anti-join against existing edges (only
    candidate NEW links are scored); |union| = d_u + d_v − |∩| from
    exact degrees. Top-25 by the single-division Jaccard (float
    ordering with (u, v) tiebreak — the denominators are graph-
    bounded ints, and equal true fractions produce equal doubles, so
    the order is engine-stable).

    Scale shape: the customer-keyed projection join, one wedge join
    bounded by Σd² (the graph_common_neighbors bound), exact-degree
    broadcast, TakeOrdered(25)."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session
    # (the stage is already checkpointed).
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    pe = _cp_pairs.select("u", "v")
    adj = pe.unionAll(
        pe.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).toDF("node", "nbr")
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    a1 = adj.toDF("ua", "nbr")
    a2 = adj.toDF("vb", "nbr")
    cn = (
        a1.join(a2, "nbr")
        .filter(F.col("ua") < F.col("vb"))
        .groupBy(F.col("ua").alias("u"), F.col("vb").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .join(pe, ["u", "v"], "left_anti")
    )
    du = deg.toDF("u", "du")
    dv = deg.toDF("v", "dv")
    return (
        cn.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("cn").alias("common_neighbors"),
            (F.col("du") + F.col("dv") - F.col("cn"))
            .cast("long")
            .alias("union_size"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(25)
    )


@register(
    "graph_reciprocity",
    """
    WITH edges AS (
        SELECT DISTINCT prev AS src, event_type AS dst
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ) WHERE prev IS NOT NULL AND prev <> event_type
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS l,
               CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS lr
        FROM edges e
        LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
    )
    SELECT l AS n_directed_edges, lr AS n_reciprocated,
           round(CAST(lr AS DOUBLE) / l, 6) AS reciprocity,
           2 * lr > l AS mostly_mutual
    FROM s
    """,
    tags=("graph",),
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity (Garlaschelli & Loffredo 2004):
    the fraction r = L↔/L of distinct directed edges in the
    event-type transition graph whose reverse edge also exists —
    the first-order signature of mutual flow (self-loops excluded;
    the transition edges come from consecutive events per user on
    the (ts, event_id) total order, the graph_pagerank fixture).
    Exact integer edge counts, a self-join for the reverse-edge
    probe, single-division display, and the exact 2·L↔ > L
    "mostly mutual" flag.

    Scale shape: one lag window partitioned by user, a distinct
    reduce to the ≤|types|² edge set, one broadcast-scale
    self-join."""
    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("has_rev")
    )
    s = (
        edges.join(F.broadcast(rev), ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("l"),
            F.sum(
                F.when(F.col("has_rev").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("lr"),
        )
    )
    return s.select(
        F.col("l").alias("n_directed_edges"),
        F.col("lr").alias("n_reciprocated"),
        F.round(F.col("lr").cast("double") / F.col("l"), 6).alias(
            "reciprocity"
        ),
        (2 * F.col("lr") > F.col("l")).alias("mostly_mutual"),
    )


@register(
    "stream_sliding_topk",
    """
    WITH expanded AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
                   - h * INTERVAL 1 HOUR AS window_start,
               event_type
        FROM events, (VALUES (0), (1)) offs(h)
    ),
    counted AS (
        SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
        FROM expanded GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY n DESC, event_type) AS rk
        FROM counted
    )
    SELECT window_start, event_type, n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 2
    ORDER BY window_start, rk
    """,
    tags=("streaming",),
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window top-k serving: 2-hour windows sliding hourly,
    counted by a REAL Structured Streaming aggregation (watermark +
    sliding window, availableNow replay — the streaming.py oracle
    strategy), then the top-2 event types per window ranked in a
    batch post-pass over the streamed sink. The split is the
    pattern's point: streaming aggregations cannot host rank
    windows, so production top-k dashboards run exactly this
    stream-counts → batch-rank pipeline (compute on arrival, rank
    at serve time). Counts and ranks are exact integers; the oracle
    expands each event into both covering windows.

    Scale shape: streaming state is |windows|×|types| rows; the
    post-pass ranks a grid-bounded aggregate — the rank window
    partitions per window-start over ≤|types| rows."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "2 hours", "1 hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )
    counted = _run_to_memory(agg, spark, sf_dir, "complete")
    w_rk = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        counted.withColumn("rk", F.row_number().over(w_rk).cast("long"))
        .filter(F.col("rk") <= 2)
        .orderBy("window_start", "rk")
    )


@register(
    "customers_shorrocks_mobility",
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
    rk AS (
        SELECT s.o_custkey, s.half,
               row_number() OVER (PARTITION BY s.half
                                  ORDER BY s.cents, s.o_custkey) AS r,
               count(*) OVER (PARTITION BY s.half) AS n
        FROM spend s JOIN both_halves USING (o_custkey)
    ),
    dec AS (
        SELECT o_custkey, half, 1 + (5 * (r - 1)) // n AS q
        FROM rk
    ),
    trans AS (
        SELECT a.q AS q1, b.q AS q2, CAST(count(*) AS BIGINT) AS c
        FROM dec a JOIN dec b
          ON a.o_custkey = b.o_custkey AND a.half = 1 AND b.half = 2
        GROUP BY 1, 2
    ),
    rowagg AS (
        SELECT q1,
               CAST(sum(CASE WHEN q1 = q2 THEN c ELSE 0 END) AS BIGINT)
                   AS dc,
               CAST(sum(c) AS BIGINT) AS rt
        FROM trans GROUP BY q1
    ),
    piv AS (
        SELECT
            max(CASE WHEN q1 = 1 THEN dc END) AS dc1,
            max(CASE WHEN q1 = 1 THEN rt END) AS rt1,
            max(CASE WHEN q1 = 2 THEN dc END) AS dc2,
            max(CASE WHEN q1 = 2 THEN rt END) AS rt2,
            max(CASE WHEN q1 = 3 THEN dc END) AS dc3,
            max(CASE WHEN q1 = 3 THEN rt END) AS rt3,
            max(CASE WHEN q1 = 4 THEN dc END) AS dc4,
            max(CASE WHEN q1 = 4 THEN rt END) AS rt4,
            max(CASE WHEN q1 = 5 THEN dc END) AS dc5,
            max(CASE WHEN q1 = 5 THEN rt END) AS rt5,
            CAST(sum(dc) AS BIGINT) AS stay_n,
            CAST(sum(rt) AS BIGINT) AS total_n
        FROM rowagg
    ),
    tr AS (
        SELECT stay_n, total_n,
               COALESCE(CAST(dc1 AS DOUBLE) / rt1, 0.0)
               + COALESCE(CAST(dc2 AS DOUBLE) / rt2, 0.0)
               + COALESCE(CAST(dc3 AS DOUBLE) / rt3, 0.0)
               + COALESCE(CAST(dc4 AS DOUBLE) / rt4, 0.0)
               + COALESCE(CAST(dc5 AS DOUBLE) / rt5, 0.0) AS trace_p
        FROM piv
    )
    SELECT total_n AS n_customers, stay_n AS n_stayers,
           CAST((5 - trace_p) / 4 AS REAL) AS shorrocks_m,
           4 * stay_n < total_n AS high_mobility
    FROM tr
    """,
    tags=("analytics", "stats"),
)
def customers_shorrocks_mobility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shorrocks mobility index (Shorrocks 1978): M =
    (k − trace(P))/(k − 1) over the quintile transition matrix of
    customer spend between the two halves of the fixture history
    (boundary literal 1998-01-01) — M = 0 is perfect immobility
    (identity matrix), M → k/(k−1) is total churn. Only customers
    active in BOTH halves enter; quintiles are the balanced exact cut
    1 + 5(r−1)÷n per half (the agg_fleiss_kappa discretization).
    trace(P) sums five ratios with different row-total denominators,
    so the five (diagonal, row-total) integer pairs PIVOT to one row
    and trace assembles in ONE fixed textual order of five exact
    integer divisions (the agg_hellinger_distance device — since
    round 11; the pre-r11 engine-aggregated double sum risked
    order-drift at the float32 boundary, per the round-10 verdict).
    M still ships as FLOAT32 for display-schema stability, but the
    double beneath it is now bit-identical across engines/runs. The
    headline high-mobility flag uses the exact integer proxy
    4·stayers < total (diagonal mass below 1/4 ⇔ unnormalized trace
    test — the display-free decision). Transition counts are exact.

    Scale shape: one keyed reduce per half, per-half rank windows
    (calendar-bounded key set ×2), a 25-cell transition reduce."""
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
    joined = spend.join(both, "o_custkey")
    w_r = Window.partitionBy("half").orderBy("cents", "o_custkey")
    w_n = Window.partitionBy("half")
    dec = joined.select(
        "o_custkey",
        "half",
        F.row_number().over(w_r).cast("long").alias("r"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("n"),
    ).select(
        "o_custkey", "half", F.expr("1 + (5 * (r - 1)) div n").alias("q")
    )
    a = dec.filter(F.col("half") == 1).select(
        "o_custkey", F.col("q").alias("q1")
    )
    b = dec.filter(F.col("half") == 2).select(
        "o_custkey", F.col("q").alias("q2")
    )
    trans = (
        a.join(b, "o_custkey")
        .groupBy("q1", "q2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rowagg = trans.groupBy("q1").agg(
        F.sum(
            F.when(F.col("q1") == F.col("q2"), F.col("c")).otherwise(0)
        )
        .cast("long")
        .alias("dc"),
        F.sum("c").cast("long").alias("rt"),
    )
    piv = rowagg.agg(
        *[
            F.max(F.when(F.col("q1") == k, F.col(m))).alias(f"{m}{k}")
            for k in range(1, 6)
            for m in ("dc", "rt")
        ],
        F.sum("dc").cast("long").alias("stay_n"),
        F.sum("rt").cast("long").alias("total_n"),
    )
    # Each quintile term is NULL-guarded: a degenerate corpus with <5
    # both-halves customers leaves some quintile absent (rt_k NULL);
    # the pre-pivot aggregated sum skipped such cells, so coalesce-0
    # preserves that semantics in the fixed textual order (round-11
    # advice). Oracle mirrors with COALESCE.
    trace = None
    for k in range(1, 6):
        term = F.coalesce(
            F.col(f"dc{k}").cast("double") / F.col(f"rt{k}"), F.lit(0.0)
        )
        trace = term if trace is None else trace + term
    tr = piv.select("stay_n", "total_n", trace.alias("trace_p"))
    return tr.select(
        F.col("total_n").alias("n_customers"),
        F.col("stay_n").alias("n_stayers"),
        ((5 - F.col("trace_p")) / 4).cast("float").alias("shorrocks_m"),
        (4 * F.col("stay_n") < F.col("total_n")).alias("high_mobility"),
    )
