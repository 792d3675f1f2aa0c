"""§2 extensions, eighty-fifth wave — link prediction and
distance-based centrality.

- graph_link_prediction: the classical similarity-index panel
  (Liben-Nowell & Kleinberg 2003) for the top non-adjacent candidate
  pairs of the co-purchase graph — common neighbors, Jaccard, Salton
  cosine, Sørensen, hub-promoted/-depressed, preferential attachment
  — every index an exact-integer function of (CN, d_u, d_v).
- graph_harmonic_centrality: Boldi-Vigna (2014) harmonic centrality
  on the event-type transition graph — the closeness variant that
  stays finite on disconnected graphs, here FULLY exact because the
  bounded node set caps every distance at 4 (12·H is a pure
  integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_COPURCHASE_SQL = """
    ce AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part pt ON pt.p_partkey = l.l_partkey
        WHERE pt.p_brand = 'Brand#23'
    ),
    pe AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p
    ),
    und AS (SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe),
    deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d
        FROM und GROUP BY u
    )
"""


@register(
    "graph_link_prediction",
    f"""
    WITH {_COPURCHASE_SQL},
    wedge AS (
        SELECT a.u AS x, b.v AS y, CAST(count(*) AS BIGINT) AS cn
        FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
        GROUP BY a.u, b.v
    ),
    cand AS (
        SELECT w.x, w.y, w.cn
        FROM wedge w LEFT JOIN pe e ON e.u = w.x AND e.v = w.y
        WHERE e.u IS NULL
    ),
    top AS (
        SELECT c.x, c.y, c.cn, dx.d AS du, dy.d AS dv
        FROM cand c
        JOIN deg dx ON dx.node = c.x
        JOIN deg dy ON dy.node = c.y
        ORDER BY c.cn DESC, c.x, c.y LIMIT 20
    )
    SELECT x AS u, y AS v, cn AS common_neighbors,
           du AS deg_u, dv AS deg_v,
           round(CAST(cn AS DOUBLE) / (du + dv - cn), 6) AS jaccard,
           round(CAST(cn AS DOUBLE)
                 / sqrt(CAST(du AS DOUBLE) * dv), 6) AS salton,
           round(2 * CAST(cn AS DOUBLE) / (du + dv), 6) AS sorensen,
           round(CAST(cn AS DOUBLE) / LEAST(du, dv), 6) AS hub_promoted,
           round(CAST(cn AS DOUBLE) / GREATEST(du, dv), 6)
               AS hub_depressed,
           CAST(du AS BIGINT) * dv AS pref_attachment,
           2 * cn > LEAST(du, dv) AS strong_candidate
    FROM top ORDER BY common_neighbors DESC, u, v
    """,
    tags=("graph",),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction similarity panel (the Liben-Nowell &
    Kleinberg 2003 survey battery) for the 20 strongest NON-adjacent
    candidate pairs of the Brand#23 co-purchase projection (the
    graph_clustering_local frame): common neighbors CN, Jaccard
    CN/(d_u+d_v−CN), Salton cosine CN/√(d_u·d_v), Sørensen
    2CN/(d_u+d_v), hub-promoted CN/min(d), hub-depressed CN/max(d)
    (Ravasz et al. 2002), and preferential attachment d_u·d_v
    (Barabási-Albert) — the "which edge appears next" shortlist a
    recommender derives from pure graph structure. Candidates come
    from the wedge join (2-paths x−w−y with x < y) ANTI-joined
    against the edge set — CN, d_u, d_v are exact int64s, every
    index is ONE correctly-rounded expression of exact integers, the
    top-20 selection orders by the EXACT (CN desc, u, v) key, and
    the strong_candidate verdict (CN exceeds half the smaller
    degree) is the pure-integer 2·CN > min(d_u, d_v).

    Scale shape: the projection is a customer-keyed equi-join; the
    wedge join touches each 2-path once (fan-out bounded by Σd² of
    the brand-scoped graph); degree joins are keyed reduces; the
    result is a bounded top-20."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    ce = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = ce.select(F.col("c"), F.col("p").alias("pa"))
    b = ce.select(F.col("c").alias("cb"), F.col("p").alias("pb"))
    pe = (
        a.join(b, (F.col("c") == F.col("cb")) & (F.col("pa") < F.col("pb")))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    und = pe.unionAll(
        pe.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    wa = und.select(F.col("u").alias("x"), F.col("v").alias("w"))
    wb = und.select(F.col("u").alias("wb"), F.col("v").alias("y"))
    wedge = (
        wa.join(wb, (F.col("w") == F.col("wb")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    cand = wedge.join(
        pe,
        (wedge.x == pe.u) & (wedge.y == pe.v),
        "left_anti",
    )
    top = (
        cand.join(
            deg.select(F.col("node").alias("x"), F.col("d").alias("du")),
            "x",
        )
        .join(
            deg.select(F.col("node").alias("y"), F.col("d").alias("dv")),
            "y",
        )
        .orderBy(F.col("cn").desc(), "x", "y")
        .limit(20)
    )
    cn, du, dv = F.col("cn"), F.col("du"), F.col("dv")
    return top.select(
        F.col("x").alias("u"),
        F.col("y").alias("v"),
        cn.alias("common_neighbors"),
        du.alias("deg_u"),
        dv.alias("deg_v"),
        F.round(cn.cast("double") / (du + dv - cn), 6).alias("jaccard"),
        F.round(
            cn.cast("double") / F.sqrt(du.cast("double") * dv), 6
        ).alias("salton"),
        F.round(2 * cn.cast("double") / (du + dv), 6).alias("sorensen"),
        F.round(cn.cast("double") / F.least(du, dv), 6).alias(
            "hub_promoted"
        ),
        F.round(cn.cast("double") / F.greatest(du, dv), 6).alias(
            "hub_depressed"
        ),
        (du.cast("long") * dv).alias("pref_attachment"),
        (2 * cn > F.least(du, dv)).alias("strong_candidate"),
    ).orderBy(F.col("common_neighbors").desc(), "u", "v")


@register(
    "graph_harmonic_centrality",
    """
    WITH e0 AS (
        SELECT prev AS src, event_type AS dst
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ) WHERE prev IS NOT NULL AND prev <> event_type
        GROUP BY prev, event_type
    ),
    und AS (
        SELECT src AS u, dst AS v FROM e0
        UNION SELECT dst, src FROM e0
    ),
    nodes AS (SELECT DISTINCT u AS node FROM und),
    d1 AS (SELECT u, v FROM und),
    d2 AS (
        SELECT DISTINCT a.u, b.v FROM d1 a JOIN d1 b ON a.v = b.u
        WHERE a.u <> b.v
          AND NOT EXISTS (SELECT 1 FROM d1 WHERE u = a.u AND v = b.v)
    ),
    d3 AS (
        SELECT DISTINCT a.u, b.v FROM d2 a JOIN d1 b ON a.v = b.u
        WHERE a.u <> b.v
          AND NOT EXISTS (SELECT 1 FROM d1 WHERE u = a.u AND v = b.v)
          AND NOT EXISTS (SELECT 1 FROM d2 WHERE u = a.u AND v = b.v)
    ),
    d4 AS (
        SELECT DISTINCT a.u, b.v FROM d3 a JOIN d1 b ON a.v = b.u
        WHERE a.u <> b.v
          AND NOT EXISTS (SELECT 1 FROM d1 WHERE u = a.u AND v = b.v)
          AND NOT EXISTS (SELECT 1 FROM d2 WHERE u = a.u AND v = b.v)
          AND NOT EXISTS (SELECT 1 FROM d3 WHERE u = a.u AND v = b.v)
    ),
    cnt AS (
        SELECT n.node,
               CAST((SELECT count(*) FROM d1 WHERE u = n.node) AS BIGINT)
                   AS c1,
               CAST((SELECT count(*) FROM d2 WHERE u = n.node) AS BIGINT)
                   AS c2,
               CAST((SELECT count(*) FROM d3 WHERE u = n.node) AS BIGINT)
                   AS c3,
               CAST((SELECT count(*) FROM d4 WHERE u = n.node) AS BIGINT)
                   AS c4
        FROM nodes n
    ),
    h AS (
        SELECT node, c1 + c2 + c3 + c4 AS reachable,
               12 * c1 + 6 * c2 + 4 * c3 + 3 * c4 AS h12
        FROM cnt
    )
    SELECT node, reachable, h12,
           round(h12 / 12.0, 6) AS harmonic,
           h12 = (SELECT max(h12) FROM h) AS is_most_central
    FROM h ORDER BY node
    """,
    tags=("graph",),
)
def graph_harmonic_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harmonic centrality (Boldi & Vigna 2014): H(u) = Σ_{v≠u}
    1/d(u,v), the closeness variant that stays FINITE on
    disconnected graphs (unreachable nodes contribute 0 instead of
    poisoning the sum) — computed on the undirected event-type
    transition graph (self-loops dropped). The node set is bounded
    (≤ |event_type| = 5), so every shortest distance is ≤ 4 and BFS
    unrolls into four distance layers d1..d4 (new-pairs = frontier ⋈
    edges minus already-seen — the graph_bfs_layers device); with
    denominators drawn only from {{1,2,3,4}}, 12·H = 12c₁ + 6c₂ +
    4c₃ + 3c₄ is a PURE INTEGER — no float harmonic sum at all —
    and the is_most_central verdict is an exact integer argmax
    (h12 vs its max). The display h12/12 is one exact division.

    Scale shape: bounded — every table is ≤ |event_type|² cells
    after one keyed reduce of the event stream; the 4-layer unroll
    is the diameter bound of a 5-node connected graph, a stated
    frame invariant (a larger type domain raises the unroll depth,
    not the algorithm)."""
    e = tbl(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e0 = (
        e.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    und = (
        e0.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(e0.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    # r12: the undirected type graph is DOMAIN-bounded (≤|event_type|²
    # ≤ 25 distinct pairs after the keyed reduce), so the 4-layer BFS
    # runs driver-side over one bounded collect (the
    # events_markov_reach device) instead of ten tiny join/distinct/
    # anti-join jobs; only the per-user lag reduce touches the events.
    _und = {(r["u"], r["v"]) for r in und.collect()}
    _nodes = sorted({u for u, _ in _und})
    _adj = {}
    for u, v in _und:
        _adj.setdefault(u, set()).add(v)
    _layers = {nd: {} for nd in _nodes}
    for nd in _nodes:
        seen = {nd}
        frontier = _adj.get(nd, set()) - seen
        for depth in (1, 2, 3, 4):
            _layers[nd][depth] = len(frontier)
            seen |= frontier
            frontier = {
                w for x in frontier for w in _adj.get(x, set())
            } - seen
    cnt = spark.createDataFrame(
        [
            (nd,) + tuple(_layers[nd][k] for k in (1, 2, 3, 4))
            for nd in _nodes
        ],
        "node string, c1 long, c2 long, c3 long, c4 long",
    )
    h = cnt.select(
        "node",
        (F.col("c1") + F.col("c2") + F.col("c3") + F.col("c4")).alias(
            "reachable"
        ),
        (
            12 * F.col("c1")
            + 6 * F.col("c2")
            + 4 * F.col("c3")
            + 3 * F.col("c4")
        ).alias("h12"),
    )
    hmax = h.agg(F.max("h12").alias("hmax"))
    return (
        h.crossJoin(F.broadcast(hmax))
        .select(
            "node",
            "reachable",
            "h12",
            F.round(F.col("h12") / 12.0, 6).alias("harmonic"),
            (F.col("h12") == F.col("hmax")).alias("is_most_central"),
        )
        .orderBy("node")
    )
