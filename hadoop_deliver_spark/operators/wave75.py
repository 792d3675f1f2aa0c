"""§2 extensions, ninety-ninth wave — method-agreement limits and
graph traversal (published-method cadence).

- agg_bland_altman: Bland-Altman limits of agreement (1986) between
  the order header total and the line-item sum — the
  method-comparison companion to agg_deming_regression.
- graph_bfs_layers: breadth-first k-hop layer sizes (Moore 1959)
  from the hub of the co-purchase graph — four unrolled frontier
  expansions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# z 2.5% two-sided for the 1.96·SD agreement limits
_Z975 = "1.959964"
_BFS_HOPS = 4

_BFS_PREFIX = """
    WITH ce AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part pt ON pt.p_partkey = l.l_partkey
        WHERE pt.p_brand = 'Brand#23'
    ),
    ed AS MATERIALIZED (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p
    ),
    sym AS MATERIALIZED (
        SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed
    ),
    deg AS MATERIALIZED (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d
        FROM sym GROUP BY u
    ),
    seed AS MATERIALIZED (
        SELECT node FROM deg
        ORDER BY d DESC, node ASC LIMIT 1
    ),
    v0 AS MATERIALIZED (SELECT node FROM seed)"""

_BFS_STAGE = """,
    f{i} AS MATERIALIZED (
        SELECT DISTINCT s.v AS node
        FROM sym s JOIN v{prev} ON v{prev}.node = s.u
        WHERE s.v NOT IN (SELECT node FROM v{prev})
    ),
    v{i} AS MATERIALIZED (
        SELECT node FROM v{prev} UNION SELECT node FROM f{i}
    )"""


@register(
    "agg_bland_altman",
    f"""
    WITH pairs AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS x,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y - x) AS HUGEINT) AS sd1,
               CAST(sum(CAST(y - x AS HUGEINT) * (y - x)) AS HUGEINT)
                   AS sd2
        FROM pairs
    ),
    b AS (
        SELECT n,
               CAST(sd1 AS DOUBLE) / n AS bias,
               sqrt(CAST(CAST(n AS HUGEINT) * sd2 - sd1 * sd1
                         AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (n - 1))) AS sd
        FROM m
    )
    SELECT n AS n_orders,
           round(bias, 4) AS bias_cents,
           round(bias - {_Z975} * sd, 4) AS loa_lower,
           round(bias + {_Z975} * sd, 4) AS loa_upper,
           bias - {_Z975} * sd < 0 AND 0 < bias + {_Z975} * sd
               AS zero_within_loa
    FROM b
    """,
    tags=("agg", "stats"),
)
def agg_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman limits of agreement (1986) between the order
    header total and the line-item Σextendedprice — the
    method-comparison companion to agg_deming_regression and the
    most-cited statistics paper for a reason: correlation/regression
    say the methods are RELATED, the bias ± 1.96·SD band says
    whether they can be used INTERCHANGEABLY. Per-order differences
    d = y − x are exact integers; bias = Σd/n and SD = √((nΣd² −
    (Σd)²)/(n(n−1))) come from one exact DECIMAL(38)/HUGEINT moment
    reduce cast once to double, and the limits and the
    zero-within-band verdict assemble in ONE fixed textual order
    with the shared 1.959964 literal. (The classical plot pairs d
    with (x+y)/2 — this op ships the summary band; the scatter is a
    rendering concern.)

    Scale shape: one keyed header-lines join reduce to per-order
    pairs, one map-side-combinable 3-sum reduce to a single row."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            o["o_orderkey"],
            (dec2("o_totalprice") * 100).cast("long").alias("x"),
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    d = F.col("y") - F.col("x")
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d).cast("decimal(38,0)").alias("sd1"),
        F.sum(d.cast("decimal(38,0)") * d).alias("sd2"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    b = m.select(
        "n",
        (F.col("sd1").cast("double") / n).alias("bias"),
        F.sqrt(
            (n38 * F.col("sd2") - F.col("sd1") * F.col("sd1")).cast(
                "double"
            )
            / (n.cast("double") * (n - 1))
        ).alias("sd"),
    )
    z = float(_Z975)
    bias, sd = F.col("bias"), F.col("sd")
    return b.select(
        n.alias("n_orders"),
        F.round(bias, 4).alias("bias_cents"),
        F.round(bias - z * sd, 4).alias("loa_lower"),
        F.round(bias + z * sd, 4).alias("loa_upper"),
        ((bias - z * sd < 0) & (F.lit(0) < bias + z * sd)).alias(
            "zero_within_loa"
        ),
    )


@register(
    "graph_bfs_layers",
    _BFS_PREFIX
    + "".join(
        _BFS_STAGE.format(i=i, prev=i - 1)
        for i in range(1, _BFS_HOPS + 1)
    )
    + f"""
    {" UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS hop,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM f{i}) AS layer_size,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM v{i}) AS reached"
        for i in range(1, _BFS_HOPS + 1)
    )}
    ORDER BY hop
    """,
    tags=("graph",),
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first layer census (Moore 1959 — THE graph traversal
    primitive) from the deterministic hub (max degree, min node id)
    of the Brand#23 co-purchase projection: four unrolled frontier
    expansions report |layer_k| and |reached ≤ k| — the
    neighborhood-growth profile behind small-world diagnostics,
    recommendation fan-out sizing, and the hop-bounded joins the
    existing graph_* ops build on. Each round is frontier ⋈ edges
    minus the visited set (anti-join semantics; the oracle unrolls
    the same four rounds as chained CTEs — the graph_kcore_peel
    bounded-unrolling device, hop count part of the contract). All
    counts exact; seed selection is the exact integer arg (max d,
    min id).

    Scale shape: per round one co-partitioned frontier-edge join +
    one anti-join against visited + a distinct — the canonical
    distributed BFS step (Pregel's superstep), linear in touched
    edges; localCheckpoint flattens lineage at round boundaries."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session.
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    ed = _cp_pairs.select("u", "v")
    sym = ed.unionAll(
        ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    seed = (
        deg.orderBy(F.desc("d"), F.asc("node"))
        .limit(1)
        .select("node")
        .localCheckpoint()
    )
    visited = seed
    frontier = seed
    rows = []
    for i in range(1, _BFS_HOPS + 1):
        nxt = (
            sym.join(frontier, sym["u"] == frontier["node"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        visited = visited.unionAll(nxt).distinct().localCheckpoint()
        layer = nxt.agg(
            F.lit(i).cast("long").alias("hop"),
            F.count(F.lit(1)).cast("long").alias("layer_size"),
        )
        reach = visited.agg(
            F.count(F.lit(1)).cast("long").alias("reached")
        )
        rows.append(layer.crossJoin(F.broadcast(reach)))
        frontier = nxt
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("hop")
