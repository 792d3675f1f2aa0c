"""§2 extensions, tenth wave (3/3) — iterative graph analytics.

PageRank over the event-type transition graph. Two things make this
a first-class engine demo rather than a toy:

1. **Exact cross-engine determinism for an iterative float-free
   algorithm.** Ranks are kept as BIGINT micro-units (total mass
   scaled to 1e9) and every update is integer arithmetic with floor
   division — `(850 * w_uv * rank_u) div (1000 * W_u)` — so the
   result after K iterations is bit-identical regardless of engine,
   partition order, or summation order (BIGINT sums are exact and
   commutative). The DuckDB oracle unrolls the same K updates as
   chained CTEs (aggregates are not allowed in a recursive CTE term,
   so unrolling IS the portable form for a fixed K).

2. **The Spark loop shape is the distributed one.** Each iteration is
   edges ⋈ ranks (broadcast — ranks is #nodes rows) → groupBy(dst)
   sum → rebase, i.e. one keyed shuffle per iteration over the EDGE
   table only; node state stays tiny. That is the classic Pregel-as-
   dataframe shape that scales to billions of edges: nothing is ever
   collected to the driver, and K is a fixed constant, not a
   convergence probe.

Dangling mass (nodes with no out-edges) is dropped, matching the
simplified PageRank both sides state identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_SCALE = 1_000_000_000
_ITERS = 6

_EDGES_SQL = """
    SELECT prev AS src, event_type AS dst, count(*) AS w
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ) WHERE prev IS NOT NULL
    GROUP BY prev, event_type
"""


def _oracle() -> str:
    """Unrolled K-iteration PageRank as chained CTEs (DuckDB)."""
    parts = [
        f"WITH edges AS ({_EDGES_SQL}),",
        "outdeg AS (SELECT src, sum(w) AS wtot FROM edges GROUP BY src),",
        "nodes AS (SELECT DISTINCT event_type AS node FROM events),",
        "nn AS (SELECT count(*) AS n FROM nodes),",
        f"pr0 AS (SELECT node, {_SCALE} // (SELECT n FROM nn) AS rank"
        " FROM nodes),",
    ]
    for i in range(1, _ITERS + 1):
        parts.append(
            f"pr{i} AS (SELECT n.node, "
            f"(150 * ({_SCALE} // (SELECT n FROM nn))) // 1000 "
            "+ COALESCE(c.contrib, 0) AS rank FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS node, "
            "CAST(sum((850 * e.w * p.rank) // (1000 * o.wtot)) AS BIGINT)"
            " AS contrib "
            f"FROM edges e JOIN pr{i - 1} p ON e.src = p.node "
            "JOIN outdeg o ON e.src = o.src GROUP BY e.dst"
            ") c ON n.node = c.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, CAST(rank AS BIGINT) AS rank_units "
        f"FROM pr{_ITERS} ORDER BY node"
    )
    return "\n".join(parts)


@register("graph_pagerank", _oracle(), tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (damping 0.85, 6 iterations) over the
    event-type transition graph: edges = consecutive event pairs per
    user on the (ts, event_id) total order, weighted by count. See
    module docstring for the determinism and scale argument; the
    returned ranks are BIGINT micro-units summing to ≤ 1e9."""
    e = tbl(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    ).cache()
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("wtot"))
    nodes = e.select(F.col("event_type").alias("node")).distinct().cache()
    n = nodes.count()
    base = (150 * (_SCALE // n)) // 1000
    ranks = nodes.select("node", F.lit(_SCALE // n).alias("rank"))
    ew = edges.join(outdeg, "src")
    for _ in range(_ITERS):
        contrib = (
            ew.join(F.broadcast(ranks), ew.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # BIGINT floor division (`div`), NOT `/`: double
                # division would round through a 53-bit mantissa and
                # break exactness once 850*w*rank exceeds 2^53.
                F.expr("(850 * w * rank) div (1000 * wtot)").alias("part"),
            )
            .groupBy("node")
            .agg(F.sum("part").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("contrib", F.lit(0))).alias(
                    "rank"
                ),
            )
        )
    return ranks.select(
        "node", F.col("rank").alias("rank_units")
    ).orderBy("node")
