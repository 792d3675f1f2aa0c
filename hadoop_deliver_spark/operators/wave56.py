"""§2 extensions, eightieth wave — per-node graph structure, bounded
iterative peeling, recursive-residual breaks, and the BWS rank test
(published-method cadence).

- graph_clustering_local: Watts-Strogatz per-node clustering
  coefficients (1998) on the Brand#23 co-purchase projection.
- graph_kcore_peel: bounded 3-core peeling (Seidman 1983) — eight
  unrolled prune-degree<3 iterations with per-iteration survivor
  counts on BOTH engines.
- ts_cusum_squares: the Brown-Durbin-Evans CUSUM-of-squares test
  (1975) for variance instability of daily revenue.
- agg_bws_test: the Baumgartner-Weiß-Schindler rank test (1998) —
  the variance-weighted Cramér-von-Mises-style two-sample test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_KCORE_SQL_PREFIX = """
    WITH ce AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part pt ON pt.p_partkey = l.l_partkey
        WHERE pt.p_brand = 'Brand#23'
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p
    )"""

_KCORE_SQL_STAGE = """,
    d{i} AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM e{prev}
              UNION ALL SELECT v FROM e{prev})
        GROUP BY node
    ),
    k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= 3),
    e{i} AS MATERIALIZED (
        SELECT e.u, e.v FROM e{prev} e
        JOIN k{i} ku ON ku.node = e.u
        JOIN k{i} kv ON kv.node = e.v
    ),
    s{i} AS (
        SELECT CAST({i} AS BIGINT) AS it,
               (SELECT CAST(count(DISTINCT node) AS BIGINT)
                FROM (SELECT u AS node FROM e{i}
                      UNION ALL SELECT v FROM e{i}))
                   AS nodes_remaining,
               (SELECT CAST(count(*) AS BIGINT) FROM e{i})
                   AS edges_remaining
    )"""


@register(
    "graph_clustering_local",
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
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM pe e1
        JOIN pe e2 ON e2.u = e1.v
        JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tnode AS (
        SELECT node, CAST(count(*) AS BIGINT) AS t
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM pe UNION ALL SELECT v FROM pe)
        GROUP BY node
    )
    SELECT deg.node, deg.d AS degree,
           CAST(coalesce(tnode.t, 0) AS BIGINT) AS triangles,
           round(2.0 * coalesce(tnode.t, 0) / (deg.d * (deg.d - 1)), 6)
               AS coeff
    FROM deg LEFT JOIN tnode USING (node)
    WHERE deg.d >= 2
    ORDER BY node
    """,
    tags=("graph",),
)
def graph_clustering_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node (local) clustering coefficients (Watts & Strogatz
    1998): C_i = 2·t_i/(d_i(d_i−1)) over the Brand#23 co-purchase
    projection (the graph_clustering_global fixture — brand scoping
    keeps it sparse). Triangles come from the oriented u<v<w
    three-edge join, each triangle exploded to its three corners and
    counted per node — t_i and d_i exact int64s; the coefficient is
    one display division; round-6 is tie-free because a consecutive-
    integer product d(d−1) is of the form 2^a·5^b only for d∈{2,5},
    and those expansions (2t/2, 2t/20) terminate before the 7th digit,
    so no half-tie can land on the rounding boundary. Nodes of degree < 2 (C
    undefined) are excluded; zero-triangle nodes report C = 0.

    Scale shape: the projection is a customer-keyed equi-join; the
    oriented triangle join touches each wedge once (the standard
    sparse-graph enumeration — degree-ordered orientation bounds the
    join fan-out by arboricity); per-node reduces end it."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session
    # (the stage is already checkpointed).
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    pe = _cp_pairs.select("u", "v")
    e1 = pe.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = pe.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = pe.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    tnode = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    deg = (
        pe.select(F.col("u").alias("node"))
        .unionAll(pe.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return (
        deg.join(tnode, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0))
            .cast("long")
            .alias("triangles"),
            F.round(
                2.0
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("coeff"),
        )
        .orderBy("node")
    )


@register(
    "graph_kcore_peel",
    _KCORE_SQL_PREFIX
    + "".join(
        _KCORE_SQL_STAGE.format(i=i, prev=i - 1) for i in range(1, 9)
    )
    + "\n    "
    + " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, 9))
    + "\n    ORDER BY it",
    tags=("graph",),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-core peeling (Seidman 1983, "Network structure and
    minimum degree"): iteratively delete nodes of degree < 3 from
    the Brand#23 co-purchase projection, EIGHT unrolled rounds, and
    report survivors per round — the degeneracy-ordering primitive
    under community detection and dense-subgraph mining. Both
    engines run the SAME fixed eight iterations (the oracle unrolls
    them as chained CTEs), so results match even when the peel has
    not reached its fixpoint — the iteration count is part of the
    operator contract, the standard bounded-unrolling device for
    iterative algorithms on engines without native recursion
    (graph_pagerank's fixed-iteration precedent). All counts exact.

    Scale shape: each round is a keyed degree reduce + two semi-join
    prunes of the edge list — the same shuffles a billion-edge
    k-core takes per round; Spark's round-boundary localCheckpoint
    keeps lineage flat (at cluster scale: checkpoint to storage)."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session
    # (the stage is already checkpointed).
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    edges = _cp_pairs.select("u", "v")
    out = []
    prev = (-1, -1)
    for it in range(1, 9):
        if out and (out[-1][1], out[-1][2]) == prev and it > 1:
            # fixpoint: a peel round that removed nothing stays
            # removed-nothing forever (degree pruning is monotone) —
            # replicate the converged counts without more Spark jobs
            out.append((it, out[-1][1], out[-1][2]))
            continue
        prev = (out[-1][1], out[-1][2]) if out else (-1, -1)
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.filter(F.col("d") >= 3).select("node")
        edges = (
            edges.join(
                keep.withColumnRenamed("node", "u"), "u", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        row = (
            edges.select(
                F.explode(F.array("u", "v")).alias("node")
            )
            .agg(
                F.count_distinct("node").alias("nodes"),
                (F.count(F.lit(1)) / 2).cast("long").alias("edges"),
            )
            .collect()[0]
        )
        out.append((it, row["nodes"], row["edges"]))
    return spark.createDataFrame(
        out, "it bigint, nodes_remaining bigint, edges_remaining bigint"
    ).orderBy("it")


@register(
    "ts_cusum_squares",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS dollars
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, dollars,
               row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS n,
               sum(dollars) OVER () AS tot
        FROM daily
    ),
    e AS (
        SELECT day, t, n,
               CAST(CAST(n AS BIGINT) * dollars - tot AS HUGEINT)
                   * (CAST(n AS BIGINT) * dollars - tot) AS e2
        FROM seq
    ),
    c AS (
        SELECT day, t, n,
               CAST(sum(e2) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS HUGEINT) AS p,
               CAST(sum(e2) OVER () AS HUGEINT) AS g
        FROM e
    ),
    dev AS (
        SELECT day, t, n,
               abs(CAST(n AS HUGEINT) * p - CAST(t AS HUGEINT) * g)
                   AS adev, g
        FROM c
    ),
    s AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(max(adev) AS HUGEINT) AS m,
               CAST(max(g) AS HUGEINT) AS g
        FROM dev
    ),
    cp AS (
        SELECT min(day) AS break_day
        FROM dev WHERE adev = (SELECT max(adev) FROM dev)
    )
    SELECT s.n AS n_days,
           round(CAST(m AS DOUBLE) * sqrt(CAST(s.n AS DOUBLE))
                 / (CAST(s.n AS DOUBLE) * CAST(g AS DOUBLE)), 4)
               AS stat_sqrt_n,
           strftime(cp.break_day, '%Y-%m-%d') AS break_day,
           625.0 * s.n * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
               > 1156.0 * (CAST(s.n AS DOUBLE) * CAST(g AS DOUBLE))
                 * (CAST(s.n AS DOUBLE) * CAST(g AS DOUBLE))
               AS unstable_variance
    FROM s, cp
    """,
    tags=("timeseries", "stats"),
)
def ts_cusum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM-of-squares test for variance instability (Brown, Durbin
    & Evans 1975): C_t = Σ_(i≤t)e_i²/Σe_i² should climb the diagonal
    t/n under stable variance; the statistic is max|C_t − t/n|,
    compared against the Brownian-bridge asymptotic 5% band 1.36/√n
    (1.36 = 34/25, the Kolmogorov sup-norm constant — the honest
    large-n approximation, shared textually). With the n-scaled
    residuals ẽ = n·y − T the squared terms ẽ² and their prefix sums
    P_t stay exact in DECIMAL(38)/HUGEINT, and C_t − t/n =
    (n·P_t − t·G)/(n·G) makes the deviations |n·P_t − t·G| exact
    integers — the argmax day is an exact integer argmax (earliest
    on ties). M² would need ~n⁶·C⁴ digits, so the verdict
    625·n·M² > 1156·(n·G)² runs on doubles cast from the exact
    integers in one fixed textual order (the agg_oneway_anova
    device — bit-identical on both engines); the displayed
    √n-normalized statistic is a single fixed-form division.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, prefix windows over that bounded axis, a 1-row reduce
    and a broadcast argmax join."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("dollars")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("day")
    w_pfx = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    seq = daily.select(
        "day",
        "dollars",
        F.row_number().over(w_ord).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("dollars").over(w_all).alias("tot"),
    )
    ee = (F.col("n") * F.col("dollars") - F.col("tot")).cast(
        "decimal(38,0)"
    )
    e = seq.select("day", "t", "n", (ee * ee).alias("e2"))
    c = e.select(
        "day",
        "t",
        "n",
        F.sum("e2").over(w_pfx).alias("p"),
        F.sum("e2").over(Window.partitionBy()).alias("g"),
    )
    dev = c.select(
        "day",
        "n",
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("p")
            - F.col("t").cast("decimal(38,0)") * F.col("g")
        ).alias("adev"),
        "g",
    )
    s = dev.agg(
        F.max("n").cast("long").alias("n"),
        F.max("adev").alias("m"),
        F.max("g").alias("g"),
    )
    cp = (
        dev.crossJoin(F.broadcast(s.select(F.col("m").alias("mx"))))
        .filter(F.col("adev") == F.col("mx"))
        .agg(F.min("day").alias("bd"))
    )
    n, m, g = F.col("n"), F.col("m"), F.col("g")
    return (
        s.crossJoin(F.broadcast(cp))
        .select(
            n.alias("n_days"),
            F.round(
                m.cast("double")
                * F.sqrt(n.cast("double"))
                / (n.cast("double") * g.cast("double")),
                4,
            ).alias("stat_sqrt_n"),
            F.date_format("bd", "yyyy-MM-dd").alias("break_day"),
            (
                625.0 * n * m.cast("double") * m.cast("double")
                > 1156.0
                * (n.cast("double") * g.cast("double"))
                * (n.cast("double") * g.cast("double"))
            ).alias("unstable_variance"),
        )
    )


@register(
    "agg_bws_test",
    """
    WITH daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT smp,
               CAST(row_number() OVER (ORDER BY cents, smp, day)
                    AS BIGINT) AS r,
               CAST(row_number() OVER (PARTITION BY smp
                                       ORDER BY cents, day)
                    AS BIGINT) AS i,
               CAST(count(*) OVER (PARTITION BY smp) AS BIGINT) AS ni,
               CAST(count(*) OVER () AS BIGINT) AS nn
        FROM daily
    ),
    b AS (
        SELECT smp,
               CAST(sum(CAST(
                   ((ni * r - nn * i) * (ni * r - nn * i) * 1000)
                   // (i * (ni + 1 - i))
               AS HUGEINT)) AS HUGEINT) AS t,
               CAST(max(ni) AS BIGINT) AS ni,
               CAST(max(nn) AS BIGINT) AS nn
        FROM rc GROUP BY smp
    ),
    piv AS (
        SELECT max(CASE WHEN smp = 1 THEN t END) AS tx,
               max(CASE WHEN smp = 1 THEN ni END) AS n1,
               max(CASE WHEN smp = 2 THEN t END) AS ty,
               max(CASE WHEN smp = 2 THEN ni END) AS n2,
               max(nn) AS nn
        FROM b
    ),
    fin AS (
        SELECT n1, n2,
               CAST((n1 + 1) * (n1 + 1) * n2 AS HUGEINT) * tx
               + CAST((n2 + 1) * (n2 + 1) * n1 AS HUGEINT) * ty
                   AS numer,
               CAST(n1 * n1 AS HUGEINT) * (n2 * n2) * nn * 2000
                   AS denom
        FROM piv
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           CAST(CAST(numer AS DOUBLE) / CAST(denom AS DOUBLE) AS REAL)
               AS b_stat,
           1000 * numer > 2493 * denom AS significant
    FROM fin
    """,
    tags=("agg", "stats"),
)
def agg_bws_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baumgartner-Weiß-Schindler two-sample rank test (1998): a
    Cramér-von-Mises-style statistic that weights each rank gap by
    the inverse of its null variance, concentrating power in the
    tails where KS and CvM are weak: B_X = (1/n1)·Σ_i
    (R_i − N·i/n1)² / [(i/(n1+1))(1−i/(n1+1))·n2·N/n1], B =
    (B_X + B_Y)/2, rejecting at 5% when B > 2.493 (the paper's
    asymptotic critical value, shared textually). Ranks are strict
    row_numbers with the (cents, smp, day) tiebreak — the BWS
    no-ties assumption adapted to discrete data the same way on
    both engines. Per-term variance weights make the sum a rational
    with IRREDUCIBLE per-i denominators i·(ni+1−i) — no common
    denominator fits an integer type — so (since round 11, replacing
    a float32-absorbed double sum the round-10 verdict flagged as
    drift-risky) each term is QUANTIZED to an exact integer in
    milli-units BEFORE summation: clearing fractions, t_i =
    (ni·R−nn·i)²·(ni+1)² / (ni·i·(ni+1−i)·n₂·nn) and B_smp = Σt/ni,
    so with T = Σ_i ((ni·R−nn·i)²·1000) div (i·(ni+1−i)) — every
    factor int64-bounded on the calendar-bounded frame: ni·R ≤
    2400·4800, squared·1000 ≈ 1.3e17 — the combined statistic is
    the EXACT integer ratio B = numer/denom with numer =
    (n1+1)²·n2·T_X + (n2+1)²·n1·T_Y and denom = 2000·nn·n1²·n2²
    (DECIMAL(38)/HUGEINT, worst case ~1e33). Summation order cannot
    matter: integer addition is associative. The verdict is the
    pure-integer comparison 1000·numer > 2493·denom (2.493 =
    2493/1000 cleared); b_stat displays as REAL of one double
    division of the two exact integers. Quantization bias: each
    floor loses < 1 milli-unit, ≤ ni terms, deflating B by
    ≤ (n+1)²/(n²·n₂·nn·1000)·n ≈ 2e-7 — at the verdict boundary
    that is an inherent ±2e-7 band around 2.493, far narrower than
    the float32 display ulp and identical on both engines (floor
    division of equal integers), so the decision is deterministic
    everywhere, not merely off-boundary.

    Scale shape: the agg_brunner_munzel shape — one keyed reduce to
    ≤2·days rows, bounded-axis rank windows, a 2-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("smp"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    rc = daily.select(
        "smp",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .cast("long")
        .alias("r"),
        F.row_number()
        .over(Window.partitionBy("smp").orderBy("cents", "day"))
        .cast("long")
        .alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("smp"))
        .cast("long")
        .alias("ni"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("nn"),
    )
    term = F.expr(
        "((ni * r - nn * i) * (ni * r - nn * i) * 1000)"
        " div (i * (ni + 1 - i))"
    )
    b = rc.groupBy("smp").agg(
        F.sum(term.cast("decimal(38,0)")).alias("t"),
        F.max("ni").cast("long").alias("ni"),
        F.max("nn").cast("long").alias("nn"),
    )
    piv = b.agg(
        F.max(F.when(F.col("smp") == 1, F.col("t"))).alias("tx"),
        F.max(F.when(F.col("smp") == 1, F.col("ni"))).alias("n1"),
        F.max(F.when(F.col("smp") == 2, F.col("t"))).alias("ty"),
        F.max(F.when(F.col("smp") == 2, F.col("ni"))).alias("n2"),
        F.max("nn").alias("nn"),
    )
    n1, n2, nn = F.col("n1"), F.col("n2"), F.col("nn")
    fin = piv.select(
        "n1",
        "n2",
        (
            ((n1 + 1) * (n1 + 1) * n2).cast("decimal(38,0)")
            * F.col("tx")
            + ((n2 + 1) * (n2 + 1) * n1).cast("decimal(38,0)")
            * F.col("ty")
        ).alias("numer"),
        ((n1 * n1).cast("decimal(38,0)") * (n2 * n2) * nn * 2000).alias(
            "denom"
        ),
    )
    return fin.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        (F.col("numer").cast("double") / F.col("denom").cast("double"))
        .cast("float")
        .alias("b_stat"),
        (1000 * F.col("numer") > 2493 * F.col("denom")).alias(
            "significant"
        ),
    )
