"""§2 extensions, sixty-first wave — graph transitivity, random-walk
testing, stylometric attribution, and market-basket lift.

- graph_clustering_global: the global clustering coefficient
  (transitivity) of the Brand#23 co-purchase projection — 3·triangles
  over connected triples, the one-number "do my neighbors know each
  other" statistic.
- ts_variance_ratio: the Lo–MacKinlay variance-ratio test of each
  event type's daily revenue series — does the series diffuse like a
  random walk (VR ≈ 1) or mean-revert / trend?
- llm_burrows_delta: Burrows's Delta stylometric distance between
  documents sources over the corpus's top-30 terms — the standard
  authorship-attribution measure.
- orders_basket_lift: association-rule lift over part pairs
  co-occurring in the same order — the market-basket "bought
  together" score, exact-count cross-multiplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "graph_clustering_global",
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
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM pe UNION ALL SELECT v FROM pe)
        GROUP BY node
    ),
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS t FROM pe e1
        JOIN pe e2 ON e2.u = e1.v
        JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tr AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS triads
        FROM deg
    )
    SELECT tr.n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pe) AS n_edges,
           tri.t AS triangles, tr.triads,
           round(3.0 * tri.t / tr.triads, 6) AS transitivity
    FROM tr CROSS JOIN tri
    """,
    tags=("graph",),
)
def graph_clustering_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient / transitivity (Newman 2003's
    C = 3·triangles / connected-triples form of Watts & Strogatz
    1998) of the Brand#23 co-purchase projection — parts linked when
    one customer bought both. The brand scoping keeps the projection
    SPARSE (measured: 19.4k edges / 31.9k triangles at sf0.1, vs the
    all-parts projection's near-complete 12.7M-edge graph whose
    transitivity is a degenerate ≈1): the statistic actually
    discriminates, and both engines' triangle enumerations stay
    cheap. Triangles come from api.triangle_count's dictionary-
    encoded bitmap intersection (exact, fuzz-proved vs brute force);
    triads Σd(d−1)/2 from exact int64 degrees; transitivity is the
    single final division. The oracle keeps the plain relational
    e1-e2-e3 triangle join so the two formulations check each other.

    Scale shape: the projection is a customer-keyed equi-join (the
    graph_common_neighbors bound); bitmaps are the dense-small-graph
    specialization (width O(n_nodes), fine to ~100k nodes) — flip to
    the degree-ordered orientation edge join for sparse billion-node
    graphs."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session
    # (the stage is already checkpointed).
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    pe = _cp_pairs.select("u", "v")
    t = api.triangle_count(pe, "u", "v")
    deg = (
        pe.select(F.col("u").alias("node"))
        .unionAll(pe.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias(
            "triads"
        ),
    )
    n_edges = pe.count()
    return stats.select(
        "n_nodes",
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(t).cast("long").alias("triangles"),
        "triads",
        F.round(F.lit(3.0) * t / F.col("triads"), 6).alias("transitivity"),
    )


@register(
    "ts_variance_ratio",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type,
               cents - lag(cents, 1) OVER w AS d1,
               cents - lag(cents, 5) OVER w AS d5
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    s AS (
        SELECT event_type,
               CAST(count(d1) AS BIGINT) AS n1,
               CAST(sum(d1) AS BIGINT) AS s1,
               CAST(sum(d1 * d1) AS BIGINT) AS q1,
               CAST(count(d5) AS BIGINT) AS n5,
               CAST(sum(d5) AS BIGINT) AS s5,
               CAST(sum(d5 * d5) AS BIGINT) AS q5
        FROM lagged GROUP BY event_type
    )
    SELECT event_type, n1, n5,
           round((CAST(n5 AS DOUBLE) * q5 - CAST(s5 AS DOUBLE) * s5)
                 * n1 * n1
                 / (5.0 * n5 * n5
                    * (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)),
                 4) AS vr5
    FROM s ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance-ratio test (Lo & MacKinlay 1988) with
    q = 5 on each event type's daily revenue series: a random walk
    has Var(5-day change) = 5·Var(1-day change), so VR(5) =
    Var(Δ₅)/(5·Var(Δ₁)) ≈ 1; VR < 1 flags mean reversion (shocks die
    out), VR > 1 momentum/trending — the econometric complement of
    ts_runs_test's sign-based randomness check. Both difference
    series are exact int64 (cents minus lagged cents over overlapping
    windows, the published overlapping-q convention), all four
    moment sums are exact, and VR is ONE fixed-order cross-multiplied
    float expression — population variances, mean-adjusted via the
    n·Q − S² form (products peak ~10¹⁷ on this fixture's cents
    scale; promote to DECIMAL(38,0) beyond).

    Scale shape: one keyed daily aggregate, two lag windows per type
    over the calendar-bounded day axis, one per-type reduce."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        (F.col("cents") - F.lag("cents", 1).over(w)).alias("d1"),
        (F.col("cents") - F.lag("cents", 5).over(w)).alias("d5"),
    )
    s = lagged.groupBy("event_type").agg(
        F.count("d1").cast("long").alias("n1"),
        F.sum("d1").cast("long").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).cast("long").alias("q1"),
        F.count("d5").cast("long").alias("n5"),
        F.sum("d5").cast("long").alias("s5"),
        F.sum(F.col("d5") * F.col("d5")).cast("long").alias("q5"),
    )
    num5 = (
        F.col("n5").cast("double") * F.col("q5")
        - F.col("s5").cast("double") * F.col("s5")
    )
    num1 = (
        F.col("n1").cast("double") * F.col("q1")
        - F.col("s1").cast("double") * F.col("s1")
    )
    return s.select(
        "event_type",
        "n1",
        "n5",
        F.round(
            num5
            * F.col("n1")
            * F.col("n1")
            / (5.0 * F.col("n5") * F.col("n5") * num1),
            4,
        ).alias("vr5"),
    ).orderBy("event_type")


@register(
    "llm_burrows_delta",
    """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    top_terms AS (
        SELECT w FROM (
            SELECT w, count(*) AS c FROM toks GROUP BY w
            ORDER BY c DESC, w LIMIT 30
        )
    ),
    src_tot AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tok
        FROM toks GROUP BY source
    ),
    grid AS (SELECT s.source, s.n_tok, t.w FROM src_tot s, top_terms t),
    cnts AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE w IN (SELECT w FROM top_terms)
        GROUP BY 1, 2
    ),
    fscaled AS (
        SELECT g.source, g.w,
               CAST(round(1e8 * COALESCE(c.c, 0) / g.n_tok) AS BIGINT) AS f
        FROM grid g LEFT JOIN cnts c ON c.source = g.source AND c.w = g.w
    ),
    term_stats AS (
        SELECT w,
               CAST(count(*) AS BIGINT) AS ns,
               CAST(sum(f) AS BIGINT) AS sf,
               CAST(sum(f * f) AS BIGINT) AS qf
        FROM fscaled GROUP BY w
    ),
    z AS (
        SELECT fs.source, fs.w,
               ts.ns * fs.f - ts.sf AS znum,
               CAST(ts.ns AS DOUBLE) * ts.qf
                   - CAST(ts.sf AS DOUBLE) * ts.sf AS zden2
        FROM fscaled fs JOIN term_stats ts ON ts.w = fs.w
    ),
    pair_terms AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CASE WHEN a.zden2 > 0 THEN
                   CAST(round(1e6 * abs(CAST(a.znum - b.znum AS DOUBLE))
                              / sqrt(a.zden2)) AS BIGINT)
               ELSE 0 END AS t_scaled
        FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    )
    SELECT src_a, src_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(CAST(sum(t_scaled) AS DOUBLE) / count(*) / 1e6, 4)
               AS delta
    FROM pair_terms GROUP BY 1, 2
    ORDER BY sum(t_scaled), src_a, src_b
    LIMIT 25
    """,
    tags=("llm", "text", "stats"),
)
def llm_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows's Delta stylometric distance (Burrows 2002; Argamon
    2008's formalization as mean |z| difference) between documents
    sources over the corpus's 30 most frequent terms: each source's
    relative frequency of each top term is z-scored ACROSS sources,
    and Delta(a,b) = mean_t |z_a − z_b| — the standard
    authorship-attribution measure; the 25 lowest-Delta pairs are
    the most stylistically alike (near-duplicate source detection by
    STYLE rather than content, complementing llm_source_containment).
    Determinism devices: relative frequencies ship as exact int64
    round(10⁸·c/N) (one fixed-order division each); per-term mean/
    variance are exact integer sums of those; z differences factor as
    (n·f_a − S) − (n·f_b − S) = integer znum deltas over ONE shared
    √(n·Q − S²), each term's contribution ships as the scaled integer
    round(10⁶·|Δz|), so the 30-term sum is order-independent and the
    ranking key is an exact int64; a constant term (zero variance)
    contributes zero by definition. The (source × top-term) grid
    comes from a 1-row collected-array broadcast (the
    ts_resample_gapfill pattern) so missing counts are true zeros.

    Scale shape: explode → keyed counts with map-side combine; the
    grid, term stats and pair join all run on domain-bounded tables
    (30 terms × |sources|², term-keyed equi-joins)."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    top = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(30)
        .select("w")
    )
    src_tot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    top_arr = top.agg(F.collect_list("w").alias("ws"))
    grid = (
        src_tot.crossJoin(F.broadcast(top_arr))
        .select("source", "n_tok", F.explode("ws").alias("w"))
    )
    cnts = (
        toks.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    fscaled = grid.join(cnts, ["source", "w"], "left").select(
        "source",
        "w",
        F.round(
            F.lit(1e8) * F.coalesce(F.col("c"), F.lit(0)) / F.col("n_tok")
        )
        .cast("long")
        .alias("f"),
    )
    ts_ = fscaled.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("f").cast("long").alias("sf"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("qf"),
    )
    z = fscaled.join(ts_, "w").select(
        "source",
        "w",
        (F.col("ns") * F.col("f") - F.col("sf")).alias("znum"),
        (
            F.col("ns").cast("double") * F.col("qf")
            - F.col("sf").cast("double") * F.col("sf")
        ).alias("zden2"),
    )
    za = z.select(
        F.col("w"),
        F.col("source").alias("src_a"),
        F.col("znum").alias("znum_a"),
        F.col("zden2").alias("zden2_a"),
    )
    zb = z.select(
        F.col("w").alias("w_b"),
        F.col("source").alias("src_b"),
        F.col("znum").alias("znum_b"),
    )
    pt = za.join(
        zb,
        (F.col("w") == F.col("w_b")) & (F.col("src_a") < F.col("src_b")),
    ).select(
        "src_a",
        "src_b",
        F.when(
            F.col("zden2_a") > 0,
            F.round(
                F.lit(1e6)
                * F.abs(
                    (F.col("znum_a") - F.col("znum_b")).cast("double")
                )
                / F.sqrt(F.col("zden2_a"))
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("t_scaled"),
    )
    return (
        pt.groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(
                F.sum("t_scaled").cast("double") / F.count(F.lit(1)) / 1e6,
                4,
            ).alias("delta"),
            F.sum("t_scaled").alias("_ord"),
        )
        .orderBy("_ord", "src_a", "src_b")
        .limit(25)
        .drop("_ord")
    )


@register(
    "orders_basket_lift",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (
        SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM items
    ),
    supp AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM items GROUP BY p
    ),
    pairs AS (
        SELECT a.p AS part_a, b.p AS part_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
           round(CAST(n_ab AS DOUBLE) * n.n / (sa.n_p * sb.n_p), 4)
               AS lift
    FROM pairs
    JOIN supp sa ON sa.p = part_a
    JOIN supp sb ON sb.p = part_b
    CROSS JOIN n_orders n
    ORDER BY CAST(n_ab AS DOUBLE) * n.n / (sa.n_p * sb.n_p) DESC,
             part_a, part_b
    LIMIT 20
    """,
    tags=("analytics",),
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift (support/confidence mining per Agrawal,
    Imieliński & Swami 1993; lift per Brin et al. 1997) over part
    pairs co-occurring in the same ORDER: lift = P(a,b)/(P(a)·P(b)) =
    n_ab·N/(n_a·n_b) — how much more often the pair sells together
    than independence predicts, the promotion-bundling complement of
    graph_common_neighbors' customer-level affinity. All supports are
    exact int64 (order-basket pair join, fan-out bounded by the ≤7-
    line basket); minimum support n_ab ≥ 3 applies the standard
    rare-pair noise floor BEFORE lift ranks (a 1-in-the-corpus pair
    would otherwise top every list); the ranking key is one
    fixed-order float expression of exact integers, identical across
    engines, with id tiebreaks.

    Scale shape: order-keyed pair self-join with per-basket bounded
    fan-out, two broadcast support joins, a 1-row N broadcast (the
    ts_resample_gapfill pattern), top-k via TakeOrderedAndProject."""
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = li.agg(F.count_distinct("o").cast("long").alias("n"))
    supp = li.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n_p"))
    a = li.select("o", F.col("p").alias("part_a"))
    b = li.select(F.col("o").alias("o_b"), F.col("p").alias("part_b"))
    pairs = (
        a.join(
            b,
            (F.col("o") == F.col("o_b"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    sa = supp.select(F.col("p").alias("part_a"), F.col("n_p").alias("n_a"))
    sb = supp.select(F.col("p").alias("part_b"), F.col("n_p").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n")
        / (F.col("n_a") * F.col("n_b"))
    )
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .withColumn("lift", F.round(lift, 4))
        .withColumn("_ord", lift)
        .orderBy(F.desc("_ord"), "part_a", "part_b")
        .limit(20)
        .select("part_a", "part_b", "n_ab", "n_a", "n_b", "lift")
    )
