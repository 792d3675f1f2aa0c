"""§2 extensions, eighty-first wave — graph-based keyword extraction,
lagged-predictability testing, inventory fractiles, and robust
location (published-method cadence).

- llm_textrank_keywords: TextRank (Mihalcea & Tarau 2004) — integer
  PageRank over the token-adjacency graph, top-20 keywords.
- ts_granger_1lag: Granger causality at lag 1 (Granger 1969) — does
  URGENT daily revenue predict LOW daily revenue beyond LOW's own
  lag?
- orders_newsvendor: the newsvendor critical fractile (Arrow,
  Harris & Marschak 1951) — the 75% service-level stocking quantile
  of daily demand per priority, as an exact order statistic.
- agg_winsorized_mean: the 10% winsorized mean and spread (Tukey &
  McLaughlin 1963 / Dixon 1960) of customer spend — clamp, don't
  drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_TR_SCALE = 1_000_000_000
_TR_ITERS = 6
# χ²₁ upper-5% (Granger verdict, 1 restriction at large df)
_CHI2_1_95 = "3.841459"

_TR_EDGES_SQL = """
    SELECT src, dst, CAST(count(*) AS BIGINT) AS w
    FROM (
        SELECT CASE WHEN prev < term THEN prev ELSE term END AS src,
               CASE WHEN prev < term THEN term ELSE prev END AS dst
        FROM (
            SELECT toks[i - 1] AS prev, toks[i] AS term
            FROM (
                SELECT toks, unnest(range(2, len(toks) + 1)) AS i
                FROM (SELECT string_split(text, ' ') AS toks
                      FROM documents)
            )
        ) WHERE prev <> term
    ) GROUP BY src, dst
"""


def _textrank_oracle() -> str:
    """Unrolled K-iteration integer PageRank over the UNDIRECTED
    token-adjacency graph (each edge contributes both directions)."""
    parts = [
        f"WITH e1 AS MATERIALIZED ({_TR_EDGES_SQL}),",
        "edges AS MATERIALIZED ("
        "SELECT src, dst, w FROM e1 "
        "UNION ALL SELECT dst AS src, src AS dst, w FROM e1),",
        "outdeg AS MATERIALIZED "
        "(SELECT src, CAST(sum(w) AS BIGINT) AS wtot "
        "FROM edges GROUP BY src),",
        "nodes AS MATERIALIZED "
        "(SELECT DISTINCT src AS node FROM edges),",
        "nn AS (SELECT count(*) AS n FROM nodes),",
        f"pr0 AS (SELECT node, {_TR_SCALE} // (SELECT n FROM nn)"
        " AS rank FROM nodes),",
    ]
    for i in range(1, _TR_ITERS + 1):
        parts.append(
            f"pr{i} AS MATERIALIZED (SELECT n.node, "
            f"(150 * ({_TR_SCALE} // (SELECT n FROM nn))) // 1000 "
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
        f"SELECT node AS term, CAST(rank AS BIGINT) AS rank_units "
        f"FROM pr{_TR_ITERS} ORDER BY rank DESC, term LIMIT 20"
    )
    return "\n".join(parts)


@register(
    "llm_textrank_keywords", _textrank_oracle(), tags=("llm", "graph")
)
def llm_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): integer
    PageRank (damping 0.85, 6 fixed iterations — the graph_pagerank
    BIGINT micro-unit device, bit-identical across engines and
    partition orders) over the token-adjacency graph: tokens linked
    when adjacent in a document (window 1; self-loops dropped),
    undirected by emitting both directions, edge weight = corpus
    co-occurrence count. Returns the top-20 keywords by rank — what
    the published method feeds summarizers. The oracle unrolls the
    same 6 updates as materialized chained CTEs.

    Scale shape: per-iteration edges ⋈ ranks (ranks is |vocab| rows)
    → keyed sum — one shuffle over the edge table per iteration,
    nothing collected; K fixed. Top-20 is a TakeOrdered."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    w_adj = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select(
            "term", F.lag("term").over(w_adj).alias("prev")
        )
        .where(
            F.col("prev").isNotNull() & (F.col("prev") != F.col("term"))
        )
        .select(
            F.least("prev", "term").alias("src"),
            F.greatest("prev", "term").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = (
        pairs.unionAll(
            pairs.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("wtot")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    base = _TR_SCALE // n_nodes
    teleport = (150 * base) // 1000
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    for _ in range(_TR_ITERS):
        contrib = (
            edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.expr("(850 * w * rank) div (1000 * wtot)")
                )
                .cast("long")
                .alias("contrib")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.coalesce(F.col("contrib"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(20)
        .select(F.col("node").alias("term"), F.col("rank").alias("rank_units"))
    )


@register(
    "ts_granger_1lag",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(floor(o_totalprice) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                    THEN CAST(floor(o_totalprice) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1
    ),
    lagged AS (
        SELECT y AS yt,
               lag(y) OVER (ORDER BY day) AS z1,
               lag(x) OVER (ORDER BY day) AS z2
        FROM daily
    ),
    obs AS (
        SELECT yt, z1, z2 FROM lagged
        WHERE z1 IS NOT NULL AND z2 IS NOT NULL
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yt) AS BIGINT) AS sy,
               CAST(sum(z1) AS BIGINT) AS s1,
               CAST(sum(z2) AS BIGINT) AS s2,
               CAST(sum(CAST(yt AS HUGEINT) * yt) AS HUGEINT) AS syy,
               CAST(sum(CAST(z1 AS HUGEINT) * z1) AS HUGEINT) AS s11,
               CAST(sum(CAST(z2 AS HUGEINT) * z2) AS HUGEINT) AS s22,
               CAST(sum(CAST(z1 AS HUGEINT) * z2) AS HUGEINT) AS s12,
               CAST(sum(CAST(z1 AS HUGEINT) * yt) AS HUGEINT) AS s1y,
               CAST(sum(CAST(z2 AS HUGEINT) * yt) AS HUGEINT) AS s2y
        FROM obs
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy,
               CAST(CAST(n AS HUGEINT) * s11
                    - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS c11,
               CAST(CAST(n AS HUGEINT) * s22
                    - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) AS c22,
               CAST(CAST(n AS HUGEINT) * s12
                    - CAST(s1 AS HUGEINT) * s2 AS DOUBLE) AS c12,
               CAST(CAST(n AS HUGEINT) * s1y
                    - CAST(s1 AS HUGEINT) * sy AS DOUBLE) AS c1y,
               CAST(CAST(n AS HUGEINT) * s2y
                    - CAST(s2 AS HUGEINT) * sy AS DOUBLE) AS c2y
        FROM m
    ),
    r AS (
        SELECT n,
               cyy - c1y * c1y / c11 AS rss_r,
               cyy - (c1y * c1y * c22 - 2 * c1y * c2y * c12
                      + c2y * c2y * c11) / (c11 * c22 - c12 * c12)
                   AS rss_u
        FROM c
    )
    SELECT n AS n_obs,
           round((rss_r - rss_u) * (n - 3) / rss_u, 4) AS f_stat,
           (rss_r - rss_u) * (n - 3)
               > {_CHI2_1_95} * rss_u AS x_granger_causes_y
    FROM r
    """,
    tags=("timeseries", "stats"),
)
def ts_granger_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 (Granger 1969): does URGENT daily
    revenue (x) predict LOW daily revenue (y) beyond y's own lag?
    Restricted model y_t ~ y_(t−1); unrestricted adds x_(t−1);
    F = (RSS_r − RSS_u)·(n−3)/RSS_u with one restriction, compared
    against the shared χ²₁ literal (F(1,∞) form — the finite-df
    correction is below the literal's resolution at thousands of
    days). The nine raw moment sums are exact integers (DECIMAL(38)/
    HUGEINT for the cross-products); the centered moments
    C_ab = n·Σab − Σa·Σb stay exact and cast once to double; both
    RSS values and the verdict assemble in ONE fixed textual order
    (the agg_oneway_anova device — bit-identical doubles on both
    engines). RSS_u uses the closed-form two-regressor projection
    (C1y²C22 − 2·C1yC2yC12 + C2y²C11)/(C11C22 − C12²). Lags run on
    the day-ordered series; days missing a priority enter at 0 (the
    daily grid is the series).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, lag windows over that bounded axis, a 1-row moment
    reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.floor("o_totalprice").cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "5-LOW",
                    F.floor("o_totalprice").cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("y"),
        )
    )
    w_ord = Window.orderBy("day")
    obs = (
        daily.select(
            F.col("y").alias("yt"),
            F.lag("y").over(w_ord).alias("z1"),
            F.lag("x").over(w_ord).alias("z2"),
        )
        .where(F.col("z1").isNotNull() & F.col("z2").isNotNull())
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yt").cast("long").alias("sy"),
        F.sum("z1").cast("long").alias("s1"),
        F.sum("z2").cast("long").alias("s2"),
        F.sum(d38("yt") * F.col("yt")).alias("syy"),
        F.sum(d38("z1") * F.col("z1")).alias("s11"),
        F.sum(d38("z2") * F.col("z2")).alias("s22"),
        F.sum(d38("z1") * F.col("z2")).alias("s12"),
        F.sum(d38("z1") * F.col("yt")).alias("s1y"),
        F.sum(d38("z2") * F.col("yt")).alias("s2y"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")

    def cc(sab, sa, sb):
        return (
            n38 * F.col(sab)
            - F.col(sa).cast("decimal(38,0)") * F.col(sb)
        ).cast("double")

    c = m.select(
        "n",
        cc("syy", "sy", "sy").alias("cyy"),
        cc("s11", "s1", "s1").alias("c11"),
        cc("s22", "s2", "s2").alias("c22"),
        cc("s12", "s1", "s2").alias("c12"),
        cc("s1y", "s1", "sy").alias("c1y"),
        cc("s2y", "s2", "sy").alias("c2y"),
    )
    cyy, c11, c22 = F.col("cyy"), F.col("c11"), F.col("c22")
    c12, c1y, c2y = F.col("c12"), F.col("c1y"), F.col("c2y")
    rss_r = cyy - c1y * c1y / c11
    rss_u = cyy - (
        c1y * c1y * c22 - 2 * c1y * c2y * c12 + c2y * c2y * c11
    ) / (c11 * c22 - c12 * c12)
    return c.select(
        n.alias("n_obs"),
        F.round((rss_r - rss_u) * (n - 3) / rss_u, 4).alias("f_stat"),
        ((rss_r - rss_u) * (n - 3) > float(_CHI2_1_95) * rss_u).alias(
            "x_granger_causes_y"
        ),
    )


@register(
    "orders_newsvendor",
    """
    WITH demand AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS d
        FROM orders GROUP BY 1, 2
    ),
    rk AS (
        SELECT priority, d,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY d, day) AS r,
               count(*) OVER (PARTITION BY priority) AS n
        FROM demand
    ),
    q AS (
        SELECT priority, CAST(max(n) AS BIGINT) AS n_days,
               CAST(max(CASE WHEN r = (3 * n + 3) // 4 THEN d END)
                    AS BIGINT) AS stock_q75,
               CAST(sum(d) AS BIGINT) AS total
        FROM rk GROUP BY priority
    ),
    u AS (
        SELECT rk.priority,
               CAST(sum(CASE WHEN rk.d > q.stock_q75 THEN 1 ELSE 0 END)
                    AS BIGINT) AS understock_days
        FROM rk JOIN q ON q.priority = rk.priority
        GROUP BY rk.priority
    )
    SELECT q.priority, q.n_days, q.stock_q75,
           round(CAST(q.total AS DOUBLE) / q.n_days, 4) AS mean_demand,
           u.understock_days,
           4 * u.understock_days <= q.n_days AS service_level_met
    FROM q JOIN u USING (priority)
    ORDER BY priority
    """,
    tags=("analytics",),
)
def orders_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The newsvendor critical fractile (Arrow, Harris & Marschak
    1951; the classic single-period inventory result): with
    underage:overage cost 3:1 the optimal stock is the 75% quantile
    of daily demand — the smallest s with F(s) ≥ 3/4, i.e. the
    ⌈3n/4⌉-th order statistic, computed EXACTLY as the rank
    (3n+3)÷4 of the (demand, day)-ordered daily order counts per
    priority. The service check counts days demand exceeded the
    stock: 4·understock ≤ n is the exact integer restatement of
    "≥ 75% of days served". mean_demand is a display-only single
    division.

    Scale shape: one keyed reduce to the (priority × day) grid,
    rank windows over that calendar-bounded axis, grid reduces and
    a 5-row broadcast join."""
    o = tbl(spark, sf_dir, "orders")
    demand = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("d"))
    w_rk = Window.partitionBy("priority").orderBy("d", "day")
    w_n = Window.partitionBy("priority")
    rk = demand.select(
        "priority",
        "d",
        F.row_number().over(w_rk).alias("r"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    q = rk.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_days"),
        F.max(
            F.when(
                F.col("r") == F.expr("(3 * n + 3) div 4"), F.col("d")
            )
        )
        .cast("long")
        .alias("stock_q75"),
        F.sum("d").cast("long").alias("total"),
    )
    u = (
        rk.join(F.broadcast(q.select("priority", "stock_q75")), "priority")
        .groupBy("priority")
        .agg(
            F.sum(
                F.when(F.col("d") > F.col("stock_q75"), 1).otherwise(0)
            )
            .cast("long")
            .alias("understock_days")
        )
    )
    return (
        q.join(u, "priority")
        .select(
            "priority",
            "n_days",
            "stock_q75",
            F.round(
                F.col("total").cast("double") / F.col("n_days"), 4
            ).alias("mean_demand"),
            "understock_days",
            (4 * F.col("understock_days") <= F.col("n_days")).alias(
                "service_level_met"
            ),
        )
        .orderBy("priority")
    )


@register(
    "agg_winsorized_mean",
    """
    WITH spend AS (
        SELECT c.c_custkey,
               CAST(coalesce(sum(CAST(CAST(o.o_totalprice
                        AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    rk AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, c_custkey) AS r,
               count(*) OVER () AS n
        FROM spend
    ),
    cut AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(max(CASE WHEN r = n // 10 + 1 THEN cents END)
                    AS BIGINT) AS lo,
               CAST(max(CASE WHEN r = n - n // 10 THEN cents END)
                    AS BIGINT) AS hi
        FROM rk
    ),
    s AS (
        SELECT cut.n, cut.lo, cut.hi,
               CAST(sum(CASE WHEN rk.cents < cut.lo THEN cut.lo
                             WHEN rk.cents > cut.hi THEN cut.hi
                             ELSE rk.cents END) AS BIGINT) AS wsum,
               CAST(sum(rk.cents) AS BIGINT) AS rsum
        FROM rk CROSS JOIN cut
        GROUP BY cut.n, cut.lo, cut.hi
    )
    SELECT n AS n_customers, lo AS lo_clamp_cents, hi AS hi_clamp_cents,
           round(CAST(wsum AS DOUBLE) / n, 4) AS winsorized_mean_cents,
           round(CAST(rsum AS DOUBLE) / n, 4) AS raw_mean_cents,
           wsum < rsum AS right_tail_dominates
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10% winsorized mean of customer spend (Tukey & McLaughlin
    1963; Dixon 1960): CLAMP the bottom and top deciles to the
    decile-boundary order statistics instead of dropping them (the
    agg_trimmed_mean sibling — winsorizing keeps n and downweights
    rather than censors). Cutoffs are the exact rank n÷10+1 and
    n−n÷10 order statistics; the clamped sum is an exact integer, so
    the headline flag wsum < rsum ("the right tail dominates" —
    winsorizing pulls the mean DOWN) is an exact comparison, and
    both means are display-only single divisions. Zero-spend
    customers (no orders) participate, anchoring the low clamp.

    Scale shape: one keyed reduce to per-customer spend, the
    block-ranked exact global rank (api core), a 1-row cutoff
    broadcast, one clamped reduce."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum((dec2("o_totalprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("cents")
        )
    )
    ranked = api.exact_global_rank(spend, "cents", "c_custkey", "r")
    nrow = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cut = (
        ranked.crossJoin(F.broadcast(nrow))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(
                F.when(
                    F.col("r") == F.expr("n div 10 + 1"), F.col("cents")
                )
            )
            .cast("long")
            .alias("lo"),
            F.max(
                F.when(
                    F.col("r") == F.expr("n - n div 10"), F.col("cents")
                )
            )
            .cast("long")
            .alias("hi"),
        )
    )
    s = (
        ranked.crossJoin(F.broadcast(cut))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lo").cast("long").alias("lo"),
            F.max("hi").cast("long").alias("hi"),
            F.sum(
                F.when(F.col("cents") < F.col("lo"), F.col("lo"))
                .when(F.col("cents") > F.col("hi"), F.col("hi"))
                .otherwise(F.col("cents"))
            )
            .cast("long")
            .alias("wsum"),
            F.sum("cents").cast("long").alias("rsum"),
        )
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("lo").alias("lo_clamp_cents"),
        F.col("hi").alias("hi_clamp_cents"),
        F.round(F.col("wsum").cast("double") / F.col("n"), 4).alias(
            "winsorized_mean_cents"
        ),
        F.round(F.col("rsum").cast("double") / F.col("n"), 4).alias(
            "raw_mean_cents"
        ),
        (F.col("wsum") < F.col("rsum")).alias("right_tail_dominates"),
    )
