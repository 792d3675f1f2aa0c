"""§2 extensions, thirty-eighth wave — Markov reach, cohort
migration, information-theoretic dependence.

- events_markov_reach: k-step conversion-reach probabilities from
  the empirical transition matrix — the unrolled Markov-chain core
  of path-based attribution, as chained joins of a 25-cell matrix.
- customers_decile_migration: the decile→decile migration matrix of
  customer spend between two eras (1995-97 vs 1998+) — the BI
  cohort-movement staple — with both decile passes on the exact
  block-ranked ntile core.
- agg_mutual_info: mutual information + entropies + NMI on the
  region×segment contingency table — the information-theoretic
  companion to agg_chi2_independence over the same cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_markov_reach",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    tm AS (
        SELECT event_type AS s, nxt AS t,
               CAST(count(*) AS DOUBLE)
                   / sum(count(*)) OVER (PARTITION BY event_type) AS p
        FROM ordered WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ),
    r1 AS (
        SELECT s, coalesce(CAST(sum(p) FILTER (t = 'purchase') AS DOUBLE),
                           0) AS r
        FROM tm GROUP BY s
    ),
    r2 AS (
        SELECT tm.s,
               sum(tm.p * (CASE WHEN tm.t = 'purchase' THEN 1.0
                                ELSE coalesce(r1.r, 0) END)) AS r
        FROM tm LEFT JOIN r1 ON r1.s = tm.t GROUP BY tm.s
    ),
    r3 AS (
        SELECT tm.s,
               sum(tm.p * (CASE WHEN tm.t = 'purchase' THEN 1.0
                                ELSE coalesce(r2.r, 0) END)) AS r
        FROM tm LEFT JOIN r2 ON r2.s = tm.t GROUP BY tm.s
    ),
    r4 AS (
        SELECT tm.s,
               sum(tm.p * (CASE WHEN tm.t = 'purchase' THEN 1.0
                                ELSE coalesce(r3.r, 0) END)) AS r
        FROM tm LEFT JOIN r3 ON r3.s = tm.t GROUP BY tm.s
    ),
    r5 AS (
        SELECT tm.s,
               sum(tm.p * (CASE WHEN tm.t = 'purchase' THEN 1.0
                                ELSE coalesce(r4.r, 0) END)) AS r
        FROM tm LEFT JOIN r4 ON r4.s = tm.t GROUP BY tm.s
    )
    SELECT r1.s AS state,
           round(r1.r, 4) AS reach_1,
           round(r3.r, 4) AS reach_3,
           round(r5.r, 4) AS reach_5
    FROM r1 JOIN r3 ON r3.s = r1.s JOIN r5 ON r5.s = r1.s
    ORDER BY state
    """,
    tags=("events", "graph"),
)
def events_markov_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-step conversion reach from the empirical Markov chain: the
    probability a user in state s hits 'purchase' within 1/3/5
    transitions, r_k(s) = Σ_t P(s,t)·[t = purchase ? 1 : r_{k−1}(t)]
    — the unrolled absorbing-chain core that Markov path attribution
    (removal-effect models) is built from. The transition matrix
    comes from per-user event successions on the (ts, event_id)
    total order.

    Scale shape: the ONLY fact-sized work is the per-user lead
    window (keyed on user_id) and one transition aggregate. The
    matrix is bounded by |event_type|² (≤ 25 rows at ANY corpus
    scale — a domain bound, not a data bound), so it collects to the
    driver like the allowlisted scalar anchors and the five
    recurrence steps run as a 25-cell Python loop — one fact pass
    total, where the chained-DataFrame spelling re-derived the
    matrix per step. Each r_k sums ≤ |event_type| float terms from
    exact count ratios; rounded for display."""
    e = tbl(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    cnt = ordered.groupBy("event_type", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    wrow = Window.partitionBy("event_type")
    tm_rows = cnt.select(
        F.col("event_type").alias("s"),
        F.col("nxt").alias("t"),
        (F.col("c").cast("double") / F.sum("c").over(wrow)).alias("p"),
    ).collect()
    tm: dict[str, list[tuple[str, float]]] = {}
    for row in tm_rows:
        tm.setdefault(row["s"], []).append((row["t"], row["p"]))
    states = sorted(tm)
    reach: dict[int, dict[str, float]] = {0: {}}
    for k in range(1, 6):
        reach[k] = {
            s: sum(
                p * (1.0 if t == "purchase" else reach[k - 1].get(t, 0.0))
                for t, p in sorted(tm[s])
            )
            for s in states
        }
    import math

    def r4(v: float) -> float:
        # HALF_UP like SQL round(), not Python's banker's rounding
        return math.copysign(math.floor(abs(v) * 1e4 + 0.5), v) / 1e4

    out = [
        (s, r4(reach[1][s]), r4(reach[3][s]), r4(reach[5][s]))
        for s in states
    ]
    return spark.createDataFrame(
        out, "state STRING, reach_1 DOUBLE, reach_3 DOUBLE, reach_5 DOUBLE"
    ).orderBy("state")


@register(
    "customers_decile_migration",
    """
    WITH h AS (
        SELECT o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT))
                    FILTER (o_orderdate < TIMESTAMP '1998-01-01')
                    AS BIGINT) AS spend1,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT))
                    FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
                    AS BIGINT) AS spend2
        FROM orders GROUP BY o_custkey
        HAVING spend1 IS NOT NULL AND spend2 IS NOT NULL
    ),
    d1 AS (
        SELECT o_custkey, ntile(10) OVER (ORDER BY spend1, o_custkey)
                   AS dec1
        FROM h
    ),
    d2 AS (
        SELECT o_custkey, ntile(10) OVER (ORDER BY spend2, o_custkey)
                   AS dec2
        FROM h
    )
    SELECT CAST(dec1 AS BIGINT) AS dec1, CAST(dec2 AS BIGINT) AS dec2,
           count(*) AS n
    FROM d1 JOIN d2 USING (o_custkey)
    GROUP BY 1, 2 ORDER BY dec1, dec2
    """,
    tags=("analytics", "ranking"),
)
def customers_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile→decile migration of customer spend between the
    1995-97 era and 1998+ (customers active in both): the cohort-
    movement matrix a BI deck reads for churn-up/churn-down — heavy
    diagonal = sticky spend, mass below it = decline. Both decile
    assignments run on the block-ranked api.exact_global_ntile core
    (exact ntile semantics, unique customer tiebreak — bit-identical
    to the single-task window at any parallelism), and every spend
    is exact cents.

    Scale shape: one keyed aggregate to per-customer rows, two
    block-ranked ntile passes, one hash self-join on the customer
    key, one ≤100-row matrix aggregate."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    era2 = F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    h = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.when(~era2, cents)).cast("long").alias("spend1"),
            F.sum(F.when(era2, cents)).cast("long").alias("spend2"),
        )
        .where(F.col("spend1").isNotNull() & F.col("spend2").isNotNull())
    )
    d1 = api.exact_global_ntile(h, "spend1", "o_custkey", 10, "dec1").select(
        "o_custkey", "dec1"
    )
    d2 = api.exact_global_ntile(h, "spend2", "o_custkey", 10, "dec2").select(
        "o_custkey", "dec2"
    )
    return (
        d1.join(d2, "o_custkey")
        .groupBy(
            F.col("dec1").cast("long").alias("dec1"),
            F.col("dec2").cast("long").alias("dec2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("dec1", "dec2")
    )


@register(
    "agg_mutual_info",
    """
    WITH cells AS (
        SELECT r.r_name, c.c_mktsegment, count(*) AS nij
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    rt AS (SELECT r_name, CAST(sum(nij) AS BIGINT) AS ri
           FROM cells GROUP BY r_name),
    ct AS (SELECT c_mktsegment, CAST(sum(nij) AS BIGINT) AS cj
           FROM cells GROUP BY c_mktsegment),
    g AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
    s AS (
        SELECT g.n,
               sum((CAST(nij AS DOUBLE) / g.n)
                   * ln(CAST(nij AS DOUBLE) * g.n
                        / (CAST(ri AS DOUBLE) * cj))) AS mi
        FROM cells JOIN rt USING (r_name) JOIN ct USING (c_mktsegment)
        CROSS JOIN g
        GROUP BY g.n
    ),
    hx AS (
        SELECT CAST(-sum((CAST(ri AS DOUBLE) / g.n)
                         * ln(CAST(ri AS DOUBLE) / g.n)) AS DOUBLE) AS h
        FROM rt CROSS JOIN g
    ),
    hy AS (
        SELECT CAST(-sum((CAST(cj AS DOUBLE) / g.n)
                         * ln(CAST(cj AS DOUBLE) / g.n)) AS DOUBLE) AS h
        FROM ct CROSS JOIN g
    )
    SELECT s.n,
           round(s.mi, 4) AS mi,
           round(hx.h, 4) AS h_region,
           round(hy.h, 4) AS h_segment,
           round(s.mi / least(hx.h, hy.h), 4) AS nmi
    FROM s CROSS JOIN hx CROSS JOIN hy
    """,
    tags=("aggregate", "stats"),
)
def agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between region and market segment —
    I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the contingency
    cells — with both marginal entropies and the normalized
    NMI = I/min(H) readout. The information-theoretic companion to
    agg_chi2_independence on the same cells: chi² asks 'is there
    dependence', MI answers 'how many nats of it'. Every probability
    is a ratio of exact integer counts; the ln-sums run over ≤25
    (resp. 5) cells.

    Scale shape: identical to the chi2 plan — one fact-sized keyed
    shuffle to cells (dims broadcast), marginals as re-aggregates of
    cells, 1-row broadcasts for the totals and entropies."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    rt = cells.groupBy("r_name").agg(F.sum("nij").cast("long").alias("ri"))
    ct = cells.groupBy("c_mktsegment").agg(
        F.sum("nij").cast("long").alias("cj")
    )
    g = cells.agg(F.sum("nij").cast("long").alias("n"))
    nij = F.col("nij").cast("double")
    s = (
        cells.join(F.broadcast(rt), "r_name")
        .join(F.broadcast(ct), "c_mktsegment")
        .crossJoin(F.broadcast(g))
        .groupBy("n")
        .agg(
            F.sum(
                (nij / F.col("n"))
                * F.log(
                    nij
                    * F.col("n")
                    / (F.col("ri").cast("double") * F.col("cj"))
                )
            ).alias("mi")
        )
    )
    hx = (
        rt.crossJoin(F.broadcast(g))
        .agg(
            (
                -F.sum(
                    (F.col("ri").cast("double") / F.col("n"))
                    * F.log(F.col("ri").cast("double") / F.col("n"))
                )
            )
            .cast("double")
            .alias("h")
        )
        .select(F.col("h").alias("h_region"))
    )
    hy = (
        ct.crossJoin(F.broadcast(g))
        .agg(
            (
                -F.sum(
                    (F.col("cj").cast("double") / F.col("n"))
                    * F.log(F.col("cj").cast("double") / F.col("n"))
                )
            )
            .cast("double")
            .alias("h")
        )
        .select(F.col("h").alias("h_segment"))
    )
    return (
        s.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.round("mi", 4).alias("mi"),
            F.round("h_region", 4).alias("h_region"),
            F.round("h_segment", 4).alias("h_segment"),
            F.round(
                F.col("mi") / F.least("h_region", "h_segment"), 4
            ).alias("nmi"),
        )
    )
