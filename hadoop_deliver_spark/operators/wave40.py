"""§2 extensions, sixty-fourth wave — rich-club ordering, ordinal
complexity, nonparametric changepoints, and candidate-volume
observability.

- graph_rich_club: the rich-club coefficient φ(k) of the Brand#23
  co-purchase projection at four degree thresholds — do the hubs
  preferentially connect to each other?
- ts_permutation_entropy: Bandt–Pompe order-3 permutation entropy of
  each event type's daily revenue series — ordinal-pattern
  complexity from pure integer comparisons.
- events_changepoint_pettitt: the Pettitt nonparametric changepoint
  test per event type — Mann-Whitney-based shift location with exact
  doubled-midrank integer statistics.
- llm_dedup_candidate_stats: the near-dup candidate-stage volumes
  (minhash / simhash / cosine) as a first-class observability query
  — the test_candidate_volume_bounds guard a user can run.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# Pettitt significance: p ≈ 2·exp(−6K²/(n³+n²)) < 0.05 ⟺
# 6·K² > ln(2/0.05)·(n³+n²); ln(40) ships as a literal
_LN40 = math.log(40.0)
# permutation-entropy normalizer ln(3!) shared with the oracle
_LN6 = math.log(6.0)


@register(
    "graph_rich_club",
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
    ks AS (SELECT k FROM (VALUES (2), (4), (8), (16)) t(k)),
    nk AS (
        SELECT k, CAST(count(*) FILTER (d > k) AS BIGINT) AS n_k
        FROM deg CROSS JOIN ks GROUP BY k
    ),
    ek AS (
        SELECT k, CAST(count(*) FILTER (du.d > k AND dv.d > k) AS BIGINT)
                   AS e_k
        FROM pe
        JOIN deg du ON du.node = pe.u
        JOIN deg dv ON dv.node = pe.v
        CROSS JOIN ks GROUP BY k
    )
    SELECT nk.k, nk.n_k, ek.e_k,
           round(2.0 * ek.e_k / (CAST(nk.n_k AS DOUBLE) * (nk.n_k - 1)),
                 6) AS phi
    FROM nk JOIN ek ON ek.k = nk.k
    WHERE nk.n_k > 1
    ORDER BY nk.k
    """,
    tags=("graph",),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004; the density
    convention of Colizza et al. 2006) of the Brand#23 co-purchase
    projection at degree thresholds k ∈ {2,4,8,16}: φ(k) =
    2·E_{>k}/(N_{>k}·(N_{>k}−1)) — the edge density among nodes of
    degree above k. φ rising with k means the hub parts form a
    tightly interlinked "rich club" (bundle promotions compound);
    flat φ means hubs connect mostly OUTWARD (spokes). Same sparse
    brand-scoped projection as graph_clustering_global (the
    all-parts projection is near-complete and φ degenerates to 1).
    Degrees, threshold counts and threshold-filtered edge counts are
    all exact int64 — one float density division per row.

    Scale shape: customer-keyed projection join (the
    graph_common_neighbors bound), one degree aggregate, two
    broadcast degree joins, a 4-row threshold grid broadcast (the
    ts_cross_correlation lag-grid pattern)."""
    # r12: the Brand#23 co-purchase projection comes from the session-
    # memoized co_purchase_graph pair stage (operators.graph) shared by
    # the five Brand#23-scoped graph ops — one pair fan-out per session.
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, _cp_pairs = co_purchase_graph(spark, sf_dir, brand="Brand#23")
    pe = _cp_pairs.select("u", "v")
    deg = (
        pe.select(F.col("u").alias("node"))
        .unionAll(pe.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 4, 8, 16)])).alias("k")
    )
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(F.count_if(F.col("d") > F.col("k")).cast("long").alias("n_k"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ek = (
        pe.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count_if(
                (F.col("du") > F.col("k")) & (F.col("dv") > F.col("k"))
            )
            .cast("long")
            .alias("e_k")
        )
    )
    return (
        nk.join(ek, "k")
        .filter(F.col("n_k") > 1)
        .select(
            "k",
            "n_k",
            "e_k",
            F.round(
                2.0
                * F.col("e_k")
                / (F.col("n_k").cast("double") * (F.col("n_k") - 1)),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


@register(
    "ts_permutation_entropy",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    trip AS (
        SELECT event_type,
               cents AS x0,
               lead(cents, 1) OVER w AS x1,
               lead(cents, 2) OVER w AS x2
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    pat AS (
        SELECT event_type,
               4 * CASE WHEN x0 > x1 THEN 1 ELSE 0 END
               + 2 * CASE WHEN x0 > x2 THEN 1 ELSE 0 END
               + CASE WHEN x1 > x2 THEN 1 ELSE 0 END AS pattern
        FROM trip WHERE x2 IS NOT NULL
    ),
    cnt AS (
        SELECT event_type, pattern, CAST(count(*) AS BIGINT) AS c
        FROM pat GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cnt
        GROUP BY event_type
    ),
    terms AS (
        SELECT c.event_type, t.n,
               CAST(round(1e9 * c.c * ln(CAST(t.n AS DOUBLE) / c.c) / t.n)
                    AS BIGINT) AS h_scaled
        FROM cnt c JOIN tot t ON t.event_type = c.event_type
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_triples,
           CAST(count(*) AS BIGINT) AS n_patterns,
           round(CAST(sum(h_scaled) AS DOUBLE) / 1e9, 4) AS perm_entropy,
           round(CAST(sum(h_scaled) AS DOUBLE) / 1e9 / {_LN6!r}, 4)
               AS normalized
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy of order 3 (Bandt & Pompe 2002) of each
    event type's daily revenue series: slide a 3-day window, reduce
    each triple to its ORDINAL pattern (which of the 6 orderings the
    values take — encoded by the three pairwise > comparisons, ties
    resolved toward time order per the standard convention), and
    take the Shannon entropy of the pattern distribution, normalized
    by ln 3! — near 1 means the series' local shapes are as random
    as they can be, low values mean repeated motifs (weekly ramps,
    sawtooth restocking); the ordinal, amplitude-blind complement of
    events_entropy_rate's symbol entropy. Patterns come from pure
    int64 comparisons; counts are exact; each pattern's entropy term
    is one fixed-order float shipped as a scaled integer
    (round(10⁹·(c/n)·ln(n/c))), so the ≤6-term sum is
    order-independent; ln 3! is a shared literal.

    Scale shape: one keyed daily aggregate, two lead windows per
    type over the calendar-bounded day axis, one ≤6-key count."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    trip = daily.select(
        "event_type",
        F.col("cents").alias("x0"),
        F.lead("cents", 1).over(w).alias("x1"),
        F.lead("cents", 2).over(w).alias("x2"),
    ).filter(F.col("x2").isNotNull())
    pattern = (
        4 * F.when(F.col("x0") > F.col("x1"), 1).otherwise(0)
        + 2 * F.when(F.col("x0") > F.col("x2"), 1).otherwise(0)
        + F.when(F.col("x1") > F.col("x2"), 1).otherwise(0)
    )
    cnt = (
        trip.select("event_type", pattern.alias("pattern"))
        .groupBy("event_type", "pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n")
    )
    terms = cnt.join(tot, "event_type").select(
        "event_type",
        "n",
        F.round(
            F.lit(1e9)
            * F.col("c")
            * F.log(F.col("n").cast("double") / F.col("c"))
            / F.col("n")
        )
        .cast("long")
        .alias("h_scaled"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_triples"),
            F.count(F.lit(1)).cast("long").alias("n_patterns"),
            F.round(F.sum("h_scaled").cast("double") / 1e9, 4).alias(
                "perm_entropy"
            ),
            F.round(
                F.sum("h_scaled").cast("double") / 1e9 / _LN6, 4
            ).alias("normalized"),
        )
        .orderBy("event_type")
    )


@register(
    "events_changepoint_pettitt",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    rk AS (
        SELECT event_type, day, c,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS t,
               count(*) OVER (PARTITION BY event_type) AS n,
               2 * rank() OVER (PARTITION BY event_type ORDER BY c)
                   + count(*) OVER (PARTITION BY event_type, c) - 1 AS r2
        FROM daily
    ),
    u AS (
        SELECT event_type, day, t, n,
               CAST(sum(r2) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING)
                    - t * (n + 1) AS BIGINT) AS u_t
        FROM rk
    ),
    k AS (
        SELECT event_type,
               CAST(max(abs(u_t)) FILTER (t < n) AS BIGINT) AS k_stat,
               CAST(max(n) AS BIGINT) AS n
        FROM u GROUP BY event_type
    )
    SELECT k.event_type, k.n AS n_days, k.k_stat,
           strftime(min(u.day), '%Y-%m-%d') AS change_day,
           round(2 * exp(-6.0 * k.k_stat * k.k_stat
                         / (CAST(k.n AS DOUBLE) * k.n * k.n
                            + CAST(k.n AS DOUBLE) * k.n)), 6) AS p_approx,
           6 * k.k_stat * k.k_stat
               > {_LN40!r} * (CAST(k.n AS DOUBLE) * k.n * k.n
                              + CAST(k.n AS DOUBLE) * k.n) AS significant
    FROM k JOIN u ON u.event_type = k.event_type
                 AND abs(u.u_t) = k.k_stat AND u.t < u.n
    GROUP BY k.event_type, k.n, k.k_stat
    ORDER BY k.event_type
    """,
    tags=("analytics", "stats"),
)
def events_changepoint_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt nonparametric changepoint test (Pettitt 1979) on each
    event type's daily counts: U_t = Σ_{{i≤t}}Σ_{{j>t}} sgn(xᵢ − xⱼ)
    peaks where the level shifts; the change day is argmax |U_t| and
    p ≈ 2·exp(−6K²/(n³+n²)) — the rank-based (outlier- and
    distribution-free) complement of ts_cusum_changepoint's
    mean-based scan. Exactness: via the Mann-Whitney identity
    U_t = Σ_{{i≤t}} R_i − t(n+1) with R the DOUBLED midrank
    (2·rank + ties − 1, an exact integer — the agg_mann_whitney
    device), every U_t, the max |U| and the argmax day are pure
    int64; the significance flag cross-multiplies
    6K² > ln(40)·(n³+n²) with ln(40) a shared literal, so it cannot
    drift; only the DISPLAYED p-value is float.

    Scale shape: one keyed daily aggregate, rank/cumsum windows per
    type over the calendar-bounded day axis, one per-type reduce +
    argmax join."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wday = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    wval = Window.partitionBy("event_type").orderBy("c")
    wtie = Window.partitionBy("event_type", "c")
    rk = daily.select(
        "event_type",
        "day",
        F.row_number().over(wday).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
        (
            2 * F.rank().over(wval) + F.count(F.lit(1)).over(wtie) - 1
        ).alias("r2"),
    )
    wcum = wday.rowsBetween(Window.unboundedPreceding, 0)
    u = rk.select(
        "event_type",
        "day",
        "t",
        "n",
        (F.sum("r2").over(wcum) - F.col("t") * (F.col("n") + 1))
        .cast("long")
        .alias("u_t"),
    )
    k = u.filter(F.col("t") < F.col("n")).groupBy("event_type").agg(
        F.max(F.abs("u_t")).cast("long").alias("k_stat"),
        F.max("n").cast("long").alias("n_days"),
    )
    nd = F.col("n_days").cast("double")
    cube = nd * F.col("n_days") * F.col("n_days") + nd * F.col("n_days")
    return (
        k.join(
            u.filter(F.col("t") < F.col("n")).select(
                F.col("event_type").alias("et_u"), "day", F.abs("u_t").alias("au")
            ),
            (F.col("event_type") == F.col("et_u"))
            & (F.col("au") == F.col("k_stat")),
        )
        .groupBy("event_type", "n_days", "k_stat")
        .agg(F.min("day").alias("cd"))
        .select(
            "event_type",
            "n_days",
            "k_stat",
            F.date_format("cd", "yyyy-MM-dd").alias("change_day"),
            F.round(
                2
                * F.exp(
                    -6.0 * F.col("k_stat") * F.col("k_stat") / cube
                ),
                6,
            ).alias("p_approx"),
            (
                6 * F.col("k_stat") * F.col("k_stat") > F.lit(_LN40) * cube
            ).alias("significant"),
        )
        .orderBy("event_type")
    )


@register("llm_dedup_candidate_stats", None)  # rows-only: engine-internal
def llm_dedup_candidate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-stage volume observability for the near-dup cores —
    the test_candidate_volume_bounds scale guard surfaced as a
    first-class query (the llm_sim_ivf_recall precedent: quality/
    cost contracts a user can RUN, not just read in the test suite):
    for each blocking core (MinHash banding, SimHash band blocking,
    cosine principal-axis grid + SOS prefilter) one row with the
    candidate-pair count, the all-pairs denominator, their ratio,
    the calibrated regression bound, and the within-bound flag.
    The ratio IS the 100-TB story — a lossless filter that passes
    50% of all-pairs is an O(n²) shuffle in disguise (the round-6
    verdict measured exactly that failure in the old cosine grid at
    98.1%). Jaccard/containment candidate stages are covered by the
    pytest guard but excluded here: their candidate volume is
    structurally ~43%/70% on this tiny-vocabulary fixture and
    running them doubles the query's cost for a number the bound
    table already documents.

    Rows-only: candidate sets are engine-internal (xxhash64 banding,
    trainer-style axes) with no SQL twin; the flags embed the
    calibrated bounds. All counting is DataFrame aggregation — no
    driver collect."""
    from hadoop_deliver_spark import api

    # r12: the minhash/simhash candidate stages are session-memoized
    # (api._staged_minhash_parts/_staged_simhash_parts, checkpointed
    # candidate lists keyed on the corpus plan + source files), so
    # this query passes the SAME plain table plan the dedup operators
    # pass — in a suite run whichever of them executes first builds
    # the stage once and every other consumer (llm_dedup_minhash,
    # llm_bleu_pairs, llm_rouge_pairs, the cluster-label builder, and
    # this report) scans its checkpoint. The pre-r12 corpus-wide
    # localCheckpoint here is gone: it re-keyed every memo to a fresh
    # RDD plan, defeating exactly that sharing.
    d = tbl(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    _, mc = api._staged_minhash_parts(d, "doc_id", "text", 3, 128, 64)
    # llm_dedup_simhash passes the projected plan — key identically
    sc = api._staged_simhash_parts(d.select("doc_id", "text"), "doc_id", "text", 4)
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    n_emb = emb.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    _, ec = api._staged_cosine_parts(emb, "vec_id", "e", 0.9)

    def row(core: str, cand: DataFrame, nrow: DataFrame, bound: float):
        return (
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
            .crossJoin(F.broadcast(nrow))
            .select(
                F.lit(core).alias("core"),
                "n_items",
                "n_candidates",
                (F.col("n_items") * (F.col("n_items") - 1) / 2)
                .cast("long")
                .alias("n_all_pairs"),
                F.round(
                    F.col("n_candidates")
                    / (F.col("n_items") * (F.col("n_items") - 1) / 2.0),
                    6,
                ).alias("ratio"),
                F.lit(bound).alias("bound"),
                (
                    F.col("n_candidates")
                    <= bound * F.col("n_items") * (F.col("n_items") - 1) / 2
                ).alias("within_bound"),
            )
        )

    return (
        row("minhash_lsh", mc, n_docs, 0.01)
        .unionAll(row("simhash_bands", sc, n_docs, 0.05))
        .unionAll(row("cosine_grid_sos", ec, n_emb, 0.05))
    )
