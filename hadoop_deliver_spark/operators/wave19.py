"""§2 extensions, forty-third wave — k-group rank inference, trend
detection, link analysis, and deterministic sketch sampling.

- agg_kruskal_wallis: the Kruskal-Wallis H test (k-group rank
  ANOVA) on exact doubled midranks from the block-ranked
  api.exact_global_rank core — the k-group generalization of
  agg_mann_whitney.
- ts_mann_kendall: the Mann-Kendall trend test per event-type daily
  series — the standard nonparametric monotone-trend detector, all
  decisions in exact integers.
- graph_hits: Kleinberg's HITS hubs/authorities on the
  customer→part purchase bipartite graph, run a FIXED two rounds in
  exact integer arithmetic (no normalization, so both engines agree
  bit-for-bit and ranking is overflow-safe by a degree bound).
- sample_hash_bottom_k: bottom-k (KMV) sketch sampling per event
  type — md5-ordered deterministic "random" sample that is
  reproducible across engines, reruns, AND corpus partitionings,
  plus the classic (k−1)/h₍ₖ₎ distinct-count estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# the five TPC-H order priorities — the k groups of the rank ANOVA
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _kw_sql_terms() -> str:
    return ",\n".join(
        f"""           CAST(sum(cnt) FILTER (grp = '{p}') AS BIGINT) AS n{i},
           CAST(sum(r2x) FILTER (grp = '{p}') AS BIGINT) AS r{i}"""
        for i, p in enumerate(_PRIORITIES, 1)
    )


@register(
    "agg_kruskal_wallis",
    f"""
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderpriority AS grp,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS rk
        FROM orders
    ),
    byval AS (
        SELECT cents, CAST(min(rk) AS BIGINT) AS mn,
               CAST(max(rk) AS BIGINT) AS mx, count(*) AS c
        FROM o GROUP BY cents
    ),
    pergrp AS (
        SELECT g.grp, g.cnt, g.cnt * (v.mn + v.mx) AS r2x
        FROM (SELECT cents, grp, count(*) AS cnt
              FROM o GROUP BY cents, grp) g
        JOIN byval v USING (cents)
    ),
    ties AS (
        SELECT CAST(sum(c * c * c - c) AS BIGINT) AS t3 FROM byval
    ),
    piv AS (
        SELECT
{_kw_sql_terms()}
        FROM pergrp
    )
    SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS n,
           CAST(4 AS INT) AS df,
           round(
             (3.0 / (CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE)
                     * (n1 + n2 + n3 + n4 + n5 + 1))
              * (CAST(r1 AS DOUBLE) * r1 / n1
                 + CAST(r2 AS DOUBLE) * r2 / n2
                 + CAST(r3 AS DOUBLE) * r3 / n3
                 + CAST(r4 AS DOUBLE) * r4 / n4
                 + CAST(r5 AS DOUBLE) * r5 / n5)
              - 3.0 * (n1 + n2 + n3 + n4 + n5 + 1))
             / (1.0 - CAST(t3 AS DOUBLE)
                      / (CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE)
                         * (n1 + n2 + n3 + n4 + n5)
                         * (n1 + n2 + n3 + n4 + n5)
                         - (n1 + n2 + n3 + n4 + n5))),
             4) AS h_corr
    FROM piv CROSS JOIN ties
    """,
    tags=("aggregate", "stats"),
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (Kruskal & Wallis 1952): does order value
    differ across the five order priorities? The k-group rank ANOVA:
    H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), tie-corrected by
    1 − Σ(t³−t)/(N³−N). Midranks come from the block-ranked
    api.exact_global_rank core exactly as in agg_mann_whitney;
    DOUBLED per-group rank sums (r2x = Σ cnt·(minrank+maxrank), so
    H = 3/(N(N+1))·Σ r2x²/n − 3(N+1)) keep every aggregate an exact
    int64, and the five per-group terms are PIVOTED into one row so
    the final float formula evaluates in a FIXED textual order —
    bit-identical across engines and partitionings, no
    order-dependent float reduce anywhere.

    Scale shape: one block-ranked pass over orders, one aggregate by
    (distinct value × group) — bounded by the price grid — and a
    1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(
        cents.alias("cents"),
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    # per distinct value: min/max global rank (the tie block), then
    # per (value, group): doubled rank-sum contribution cnt·(min+max)
    byval = ranked.groupBy("cents").agg(
        F.min("rk").cast("long").alias("mn"),
        F.max("rk").cast("long").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    pergrp = (
        ranked.groupBy("cents", "grp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(byval), "cents")
        .select(
            "grp",
            "cnt",
            (F.col("cnt") * (F.col("mn") + F.col("mx"))).alias("r2x"),
        )
    )
    piv = pergrp.agg(
        *[
            agg
            for i, p in enumerate(_PRIORITIES, 1)
            for agg in (
                F.sum(F.when(F.col("grp") == p, F.col("cnt")))
                .cast("long")
                .alias(f"n{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("r2x")))
                .cast("long")
                .alias(f"r{i}"),
            )
        ]
    )
    ties = byval.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("t3")
    )
    n = sum(F.col(f"n{i}") for i in range(1, 6))
    h_num = sum(
        F.col(f"r{i}").cast("double") * F.col(f"r{i}") / F.col(f"n{i}")
        for i in range(1, 6)
    )
    nd = n.cast("double")
    h = 3.0 / (nd * (n + 1)) * h_num - 3.0 * (n + 1)
    corr = 1.0 - F.col("t3").cast("double") / (nd * n * n - n)
    return piv.crossJoin(F.broadcast(ties)).select(
        n.cast("long").alias("n"),
        F.lit(4).cast("int").alias("df"),
        F.round(h / corr, 4).alias("h_corr"),
    )


@register(
    "ts_mann_kendall",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1
    ),
    t AS (
        SELECT event_type,
               CAST(sum(tc) AS BIGINT) AS n,
               CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie18
        FROM (SELECT event_type, c, count(*) AS tc
              FROM d GROUP BY event_type, c) x
        GROUP BY event_type
    )
    SELECT s.event_type, t.n, s.s_stat,
           CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie18 AS BIGINT)
               AS var18,
           round(CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   / sqrt((CAST(t.n AS DOUBLE) * (t.n - 1) * (2 * t.n + 5)
                           - t.tie18) / 18)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   / sqrt((CAST(t.n AS DOUBLE) * (t.n - 1) * (2 * t.n + 5)
                           - t.tie18) / 18)
               ELSE 0.0 END, 4) AS z
    FROM s JOIN t USING (event_type)
    ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test (Mann 1945, Kendall 1975) per
    event-type daily count series: S = Σ_{i<j} sign(c_j − c_i) — the
    count of concordant minus discordant day pairs — with the
    tie-corrected variance Var·18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5)
    kept as an exact int64 and the ±1 continuity correction decided
    on the exact integer S. Only the final z touches floats,
    identically ordered on both engines.

    Scale shape: the pairwise join runs on the per-type DAILY
    aggregate — calendar-bounded (≤ days² pairs per type at ANY
    corpus scale), never the fact table, which is reduced by one
    keyed shuffle first."""
    e = tbl(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = d.select("event_type", F.col("day").alias("da"), F.col("c").alias("ca"))
    b = d.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("c").alias("cb"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("da") < F.col("db")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    t = (
        d.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("tc"))
        .groupBy("event_type")
        .agg(
            F.sum("tc").cast("long").alias("n"),
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            )
            .cast("long")
            .alias("tie18"),
        )
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt((nd * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie18")) / 18)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(t, "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie18")
            )
            .cast("long")
            .alias("var18"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_hits",
    """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h1 AS (SELECT c, CAST(count(*) AS BIGINT) AS h FROM edges GROUP BY c),
    a1 AS (
        SELECT e.p, CAST(sum(h1.h) AS BIGINT) AS a
        FROM edges e JOIN h1 USING (c) GROUP BY e.p
    ),
    h2 AS (
        SELECT e.c, CAST(sum(a1.a) AS BIGINT) AS h
        FROM edges e JOIN a1 USING (p) GROUP BY e.c
    ),
    a2 AS (
        SELECT e.p, CAST(sum(h2.h) AS BIGINT) AS a
        FROM edges e JOIN h2 USING (c) GROUP BY e.p
    )
    SELECT * FROM (
        (SELECT 'hub' AS role, CAST(c AS BIGINT) AS node_id, h AS score
         FROM h2 ORDER BY h DESC, c LIMIT 10)
        UNION ALL
        (SELECT 'authority' AS role, CAST(p AS BIGINT) AS node_id,
                a AS score
         FROM a2 ORDER BY a DESC, p LIMIT 10)
    )
    ORDER BY role, score DESC, node_id
    """,
    tags=("graph",),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's HITS (1999) on the customer→part purchase
    bipartite graph: hubs = customers whose baskets concentrate on
    high-authority parts, authorities = parts bought by high-hub
    customers. Run a FIXED two mutual-reinforcement rounds in exact
    INTEGER arithmetic with no per-round normalization — rankings
    are normalization-invariant, the iterate magnitude is bounded by
    (max degree)⁴·|edges| (far inside int64 at any fixture scale),
    and both engines agree bit-for-bit where a float power iteration
    would drift. Top-10 per role with id tiebreak.

    Scale shape: each round is one keyed equi-join + map-side-
    combined aggregate on the deduped edge list; top-k via
    TakeOrderedAndProject. At corpus scale add per-round integer
    RIGHT-SHIFT rescaling (rank-preserving) instead of float
    normalization."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    h1 = edges.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("h"))
    a1 = (
        edges.join(h1, "c")
        .groupBy("p")
        .agg(F.sum("h").cast("long").alias("a"))
    )
    h2 = (
        edges.join(a1, "p")
        .groupBy("c")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    a2 = (
        edges.join(h2, "c")
        .groupBy("p")
        .agg(F.sum("h").cast("long").alias("a"))
    )
    hubs = (
        h2.orderBy(F.col("h").desc(), "c")
        .limit(10)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").cast("long").alias("node_id"),
            F.col("h").alias("score"),
        )
    )
    auths = (
        a2.orderBy(F.col("a").desc(), "p")
        .limit(10)
        .select(
            F.lit("authority").alias("role"),
            F.col("p").cast("long").alias("node_id"),
            F.col("a").alias("score"),
        )
    )
    return hubs.unionAll(auths).orderBy(
        "role", F.col("score").desc(), "node_id"
    )


@register(
    "sample_hash_bottom_k",
    """
    WITH h AS (
        SELECT event_type, event_id,
               md5(CAST(event_id AS VARCHAR)) AS hx,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS pos
        FROM events
    ),
    kept AS (SELECT * FROM h WHERE pos <= 5),
    kth AS (
        SELECT event_type,
               max(CAST(from_hex(substr(hx, 1, 8)) AS BIT)::INT
                   ::BIGINT) AS hk
        FROM kept GROUP BY event_type
    )
    SELECT k.event_type, k.pos, k.event_id,
           CAST(from_hex(substr(k.hx, 1, 8)) AS BIT)::INT::BIGINT AS h32,
           round(4.0 * 4294967296.0 / t.hk, 4) AS kmv_est
    FROM kept k JOIN kth t USING (event_type)
    ORDER BY event_type, pos
    """,
    tags=("sampling", "sketch"),
)
def sample_hash_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) sketch sampling (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD'07): per event type keep the k=5 rows whose
    md5(key) is smallest — a "random" sample that is DETERMINISTIC
    across engines, reruns, and partitionings (the property reservoir
    sampling lacks), mergeable across shards by re-taking the k
    smallest, and consistent: the same keys are picked no matter
    where they live. The kth smallest hash also yields the classic
    KMV distinct-count estimate D̂ = (k−1)·2³²/h₍ₖ₎ (h from the first
    8 hex chars via the cross-engine hex-parse parity device:
    Spark conv(hex,16,10) == DuckDB from_hex::BIT::INT).

    Scale shape (round-8 re-plan, low-cardinality-window guard):
    salted two-phase bottom-k — phase 1 ranks within (type, 16-way
    deterministic hash salt) and keeps ≤ k per cell (lossless: every
    global bottom-k row is within its own cell's bottom-k), phase 2
    re-selects the k smallest of the ≤ 16k survivors per type with a
    bounded collect_list → sort → slice AGGREGATE — no window ever
    partitions on the bare 5-value type key, and the per-type state
    phase 2 holds is 16k structs, not the corpus."""
    e = tbl(spark, sf_dir, "events")
    hx = F.md5(F.col("event_id").cast("string"))
    w1 = Window.partitionBy("event_type", "_salt").orderBy("hx", "event_id")
    survivors = (
        e.select("event_type", "event_id", hx.alias("hx"))
        .withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= 5)
    )
    h = (
        survivors.groupBy("event_type")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("hx", "event_id"))),
                1,
                5,
            ).alias("top")
        )
        .select("event_type", F.posexplode("top").alias("p", "s"))
        .select(
            "event_type",
            (F.col("p") + 1).alias("pos"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.hx").alias("hx"),
        )
        .withColumn(
            "h32", F.conv(F.substring("hx", 1, 8), 16, 10).cast("long")
        )
    )
    kth = h.groupBy("event_type").agg(F.max("h32").alias("hk"))
    return (
        h.join(F.broadcast(kth), "event_type")
        .select(
            "event_type",
            "pos",
            "event_id",
            "h32",
            F.round(F.lit(4.0) * 4294967296.0 / F.col("hk"), 4).alias(
                "kmv_est"
            ),
        )
        .orderBy("event_type", "pos")
    )
