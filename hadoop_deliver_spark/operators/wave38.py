"""§2 extensions, sixty-second wave — mergeable quantile sketching,
vocabulary-richness characteristic, population-stability drift, and
market concentration.

- agg_quantile_sketch: a 256-bucket equi-width mergeable quantile
  sketch of order value with its exact-quantile envelope — estimate,
  truth, error, and the within-one-bucket guarantee, side by side.
- llm_yule_k: Yule's characteristic K vocabulary-repetitiveness
  constant per documents source from exact count-of-count sums.
- dq_psi_drift: the Population Stability Index between early and
  late order-value distributions over 10 fixed bins — the scorecard
  drift monitor.
- agg_hhi: the Herfindahl–Hirschman concentration index of supplier
  revenue within each nation — antitrust's market-power number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_quantile_sketch",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderkey
        FROM orders
    ),
    mm AS (
        SELECT CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
               CAST(count(*) AS BIGINT) AS n,
               CAST((max(v) - min(v) + 256) // 256 AS BIGINT) AS width
        FROM o
    ),
    buckets AS (
        SELECT CAST((v - lo) // width AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM o CROSS JOIN mm GROUP BY 1
    ),
    cum AS (
        SELECT b, c,
               CAST(sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cs
        FROM buckets
    ),
    targets AS (
        SELECT 'p50' AS q, CAST((n + 1) // 2 AS BIGINT) AS r FROM mm
        UNION ALL
        SELECT 'p90', CAST((9 * n + 9) // 10 AS BIGINT) FROM mm
        UNION ALL
        SELECT 'p99', CAST((99 * n + 99) // 100 AS BIGINT) FROM mm
    ),
    est AS (
        SELECT t.q, t.r,
               min(c2.b) AS hit_b
        FROM targets t JOIN cum c2 ON c2.cs >= t.r
        GROUP BY t.q, t.r
    ),
    ranked AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rk FROM o
    )
    SELECT e.q AS quantile, e.r AS target_rank,
           CAST(mm.lo + e.hit_b * mm.width AS DOUBLE)
               + CAST(mm.width AS DOUBLE) / 2 AS estimate,
           CAST(rnk.v AS BIGINT) AS exact,
           abs(CAST(mm.lo + e.hit_b * mm.width AS DOUBLE)
               + CAST(mm.width AS DOUBLE) / 2 - rnk.v) AS abs_err,
           abs(CAST(mm.lo + e.hit_b * mm.width AS DOUBLE)
               + CAST(mm.width AS DOUBLE) / 2 - rnk.v)
               <= CAST(mm.width AS DOUBLE) AS within_bucket
    FROM est e
    JOIN ranked rnk ON rnk.rk = e.r
    CROSS JOIN mm
    ORDER BY quantile
    """,
    tags=("aggregate", "sketch"),
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch with its exact
    envelope (the equi-width estimator of the histogram literature —
    Ioannidis 2003 survey; mergeability per Agarwal et al. 2012's
    framing: bucket counts ADD, so per-partition sketches combine
    losslessly, which is why histogram sketches are the distributed
    quantile workhorse): order values route to 256 equi-width cents
    buckets, p50/p90/p99 are estimated as the midpoint of the first
    bucket whose cumulative count reaches the target rank, and the
    guarantee |estimate − exact| ≤ bucket width is REPORTED as a
    checked column, with the exact type-1 quantile (from the
    block-ranked api.exact_global_rank core) alongside — the
    oracle-checkable twin of the engine-private agg_percentile
    approx_percentile path. Every decision is exact integer
    arithmetic: width = (hi − lo + 256) div 256, bucket = (v − lo)
    div width, target rank = ceil-division, bucket selection by
    integer cumulative-count compare; the only floats are the
    displayed midpoint and error.

    Scale shape: one 256-key aggregate with map-side combine
    (the sketch), a 256-row cumulative window (domain-bounded —
    allowlisted), a 3-row target probe (broadcast), and one
    block-ranked pass for the envelope — at 100 TB you keep the
    sketch and drop the envelope pass."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("v"),
        "o_orderkey",
    )
    mm = base.agg(
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("(max(v) - min(v) + 256) div 256").cast("long").alias(
            "width"
        ),
    )
    buckets = (
        base.crossJoin(F.broadcast(mm))
        .select(F.expr("(v - lo) div width").cast("long").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.withColumn(
        "cs", F.sum("c").over(wcum).cast("long")
    )
    targets = mm.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("q"),
                    F.expr("(n + 1) div 2").cast("long").alias("r"),
                ),
                F.struct(
                    F.lit("p90").alias("q"),
                    F.expr("(9 * n + 9) div 10").cast("long").alias("r"),
                ),
                F.struct(
                    F.lit("p99").alias("q"),
                    F.expr("(99 * n + 99) div 100").cast("long").alias("r"),
                ),
            )
        ).alias("t")
    ).select(F.col("t.q").alias("q"), F.col("t.r").alias("r"))
    est = (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cs") >= F.col("r"))
        .groupBy("q", "r")
        .agg(F.min("b").alias("hit_b"))
    )
    ranked = api.exact_global_rank(base, "v", "o_orderkey", "rk")
    rnk = ranked.select(F.col("rk").alias("r_m"), F.col("v").alias("exact"))
    joined = (
        est.join(rnk, est["r"] == rnk["r_m"])
        .crossJoin(F.broadcast(mm.select("lo", "width")))
    )
    mid = (
        (F.col("lo") + F.col("hit_b") * F.col("width")).cast("double")
        + F.col("width").cast("double") / 2
    )
    return joined.select(
        F.col("q").alias("quantile"),
        F.col("r").alias("target_rank"),
        mid.alias("estimate"),
        F.col("exact").cast("long").alias("exact"),
        F.abs(mid - F.col("exact")).alias("abs_err"),
        (F.abs(mid - F.col("exact")) <= F.col("width").cast("double")).alias(
            "within_bucket"
        ),
    ).orderBy("quantile")


@register(
    "llm_yule_k",
    """
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c * c) AS BIGINT) AS sum_c2,
           round(1e4 * (CAST(sum(c * c) AS DOUBLE) - sum(c))
                 / (CAST(sum(c) AS DOUBLE) * sum(c)), 4) AS yule_k
    FROM cnt GROUP BY source ORDER BY source
    """,
    tags=("llm", "text", "stats"),
)
def llm_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K (Yule 1944) per documents source:
    K = 10⁴·(Σ_m m²·V_m − N)/N² = 10⁴·(Σ_w c_w² − N)/N² — the
    classic vocabulary-repetitiveness constant, designed to be
    INDEPENDENT of text length (unlike raw TTR), rising as the text
    leans harder on few words: templated/boilerplate-flooded sources
    score high, lexically rich prose low — the length-invariant
    member of the richness family next to llm_hapax_ratio (tail
    shape), llm_lexical_diversity (windowed TTR) and
    llm_chao1_richness (unseen types). Σc² and N are exact int64
    from one (source, term) aggregate; K is one fixed-order float
    expression.

    Scale shape: one explode + one keyed count with map-side combine
    + a per-source reduce — the llm_hapax_ratio plan."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = F.sum("c")
    c2 = F.sum(F.col("c") * F.col("c"))
    return (
        cnt.groupBy("source")
        .agg(
            n.cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            c2.cast("long").alias("sum_c2"),
            F.round(
                F.lit(1e4)
                * (c2.cast("double") - n)
                / (n.cast("double") * n),
                4,
            ).alias("yule_k"),
        )
        .orderBy("source")
    )


@register(
    "dq_psi_drift",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderdate < DATE '1995-06-01' AS early
        FROM orders
    ),
    mm AS (
        SELECT CAST(min(v) AS BIGINT) AS lo,
               CAST((max(v) - min(v) + 10) // 10 AS BIGINT) AS width
        FROM o
    ),
    binned AS (
        SELECT CAST((v - lo) // width AS BIGINT) AS bin, early
        FROM o CROSS JOIN mm
    ),
    cells AS (
        SELECT bin,
               CAST(count(*) FILTER (early) AS BIGINT) AS c_a,
               CAST(count(*) FILTER (NOT early) AS BIGINT) AS c_b
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
               CAST(sum(c_b) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS k
        FROM cells
    )
    SELECT bin, c_a, c_b,
           round(CAST(c_a + 1 AS DOUBLE) / (n_a + k), 6) AS share_a,
           round(CAST(c_b + 1 AS DOUBLE) / (n_b + k), 6) AS share_b,
           round((CAST(c_a + 1 AS DOUBLE) / (n_a + k)
                  - CAST(c_b + 1 AS DOUBLE) / (n_b + k))
                 * ln((CAST(c_a + 1 AS DOUBLE) * (n_b + k))
                      / (CAST(c_b + 1 AS DOUBLE) * (n_a + k))), 6)
               AS psi_term
    FROM cells CROSS JOIN tot
    ORDER BY bin
    """,
    tags=("dq", "stats"),
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (the credit-scorecard drift monitor
    standard since the 1990s; formalized in Yurdakul 2018) between
    early (< 1995-06-01) and late order-value distributions over 10
    fixed equi-width bins: PSI = Σ_i (pᵢ − qᵢ)·ln(pᵢ/qᵢ), read
    against the industry thresholds 0.1 (stable) / 0.25 (shifted).
    Per-bin table so the drift LOCALIZES — the summary total is the
    column sum. Exactness: bin edges are integer arithmetic from the
    global (min, width) 1-row broadcast; counts are exact int64;
    add-one (Laplace) smoothing keeps empty bins finite and is the
    standard PSI practice; each bin's term is one fixed-order float
    expression whose ln argument is a ratio of exact integers — both
    engines compute identical doubles.

    Scale shape: map-only binning, one 10-key conditional-count
    aggregate with map-side combine, two 1-row broadcasts."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("v"),
        (F.col("o_orderdate") < F.lit("1995-06-01").cast("date")).alias(
            "early"
        ),
    )
    mm = base.agg(
        F.min("v").cast("long").alias("lo"),
        F.expr("(max(v) - min(v) + 10) div 10").cast("long").alias("width"),
    )
    cells = (
        base.crossJoin(F.broadcast(mm))
        .select(F.expr("(v - lo) div width").cast("long").alias("bin"), "early")
        .groupBy("bin")
        .agg(
            F.count_if(F.col("early")).cast("long").alias("c_a"),
            F.count_if(~F.col("early")).cast("long").alias("c_b"),
        )
    )
    tot = cells.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    pa = (F.col("c_a") + 1).cast("double") / (F.col("n_a") + F.col("k"))
    pb = (F.col("c_b") + 1).cast("double") / (F.col("n_b") + F.col("k"))
    ratio = (
        (F.col("c_a") + 1).cast("double") * (F.col("n_b") + F.col("k"))
    ) / ((F.col("c_b") + 1).cast("double") * (F.col("n_a") + F.col("k")))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "c_a",
            "c_b",
            F.round(pa, 6).alias("share_a"),
            F.round(pb, 6).alias("share_b"),
            F.round((pa - pb) * F.log(ratio), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


@register(
    "agg_hhi",
    """
    WITH srev AS (
        SELECT s.s_nationkey AS nk, l.l_suppkey,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(srev.cents) AS BIGINT) AS total_cents,
           round(CAST(sum(CAST(srev.cents AS DECIMAL(38,0)) * srev.cents)
                      AS DOUBLE)
                 / (CAST(sum(srev.cents) AS DOUBLE) * sum(srev.cents)),
                 6) AS hhi
    FROM srev JOIN nation n ON n.n_nationkey = srev.nk
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    tags=("aggregate", "stats"),
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index (Hirschman 1945;
    Herfindahl 1950; the US-DOJ merger-screen statistic) of supplier
    revenue within each nation: HHI = Σ_s (xₛ/T)² = Σxₛ²/T² on the
    [1/n, 1] scale — 1 means one supplier owns the nation's flow,
    1/n means perfectly even split; the square-weighted sibling of
    agg_gini/agg_hoover_index that antitrust and vendor-risk reviews
    actually quote. Σx² accumulates in DECIMAL(38,0) (supplier-cents
    squared exceeds int64 at sf0.1 already — the agg_gini device);
    HHI is one fixed-order float division.

    Scale shape: one (nation, supplier) keyed sum, one per-nation
    reduce — both with map-side combine; the broadcast supplier→
    nation dimension join is the q5 pattern."""
    li = tbl(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    return (
        srev.join(F.broadcast(n), srev["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.round(
                F.sum(
                    F.col("cents").cast("decimal(38,0)") * F.col("cents")
                ).cast("double")
                / (F.sum("cents").cast("double") * F.sum("cents")),
                6,
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )
