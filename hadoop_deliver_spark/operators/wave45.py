"""§2 extensions, sixty-ninth wave — paired binary change testing,
price-volume decomposition, standardized effect size, and dedup
threshold calibration.

- events_mcnemar: McNemar's paired test of per-user purchase
  behavior between month halves — did the SAME users change?
- orders_price_volume_bridge: the price/volume/mix revenue bridge
  per brand between 1995 and 1996 — where did the revenue change
  come from, in exact cents.
- agg_cohens_d: Cohen's d / Hedges' g standardized effect size of
  URGENT order values vs the rest — the magnitude companion of the
  significance tests.
- llm_dedup_threshold_sweep: near-duplicate pair counts across a
  Jaccard threshold grid from one candidate pass — the calibration
  curve for picking a dedup cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.llm import _EXACT_JACCARD_SQL
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "events_mcnemar",
    """
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'purchase'
                    AND dayofmonth(CAST(ts AS DATE)) <= 15) AS BIGINT)
                   > 0 AS p1,
               CAST(count(*) FILTER (event_type = 'purchase'
                    AND dayofmonth(CAST(ts AS DATE)) > 15) AS BIGINT)
                   > 0 AS p2
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (p1 AND NOT p2) AS BIGINT) AS b_lost,
           CAST(count(*) FILTER (p2 AND NOT p1) AS BIGINT) AS c_gained,
           round(CAST((count(*) FILTER (p1 AND NOT p2)
                       - count(*) FILTER (p2 AND NOT p1))
                      * (count(*) FILTER (p1 AND NOT p2)
                         - count(*) FILTER (p2 AND NOT p1)) AS DOUBLE)
                 / nullif(count(*) FILTER (p1 AND NOT p2)
                          + count(*) FILTER (p2 AND NOT p1), 0), 4)
               AS chi2,
           625 * (count(*) FILTER (p1 AND NOT p2)
                  - count(*) FILTER (p2 AND NOT p1))
               * (count(*) FILTER (p1 AND NOT p2)
                  - count(*) FILTER (p2 AND NOT p1))
               > 2401 * (count(*) FILTER (p1 AND NOT p2)
                         + count(*) FILTER (p2 AND NOT p1))
               AS significant
    FROM per_user
    """,
    tags=("analytics", "stats"),
)
def events_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (McNemar 1947) of paired purchase behavior:
    flag each user as a purchaser in the first half of the month and
    in the second, and test the DISCORDANT cells — users who stopped
    (b) vs users who started (c); χ² = (b−c)²/(b+c). Because each
    user is their own control, between-user variance cancels — the
    paired sibling of events_abtest_proportions' two-independent-
    samples z (which would need far more users to see the same
    shift). All counts are exact int64 booleans; the 5% verdict
    cross-multiplies (b−c)² > 1.96²·(b+c) to the pure-integer
    625·(b−c)² > 2401·(b+c) (1.96 = 49/25 exactly — the
    events_sign_test device); only the displayed χ² divides.

    Scale shape: one user-keyed conditional aggregate with map-side
    combine, one scalar reduce."""
    e = tbl(spark, sf_dir, "events")
    purch = F.col("event_type") == "purchase"
    first_half = F.dayofmonth(F.to_date("ts")) <= 15
    per_user = e.groupBy("user_id").agg(
        (F.count_if(purch & first_half) > 0).alias("p1"),
        (F.count_if(purch & ~first_half) > 0).alias("p2"),
    )
    b = F.count_if(F.col("p1") & ~F.col("p2")).cast("long")
    c = F.count_if(F.col("p2") & ~F.col("p1")).cast("long")
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        b.alias("b_lost"),
        c.alias("c_gained"),
        F.round(
            ((b - c) * (b - c)).cast("double")
            / F.nullif(b + c, F.lit(0)),
            4,
        ).alias("chi2"),
        (625 * (b - c) * (b - c) > 2401 * (b + c)).alias("significant"),
    )


@register(
    "orders_price_volume_bridge",
    """
    WITH yr AS (
        SELECT p.p_brand AS brand,
               CAST(year(l.l_shipdate) AS INT) AS y,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS v,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT brand,
               CAST(max(CASE WHEN y = 1995 THEN v END) AS BIGINT) AS v0,
               CAST(max(CASE WHEN y = 1995 THEN q END) AS BIGINT) AS q0,
               CAST(max(CASE WHEN y = 1996 THEN v END) AS BIGINT) AS v1,
               CAST(max(CASE WHEN y = 1996 THEN q END) AS BIGINT) AS q1
        FROM yr GROUP BY brand
    )
    SELECT brand,
           v1 - v0 AS delta_cents,
           round((CAST(q1 AS DOUBLE) - q0) * v0 / q0, 2) AS volume_effect,
           round(CAST(q1 AS DOUBLE) * (CAST(v1 AS DOUBLE) / q1
                                       - CAST(v0 AS DOUBLE) / q0), 2)
               AS price_effect,
           round((v1 - v0)
                 - (CAST(q1 AS DOUBLE) - q0) * v0 / q0
                 - CAST(q1 AS DOUBLE) * (CAST(v1 AS DOUBLE) / q1
                                         - CAST(v0 AS DOUBLE) / q0), 2)
               AS residual
    FROM piv
    WHERE v0 IS NOT NULL AND v1 IS NOT NULL AND q0 > 0 AND q1 > 0
    ORDER BY brand
    """,
    tags=("analytics",),
)
def orders_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume revenue bridge per brand, 1995 → 1996 (the
    standard FP&A price/volume/mix waterfall; the additive
    decomposition convention with volume at base price and price at
    current volume): ΔR = (q₁−q₀)·p₀ + q₁·(p₁−p₀), where p = unit
    value v/q — answering "did revenue move because we sold MORE or
    because prices CHANGED", the decomposed narrative behind
    orders_unit_value_index's single ratio. The residual column
    proves the decomposition closes (zero up to the display
    rounding, by construction of this convention). Revenue and
    quantity sums are exact int64 cents/units; the effects are
    fixed-order float expressions of those integers; brands missing
    a year drop by exact guards.

    Scale shape: one (brand, year) keyed sum over the
    predicate-pruned two-year slice with map-side combine, one
    pivot."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = (
        li.filter(F.year("l_shipdate").isin(1995, 1996))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("y"),
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("v"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
        )
    )
    piv = yr.groupBy("brand").agg(
        F.max(F.when(F.col("y") == 1995, F.col("v"))).cast("long").alias("v0"),
        F.max(F.when(F.col("y") == 1995, F.col("q"))).cast("long").alias("q0"),
        F.max(F.when(F.col("y") == 1996, F.col("v"))).cast("long").alias("v1"),
        F.max(F.when(F.col("y") == 1996, F.col("q"))).cast("long").alias("q1"),
    )
    vol = (
        (F.col("q1").cast("double") - F.col("q0"))
        * F.col("v0")
        / F.col("q0")
    )
    price = F.col("q1").cast("double") * (
        F.col("v1").cast("double") / F.col("q1")
        - F.col("v0").cast("double") / F.col("q0")
    )
    return (
        piv.filter(
            F.col("v0").isNotNull()
            & F.col("v1").isNotNull()
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
        .select(
            "brand",
            (F.col("v1") - F.col("v0")).alias("delta_cents"),
            F.round(vol, 2).alias("volume_effect"),
            F.round(price, 2).alias("price_effect"),
            F.round((F.col("v1") - F.col("v0")) - vol - price, 2).alias(
                "residual"
            ),
        )
        .orderBy("brand")
    )


@register(
    "agg_cohens_d",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderpriority = '1-URGENT' AS grp_a
        FROM orders
    ),
    s AS (
        SELECT CAST(count(*) FILTER (grp_a) AS BIGINT) AS n1,
               CAST(sum(v) FILTER (grp_a) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS DECIMAL(38,0)) * v) FILTER (grp_a)
                    AS DECIMAL(38,0)) AS q1,
               CAST(count(*) FILTER (NOT grp_a) AS BIGINT) AS n2,
               CAST(sum(v) FILTER (NOT grp_a) AS BIGINT) AS s2,
               CAST(sum(CAST(v AS DECIMAL(38,0)) * v) FILTER (NOT grp_a)
                    AS DECIMAL(38,0)) AS q2
        FROM o
    )
    SELECT n1, n2,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt(((CAST(q1 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * s1 / n1)
                         + (CAST(q2 AS DOUBLE)
                            - CAST(s2 AS DOUBLE) * s2 / n2))
                        / (n1 + n2 - 2)), 6) AS cohens_d,
           round(((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                  / sqrt(((CAST(q1 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * s1 / n1)
                          + (CAST(q2 AS DOUBLE)
                             - CAST(s2 AS DOUBLE) * s2 / n2))
                         / (n1 + n2 - 2)))
                 * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size (Cohen 1988) with the
    Hedges' g small-sample correction (Hedges 1981: g = d·(1 −
    3/(4N−9))) for URGENT order values vs the rest — the MAGNITUDE
    companion every significance test needs: agg_welch_ttest and
    agg_mann_whitney say whether a difference exists, d says whether
    anyone should care (|d| < 0.2 is conventionally trivial however
    small the p-value at big n). Pooled-SD form with exact moments:
    counts and sums are int64, Σv² accumulates in DECIMAL(38,0)
    (cents² crosses int64 at sf0.1 — the agg_hhi device), and d is
    one fixed-order float expression; the correction factor is exact
    rational arithmetic in doubles.

    Scale shape: one conditional-aggregate scan with map-side
    partial — no join, no window."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").alias("grp_a"),
    )
    a = F.col("grp_a")
    vdec = F.col("v").cast("decimal(38,0)") * F.col("v")
    s = base.agg(
        F.count_if(a).cast("long").alias("n1"),
        F.sum(F.when(a, F.col("v"))).cast("long").alias("s1"),
        F.sum(F.when(a, vdec)).cast("decimal(38,0)").alias("q1"),
        F.count_if(~a).cast("long").alias("n2"),
        F.sum(F.when(~a, F.col("v"))).cast("long").alias("s2"),
        F.sum(F.when(~a, vdec)).cast("decimal(38,0)").alias("q2"),
    )
    mean_diff = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s2").cast("double") / F.col("n2")
    )
    pooled = F.sqrt(
        (
            (
                F.col("q1").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
            )
            + (
                F.col("q2").cast("double")
                - F.col("s2").cast("double") * F.col("s2") / F.col("n2")
            )
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = mean_diff / pooled
    g = d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9))
    return s.select(
        "n1",
        "n2",
        F.round(d, 6).alias("cohens_d"),
        F.round(g, 6).alias("hedges_g"),
    )


@register(
    "llm_dedup_threshold_sweep",
    f"""
    WITH jac AS MATERIALIZED (
        SELECT jaccard FROM ({_EXACT_JACCARD_SQL}) WHERE jaccard >= 0.5
    ),
    grid AS (SELECT CAST(t AS DOUBLE) AS t
             FROM (VALUES (0.5), (0.6), (0.7), (0.8)) g(t))
    SELECT g.t AS threshold,
           CAST(count(*) FILTER (j.jaccard >= g.t) AS BIGINT) AS n_pairs
    FROM grid g LEFT JOIN jac j ON true
    GROUP BY g.t ORDER BY threshold
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration sweep: near-duplicate PAIR counts
    at Jaccard cutoffs {{0.5, 0.6, 0.7, 0.8}} from ONE candidate
    pass — the curve a dedup operator reads before committing a
    threshold (too low merges near-miss boilerplate families, too
    high leaves true duplicates behind; the knee is corpus-specific), turning
    llm_dedup_minhash's fixed 0.5 into an informed choice, next to
    llm_dedup_candidate_stats' volume side. The engine reuses
    api.minhash_pairs once at the loosest cutoff (its refined exact
    Jaccards are what the banding guarantees at J ≥ 0.5) and buckets
    by exact per-pair compare; the oracle derives the same pair set
    from first-principles exact Jaccard (the llm_dedup_minhash
    equality contract) with a 4-row threshold grid.

    Scale shape: one LSH candidate pass + refine, then a 4-row
    broadcast grid over the tiny near-dup pair set."""
    d = tbl(spark, sf_dir, "documents")
    pairs = api.minhash_pairs(d, "doc_id", "text", threshold=0.5).select(
        "jaccard"
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8)])
        ).alias("t")
    )
    counts = (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy(F.col("t").cast("double").alias("threshold"))
        .agg(
            F.count_if(F.col("jaccard") >= F.col("t"))
            .cast("long")
            .alias("n_pairs")
        )
    )
    # grid-preserving left join: on a pair-free corpus the crossJoin
    # yields 0 rows, but the oracle's `grid LEFT JOIN jac ON true`
    # still returns all 4 threshold rows with n_pairs=0 — keep the
    # grid as the preserved side so the twins agree (round-7 advice)
    return (
        grid.select(F.col("t").cast("double").alias("threshold"))
        .join(F.broadcast(counts), "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        )
        .orderBy("threshold")
    )
