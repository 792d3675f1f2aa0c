"""§2 extensions, fifty-eighth wave — rank correlation, weighted link
prediction, inequality geometry, and species-richness estimation.

- agg_kendall_tau: Kendall's τ-b rank correlation between each event
  type's daily count and daily value-cents series — the
  concordance-counting partner of agg_spearman's rank-moment form.
- graph_adamic_adar: Adamic–Adar weighted link prediction on the
  customer→part co-purchase graph — common_neighbors' published
  refinement that discounts promiscuous shared customers by
  1/ln(degree).
- agg_lorenz_curve: the decile Lorenz curve of order value
  (cumulative population share vs cumulative value share) — the
  geometry behind agg_gini's single number.
- llm_chao1_richness: the Chao1 nonparametric richness estimator per
  documents source — how much vocabulary the corpus has NOT yet
  shown, from singleton/doubleton counts alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_kendall_tau",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END
                   AS conc,
               CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END
                   AS disc,
               CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
               CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(sum(tie_x) AS BIGINT) AS ties_x,
           CAST(sum(tie_y) AS BIGINT) AS ties_y,
           round((sum(conc) - sum(disc))
                 / sqrt(CAST((count(*) - sum(tie_x)) AS DOUBLE)
                        * (count(*) - sum(tie_y))), 4) AS tau_b
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregate", "stats"),
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation (Kendall 1938; the τ-b tie
    correction in Kendall 1945) between each event type's daily count
    and daily value-cents series — the concordance-counting
    complement of agg_spearman: τ counts pair ORDER agreements
    directly instead of correlating midranks, so it is robust to any
    monotone transform and has the cleaner interpretation
    P(concordant) − P(discordant). Both series are exact int64 (count
    and DECIMAL-cents sum), so every concordance/tie decision is an
    integer-sign comparison — no float enters until the single final
    τ-b division; τ-b = (C − D)/√((n₀ − t_x)(n₀ − t_y)) with n₀ the
    pair count and t the tied-pair counts.

    Scale shape: the fact table reduces to the calendar-bounded
    per-type daily aggregate in one keyed shuffle; the pair join is
    an event_type equi-join (hash, not nested-loop) whose fan-out is
    ≤ days²/2 per type at ANY corpus scale — the ts_theil_sen
    precedent."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(dec2("value") * 100).cast("long").alias("y"),
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("day_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    cross = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & (F.col("day_a") < F.col("day_b")),
    ).select(
        "event_type",
        F.when(cross > 0, 1).otherwise(0).alias("conc"),
        F.when(cross < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("tie_y"),
    )
    n0 = F.count(F.lit(1))
    c = F.sum("conc")
    d = F.sum("disc")
    tx = F.sum("tie_x")
    ty = F.sum("tie_y")
    return (
        pairs.groupBy("event_type")
        .agg(
            n0.cast("long").alias("n_pairs"),
            c.cast("long").alias("concordant"),
            d.cast("long").alias("discordant"),
            tx.cast("long").alias("ties_x"),
            ty.cast("long").alias("ties_y"),
            F.round(
                (c - d)
                / F.sqrt((n0 - tx).cast("double") * (n0 - ty)),
                4,
            ).alias("tau_b"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_adamic_adar",
    """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cdeg AS (
        SELECT c, CAST(count(*) AS BIGINT) AS d,
               CAST(round(1e12 / ln(count(*))) AS BIGINT) AS w
        FROM edges GROUP BY c HAVING count(*) >= 2
    ),
    aa AS (
        SELECT a.p AS part_a, b.p AS part_b,
               CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(cd.w) AS BIGINT) AS aa_scaled
        FROM edges a
        JOIN edges b ON a.c = b.c AND a.p < b.p
        JOIN cdeg cd ON cd.c = a.c
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_common,
           round(CAST(aa_scaled AS DOUBLE) / 1e12, 4) AS aa_score
    FROM aa
    ORDER BY aa_scaled DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("graph",),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar weighted link prediction (Adamic & Adar 2003) on
    the customer→part co-purchase graph: the top-20 part pairs by
    AA(a,b) = Σ_{c ∈ N(a)∩N(b)} 1/ln(deg(c)) — the published
    refinement of graph_common_neighbors that discounts promiscuous
    shared neighbors (a customer who buys EVERYTHING says little
    about any pair; a two-part specialist says a lot). Cross-engine
    determinism device: each weight ships as the exact int64
    round(10¹²/ln(d)) so the per-pair score is an ORDER-INDEPENDENT
    integer sum — a lone last-ulp libm disagreement shifts one term
    by ±1e-12, absorbed by the round-4 display and harmless to the
    ranking (pairs with the same common-neighbor degree multiset sum
    to identical integers in each engine; distinct multisets differ
    by ≫ a few units). deg(c) ≥ 2 is structural: a degree-1 customer
    cannot be a COMMON neighbor, and it keeps ln positive.

    Scale shape: deduped edge list, one customer-keyed degree
    aggregate joined back, customer-keyed pair self-join (Σ deg(c)²
    work, the item-item CF bound — cap or sample super-baskets at
    web scale), top-k via TakeOrderedAndProject. r12: the edge list,
    the degree weight attach and the pair fan-out come from the
    session-memoized co_purchase_graph stage (operators.graph)
    shared with graph_common_neighbors / graph_modularity — one
    fan-out pass serves all three (deg(c) ≥ 2 holds for every
    pair-witnessing customer, so the shared stage's weighted sum IS
    this query's cdeg inner join)."""
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    _, pairs = co_purchase_graph(spark, sf_dir)
    aa = pairs.select(
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        "n_common",
        F.col("w_sum").alias("aa_scaled"),
    )
    return (
        aa.orderBy(F.desc("aa_scaled"), "part_a", "part_b")
        .limit(20)
        .select(
            "part_a",
            "part_b",
            "n_common",
            F.round(F.col("aa_scaled").cast("double") / 1e12, 4).alias(
                "aa_score"
            ),
        )
    )


@register(
    "agg_lorenz_curve",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rk
        FROM o
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total
        FROM o
    ),
    bucketed AS (
        SELECT CAST((10 * rk + n - 1) // n AS BIGINT) AS decile,
               cents
        FROM r CROSS JOIN tot
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS bucket_cents
        FROM bucketed GROUP BY decile
    )
    SELECT decile,
           CAST(sum(n_rows) OVER w AS BIGINT) AS cum_rows,
           CAST(sum(bucket_cents) OVER w AS BIGINT) AS cum_cents,
           round(CAST(sum(n_rows) OVER w AS DOUBLE)
                 / (SELECT n FROM tot), 6) AS pop_share,
           round(CAST(sum(bucket_cents) OVER w AS DOUBLE)
                 / (SELECT total FROM tot), 6) AS value_share
    FROM per
    WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    ORDER BY decile
    """,
    tags=("aggregate", "stats"),
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile Lorenz curve of order value (Lorenz 1905) — the
    cumulative population share vs cumulative value share points
    whose enclosed area agg_gini integrates into one number: "the
    bottom 50% of orders carry 28% of revenue". Ranks come from the
    block-ranked api.exact_global_rank core (no single-partition
    window touches the fact table); each row's decile is the exact
    integer ceil(10·rk/n) = (10·rk + n − 1) div n, so bucket
    membership and both cumulative sums are exact int64 — floats
    appear only in the two final share divisions. The decile
    boundary at a tie group is tiebreak-dependent row-wise but the
    oracle ranks with the IDENTICAL (cents, o_orderkey) total order,
    so the buckets match exactly.

    Scale shape: one block-ranked pass over the fact table, a 10-row
    grouped reduce, and a 10-row cumulative window (domain-bounded —
    allowlisted like events_holm_correction's); the 1-row (n, total)
    broadcast is the ts_resample_gapfill pattern."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    bucketed = ranked.crossJoin(F.broadcast(tot)).select(
        F.expr("(10 * rk + n - 1) div n").cast("long").alias("decile"),
        "cents",
        "n",
        "total",
    )
    per = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("bucket_cents"),
        F.max("n").alias("n"),
        F.max("total").alias("total"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        F.sum("n_rows").over(w).cast("long").alias("cum_rows"),
        F.sum("bucket_cents").over(w).cast("long").alias("cum_cents"),
        F.round(
            F.sum("n_rows").over(w).cast("double") / F.col("n"), 6
        ).alias("pop_share"),
        F.round(
            F.sum("bucket_cents").over(w).cast("double") / F.col("total"), 6
        ).alias("value_share"),
    ).orderBy("decile")


@register(
    "llm_chao1_richness",
    """
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    ),
    ff AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS s_obs,
               CAST(count(*) FILTER (c = 1) AS BIGINT) AS f1,
               CAST(count(*) FILTER (c = 2) AS BIGINT) AS f2
        FROM cnt GROUP BY source
    )
    SELECT source, s_obs, f1, f2,
           round(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)),
                 4) AS chao1,
           round((CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)))
                 / (s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))),
                 4) AS unseen_share
    FROM ff ORDER BY source
    """,
    tags=("llm", "text", "stats"),
)
def llm_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 nonparametric species-richness estimator (Chao 1984;
    bias-corrected form per Chao 2005) per documents source: how much
    vocabulary has the corpus NOT yet shown? Ŝ = S_obs +
    f₁(f₁−1)/(2(f₂+1)) from the singleton (f₁) and doubleton (f₂)
    counts alone — the capture-recapture logic that prices corpus
    coverage before committing a tokenizer vocab, complementing
    llm_good_turing's unseen-MASS estimate with an unseen-TYPES
    estimate (the bias-corrected form stays defined at f₂ = 0).
    All counts are exact int64 from one (source, term) aggregate;
    floats enter only in the two final fixed-order expressions.

    Scale shape: one explode + one (source, term) keyed aggregate
    with map-side combine, then a per-source conditional-count
    reduce — the llm_hapax_ratio plan with a different final
    formula."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ff = cnt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.count_if(F.col("c") == 1).cast("long").alias("f1"),
        F.count_if(F.col("c") == 2).cast("long").alias("f2"),
    )
    unseen = (
        F.col("f1").cast("double")
        * (F.col("f1") - 1)
        / (2.0 * (F.col("f2") + 1))
    )
    return ff.select(
        "source",
        "s_obs",
        "f1",
        "f2",
        F.round(F.col("s_obs") + unseen, 4).alias("chao1"),
        F.round(unseen / (F.col("s_obs") + unseen), 4).alias("unseen_share"),
    ).orderBy("source")
