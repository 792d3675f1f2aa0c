"""§2 extensions, forty-ninth wave — resampling-free uncertainty,
cross-source vocabulary overlap, co-purchase similarity, and demand
elasticity.

- agg_jackknife_ratio_se: delete-one jackknife standard error
  (Quenouille 1956, Tukey 1958) of the per-nation revenue/quantity
  ratio — uncertainty for a NONLINEAR statistic with no RNG, fully
  relational via broadcast totals.
- llm_source_vocab_overlap: exact vocabulary Jaccard between source
  pairs via one inverted-index join — the transfer/contamination
  screen over corpus mixtures.
- graph_common_neighbors: common-neighbor / Jaccard link prediction
  (Liben-Nowell & Kleinberg 2003) on the co-purchase graph — the
  collaborative-filtering primitive.
- orders_price_elasticity: log-log price elasticity of demand per
  part brand (one regr_slope pass over the joined fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_jackknife_ratio_se",
    """
    WITH o AS (
        SELECT n.n_name,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(1 AS BIGINT) AS one
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    tot AS (
        SELECT n_name, CAST(sum(cents) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY n_name
    ),
    loo AS (
        SELECT o.n_name, t.s, t.n,
               CAST(t.s - o.cents AS DOUBLE) / (t.n - 1)
                   - CAST(t.s AS DOUBLE) / t.n AS dev
        FROM o JOIN tot t USING (n_name)
        WHERE t.n >= 2
    )
    SELECT n_name, CAST(max(n) AS BIGINT) AS n_orders,
           round(CAST(max(s) AS DOUBLE) / max(n) / 100, 4) AS mean_price,
           round(sqrt((max(n) - 1.0) / max(n) * sum(dev * dev)) / 100, 4)
               AS jackknife_se
    FROM loo GROUP BY n_name ORDER BY n_name
    """,
    tags=("aggregate", "stats"),
)
def agg_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one jackknife standard error (Quenouille 1956, Tukey
    1958) of the per-nation mean order price: every leave-one-out
    replicate θ₍ᵢ₎ = (S − xᵢ)/(n − 1) comes from the BROADCAST exact
    totals — so the "resampling" is one map-side expression per row,
    no RNG, no replicate shuffles (the jackknife's closed form is
    what makes uncertainty quantification distributable; bootstrap
    would need seeded resamples and lose cross-engine exactness).
    SE = √((n−1)/n · Σ(θ₍ᵢ₎ − θ̄)²). Cents totals are exact int64;
    each θ₍ᵢ₎ is one correctly-rounded division; the Σ of squared
    deviations is a group float sum under round-4 display (theil
    convention).

    Scale shape: one keyed aggregate for totals, broadcast back
    onto the scan, one keyed reduce — two shuffles total."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    tot = base.groupBy("n_name").agg(
        F.sum("cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # θ̄ (the mean of the jackknife replicates) equals S/n EXACTLY for
    # the mean statistic, so the deviation is a row-level expression
    # on the broadcast totals — no nested aggregate needed
    loo = (
        base.join(F.broadcast(tot), "n_name")
        .filter(F.col("n") >= 2)
        .withColumn(
            "dev",
            (F.col("s") - F.col("cents")).cast("double") / (F.col("n") - 1)
            - F.col("s").cast("double") / F.col("n"),
        )
    )
    return (
        loo.groupBy("n_name")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.round(F.max("s").cast("double") / F.max("n") / 100, 4).alias(
                "mean_price"
            ),
            F.round(
                F.sqrt(
                    (F.max("n") - 1.0)
                    / F.max("n")
                    * F.sum(F.col("dev") * F.col("dev"))
                )
                / 100,
                4,
            ).alias("jackknife_se"),
        )
        .orderBy("n_name")
    )


@register(
    "llm_source_vocab_overlap",
    """
    WITH v AS (
        SELECT DISTINCT source, unnest(list_distinct(string_split(text, ' ')))
               AS w
        FROM documents WHERE length(text) > 0
    ),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM v GROUP BY 1),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.nv + sb.nv - i.n_common), 4) AS vocab_jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    ORDER BY vocab_jaccard DESC, src_a, src_b
    LIMIT 25
    """,
    tags=("llm", "text"),
)
def llm_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary Jaccard between every source pair — the
    cross-source transfer/contamination screen (two sources sharing
    90% of their vocabulary are near-clones; near-zero overlap means
    a mixture weight can't borrow strength). One inverted-index join
    on the term (each term contributes its source-pair combinations,
    never a source cross product), exact int64 intersection counts,
    one correctly-rounded division per pair — bit-identical ranking
    (same double, id tiebreaks), top-25.

    Scale shape: distinct (source, term) explode, term-keyed
    self-join (postings bounded by #sources per term), ≤ S²/2 output
    rows."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    v = d.select(
        "source",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    ).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a = v.select(F.col("source").alias("src_a"), "w")
    b = v.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("nv").alias("nva"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("nv").alias("nvb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .withColumn(
            "vocab_jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("nva") + F.col("nvb") - F.col("n_common")),
                4,
            ),
        )
        .select("src_a", "src_b", "n_common", "vocab_jaccard")
        .orderBy(F.desc("vocab_jaccard"), "src_a", "src_b")
        .limit(25)
    )


@register(
    "graph_common_neighbors",
    """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY p),
    cn AS (
        SELECT a.p AS part_a, b.p AS part_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM edges a JOIN edges b ON a.c = b.c AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT c.part_a, c.part_b, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
                 / (da.d + db.d - c.n_common), 4) AS jaccard
    FROM cn c
    JOIN deg da ON da.p = c.part_a
    JOIN deg db ON db.p = c.part_b
    ORDER BY n_common DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("graph",),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell &
    Kleinberg 2003) on the customer→part co-purchase graph: the
    top-20 part pairs by shared-customer count, with neighbor-set
    Jaccard — the collaborative-filtering "customers who bought X
    also bought Y" primitive. Pairs are generated per CUSTOMER
    (Σ deg(c)² work, the item-item CF bound), counts exact int64,
    ranking on (exact count, id) so no float can reorder.

    Scale shape: deduped edge list, customer-keyed self-join (the
    per-customer basket bounds the fan-out — cap or sample
    super-baskets at web scale), top-k via TakeOrderedAndProject.
    r12: the edge list and the pair fan-out come from the session-
    memoized co_purchase_graph stage (operators.graph) shared with
    graph_adamic_adar / graph_modularity — one fan-out pass serves
    all three."""
    from hadoop_deliver_spark.operators.graph import co_purchase_graph

    edges, pairs = co_purchase_graph(spark, sf_dir)
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # the ranking is on (n_common, part ids) alone and the degree
    # joins are 1:1 (every pair endpoint is in edges), so the top-20
    # cut commutes below them: TakeOrdered on the pair stage, then
    # attach degrees to 20 rows (broadcast) instead of shuffling the
    # full pair table through two joins.
    cn_top = (
        pairs.select(
            F.col("u").alias("part_a"), F.col("v").alias("part_b"), "n_common"
        )
        .orderBy(F.desc("n_common"), "part_a", "part_b")
        .limit(20)
    )
    da = deg.select(F.col("p").alias("part_a"), F.col("d").alias("da"))
    db = deg.select(F.col("p").alias("part_b"), F.col("d").alias("db"))
    return (
        F.broadcast(cn_top)
        .join(da, "part_a")
        .join(db, "part_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")),
                4,
            ),
        )
        .select("part_a", "part_b", "n_common", "jaccard")
        .orderBy(F.desc("n_common"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "orders_price_elasticity",
    """
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(regr_slope(ln(l.l_quantity),
                            ln(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                    AS DOUBLE) / l.l_quantity)), 4)
               AS elasticity,
           round(regr_r2(ln(l.l_quantity),
                         ln(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 AS DOUBLE) / l.l_quantity)), 4) AS r2
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
    tags=("analytics",),
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per part brand: regress
    ln(quantity) on ln(unit price) — the slope IS the elasticity
    (the % quantity change per % price change), the workhorse
    estimator of demand analysis. Unit price derives from the exact
    DECIMAL extended price; regr_slope/regr_r2 partial-merge on the
    wire (round-4 absorbs double-sum order drift, registry
    convention).

    Scale shape: one broadcast-joined dimension, one grouped
    regression aggregate — a single shuffle on the brand key."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    unit = dec2("l_extendedprice").cast("double") / F.col("l_quantity")
    y, x = F.log("l_quantity"), F.log(unit)
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.regr_slope(y, x), 4).alias("elasticity"),
            F.round(F.regr_r2(y, x), 4).alias("r2"),
        )
        .orderBy("p_brand")
    )
