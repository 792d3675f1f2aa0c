"""§2 extensions, hundred-forty-fourth wave — concentration ratios
and robustness curves.

- orders_cr_ratios: CR1/CR4/CR8 concentration ratios of brand
  revenue — the antitrust screen that reads directly as market
  share (agg_hhi's quadratic form obscures it); exact descending
  block-ranked cumshare probes.
- agg_trim_sensitivity: the trimmed-mean sensitivity curve — the
  mean at 0/1/5/10 % symmetric trims from ONE exact ranking — how
  much of the headline average is tail-driven; the curve whose
  single point agg_trimmed_mean reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "orders_cr_ratios",
    """
    WITH br AS (
        SELECT p.p_brand AS brand,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * 100 AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(rev) AS BIGINT) AS t
        FROM br
    ),
    cum AS (
        SELECT brand, rev,
               CAST(row_number() OVER (ORDER BY rev DESC, brand)
                    AS BIGINT) AS r,
               CAST(sum(rev) OVER (ORDER BY rev DESC, brand
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM br
    )
    SELECT tot.k AS n_brands,
           round(tot.t / 100.0, 2) AS total_revenue,
           (SELECT min(brand) FROM cum WHERE r = 1) AS top_brand,
           round(CAST((SELECT max(c) FROM cum WHERE r <= 1) AS DOUBLE)
                 / tot.t, 6) AS cr1,
           round(CAST((SELECT max(c) FROM cum WHERE r <= 4) AS DOUBLE)
                 / tot.t, 6) AS cr4,
           round(CAST((SELECT max(c) FROM cum WHERE r <= 8) AS DOUBLE)
                 / tot.t, 6) AS cr8,
           CAST((SELECT max(c) FROM cum WHERE r <= 4) AS DOUBLE)
               / tot.t > 0.4 AS concentrated_cr4
    FROM tot
    """,
    tags=("orders", "analytics"),
)
def orders_cr_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration ratios of brand revenue: CR_k = the top-k
    brands' revenue share for k = 1, 4, 8 — the antitrust screen
    whose 0.4 CR4 threshold marks a concentrated market (the
    reading agg_hhi's sum-of-squares form encodes but does not
    display). Brands are ranked by the exact descending block-ranked
    cumsum (brand-name tiebreak); every CR numerator is an exact
    integer prefix sum probed at rank ≤ k; the verdict compares the
    unrounded share (integer-ratio, identical on both engines).

    Scale shape: one join + brand reduce, one block-ranked
    descending rank+cumsum over the bounded brand table, three
    1-row prefix probes."""
    from hadoop_deliver_spark.api import (
        exact_global_cumsum_desc,
        exact_global_rank,
    )

    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    br = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    tot = br.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("rev").cast("long").alias("t"),
    )
    cum = exact_global_cumsum_desc(br, "rev", "brand", "c")
    cum = exact_global_rank(
        cum.withColumn("neg", -F.col("rev")), "neg", "brand", "r"
    ).drop("neg")

    def prefix(kk: int, name: str):
        return cum.filter(F.col("r") <= kk).agg(
            F.max("c").alias(name)
        )

    top = cum.filter(F.col("r") == 1).agg(
        F.min("brand").alias("top_brand")
    )
    c1 = prefix(1, "c1")
    c4 = prefix(4, "c4")
    c8 = prefix(8, "c8")
    return (
        tot.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c4))
        .crossJoin(F.broadcast(c8))
        .select(
            F.col("k").alias("n_brands"),
            F.round(F.col("t") / 100.0, 2).alias("total_revenue"),
            "top_brand",
            F.round(F.col("c1").cast("double") / F.col("t"), 6).alias("cr1"),
            F.round(F.col("c4").cast("double") / F.col("t"), 6).alias("cr4"),
            F.round(F.col("c8").cast("double") / F.col("t"), 6).alias("cr8"),
            (F.col("c4").cast("double") / F.col("t") > 0.4).alias(
                "concentrated_cr4"
            ),
        )
    )


@register(
    "agg_trim_sensitivity",
    """
    WITH v AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    rk AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents, k) AS BIGINT) AS r
        FROM v
    ),
    lv AS (SELECT p FROM unnest([0, 10, 50, 100]) AS t(p)),
    trims AS (
        SELECT lv.p,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(rk.cents) AS BIGINT) AS s
        FROM rk CROSS JOIN lv CROSS JOIN n
        WHERE rk.r > lv.p * n.n // 1000
          AND rk.r <= n.n - lv.p * n.n // 1000
        GROUP BY 1
    ),
    wide AS (
        SELECT max(CASE WHEN p = 0 THEN CAST(s AS DOUBLE) / m END) AS t0,
               max(CASE WHEN p = 10 THEN CAST(s AS DOUBLE) / m END) AS t1,
               max(CASE WHEN p = 50 THEN CAST(s AS DOUBLE) / m END) AS t5,
               max(CASE WHEN p = 100 THEN CAST(s AS DOUBLE) / m END)
                   AS t10,
               max(CASE WHEN p = 0 THEN m END) AS n_all
        FROM trims
    )
    SELECT n_all AS n_orders,
           round(t0 / 100, 4) AS mean_full,
           round(t1 / 100, 4) AS mean_trim1,
           round(t5 / 100, 4) AS mean_trim5,
           round(t10 / 100, 4) AS mean_trim10,
           round((t0 - t10) / 100, 4) AS full_minus_trim10,
           round(abs(t0 - t10) / t0, 6) AS tail_share_of_mean,
           round(abs(t0 - t10) / t0, 6) > 0.05 AS tail_driven
    FROM wide
    """,
    tags=("aggregate", "stats"),
)
def agg_trim_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed-mean sensitivity curve: the mean of order value at
    0 / 1 / 5 / 10 % symmetric trims, all taken from ONE exact
    block-ranked ordering — the trim boundary at level p‰ is the
    PURE INTEGER rank window (p·n div 1000, n − p·n div 1000], so
    the four means share bit-identical membership across engines.
    The curve (not agg_trimmed_mean's single point) answers 'how
    much of the headline average do the tails pay for': a
    tail_share_of_mean above the pinned 5 % flags a mean that moves
    when a handful of extreme orders do. Trim sums are exact
    integers; four divisions and one ratio follow.

    Scale shape: one block-ranked rank over orders, a 4-level
    broadcast ladder filter, one keyed 4-row reduce."""
    from hadoop_deliver_spark.api import exact_global_rank

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    n = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    rk = exact_global_rank(v, "cents", "k", "r")
    lv = spark.createDataFrame(
        [(0,), (10,), (50,), (100,)], ["p"]
    ).select(F.col("p").cast("long").alias("p"))
    trims = (
        rk.crossJoin(F.broadcast(lv))
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("r") > F.expr("div(p * n, 1000)"))
            & (F.col("r") <= F.col("n") - F.expr("div(p * n, 1000)"))
        )
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("cents").cast("long").alias("s"),
        )
    )
    mean = F.col("s").cast("double") / F.col("m")
    wide = trims.agg(
        F.max(F.when(F.col("p") == 0, mean)).alias("t0"),
        F.max(F.when(F.col("p") == 10, mean)).alias("t1"),
        F.max(F.when(F.col("p") == 50, mean)).alias("t5"),
        F.max(F.when(F.col("p") == 100, mean)).alias("t10"),
        F.max(F.when(F.col("p") == 0, F.col("m"))).alias("n_all"),
    )
    drift = F.abs(F.col("t0") - F.col("t10")) / F.col("t0")
    return wide.select(
        F.col("n_all").alias("n_orders"),
        F.round(F.col("t0") / 100, 4).alias("mean_full"),
        F.round(F.col("t1") / 100, 4).alias("mean_trim1"),
        F.round(F.col("t5") / 100, 4).alias("mean_trim5"),
        F.round(F.col("t10") / 100, 4).alias("mean_trim10"),
        F.round((F.col("t0") - F.col("t10")) / 100, 4).alias(
            "full_minus_trim10"
        ),
        F.round(drift, 6).alias("tail_share_of_mean"),
        (F.round(drift, 6) > 0.05).alias("tail_driven"),
    )
