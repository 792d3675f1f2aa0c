"""§2 extensions, hundred-fourteenth wave — random-effects meta
pooling and the Newcombe difference-of-proportions interval.

- agg_meta_random_effect: DerSimonian–Laird (1986) random-effects
  meta-analysis — the method-of-moments τ² between-study variance
  and the re-weighted pool; the heterogeneity-honest twin of
  agg_meta_fixed_effect (which assumes one true mean).
- agg_newcombe_diff_ci: Newcombe's (1998, method 10) hybrid Wilson
  score interval for the DIFFERENCE of two proportions — the
  recommended replacement for the Wald diff CI; the two-sample
  extension of agg_wilson_interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_meta_random_effect",
    """
    WITH j AS (
        SELECT c.c_nationkey AS nation,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT nation, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS q
        FROM j GROUP BY 1
    ),
    st AS (
        SELECT nation, n,
               CAST(s AS DOUBLE) / n AS m,
               (q - CAST(s AS DOUBLE) * s / n) / (n - 1) / n AS se2
        FROM g WHERE n >= 2
    ),
    p1 AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_total,
               sum(1.0 / se2) AS sw,
               sum(1.0 / (se2 * se2)) AS sw2,
               sum(m / se2) AS swm,
               sum(m * m / se2) AS swmm
        FROM st
    ),
    tau AS (
        SELECT k, n_total, sw, swm,
               greatest(0.0, ((swmm - swm * swm / sw) - (k - 1))
                             / (sw - sw2 / sw)) AS tau2
        FROM p1
    ),
    p2 AS (
        SELECT t.k, t.n_total, t.tau2, t.sw, t.swm,
               sum(1.0 / (s.se2 + t.tau2)) AS swr,
               sum(s.m / (s.se2 + t.tau2)) AS swrm
        FROM st s CROSS JOIN tau t
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT k AS n_studies, n_total AS n_orders,
           round(sqrt(tau2) / 100, 4) AS tau_dollars,
           round(swrm / swr / 100, 4) AS pooled_mean_re,
           round(196.0 / sqrt(swr) / 100, 4) AS ci_halfwidth_re,
           round((swrm / swr - swm / sw) / 100, 4) AS re_minus_fe,
           round(sqrt(sw / swr), 4) AS ci_widening
    FROM p2
    """,
    tags=("aggregate", "stats"),
)
def agg_meta_random_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DerSimonian–Laird (1986) random-effects meta-analysis of mean
    order value across the 25 nations-as-studies: the
    method-of-moments between-study variance
    τ² = max(0, (Q − (k−1))/(Σw − Σw²/Σw)) from the SAME fixed-effect
    Q as agg_meta_fixed_effect, then re-weighted pooling with
    w*_i = 1/(se_i² + τ²) — wide studies no longer dominate once
    real heterogeneity exists. Reports τ (dollars), the RE pooled
    mean and CI half-width, the RE−FE shift, and the CI-widening
    factor √(Σw/Σw*) ≥ 1 — the honest price of heterogeneity.
    Per-study moments are exact integers; both engines run the
    identical two-pass float chain (25-study sums → τ² broadcast
    back → 25-study re-sum), so drift stays at the shared-ulp level
    round-4 absorbs.

    Scale shape: one broadcast join + keyed reduce to 25 study rows,
    a 1-row τ² reduce broadcast back, one 25-row re-reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("q"),
    )
    st = g.filter(F.col("n") >= 2).select(
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        (
            (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
            / F.col("n")
        ).alias("se2"),
    )
    p1 = st.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum(1.0 / F.col("se2")).alias("sw"),
        F.sum(1.0 / (F.col("se2") * F.col("se2"))).alias("sw2"),
        F.sum(F.col("m") / F.col("se2")).alias("swm"),
        F.sum(F.col("m") * F.col("m") / F.col("se2")).alias("swmm"),
    )
    q_ = F.col("swmm") - F.col("swm") * F.col("swm") / F.col("sw")
    tau = p1.select(
        "k",
        "n_total",
        "sw",
        "swm",
        F.greatest(
            F.lit(0.0),
            (q_ - (F.col("k") - 1)) / (F.col("sw") - F.col("sw2") / F.col("sw")),
        ).alias("tau2"),
    )
    p2 = (
        st.crossJoin(F.broadcast(tau))
        .groupBy("k", "n_total", "tau2", "sw", "swm")
        .agg(
            F.sum(1.0 / (F.col("se2") + F.col("tau2"))).alias("swr"),
            F.sum(F.col("m") / (F.col("se2") + F.col("tau2"))).alias("swrm"),
        )
    )
    return p2.select(
        F.col("k").alias("n_studies"),
        F.col("n_total").alias("n_orders"),
        F.round(F.sqrt(F.col("tau2")) / 100, 4).alias("tau_dollars"),
        F.round(F.col("swrm") / F.col("swr") / 100, 4).alias(
            "pooled_mean_re"
        ),
        F.round(196.0 / F.sqrt(F.col("swr")) / 100, 4).alias(
            "ci_halfwidth_re"
        ),
        F.round(
            (F.col("swrm") / F.col("swr") - F.col("swm") / F.col("sw")) / 100,
            4,
        ).alias("re_minus_fe"),
        F.round(F.sqrt(F.col("sw") / F.col("swr")), 4).alias("ci_widening"),
    )


@register(
    "agg_newcombe_diff_ci",
    """
    WITH g AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 'closed'
                    ELSE 'open_or_partial' END AS grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (o_orderpriority IN
                    ('1-URGENT', '2-HIGH')) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT grp, n, x,
               CAST(x AS DOUBLE) / n AS p,
               (x + 1.9208) / (n + 3.8416)
                   - 1.96 * sqrt((CAST(x AS DOUBLE) / n)
                                 * (1 - CAST(x AS DOUBLE) / n) / n
                                 + 0.9604 / (CAST(n AS DOUBLE) * n))
                     / (1 + 3.8416 / n) AS lo,
               (x + 1.9208) / (n + 3.8416)
                   + 1.96 * sqrt((CAST(x AS DOUBLE) / n)
                                 * (1 - CAST(x AS DOUBLE) / n) / n
                                 + 0.9604 / (CAST(n AS DOUBLE) * n))
                     / (1 + 3.8416 / n) AS hi
        FROM g
    ),
    two AS (
        SELECT max(CASE WHEN grp = 'closed' THEN n END) AS n1,
               max(CASE WHEN grp = 'closed' THEN x END) AS x1,
               max(CASE WHEN grp = 'closed' THEN p END) AS p1,
               max(CASE WHEN grp = 'closed' THEN lo END) AS l1,
               max(CASE WHEN grp = 'closed' THEN hi END) AS u1,
               max(CASE WHEN grp <> 'closed' THEN n END) AS n2,
               max(CASE WHEN grp <> 'closed' THEN x END) AS x2,
               max(CASE WHEN grp <> 'closed' THEN p END) AS p2,
               max(CASE WHEN grp <> 'closed' THEN lo END) AS l2,
               max(CASE WHEN grp <> 'closed' THEN hi END) AS u2
        FROM w
    )
    SELECT n1, x1, n2, x2,
           round(p1, 6) AS p_closed,
           round(p2, 6) AS p_open,
           round(p1 - p2, 6) AS diff,
           round(p1 - p2 - sqrt((p1 - l1) * (p1 - l1)
                                + (u2 - p2) * (u2 - p2)), 6) AS ci_lo,
           round(p1 - p2 + sqrt((u1 - p1) * (u1 - p1)
                                + (p2 - l2) * (p2 - l2)), 6) AS ci_hi,
           round(p1 - p2 - sqrt((p1 - l1) * (p1 - l1)
                                + (u2 - p2) * (u2 - p2)), 6) > 0
               OR round(p1 - p2 + sqrt((u1 - p1) * (u1 - p1)
                                       + (p2 - l2) * (p2 - l2)), 6) < 0
               AS excludes_zero
    FROM two
    """,
    tags=("aggregate", "stats"),
)
def agg_newcombe_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe (1998, method 10) hybrid Wilson score interval for
    the difference of two proportions: share of high-priority
    (URGENT/HIGH) orders among closed ('F') vs open/partial orders.
    Each group gets its Wilson interval [l, u] (z = 1.96; the
    z² = 3.8416 / z²∕2 = 1.9208 / z²∕4 = 0.9604 literals are pinned
    identically on both sides), then the diff CI is
    d ± √((p₁−l₁)² + (u₂−p₂)²) / √((u₁−p₁)² + (p₂−l₂)²) — never
    collapses at p near 0/1 and respects the [−1, 1] range, which
    the Wald form does not. Counts are PURE INTEGER; the
    excludes-zero verdict compares the ROUNDED bounds so both
    engines decide from identical numbers. Two-sample extension of
    agg_wilson_interval.

    Scale shape: one map-side-combined 2-group reduce, a 2-row
    pivot, closed-form scalar algebra."""
    o = tbl(spark, sf_dir, "orders")
    g = o.groupBy(
        F.when(F.col("o_orderstatus") == "F", "closed")
        .otherwise("open_or_partial")
        .alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("x"),
    )
    p = F.col("x").cast("double") / F.col("n")
    center = (F.col("x") + 1.9208) / (F.col("n") + 3.8416)
    half = (
        1.96
        * F.sqrt(
            p * (1 - p) / F.col("n")
            + 0.9604 / (F.col("n").cast("double") * F.col("n"))
        )
        / (1 + 3.8416 / F.col("n"))
    )
    w = g.select(
        "grp",
        "n",
        "x",
        p.alias("p"),
        (center - half).alias("lo"),
        (center + half).alias("hi"),
    )
    is1 = F.col("grp") == "closed"
    two = w.agg(
        F.max(F.when(is1, F.col("n"))).alias("n1"),
        F.max(F.when(is1, F.col("x"))).alias("x1"),
        F.max(F.when(is1, F.col("p"))).alias("p1"),
        F.max(F.when(is1, F.col("lo"))).alias("l1"),
        F.max(F.when(is1, F.col("hi"))).alias("u1"),
        F.max(F.when(~is1, F.col("n"))).alias("n2"),
        F.max(F.when(~is1, F.col("x"))).alias("x2"),
        F.max(F.when(~is1, F.col("p"))).alias("p2"),
        F.max(F.when(~is1, F.col("lo"))).alias("l2"),
        F.max(F.when(~is1, F.col("hi"))).alias("u2"),
    )
    d = F.col("p1") - F.col("p2")
    down = F.sqrt(
        (F.col("p1") - F.col("l1")) * (F.col("p1") - F.col("l1"))
        + (F.col("u2") - F.col("p2")) * (F.col("u2") - F.col("p2"))
    )
    up = F.sqrt(
        (F.col("u1") - F.col("p1")) * (F.col("u1") - F.col("p1"))
        + (F.col("p2") - F.col("l2")) * (F.col("p2") - F.col("l2"))
    )
    return two.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(F.col("p1"), 6).alias("p_closed"),
        F.round(F.col("p2"), 6).alias("p_open"),
        F.round(d, 6).alias("diff"),
        F.round(d - down, 6).alias("ci_lo"),
        F.round(d + up, 6).alias("ci_hi"),
        (
            (F.round(d - down, 6) > 0) | (F.round(d + up, 6) < 0)
        ).alias("excludes_zero"),
    )
