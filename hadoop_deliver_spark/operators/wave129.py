"""§2 extensions, hundred-twenty-ninth wave — cluster quality and
moment-fit tails.

- llm_embedding_silhouette: simplified silhouette (centroid-based
  a/b distances) per label over the embedding table — the cluster-
  quality score used to vet label taxonomies before training on
  them; O(n·d·L) with a broadcast centroid table, never O(n²).
- agg_gamma_fit_mom: Gamma distribution method-of-moments fit of
  order value with the mean-excess ladder diagnostic — the
  light-tail counterpart of agg_lognormal_fit and orders_pot_gpd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "llm_embedding_silhouette",
    """
    WITH comp AS (
        SELECT vec_id, label, i AS dim,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cen AS (
        SELECT label, dim, avg(x) AS m FROM comp GROUP BY 1, 2
    ),
    d2 AS (
        SELECT c.vec_id, c.label AS own, n.label AS other,
               sum((c.x - n.m) * (c.x - n.m)) AS dd
        FROM comp c JOIN cen n ON c.dim = n.dim
        GROUP BY 1, 2, 3
    ),
    ab AS (
        SELECT vec_id, own,
               sqrt(max(CASE WHEN own = other THEN dd END)) AS a,
               sqrt(min(CASE WHEN own <> other THEN dd END)) AS b
        FROM d2 GROUP BY 1, 2
    ),
    sil AS (
        SELECT own AS label, CAST(count(*) AS BIGINT) AS n_vectors,
               avg((b - a) / greatest(a, b)) AS s,
               avg(a) AS mean_a, avg(b) AS mean_b
        FROM ab GROUP BY 1
    )
    SELECT label, n_vectors,
           round(s, 6) AS silhouette,
           round(mean_a, 6) AS mean_own_dist,
           round(mean_b, 6) AS mean_next_dist
    FROM sil ORDER BY label
    """,
    tags=("llm", "embedding"),
)
def llm_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per embedding label: for each
    vector, a = distance to its OWN label centroid, b = distance to
    the NEAREST other centroid, s = (b − a)/max(a, b) — the
    centroid-based variant (Hruschka 2004) that replaces the O(n²)
    pairwise silhouette with O(n·L) centroid distances and is the
    standard screen for 'are these labels real clusters' before
    training a classifier on them. s near 1 = tight and separated,
    near 0 = overlapping, negative = mislabeled. Per-(vector,
    centroid) squared distances are exact float sums over the 64
    dims; the a/b pivot and the s reduce are the identical chain on
    both sides.

    Scale shape: one posexplode, a 64·L-row centroid reduce
    broadcast back onto the component stream (join on dim), one
    (vector × label) keyed reduce, one per-label reduce. No
    pairwise vector join anywhere."""
    emb = tbl(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "label", "dim", F.col("xf").cast("double").alias("x"))
    cen = comp.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.avg("x").alias("m")
    )
    d2 = (
        comp.join(F.broadcast(cen), "dim")
        .groupBy("vec_id", F.col("label").alias("own"), F.col("clabel").alias("other"))
        .agg(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("dd"))
    )
    ab = d2.groupBy("vec_id", "own").agg(
        F.sqrt(
            F.max(F.when(F.col("own") == F.col("other"), F.col("dd")))
        ).alias("a"),
        F.sqrt(
            F.min(F.when(F.col("own") != F.col("other"), F.col("dd")))
        ).alias("b"),
    )
    sil = ab.groupBy(F.col("own").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.avg(
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
        ).alias("s"),
        F.avg("a").alias("mean_a"),
        F.avg("b").alias("mean_b"),
    )
    return sil.select(
        "label",
        "n_vectors",
        F.round(F.col("s"), 6).alias("silhouette"),
        F.round(F.col("mean_a"), 6).alias("mean_own_dist"),
        F.round(F.col("mean_b"), 6).alias("mean_next_dist"),
    ).orderBy("label")


@register(
    "agg_gamma_fit_mom",
    """
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2
        FROM v
    ),
    par AS (
        SELECT n,
               s1 / n AS mu,
               (s2 - s1 * s1 / n) / (n - 1) AS var
        FROM mom
    ),
    me AS (
        SELECT par.n,
               sum(CASE WHEN v.cents > par.mu
                        THEN v.cents - par.mu ELSE 0 END) AS e1,
               CAST(sum(CASE WHEN v.cents > par.mu THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               sum(CASE WHEN v.cents > 1.5 * par.mu
                        THEN v.cents - 1.5 * par.mu ELSE 0 END) AS e2,
               CAST(sum(CASE WHEN v.cents > 1.5 * par.mu THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM v, par GROUP BY 1
    )
    SELECT p.n AS n_orders,
           round(p.mu * p.mu / p.var, 4) AS shape_k,
           round(p.var / p.mu / 100, 4) AS scale_theta,
           round(p.mu / 100, 2) AS mean_dollars,
           round(sqrt(p.var) / p.mu, 4) AS cv,
           round(m.e1 / m.c1 / 100, 2) AS mean_excess_at_mu,
           round(CASE WHEN m.c2 > 0 THEN m.e2 / m.c2 / 100 END, 2)
               AS mean_excess_at_15mu,
           round(CASE WHEN m.c2 > 0
                 THEN (m.e2 / m.c2) / (m.e1 / m.c1) END, 4)
               AS excess_ratio
    FROM par p, me m
    """,
    tags=("aggregate", "stats"),
)
def agg_gamma_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma method-of-moments fit of order value — shape
    k̂ = μ̂²/σ̂², scale θ̂ = σ̂²/μ̂ — with the mean-excess ladder
    diagnostic: e(u) = E[X−u | X>u] at u = μ and u = 1.5μ (NULL-guarded when the upper slice is empty). For a
    Gamma (light) tail the mean excess FLATTENS as u grows; a
    rising excess_ratio ≫ 1 says the tail is heavier than Gamma
    and orders_pot_gpd's machinery is warranted — the cheap triage
    between agg_lognormal_fit, this, and the GPD. Moments are exact
    integers (HUGEINT squares); the excess sums are integer
    comparisons against the broadcast float threshold, identical on
    both engines (IEEE comparisons agree bit-for-bit).

    Scale shape: one exact-moment reduce, one broadcast-threshold
    conditional reduce."""
    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    mom = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("double").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2"),
    )
    par = mom.select(
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    me = v.crossJoin(F.broadcast(par)).agg(
        F.sum(
            F.when(
                F.col("cents") > F.col("mu"), F.col("cents") - F.col("mu")
            ).otherwise(0.0)
        ).alias("e1"),
        F.sum(F.when(F.col("cents") > F.col("mu"), 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(
            F.when(
                F.col("cents") > 1.5 * F.col("mu"),
                F.col("cents") - 1.5 * F.col("mu"),
            ).otherwise(0.0)
        ).alias("e2"),
        F.sum(F.when(F.col("cents") > 1.5 * F.col("mu"), 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    return par.crossJoin(F.broadcast(me)).select(
        F.col("n").alias("n_orders"),
        F.round(F.col("mu") * F.col("mu") / F.col("var"), 4).alias("shape_k"),
        F.round(F.col("var") / F.col("mu") / 100, 4).alias("scale_theta"),
        F.round(F.col("mu") / 100, 2).alias("mean_dollars"),
        F.round(F.sqrt(F.col("var")) / F.col("mu"), 4).alias("cv"),
        F.round(F.col("e1") / F.col("c1") / 100, 2).alias(
            "mean_excess_at_mu"
        ),
        F.round(
            F.when(F.col("c2") > 0, F.col("e2") / F.col("c2") / 100), 2
        ).alias("mean_excess_at_15mu"),
        F.round(
            F.when(
                F.col("c2") > 0,
                (F.col("e2") / F.col("c2")) / (F.col("e1") / F.col("c1")),
            ),
            4,
        ).alias("excess_ratio"),
    )
