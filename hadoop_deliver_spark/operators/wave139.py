"""§2 extensions, hundred-thirty-ninth wave — ratio inference done
right: Fieller and the delta-method CV interval.

- agg_fieller_ratio_ci: Fieller's theorem (1954) confidence interval
  for the RATIO of two group means (closed vs open order value) —
  the exact-coverage ratio CI that stays valid when the naive
  delta-method interval collapses (denominator near zero); the
  g-statistic says which regime you are in.
- agg_cv_delta_ci: coefficient of variation with its delta-method
  standard error and CI — the relative-variability headline with
  honest uncertainty, completing agg_stats' point estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_fieller_ratio_ci",
    """
    WITH v AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    m AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS q
        FROM v GROUP BY 1
    ),
    two AS (
        SELECT max(CASE WHEN g = 1 THEN n END) AS n1,
               max(CASE WHEN g = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
               max(CASE WHEN g = 1 THEN
                   (q - CAST(s AS DOUBLE) * s / n) / (n - 1) / n END)
                   AS v1,
               max(CASE WHEN g = 2 THEN n END) AS n2,
               max(CASE WHEN g = 2 THEN CAST(s AS DOUBLE) / n END) AS m2,
               max(CASE WHEN g = 2 THEN
                   (q - CAST(s AS DOUBLE) * s / n) / (n - 1) / n END)
                   AS v2
        FROM m
    ),
    fl AS (
        SELECT n1, n2, m1, m2,
               m1 / m2 AS ratio,
               3.8416 * v2 / (m2 * m2) AS gstat,
               (m1 * m2) AS mm, v1, v2
        FROM two
    )
    SELECT n1 AS n_closed, n2 AS n_open,
           round(m1 / 100, 2) AS mean_closed,
           round(m2 / 100, 2) AS mean_open,
           round(ratio, 6) AS ratio,
           round(gstat, 6) AS g_stat,
           round(CASE WHEN gstat < 1 THEN
                 (ratio - 1.96 / m2 * sqrt(v1 + ratio * ratio * v2
                                           - gstat * v1)) / (1 - gstat)
                 END, 6) AS ci_lo,
           round(CASE WHEN gstat < 1 THEN
                 (ratio + 1.96 / m2 * sqrt(v1 + ratio * ratio * v2
                                           - gstat * v1)) / (1 - gstat)
                 END, 6) AS ci_hi,
           gstat < 1 AS bounded_interval
    FROM fl
    """,
    tags=("aggregate", "stats"),
)
def agg_fieller_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fieller's theorem CI for the ratio of mean order values,
    closed ('F') over open/partial: with independent group means
    (m₁, v₁), (m₂, v₂) and g = z²·v₂/m₂², the interval
    [(R ± (z/m₂)·√(v₁ + R²v₂ − g·v₁)) / (1 − g)] has exact
    asymptotic coverage EVEN when the denominator mean is noisy —
    the regime (g ≥ 1 ⇒ the CI is unbounded and reported NULL, with
    the bounded_interval verdict false) that the naive delta-method
    ratio CI silently gets wrong. z = 1.96 (z² = 3.8416) pinned;
    group moments are exact integers; zero covariance by
    independence (documented). The two-group ratio complement of
    agg_newcombe_diff_ci's difference form.

    Scale shape: one 2-group exact-moment reduce, a 2-row pivot,
    closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(2).alias("g"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = v.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sev = (
        (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
        / F.col("n")
    )
    two = m.agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("g") == 1, sev)).alias("v1"),
        F.max(F.when(F.col("g") == 2, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("g") == 2, mean)).alias("m2"),
        F.max(F.when(F.col("g") == 2, sev)).alias("v2"),
    )
    ratio = F.col("m1") / F.col("m2")
    g = 3.8416 * F.col("v2") / (F.col("m2") * F.col("m2"))
    half = (
        1.96
        / F.col("m2")
        * F.sqrt(
            F.col("v1") + ratio * ratio * F.col("v2") - g * F.col("v1")
        )
    )
    return two.select(
        F.col("n1").alias("n_closed"),
        F.col("n2").alias("n_open"),
        F.round(F.col("m1") / 100, 2).alias("mean_closed"),
        F.round(F.col("m2") / 100, 2).alias("mean_open"),
        F.round(ratio, 6).alias("ratio"),
        F.round(g, 6).alias("g_stat"),
        F.round(F.when(g < 1, (ratio - half) / (1 - g)), 6).alias("ci_lo"),
        F.round(F.when(g < 1, (ratio + half) / (1 - g)), 6).alias("ci_hi"),
        (g < 1).alias("bounded_interval"),
    )


@register(
    "agg_cv_delta_ci",
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
    cvx AS (
        SELECT n,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n) AS cv
        FROM mom
    )
    SELECT n AS n_orders,
           round(cv, 6) AS cv,
           round(cv * sqrt(1.0 / (2 * (n - 1)) + cv * cv / n), 6)
               AS se_cv,
           round(cv - 1.96 * cv * sqrt(1.0 / (2 * (n - 1))
                 + cv * cv / n), 6) AS ci_lo,
           round(cv + 1.96 * cv * sqrt(1.0 / (2 * (n - 1))
                 + cv * cv / n), 6) AS ci_hi,
           round(cv, 6) > 1.0 AS overdispersed_vs_exponential
    FROM cvx
    """,
    tags=("aggregate", "stats"),
)
def agg_cv_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation of order value with its delta-method
    standard error se(ĉv) = cv·√(1/(2(n−1)) + cv²/n) and the 95 %
    Wald interval — the relative-variability headline with honest
    uncertainty attached (agg_stats reports the point estimate
    only). The pinned reference verdict compares cv to 1 — the
    exponential distribution's CV — on the ROUNDED value: cv > 1
    is heavier-than-exponential relative spread, the same triage
    direction agg_gamma_fit_mom's shape k < 1 encodes (k = 1/cv²
    under the Gamma). Moments are exact integers; four float
    operations follow.

    Scale shape: one exact-moment reduce, closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    mom = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("double").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2"),
    )
    cv = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    ) / (F.col("s1") / F.col("n"))
    se = cv * F.sqrt(1.0 / (2 * (F.col("n") - 1)) + cv * cv / F.col("n"))
    return mom.select(
        F.col("n").alias("n_orders"),
        F.round(cv, 6).alias("cv"),
        F.round(se, 6).alias("se_cv"),
        F.round(cv - 1.96 * se, 6).alias("ci_lo"),
        F.round(cv + 1.96 * se, 6).alias("ci_hi"),
        (F.round(cv, 6) > 1.0).alias("overdispersed_vs_exponential"),
    )
