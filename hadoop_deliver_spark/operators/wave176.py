"""§2 extensions, hundred-seventy-sixth wave — effect sizes the
test-statistic family implies but never reports.

- agg_point_biserial: the point-biserial correlation between the
  return flag and line price — the dichotomous-continuous Pearson,
  with its exact t equivalence; the parametric counterpart of
  agg_mw_effect_size's rank-based common-language effect.
- agg_eta_omega_squared: η² and the less-biased ω² for the
  segment→balance one-way design — the variance-explained effect
  sizes behind agg_oneway_anova's F (an F can be huge while ω²
  stays trivial at scale; reporting both is the APA-manual rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_point_biserial",
    """
    WITH x AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (y = 1) AS BIGINT) AS n1,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
               CAST(sum(CASE WHEN y = 1 THEN v END) AS BIGINT) AS s1r
        FROM x
    ),
    m AS (
        SELECT n, n1, n - n1 AS n0,
               CAST(s1r AS DOUBLE) / n1 AS mu1,
               CAST(s1 - s1r AS DOUBLE) / (n - n1) AS mu0,
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1 / n) / n) AS sd
        FROM s
    )
    SELECT n AS n_lines, n1 AS n_returned,
           round((mu1 - mu0) / sd
                 * sqrt(CAST(n1 AS DOUBLE) * n0 / (CAST(n AS DOUBLE) * n)),
                 6) AS r_pb,
           round((mu1 - mu0) / sd
                 * sqrt(CAST(n1 AS DOUBLE) * n0 / (CAST(n AS DOUBLE) * n))
                 * sqrt((n - 2)
                        / (1 - pow((mu1 - mu0) / sd
                           * sqrt(CAST(n1 AS DOUBLE) * n0
                                  / (CAST(n AS DOUBLE) * n)), 2))), 4)
               AS t_stat,
           abs(round((mu1 - mu0) / sd
                 * sqrt(CAST(n1 AS DOUBLE) * n0 / (CAST(n AS DOUBLE) * n))
                 * sqrt((n - 2)
                        / (1 - pow((mu1 - mu0) / sd
                           * sqrt(CAST(n1 AS DOUBLE) * n0
                                  / (CAST(n AS DOUBLE) * n)), 2))), 4))
               > 1.96 AS price_differs_by_return
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_point_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-biserial correlation (Pearson with a 0/1 dummy) between
    the return flag and line price cents:
    r_pb = (μ₁−μ₀)/σₙ · √(n₁n₀/n²) with the POPULATION σ (the
    convention under which r_pb is exactly the Pearson r of (y, v)),
    and its algebraic t equivalence t = r√((n−2)/(1−r²)) with the
    1.96 verdict on the ROUNDED t. This is the parametric
    dollars-scale answer to 'do returned lines cost more?' where
    agg_mw_effect_size answers in rank probability — same question,
    different invariances, and the pair is the standard report. All
    moment inputs are exact integers (cents, conditional cent sums,
    Σv² in the 38-digit envelope); the assembly is one fixed textual
    chain.

    Scale shape: ONE global reduce (five sums), 1-row scalars."""
    li = tbl(spark, sf_dir, "lineitem")
    x = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (dec2("l_extendedprice") * 100).cast("long").alias("v"),
    )
    vd = F.col("v").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
        F.sum(F.when(F.col("y") == 1, F.col("v"))).cast("long").alias("s1r"),
    )
    n, n1 = F.col("n"), F.col("n1")
    n0 = n - n1
    mu1 = F.col("s1r").cast("double") / n1
    mu0 = (F.col("s1") - F.col("s1r")).cast("double") / n0
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n)
        / n
    )
    m = s.select(
        n.alias("n"),
        n1.alias("n1"),
        n0.alias("n0"),
        mu1.alias("mu1"),
        mu0.alias("mu0"),
        sd.alias("sd"),
    )
    r = (
        (F.col("mu1") - F.col("mu0"))
        / F.col("sd")
        * F.sqrt(
            F.col("n1").cast("double")
            * F.col("n0")
            / (F.col("n").cast("double") * F.col("n"))
        )
    )
    t = r * F.sqrt((F.col("n") - 2) / (1 - F.pow(r, 2)))
    return m.select(
        F.col("n").alias("n_lines"),
        F.col("n1").alias("n_returned"),
        F.round(r, 6).alias("r_pb"),
        F.round(t, 4).alias("t_stat"),
        (F.abs(F.round(t, 4)) > 1.96).alias("price_differs_by_return"),
    )


@register(
    "agg_eta_omega_squared",
    """
    WITH x AS (
        SELECT c_mktsegment AS g,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM customer
    ),
    per AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(v) AS BIGINT) AS sg
        FROM x GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT g) AS BIGINT) AS k,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
        FROM x
    ),
    ss AS (
        SELECT t.n, t.k,
               CAST(t.s2 AS DOUBLE)
                   - CAST(t.s1 AS DOUBLE) * t.s1 / t.n AS ss_tot,
               sum(CAST(p.sg AS DOUBLE) * p.sg / p.ng)
                   - CAST(t.s1 AS DOUBLE) * t.s1 / t.n AS ss_between
        FROM per p CROSS JOIN tot t
        GROUP BY t.n, t.k, t.s1, t.s2
    )
    SELECT n AS n_customers, k AS n_groups,
           round(ss_between / ss_tot, 6) AS eta_squared,
           round((ss_between - (k - 1)
                  * ((ss_tot - ss_between) / (n - k)))
                 / (ss_tot + (ss_tot - ss_between) / (n - k)), 6)
               AS omega_squared,
           round((ss_between / (k - 1))
                 / ((ss_tot - ss_between) / (n - k)), 4) AS f_stat
    FROM ss
    """,
    tags=("agg", "stats"),
)
def agg_eta_omega_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-explained effect sizes for the segment→balance
    one-way design: η² = SS_between/SS_total (the descriptive share,
    upward-biased in small groups) and Hays' ω² =
    (SS_b − (k−1)·MS_w)/(SS_t + MS_w) (the unbiased population
    estimate), beside the F they both underlie — the APA-report
    triple that agg_oneway_anova's bare F omits, and the reason a
    'highly significant' F on big n can describe a trivially small
    effect (at 10⁹ rows F explodes while ω² sits still — exactly the
    scale regime this engine targets). All sums of squares assemble
    from exact integer cent moments (Σv, Σv², per-group Σ) in one
    fixed textual chain.

    Scale shape: one group-keyed reduce (≤5 rows), one global
    moment reduce, a 5-row assembly — map-side combine throughout."""
    c = tbl(spark, sf_dir, "customer")
    x = c.select(
        F.col("c_mktsegment").alias("g"),
        (dec2("c_acctbal") * 100).cast("long").alias("v"),
    )
    vd = F.col("v").cast("decimal(38,0)")
    per = x.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("v").cast("long").alias("sg"),
    )
    tot = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("g").cast("long").alias("k"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vd * F.col("v")).alias("s2"),
    )
    ss = (
        per.crossJoin(F.broadcast(tot))
        .groupBy("n", "k", "s1", "s2")
        .agg(
            F.sum(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng")
            ).alias("between_raw")
        )
        .select(
            "n",
            "k",
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            ).alias("ss_tot"),
            (
                F.col("between_raw")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            ).alias("ss_between"),
        )
    )
    n, k = F.col("n"), F.col("k")
    ssw = F.col("ss_tot") - F.col("ss_between")
    msw = ssw / (n - k)
    return ss.select(
        n.alias("n_customers"),
        k.alias("n_groups"),
        F.round(F.col("ss_between") / F.col("ss_tot"), 6).alias(
            "eta_squared"
        ),
        F.round(
            (F.col("ss_between") - (k - 1) * msw)
            / (F.col("ss_tot") + msw),
            6,
        ).alias("omega_squared"),
        F.round((F.col("ss_between") / (k - 1)) / msw, 4).alias("f_stat"),
    )
