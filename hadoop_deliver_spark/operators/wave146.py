"""§2 extensions, hundred-forty-sixth wave — variance-homogeneity
screens.

The ANOVA-precondition family: before trusting agg_oneway_anova /
agg_tukey_hsd (which pool a common error variance), a referee asks
whether the group variances are even comparable. Three classic
screens, each absent until now:

- agg_cochran_c_hartley: Cochran's C (largest variance share) and
  Hartley's Fmax (largest/smallest variance ratio) across the five
  order-priority groups — the two oldest homogeneity statistics,
  complementing the formal agg_bartlett_test / agg_brown_forsythe
  tests with the effect-size view.
- agg_variance_ftest: the classic two-sample variance-ratio F test
  (AUTOMOBILE vs BUILDING account balances) with Paulson's (1942)
  normal approximation for the verdict — the parametric sibling of
  agg_ansari_bradley / agg_conover_squared_ranks.
- agg_paired_ttest: the parametric paired t — per-customer early-
  half vs late-half mean order value deltas — closing the paired
  triple next to its nonparametric siblings events_sign_test and
  agg_wilcoxon_signedrank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_cochran_c_hartley",
    """
    WITH x AS (
        SELECT o_orderpriority AS grp,
               CAST(floor(o_totalprice) AS BIGINT) AS v
        FROM orders
    ),
    g AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
        FROM x GROUP BY 1
    ),
    v AS (
        SELECT grp, n,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                   / (n - 1) AS var_g
        FROM g
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           min(n) AS n_min, max(n) AS n_max,
           round(max(var_g) / sum(var_g), 4) AS c_stat,
           round(max(var_g) * count(*) / sum(var_g), 4) AS c_ratio,
           round(max(var_g) / min(var_g), 4) AS fmax,
           max(var_g) / min(var_g) < 4.0 AS homogeneous_rot
    FROM v
    """,
    tags=("agg", "stats"),
)
def agg_cochran_c_hartley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's C (1941) and Hartley's Fmax (1950) variance-
    homogeneity screens across the five order-priority groups on
    whole-dollar order totals: C = max(s²ᵢ)/Σs²ᵢ (share of the total
    variance held by the most variable group; C·k = 1 under perfect
    homogeneity) and Fmax = max(s²ᵢ)/min(s²ᵢ). Per-group power sums
    Σv, Σv² accumulate as exact DECIMAL(38)/HUGEINT integers, so each
    group variance is one fixed textual expression over bit-identical
    inputs on both engines; the boolean applies Hartley's classical
    Fmax < 4 rule-of-thumb for balanced moderate samples (David 1952
    tables put the k=5 5% critical between ~1.6 and ~9 depending on
    df — the literal 4 is the screening convention, stated as such).
    Fmax divides two identical doubles, so the verdict cannot drift;
    C rounds at 4 (the k-term double sum Σs²ᵢ is order-sensitive in
    the last ulp only).

    Complements agg_bartlett_test (formal χ², normal-sensitive) and
    agg_brown_forsythe (robust) with the effect-size view a referee
    reads first.

    Scale shape: ONE keyed reduce of the fact table to k=5 rows
    (n, Σv, Σv² per priority), then a 1-row assembly — no joins, no
    windows, map-side partial aggregation throughout."""
    o = tbl(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor("o_totalprice").cast("long").alias("v"),
    )
    vdec = F.col("v").cast("decimal(38,0)")
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(vdec * F.col("v")).alias("s2"),
    )
    var_g = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    v = g.select("grp", "n", var_g.alias("var_g"))
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("n").alias("n_min"),
        F.max("n").alias("n_max"),
        F.round(F.max("var_g") / F.sum("var_g"), 4).alias("c_stat"),
        F.round(
            F.max("var_g") * F.count(F.lit(1)) / F.sum("var_g"), 4
        ).alias("c_ratio"),
        F.round(F.max("var_g") / F.min("var_g"), 4).alias("fmax"),
        (F.max("var_g") / F.min("var_g") < 4.0).alias("homogeneous_rot"),
    )


@register(
    "agg_variance_ftest",
    """
    WITH x AS (
        SELECT c_mktsegment AS seg,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    s AS (
        SELECT
            CAST(count(*) FILTER (seg = 'AUTOMOBILE') AS BIGINT) AS n_a,
            CAST(sum(cents) FILTER (seg = 'AUTOMOBILE') AS BIGINT) AS s1_a,
            CAST(sum(CAST(cents AS HUGEINT) * cents)
                 FILTER (seg = 'AUTOMOBILE') AS HUGEINT) AS s2_a,
            CAST(count(*) FILTER (seg = 'BUILDING') AS BIGINT) AS n_b,
            CAST(sum(cents) FILTER (seg = 'BUILDING') AS BIGINT) AS s1_b,
            CAST(sum(CAST(cents AS HUGEINT) * cents)
                 FILTER (seg = 'BUILDING') AS HUGEINT) AS s2_b
        FROM x
    ),
    v AS (
        SELECT n_a, n_b,
               (CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                   / (n_a - 1) AS var_a,
               (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                   / (n_b - 1) AS var_b
        FROM s
    ),
    f AS (
        SELECT n_a, n_b, var_a, var_b, var_a / var_b AS fr,
               CAST(n_a - 1 AS DOUBLE) AS dfa,
               CAST(n_b - 1 AS DOUBLE) AS dfb
        FROM v
    )
    SELECT n_a, n_b,
           round(fr, 6) AS f_ratio,
           round(((1 - 2 / (9 * dfb)) * cbrt(fr) - (1 - 2 / (9 * dfa)))
                 / sqrt(2 / (9 * dfa)
                        + (2 / (9 * dfb)) * cbrt(fr) * cbrt(fr)),
                 4) AS paulson_z,
           abs(round(((1 - 2 / (9 * dfb)) * cbrt(fr)
                      - (1 - 2 / (9 * dfa)))
                 / sqrt(2 / (9 * dfa)
                        + (2 / (9 * dfb)) * cbrt(fr) * cbrt(fr)),
                 4)) < 1.96 AS variances_equal
    FROM f
    """,
    tags=("agg", "stats"),
)
def agg_variance_ftest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample variance-ratio F test on account-balance cents,
    AUTOMOBILE vs BUILDING segments: F = s²_A/s²_B with
    (n_A−1, n_B−1) df, verdict via Paulson's (1942) cube-root normal
    approximation z = ((1−2/9ν₂)·F^⅓ − (1−2/9ν₁)) /
    √(2/9ν₁ + (2/9ν₂)·F^⅔) — the closed form that keeps the critical
    bracket computable without an F-quantile table, accurate to ~1e-3
    in p for df ≥ 10. Both variances assemble from exact integer cent
    power sums in one fixed textual expression, so F is bit-identical
    across engines; z rounds at 4 (cbrt may differ in the last ulp
    between libm implementations) and the verdict compares the
    ROUNDED z against the shared 1.96 literal.

    The parametric member of the scale-difference family next to
    agg_ansari_bradley / agg_conover_squared_ranks / agg_moses_extreme
    (rank-based) and agg_levene_mean / agg_brown_forsythe (k-group).

    Scale shape: ONE filtered global reduce (six conditional sums),
    then 1-row closed-form scalars."""
    c = tbl(spark, sf_dir, "customer")
    x = c.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        (dec2("c_acctbal") * 100).cast("long").alias("cents"),
    )
    cd = F.col("cents").cast("decimal(38,0)")
    is_a = F.col("seg") == "AUTOMOBILE"
    s = x.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_a, F.col("cents"))).cast("long").alias("s1_a"),
        F.sum(F.when(is_a, cd * F.col("cents"))).alias("s2_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(~is_a, F.col("cents"))).cast("long").alias("s1_b"),
        F.sum(F.when(~is_a, cd * F.col("cents"))).alias("s2_b"),
    )
    var_a = (
        F.col("s2_a").cast("double")
        - F.col("s1_a").cast("double") * F.col("s1_a") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("s2_b").cast("double")
        - F.col("s1_b").cast("double") * F.col("s1_b") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    f = s.select(
        "n_a",
        "n_b",
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        (var_a / var_b).alias("fr"),
        (F.col("n_a") - 1).cast("double").alias("dfa"),
        (F.col("n_b") - 1).cast("double").alias("dfb"),
    )
    fr, dfa, dfb = F.col("fr"), F.col("dfa"), F.col("dfb")
    z = (
        (1 - 2 / (9 * dfb)) * F.cbrt(fr) - (1 - 2 / (9 * dfa))
    ) / F.sqrt(2 / (9 * dfa) + (2 / (9 * dfb)) * F.cbrt(fr) * F.cbrt(fr))
    return f.select(
        "n_a",
        "n_b",
        F.round(fr, 6).alias("f_ratio"),
        F.round(z, 4).alias("paulson_z"),
        (F.abs(F.round(z, 4)) < 1.96).alias("variances_equal"),
    )


@register(
    "agg_paired_ttest",
    """
    WITH h AS (
        SELECT o_custkey,
               CAST(count(*) FILTER (o_orderdate < TIMESTAMP '1998-06-01')
                    AS BIGINT) AS n1,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT))
                    FILTER (o_orderdate < TIMESTAMP '1998-06-01')
                    AS BIGINT) AS s1,
               CAST(count(*) FILTER (o_orderdate >= TIMESTAMP '1998-06-01')
                    AS BIGINT) AS n2,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT))
                    FILTER (o_orderdate >= TIMESTAMP '1998-06-01')
                    AS BIGINT) AS s2
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1) / 100
                   AS d
        FROM h WHERE n1 > 0 AND n2 > 0
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               avg(d) AS md, sum(d * d) AS sdd
        FROM d
    )
    SELECT n AS n_pairs,
           round(md, 4) AS mean_delta,
           round(sqrt((sdd - n * md * md) / (n - 1)), 4) AS sd_delta,
           round(md * sqrt(CAST(n AS DOUBLE))
                 / sqrt((sdd - n * md * md) / (n - 1)), 4) AS t_stat,
           abs(round(md * sqrt(CAST(n AS DOUBLE))
                 / sqrt((sdd - n * md * md) / (n - 1)), 4)) > 1.96
               AS shifted
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test on per-customer order-value drift: for every
    customer with orders on BOTH sides of the pinned 1998-06-01
    midpoint of the order history, the paired difference is
    d = mean(late-half totalprice) − mean(early-half), and
    t = d̄·√n / s_d with n−1 df (large-sample 1.96 verdict on the
    ROUNDED t). The per-customer half-means divide exact integer cent
    sums, so each d is one fixed textual expression over bit-identical
    inputs; the cross-customer moment sums Σd, Σd² are order-sensitive
    doubles whose last-ulp wobble vanishes at the round-4 display.
    Closes the paired triple: events_sign_test (signs only),
    agg_wilcoxon_signedrank (signed ranks), and now the parametric t
    on the same early/late design.

    Scale shape: ONE keyed per-customer reduce (four conditional
    sums), then a 1-row moment reduce — no joins, no windows."""
    o = tbl(spark, sf_dir, "orders")
    cut = F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    cents = (dec2("o_totalprice") * 100).cast("long")
    h = o.groupBy("o_custkey").agg(
        F.sum(F.when(cut, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(cut, cents)).cast("long").alias("s1"),
        F.sum(F.when(~cut, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(~cut, cents)).cast("long").alias("s2"),
    )
    d = h.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        (
            (
                F.col("s2").cast("double") / F.col("n2")
                - F.col("s1").cast("double") / F.col("n1")
            )
            / 100
        ).alias("d")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("d").alias("md"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    n, md, sdd = F.col("n"), F.col("md"), F.col("sdd")
    sd = F.sqrt((sdd - n * md * md) / (n - 1))
    t = md * F.sqrt(n.cast("double")) / sd
    return m.select(
        n.alias("n_pairs"),
        F.round(md, 4).alias("mean_delta"),
        F.round(sd, 4).alias("sd_delta"),
        F.round(t, 4).alias("t_stat"),
        (F.abs(F.round(t, 4)) > 1.96).alias("shifted"),
    )
