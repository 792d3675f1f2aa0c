"""§2 extensions, hundred-fifty-sixth wave — homogeneity breaks and
the law of proportionate effect.

- ts_snht: Alexandersson's (1986) Standard Normal Homogeneity Test
  on the daily revenue series — the fourth classic of the
  changepoint family (ts_changepoint_pettitt ranks, ts_buishand_range
  partial sums, ts_cusum_changepoint cumulative deviations; SNHT is
  the LIKELIHOOD-flavored one, weighting both segment means by
  segment length, which makes it the most sensitive of the four to
  breaks near the series ends).
- customers_gibrat_law: Gibrat's (1931) law of proportionate effect
  — is spend growth independent of size? OLS of log growth on log
  initial size across the two fixture halves; β < 0 is the
  mean-reversion-of-size signature regression toward which real
  firm-size data almost always leans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "ts_snht",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s1,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        FROM daily
    ),
    cum AS (
        SELECT dn, n, s1, s2,
               row_number() OVER (ORDER BY dn) AS k,
               CAST(sum(cents) OVER (ORDER BY dn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS ck
        FROM daily CROSS JOIN s
    ),
    t AS (
        SELECT dn, k, n,
               (CAST(ck AS DOUBLE) - CAST(k AS DOUBLE) * s1 / n)
                   / sqrt((CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n))) AS zk
        FROM cum WHERE k < n
    ),
    tk AS (
        SELECT dn, k, n,
               zk * zk / k + zk * zk / (n - k) AS t_k
        FROM t
    ),
    best AS (SELECT max(t_k) AS tmax FROM tk)
    SELECT max(tk.n) AS n_days,
           round(best.tmax, 4) AS snht_t,
           CAST(min(CASE WHEN tk.t_k = best.tmax THEN tk.dn END)
                AS BIGINT) AS break_dn,
           round(best.tmax, 4) > 8.1 AS inhomogeneous
    FROM tk CROSS JOIN best
    GROUP BY best.tmax
    """,
    tags=("timeseries", "stats"),
)
def ts_snht(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alexandersson's Standard Normal Homogeneity Test (1986) on the
    daily revenue series: with standardized z's, T(k) = k·z̄₁² +
    (n−k)·z̄₂² and T = max_k T(k). The algebra collapses to prefix
    sums — z̄₁ = (C_k − k·μ)/(k·σ) with C_k the cents prefix sum, so
    T(k) = Z_k²/k + Z_k²/(n−k) where Z_k = (C_k − k·μ)/σ (the two
    segment means are exact complements: (S₁−C_k) − (n−k)μ = −(C_k −
    kμ)) — one rolling integer sum over the calendar-bounded daily
    axis plus exact global moments; no per-k rescan. The break day is
    the FIRST argmax (min-dn tiebreak, pinned). The 8.1 critical is
    Alexandersson & Moberg's (1997) tabulated 95% point for n≈50,
    stated as the screening convention (the exact critical varies
    slowly with n). Fourth member of the changepoint family:
    Pettitt (ranks), Buishand (range), CUSUM (deviations), SNHT
    (length-weighted likelihood) — SNHT is the end-sensitive one.

    Scale shape: one daily reduce, one 1-row moment reduce broadcast
    onto the ≤2.4k-day axis, one rolling prefix sum, two scalar
    reduces."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    cd = F.col("cents").cast("decimal(38,0)")
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(cd * F.col("cents")).alias("s2"),
    )
    w0 = Window.orderBy("dn")
    cum = daily.crossJoin(F.broadcast(s)).select(
        "dn",
        "n",
        "s1",
        "s2",
        F.row_number().over(w0).alias("k"),
        F.sum("cents")
        .over(w0.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("ck"),
    )
    n = F.col("n")
    sigma = F.sqrt(
        F.col("s2").cast("double") / n
        - (F.col("s1").cast("double") / n) * (F.col("s1").cast("double") / n)
    )
    zk = (
        F.col("ck").cast("double")
        - F.col("k").cast("double") * F.col("s1") / n
    ) / sigma
    t = cum.filter(F.col("k") < n).select(
        "dn", "k", "n", zk.alias("zk")
    )
    tk = t.select(
        "dn",
        "k",
        "n",
        (
            F.col("zk") * F.col("zk") / F.col("k")
            + F.col("zk") * F.col("zk") / (n - F.col("k"))
        ).alias("t_k"),
    )
    best = tk.agg(F.max("t_k").alias("tmax"))
    out = (
        tk.crossJoin(F.broadcast(best))
        .groupBy("tmax")
        .agg(
            F.max("n").alias("n_days"),
            F.min(
                F.when(F.col("t_k") == F.col("tmax"), F.col("dn"))
            )
            .cast("long")
            .alias("break_dn"),
        )
    )
    return out.select(
        F.col("n_days"),
        F.round("tmax", 4).alias("snht_t"),
        F.col("break_dn"),
        (F.round("tmax", 4) > 8.1).alias("inhomogeneous"),
    )


@register(
    "customers_gibrat_law",
    """
    WITH h AS (
        SELECT o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT))
                    FILTER (o_orderdate < TIMESTAMP '1998-01-01')
                    AS BIGINT) AS c1,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT))
                    FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
                    AS BIGINT) AS c2
        FROM orders GROUP BY 1
    ),
    xy AS (
        SELECT ln(CAST(c1 AS DOUBLE)) AS x,
               ln(CAST(c2 AS DOUBLE)) - ln(CAST(c1 AS DOUBLE)) AS y
        FROM h WHERE c1 > 0 AND c2 > 0
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               avg(x) AS mx, avg(y) AS my,
               sum(x * y) AS sxy, sum(x * x) AS sxx,
               sum(y * y) AS syy
        FROM xy
    ),
    b AS (
        SELECT n, mx, my,
               (sxy - n * mx * my) / (sxx - n * mx * mx) AS beta,
               (sxy - n * mx * my)
                   / sqrt((sxx - n * mx * mx) * (syy - n * my * my))
                   AS rho
        FROM m
    )
    SELECT n AS n_customers,
           round(beta, 6) AS gibrat_beta,
           round(my - beta * mx, 4) AS alpha,
           round(rho, 6) AS growth_size_corr,
           round(rho * sqrt((n - 2) / (1 - rho * rho)), 4) AS t_stat,
           abs(round(rho * sqrt((n - 2) / (1 - rho * rho)), 4)) < 1.96
               AS gibrat_holds
    FROM b
    """,
    tags=("analytics", "stats"),
)
def customers_gibrat_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gibrat's law of proportionate effect (1931) across the two
    fixture halves (1998-01-01 boundary, the agg_paired_ttest /
    shorrocks frame): OLS of log spend growth y = ln(c₂/c₁) on log
    initial size x = ln(c₁) over customers active in both halves.
    Under Gibrat, growth is independent of size (β = 0); β < 0 is
    size mean-reversion (small customers grow faster — the
    regression-toward-the-mean that makes naive 'small accounts
    outperform' readings spurious), β > 0 cumulative advantage. The
    t test on the growth–size correlation t = ρ√((n−2)/(1−ρ²))
    reads the ROUNDED ρ with the 1.96 verdict ('holds' = no
    detectable size dependence). Half-spends are exact integer cent
    sums; logs/moments are one fixed textual float chain whose
    cross-customer sum order-wobble dies at the display rounding.

    Scale shape: one customer-keyed two-sum reduce, one 1-row
    moment reduce, closed-form scalars — no joins, no windows."""
    o = tbl(spark, sf_dir, "orders")
    cut = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    cents = (dec2("o_totalprice") * 100).cast("long")
    h = o.groupBy("o_custkey").agg(
        F.sum(F.when(cut, cents)).cast("long").alias("c1"),
        F.sum(F.when(~cut, cents)).cast("long").alias("c2"),
    )
    xy = h.filter((F.col("c1") > 0) & (F.col("c2") > 0)).select(
        F.log(F.col("c1").cast("double")).alias("x"),
        (
            F.log(F.col("c2").cast("double"))
            - F.log(F.col("c1").cast("double"))
        ).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, mx, my = F.col("n"), F.col("mx"), F.col("my")
    beta = (F.col("sxy") - n * mx * my) / (F.col("sxx") - n * mx * mx)
    rho = (F.col("sxy") - n * mx * my) / F.sqrt(
        (F.col("sxx") - n * mx * mx) * (F.col("syy") - n * my * my)
    )
    b = m.select(
        n.alias("n"),
        mx.alias("mx"),
        my.alias("my"),
        beta.alias("beta"),
        rho.alias("rho"),
    )
    t = F.col("rho") * F.sqrt(
        (F.col("n") - 2) / (1 - F.col("rho") * F.col("rho"))
    )
    return b.select(
        F.col("n").alias("n_customers"),
        F.round("beta", 6).alias("gibrat_beta"),
        F.round(F.col("my") - F.col("beta") * F.col("mx"), 4).alias(
            "alpha"
        ),
        F.round("rho", 6).alias("growth_size_corr"),
        F.round(t, 4).alias("t_stat"),
        (F.abs(F.round(t, 4)) < 1.96).alias("gibrat_holds"),
    )
