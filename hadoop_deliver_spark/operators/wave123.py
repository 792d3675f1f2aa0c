"""§2 extensions, hundred-twenty-third wave — parametric tail
modeling and fractal scaling.

- agg_lognormal_fit: lognormal fit of order value by log-moments,
  with the built-in exact-rank P90 diagnostic (fitted vs empirical)
  — the log-domain sibling of orders_weibull_gaps / orders_pot_gpd
  in the distribution-fitting family.
- ts_dfa: detrended fluctuation analysis (Peng et al. 1994) of the
  global daily value series at box sizes 4/8/16 — the
  nonstationarity-robust scaling exponent; the detrended complement
  of ts_hurst_exponent's rescaled-range form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

#: Φ⁻¹(0.9), pinned on both sides.
_Z90 = 1.2815515655446004


@register(
    "agg_lognormal_fit",
    f"""
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    lg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               avg(ln(CAST(cents AS DOUBLE))) AS mu,
               sum(ln(CAST(cents AS DOUBLE)) * ln(CAST(cents AS DOUBLE)))
                   AS sll,
               CAST(sum(cents) AS BIGINT) AS t
        FROM v
    ),
    par AS (
        SELECT n, t, mu,
               sqrt((sll - n * mu * mu) / (n - 1)) AS sig
        FROM lg
    ),
    grid AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1
    ),
    cdf AS (
        SELECT cents, CAST(sum(c) OVER (ORDER BY cents
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    ),
    p90 AS (
        SELECT min(cents) AS p90e FROM cdf, par
        WHERE 10 * cum >= 9 * par.n
    )
    SELECT par.n AS n_orders,
           round(par.mu, 6) AS mu_log,
           round(par.sig, 6) AS sigma_log,
           round(exp(par.mu) / 100, 2) AS fitted_median,
           round(exp(par.mu + par.sig * par.sig / 2) / 100, 2)
               AS fitted_mean,
           round(CAST(par.t AS DOUBLE) / par.n / 100, 2) AS actual_mean,
           round(exp(par.mu + {_Z90!r} * par.sig) / 100, 2) AS fitted_p90,
           round(p90.p90e / 100.0, 2) AS empirical_p90,
           round(exp(par.mu + {_Z90!r} * par.sig) / p90.p90e, 4)
               AS p90_fit_ratio
    FROM par, p90
    """,
    tags=("aggregate", "stats"),
)
def agg_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of order value by log-moments — μ̂ = mean of
    ln(cents), σ̂ = sample sd of the logs — reporting the fitted
    median e^μ, fitted mean e^(μ+σ²/2) against the exact actual
    mean, and the goodness diagnostic the fit ships with: fitted
    P90 = e^(μ+z₀.₉σ) (z₀.₉ pinned to 17 digits on both sides)
    against the EXACT integer-rank empirical P90 (type-1, block-
    ranked cents CDF). A p90_fit_ratio far from 1 says the upper
    tail is not lognormal — the cheap pre-check before
    orders_pot_gpd's tail machinery. Log sums drift at the shared
    libm-ulp level; round-6/2 absorbs.

    Scale shape: one log-moment reduce, one block-ranked CDF with a
    1-row rank probe."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    ln = F.log(F.col("cents").cast("double"))
    lg = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(ln).alias("mu"),
        F.sum(ln * ln).alias("sll"),
        F.sum("cents").cast("long").alias("t"),
    )
    par = lg.select(
        "n",
        "t",
        "mu",
        F.sqrt(
            (F.col("sll") - F.col("n") * F.col("mu") * F.col("mu"))
            / (F.col("n") - 1)
        ).alias("sig"),
    )
    grid = v.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cdf = exact_global_keyed_cumsum(grid, "cents", "c", "cents", "cum")
    p90 = (
        cdf.crossJoin(F.broadcast(par.select("n")))
        .filter(10 * F.col("cum") >= 9 * F.col("n"))
        .agg(F.min("cents").alias("p90e"))
    )
    fitted_p90 = F.exp(F.col("mu") + _Z90 * F.col("sig"))
    return par.crossJoin(F.broadcast(p90)).select(
        F.col("n").alias("n_orders"),
        F.round(F.col("mu"), 6).alias("mu_log"),
        F.round(F.col("sig"), 6).alias("sigma_log"),
        F.round(F.exp(F.col("mu")) / 100, 2).alias("fitted_median"),
        F.round(
            F.exp(F.col("mu") + F.col("sig") * F.col("sig") / 2) / 100, 2
        ).alias("fitted_mean"),
        F.round(F.col("t").cast("double") / F.col("n") / 100, 2).alias(
            "actual_mean"
        ),
        F.round(fitted_p90 / 100, 2).alias("fitted_p90"),
        F.round(F.col("p90e") / 100.0, 2).alias("empirical_p90"),
        F.round(fitted_p90 / F.col("p90e"), 4).alias("p90_fit_ratio"),
    )


@register(
    "ts_dfa",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(y) AS BIGINT) AS t
        FROM daily
    ),
    prof AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST((SELECT m FROM tot)
                    * sum(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    - row_number() OVER (ORDER BY day)
                      * (SELECT t FROM tot) AS BIGINT) AS p
        FROM daily
    ),
    boxed AS (
        SELECT s, (i - 1) // s AS b, i, CAST(p AS DOUBLE) AS p
        FROM prof, LATERAL unnest([4, 8, 16]) AS t(s)
    ),
    per_box AS (
        SELECT s, b, CAST(count(*) AS BIGINT) AS cnt,
               sum(p) AS sy, sum(CAST(i AS DOUBLE) * p) AS sxy,
               sum(CAST(i AS DOUBLE)) AS sx,
               sum(CAST(i AS DOUBLE) * i) AS sxx,
               sum(p * p) AS syy
        FROM boxed GROUP BY 1, 2
    ),
    full_boxes AS (
        SELECT s, cnt,
               syy - sy * sy / cnt
                   - pow(sxy - sx * sy / cnt, 2)
                     / (sxx - sx * sx / cnt) AS ssr
        FROM per_box WHERE cnt = s
    ),
    fs AS (
        SELECT s, CAST(count(*) AS BIGINT) AS nb,
               sqrt(sum(ssr) / (count(*) * s)) / (SELECT m FROM tot)
                   AS f
        FROM full_boxes GROUP BY 1
    ),
    sl AS (
        SELECT count(*) AS k, avg(ln(CAST(s AS DOUBLE))) AS mx,
               avg(ln(f)) AS my,
               sum(ln(CAST(s AS DOUBLE)) * ln(f)) AS sxy,
               sum(ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE))) AS sxx
        FROM fs
    )
    SELECT (SELECT m FROM tot) AS n_days,
           round((SELECT f FROM fs WHERE s = 4) / 100, 4) AS f4,
           round((SELECT f FROM fs WHERE s = 8) / 100, 4) AS f8,
           round((SELECT f FROM fs WHERE s = 16) / 100, 4) AS f16,
           round((sxy - k * mx * my) / (sxx - k * mx * mx), 4)
               AS dfa_alpha
    FROM sl
    """,
    tags=("timeseries", "stats"),
)
def ts_dfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis (Peng et al. 1994) of the
    global daily value series: integrate the mean-centered series
    into the profile (kept PURE INTEGER by the scale trick
    P_k = m·cum_k − k·T), slice it into non-overlapping boxes of
    size s ∈ {4, 8, 16} (partial tail boxes dropped — the standard
    convention), OLS-detrend each box in closed form
    (SSR = Syy − Sxy²/Sxx), and report F(s) = √(ΣSSR/(n_b·s))/m with
    the scaling exponent α = the log-log OLS slope over the three
    box sizes. α ≈ 0.5 = uncorrelated, α > 0.5 = persistent — the
    trend-robust twin of ts_hurst_exponent (R/S is biased by the
    very trends DFA removes). Box membership is exact integer
    arithmetic on the block-ranked day rank; floats enter at the
    per-box OLS.

    Scale shape: one daily reduce, one block-ranked rank+cumsum
    over the calendar-bounded day axis, a 3× map-only box explode,
    keyed per-box reduces, 3-row closed-form slope."""
    from hadoop_deliver_spark.api import (
        exact_global_keyed_cumsum,
        exact_global_rank,
    )

    e = tbl(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((dec2("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .withColumn("daynum", F.datediff("day", F.lit("1990-01-01")))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").cast("long").alias("t"),
    )
    prof = exact_global_keyed_cumsum(daily, "daynum", "y", "daynum", "cum")
    prof = exact_global_rank(prof, "daynum", "daynum", "i")
    prof = prof.crossJoin(F.broadcast(tot)).select(
        "i",
        "m",
        (F.col("m") * F.col("cum") - F.col("i") * F.col("t"))
        .cast("long")
        .alias("pint"),
    )
    boxed = prof.select(
        "i",
        "m",
        F.col("pint").cast("double").alias("p"),
        F.explode(F.array(F.lit(4), F.lit(8), F.lit(16))).alias("s"),
    ).withColumn("b", ((F.col("i") - 1) / F.col("s")).cast("long"))
    x = F.col("i").cast("double")
    per_box = boxed.groupBy("s", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("m").alias("m"),
        F.sum("p").alias("sy"),
        F.sum(x * F.col("p")).alias("sxy"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(F.col("p") * F.col("p")).alias("syy"),
    )
    ssr = (
        F.col("syy")
        - F.col("sy") * F.col("sy") / F.col("cnt")
        - F.pow(
            F.col("sxy") - F.col("sx") * F.col("sy") / F.col("cnt"),
            F.lit(2),
        )
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("cnt"))
    )
    fs = (
        per_box.filter(F.col("cnt") == F.col("s"))
        .withColumn("ssr", ssr)
        .groupBy("s")
        .agg(
            F.max("m").alias("m"),
            (
                F.sqrt(F.sum("ssr") / (F.count(F.lit(1)) * F.col("s")))
                / F.max("m")
            ).alias("f"),
        )
    )
    lns = F.log(F.col("s").cast("double"))
    lnf = F.log(F.col("f"))
    sl = fs.agg(
        F.max("m").alias("n_days"),
        F.max(F.when(F.col("s") == 4, F.col("f"))).alias("fv4"),
        F.max(F.when(F.col("s") == 8, F.col("f"))).alias("fv8"),
        F.max(F.when(F.col("s") == 16, F.col("f"))).alias("fv16"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.avg(lns).alias("mx"),
        F.avg(lnf).alias("my"),
        F.sum(lns * lnf).alias("sxy"),
        F.sum(lns * lns).alias("sxx"),
    )
    return sl.select(
        "n_days",
        F.round(F.col("fv4") / 100, 4).alias("f4"),
        F.round(F.col("fv8") / 100, 4).alias("f8"),
        F.round(F.col("fv16") / 100, 4).alias("f16"),
        F.round(
            (F.col("sxy") - F.col("k") * F.col("mx") * F.col("my"))
            / (F.col("sxx") - F.col("k") * F.col("mx") * F.col("mx")),
            4,
        ).alias("dfa_alpha"),
    )
