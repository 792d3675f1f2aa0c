"""§2 extensions, eighty-sixth wave — serial-correlation and
outlier/dispersion classics (published-method cadence, the round-9
verdict's absent-classics list).

- ts_durbin_watson: the Durbin-Watson first-order serial-correlation
  test (1950) on the demeaned daily-revenue series — fully
  exact-integer numerator/denominator, d < 1.5 verdict as 2·num <
  3·den.
- ts_yule_walker_pacf: partial autocorrelation at lag 2 via the
  Yule-Walker equations (1927/1931) — exact integer autocovariance
  sums, φ22 = (c2·c0 − c1²)/(c0² − c1²) in one fixed textual order.
- agg_levene_mean: Levene's variance-homogeneity test (1960) with
  the MEAN center — the mean-centered twin of agg_brown_forsythe,
  on exact per-group |n_i·x − S_i| integer deviations.
- agg_grubbs_extreme: Grubbs' extreme studentized deviate (1950) —
  closed-form max|x − x̄|/s from (min, max, Σx, Σx²) alone, fully
  exact-integer 4σ screening verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₄ 5% (the Brown-Forsythe/ANOVA verdict literal, shared textually)
_CHI2_4_95 = "9.487729"


def _daily_resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (day, e) frame shared by the two serial-correlation ops:
    daily revenue y (floor dollars, exact BIGINT — the
    ts_dickey_fuller series) demeaned WITHOUT division as
    e_t = n·y_t − T (exact int64; the uniform n-scaling cancels in
    every ratio statistic built on it)."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_all = Window.partitionBy()
    return daily.select(
        "day",
        (
            F.count(F.lit(1)).over(w_all) * F.col("y")
            - F.sum("y").over(w_all)
        )
        .cast("long")
        .alias("e"),
    )


_DAILY_RESID_SQL = """
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    resid AS (
        SELECT day,
               CAST(CAST(count(*) OVER () AS BIGINT) * y
                    - sum(y) OVER () AS BIGINT) AS e
        FROM daily
    )
"""


@register(
    "ts_durbin_watson",
    f"""
    WITH {_DAILY_RESID_SQL},
    lagged AS (
        SELECT e, lag(e) OVER (ORDER BY day) AS el FROM resid
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS den,
               CAST(sum(CASE WHEN el IS NULL THEN 0
                             ELSE CAST(e - el AS HUGEINT) * (e - el)
                        END) AS HUGEINT) AS num
        FROM lagged
    )
    SELECT n_days,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
               AS dw_stat,
           2 * num < 3 * den AS positive_autocorr
    FROM m
    """,
    tags=("timeseries", "stats"),
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test (1950) for first-order serial correlation
    in the daily-revenue series: d = Σ(e_t − e_(t−1))² / Σe_t² ∈
    [0, 4], d ≈ 2 under independence, d → 0 under positive
    autocorrelation. The residuals are the mean-only model's,
    n-scaled to exact integers (e_t = n·y_t − T — the ts_dickey_fuller
    device; the scale cancels in the ratio), so BOTH sums are exact
    DECIMAL(38)/HUGEINT and the d < 1.5 positive-autocorrelation
    verdict is the EXACT integer predicate 2·num < 3·den — no float
    touches the decision. The displayed d is one double division of
    the two exact sums (bit-identical across engines).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series (~2.5k rows at ANY corpus scale), one lag window over the
    bounded axis, a 1-row moment reduce — map-side-combinable."""
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    resid = _daily_resid(spark, sf_dir)
    lagged = resid.select(
        "e", F.lag("e").over(Window.orderBy("day")).alias("el")
    )
    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(d38("e") * F.col("e")).alias("den"),
        F.sum(
            F.when(F.col("el").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise(
                (F.col("e") - F.col("el")).cast("decimal(38,0)")
                * (F.col("e") - F.col("el"))
            )
        ).alias("num"),
    )
    return m.select(
        "n_days",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("dw_stat"),
        (2 * F.col("num") < 3 * F.col("den")).alias("positive_autocorr"),
    )


@register(
    "ts_yule_walker_pacf",
    f"""
    WITH {_DAILY_RESID_SQL},
    led AS (
        SELECT e,
               lead(e, 1) OVER (ORDER BY day) AS e1,
               lead(e, 2) OVER (ORDER BY day) AS e2
        FROM resid
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS c0i,
               CAST(sum(CASE WHEN e1 IS NULL THEN 0
                             ELSE CAST(e AS HUGEINT) * e1 END)
                    AS HUGEINT) AS c1i,
               CAST(sum(CASE WHEN e2 IS NULL THEN 0
                             ELSE CAST(e AS HUGEINT) * e2 END)
                    AS HUGEINT) AS c2i
        FROM led
    ),
    c AS (
        SELECT n_days,
               CAST(c0i AS DOUBLE) AS c0,
               CAST(c1i AS DOUBLE) AS c1,
               CAST(c2i AS DOUBLE) AS c2
        FROM m
    )
    SELECT n_days,
           round(c1 / c0, 6) AS pacf1,
           round((c2 * c0 - c1 * c1) / (c0 * c0 - c1 * c1), 6)
               AS pacf2,
           (c2 * c0 - c1 * c1) * (c2 * c0 - c1 * c1) * n_days
               > 4 * (c0 * c0 - c1 * c1) * (c0 * c0 - c1 * c1)
               AS lag2_significant
    FROM c
    """,
    tags=("timeseries", "stats"),
)
def ts_yule_walker_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily revenue at lag 2 via the
    Yule-Walker equations (Yule 1927, Walker 1931): with ρ_k =
    c_k/c_0, the order-2 system gives φ22 = (ρ2 − ρ1²)/(1 − ρ1²) =
    (c2·c0 − c1²)/(c0² − c1²) — extends ts_autocorr from the ACF to
    the PACF, the AR-order identification tool. The autocovariance
    sums c_k = Σ e_t·e_(t+k) are EXACT DECIMAL(38)/HUGEINT on the
    n-scaled integer residuals (full-sample-mean convention, biased
    estimator, stated knob: no per-lag re-centering), cast to double
    ONCE and assembled in one fixed textual order — c0² would burst
    DECIMAL(38) at sf1, so the quotient runs in doubles (the
    agg_oneway_anova device; bit-identical on identical inputs).
    Verdict |φ22| > 2/√n (the standard PACF band) as the
    same-ordered double predicate (c2c0 − c1²)²·n > 4·(c0² − c1²)².
    pacf1 = ρ1 = φ11 ships alongside.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, two lead windows over the bounded axis, a 1-row moment
    reduce — map-side-combinable."""
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    resid = _daily_resid(spark, sf_dir)
    w_ord = Window.orderBy("day")
    led = resid.select(
        "e",
        F.lead("e", 1).over(w_ord).alias("e1"),
        F.lead("e", 2).over(w_ord).alias("e2"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    m = led.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(d38("e") * F.col("e")).alias("c0i"),
        F.sum(
            F.when(F.col("e1").isNull(), zero).otherwise(
                d38("e") * F.col("e1")
            )
        ).alias("c1i"),
        F.sum(
            F.when(F.col("e2").isNull(), zero).otherwise(
                d38("e") * F.col("e2")
            )
        ).alias("c2i"),
    )
    c = m.select(
        "n_days",
        F.col("c0i").cast("double").alias("c0"),
        F.col("c1i").cast("double").alias("c1"),
        F.col("c2i").cast("double").alias("c2"),
    )
    c0, c1, c2, n = F.col("c0"), F.col("c1"), F.col("c2"), F.col("n_days")
    num = c2 * c0 - c1 * c1
    den = c0 * c0 - c1 * c1
    return c.select(
        "n_days",
        F.round(c1 / c0, 6).alias("pacf1"),
        F.round(num / den, 6).alias("pacf2"),
        (num * num * n > 4 * den * den).alias("lag2_significant"),
    )


@register(
    "agg_levene_mean",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    g1 AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sm
        FROM base GROUP BY s
    ),
    z AS (
        SELECT b.s, abs(g.n * b.cents - g.sm) AS u
        FROM base b JOIN g1 g USING (s)
    ),
    g2 AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS su,
               CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS qu
        FROM z GROUP BY s
    ),
    piv AS (
        SELECT
            {", ".join(
                f"max(CASE WHEN s = {i} THEN {m} END) AS {m}{i}"
                for i in range(1, 6)
                for m in ("n", "su", "qu")
            )}
        FROM g2
    ),
    m AS (
        SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS nn,
               {" + ".join(
                   f"CAST(su{i} AS DOUBLE) / n{i}" for i in range(1, 6)
               )} AS tsum,
               {" + ".join(
                   f"CAST(su{i} AS DOUBLE) * CAST(su{i} AS DOUBLE)"
                   f" / (CAST(n{i} AS DOUBLE) * n{i} * n{i})"
                   for i in range(1, 6)
               )} AS btw,
               {" + ".join(
                   f"(CAST(qu{i} AS DOUBLE)"
                   f" / (CAST(n{i} AS DOUBLE) * n{i})"
                   f" - CAST(su{i} AS DOUBLE) * CAST(su{i} AS DOUBLE)"
                   f" / (CAST(n{i} AS DOUBLE) * n{i} * n{i}))"
                   for i in range(1, 6)
               )} AS ssw
        FROM piv
    )
    SELECT nn AS n_orders,
           round((btw - tsum * tsum / nn) / 4 / (ssw / (nn - 5)), 4)
               AS f_stat,
           (btw - tsum * tsum / nn) * (nn - 5)
               > {_CHI2_4_95} * ssw AS variances_differ
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's variance-homogeneity test (1960) with the original
    MEAN center — the mean-centered twin of agg_brown_forsythe:
    one-way ANOVA on z = |x − x̄_g| across the five priorities. The
    group mean is rational, so the deviations are carried as the
    EXACT integers u = |n_g·x − S_g| = n_g·z (group-scaled; unlike
    the median-doubling trick the scale is NOT uniform across
    groups, so it cannot be left in the scores) and every z-moment
    recovers by exact-input division: Σz = U_g/n_g, Σz² = Q_g/n_g².
    The five (n, U=Σu, Q=Σu²) exact DECIMAL(38)/HUGEINT triples
    pivot to one row and SSB/SSW/F assemble in ONE fixed textual
    order of doubles (the agg_oneway_anova device; n_g³ runs as a
    double product — it would burst BIGINT at sf10). Verdict
    SSB·(N−5) > χ²₄(0.95)·SSW with the shared Brown-Forsythe
    literal.

    Scale shape: one keyed reduce to five (n, S) pairs broadcast
    back, one keyed moment reduce, a 1-row pivot — two fact-table
    scans, no window, map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g1 = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sm"),
    )
    z = base.join(F.broadcast(g1), "s").select(
        "s", F.abs(F.col("n") * F.col("cents") - F.col("sm")).alias("u")
    )
    g2 = z.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("qu"),
    )
    piv = g2.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(m))).alias(f"{m}{i}")
            for i in range(1, 6)
            for m in ("n", "su", "qu")
        ]
    )
    nn = sum(F.col(f"n{i}") for i in range(2, 6)) + F.col("n1")
    tsum = btw = ssw = None
    for i in range(1, 6):
        sud = F.col(f"su{i}").cast("double")
        nd3 = F.col(f"n{i}").cast("double") * F.col(f"n{i}") * F.col(
            f"n{i}"
        )
        nd2 = F.col(f"n{i}").cast("double") * F.col(f"n{i}")
        t_i = sud / F.col(f"n{i}")
        b_i = sud * sud / nd3
        w_i = F.col(f"qu{i}").cast("double") / nd2 - sud * sud / nd3
        tsum = t_i if tsum is None else tsum + t_i
        btw = b_i if btw is None else btw + b_i
        ssw = w_i if ssw is None else ssw + w_i
    m = piv.select(
        nn.cast("long").alias("nn"),
        tsum.alias("tsum"),
        btw.alias("btw"),
        ssw.alias("ssw"),
    )
    nn, tsum, btw, ssw = (
        F.col("nn"),
        F.col("tsum"),
        F.col("btw"),
        F.col("ssw"),
    )
    ssb = btw - tsum * tsum / nn
    return m.select(
        nn.alias("n_orders"),
        F.round(ssb / 4 / (ssw / (nn - 5)), 4).alias("f_stat"),
        (ssb * (nn - 5) > float(_CHI2_4_95) * ssw).alias(
            "variances_differ"
        ),
    )


@register(
    "agg_grubbs_extreme",
    """
    WITH base AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT)
                   AS ss,
               CAST(max(cents) AS BIGINT) AS mx,
               CAST(min(cents) AS BIGINT) AS mn
        FROM base
    ),
    d AS (
        SELECT n,
               greatest(CAST(n AS HUGEINT) * mx - s,
                        CAST(s AS HUGEINT) - CAST(n AS HUGEINT) * mn)
                   AS mdev,
               CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS cvar
        FROM m
    )
    SELECT n AS n_orders,
           round(sqrt(CAST(mdev AS DOUBLE) * CAST(mdev AS DOUBLE)
                      * (n - 1)
                      / (CAST(n AS DOUBLE) * CAST(cvar AS DOUBLE))), 4)
               AS g_stat,
           mdev * mdev * (n - 1) > 16 * CAST(n AS HUGEINT) * cvar
               AS outlier_flag
    FROM d
    """,
    tags=("agg", "stats"),
)
def agg_grubbs_extreme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' extreme studentized deviate (1950) over order value:
    G = max|x − x̄|/s. The whole statistic collapses to ONE
    aggregation pass because max|x − x̄| = max(max(x) − x̄, x̄ −
    min(x)), so M = N·max|x − x̄| = max(N·mx − S, S − N·mn) is an
    exact integer from (N, S, min, max) and G² =
    M²·(N−1)/(N·(N·Σx² − S²)) — no deviation materializes per row.
    The verdict is the fixed 4σ screening threshold (the
    Shewhart/Bollinger k·σ-literal convention — the exact Grubbs
    critical point is N-dependent; at these N it sits near 4.7, and
    the docstring states the knob): G > 4 as the EXACT
    DECIMAL(38)/HUGEINT predicate M²·(N−1) > 16·N·(N·Σx² − S²) —
    inside DECIMAL(38) through sf1; at sf10 the right side nears
    1e38 (the agg_wilcoxon_signedrank envelope note applies). The
    displayed G assembles in one fixed textual order of doubles.

    Scale shape: ONE map-side-combinable reduce over the fact table
    to a single row; no join, no window, no second scan."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
        F.max("cents").cast("long").alias("mx"),
        F.min("cents").cast("long").alias("mn"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    d = m.select(
        "n",
        F.greatest(
            n38 * F.col("mx") - F.col("s"),
            d38("s") - n38 * F.col("mn"),
        ).alias("mdev"),
        (n38 * F.col("ss") - d38("s") * F.col("s")).alias("cvar"),
    )
    n, mdev, cvar = F.col("n"), F.col("mdev"), F.col("cvar")
    return d.select(
        n.alias("n_orders"),
        F.round(
            F.sqrt(
                mdev.cast("double")
                * mdev.cast("double")
                * (n - 1)
                / (n.cast("double") * cvar.cast("double"))
            ),
            4,
        ).alias("g_stat"),
        (mdev * mdev * (n - 1) > 16 * n38 * cvar).alias("outlier_flag"),
    )
