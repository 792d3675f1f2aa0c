"""§2 extensions, hundred-thirty-fifth wave — cointegration and
advertising carryover.

- ts_engle_granger: the Engle–Granger (1987) two-step cointegration
  test between the click and purchase daily levels — OLS
  equilibrium regression, then a Dickey–Fuller-style unit-root
  regression ON THE RESIDUALS; the long-run-relationship question
  ts_granger_1lag (short-run) and ts_var1_fit (stationary dynamics)
  leave open.
- events_adstock_fit: geometric adstock (λ = 0.5, 7-day carryover)
  of click value regressed against purchase value — the
  marketing-mix-modeling carryover fit, with the no-adstock OLS
  side-by-side to show what the carryover buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_DAILY_XY_SQL = """
    dx AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS xc
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    dy AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS yc
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    jd AS (
        SELECT datediff('day', DATE '1990-01-01', dx.day) AS dn,
               CAST(dx.xc AS DOUBLE) / 100 AS x,
               CAST(dy.yc AS DOUBLE) / 100 AS y
        FROM dx JOIN dy ON dx.day = dy.day
    )
"""


@register(
    "ts_engle_granger",
    f"""
    WITH {_DAILY_XY_SQL},
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               avg(x) AS mx, avg(y) AS my,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM jd
    ),
    fit AS (
        SELECT m,
               (sxy - m * mx * my) / (sxx - m * mx * mx) AS beta,
               my - (sxy - m * mx * my) / (sxx - m * mx * mx) * mx
                   AS alpha
        FROM mom
    ),
    res AS (
        SELECT jd.dn, jd.y - f.alpha - f.beta * jd.x AS e
        FROM jd, fit f
    ),
    dpair AS (
        SELECT b.e - a.e AS de, a.e AS el
        FROM res a JOIN res b ON b.dn = a.dn + 1
    ),
    df AS (
        SELECT CAST(count(*) AS BIGINT) AS md,
               sum(el * de) AS sed, sum(el * el) AS see,
               sum(de * de) AS sdd
        FROM dpair
    )
    SELECT f.m AS n_days, df.md AS n_diffs,
           round(f.beta, 6) AS eq_beta,
           round(f.alpha, 4) AS eq_alpha,
           round(df.sed / df.see, 6) AS gamma,
           round((df.sed / df.see)
                 / sqrt((df.sdd - df.sed * df.sed / df.see)
                        / (df.md - 1) / df.see), 4) AS adf_t,
           round((df.sed / df.see)
                 / sqrt((df.sdd - df.sed * df.sed / df.see)
                        / (df.md - 1) / df.see), 4) < -3.34
               AS cointegrated_5pct
    FROM fit f, df
    """,
    tags=("timeseries", "stats"),
)
def ts_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle–Granger two-step cointegration test between purchase
    (y) and click (x) daily dollar levels: step 1 is the OLS
    equilibrium y = α + βx; step 2 runs the no-intercept
    Dickey–Fuller regression Δê_t = γ·ê_{t−1} + u on the residuals
    (consecutive calendar days via the dn ↔ dn+1 equi-join — no
    global lag window), with t(γ̂) compared to the Engle–Granger
    5 % critical value −3.34 (two-variable case, MacKinnon) — the
    OLS-residual test needs its OWN table, not the plain DF one.
    Rejection means the two series share a long-run equilibrium
    even if each is individually a random walk — the question
    ts_granger_1lag's stationary short-run test cannot answer. The
    verdict compares the ROUNDED t.

    Scale shape: two daily reduces, one day equi-join, one 4-sum
    OLS reduce broadcast back, one residual lag equi-join, one
    3-sum DF reduce."""
    e = tbl(spark, sf_dir, "events")

    def daily(et: str, col: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum((dec2("value") * 100).cast("long"))
                .cast("long")
                .alias(col)
            )
        )

    jd = (
        daily("click", "xc")
        .join(daily("purchase", "yc"), "day")
        .select(
            F.datediff("day", F.lit("1990-01-01")).alias("dn"),
            (F.col("xc").cast("double") / 100).alias("x"),
            (F.col("yc").cast("double") / 100).alias("y"),
        )
    )
    mom = jd.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (F.col("sxy") - F.col("m") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("m") * F.col("mx") * F.col("mx")
    )
    fit = mom.select(
        "m",
        beta.alias("beta"),
        (F.col("my") - beta * F.col("mx")).alias("alpha"),
    )
    res = jd.crossJoin(F.broadcast(fit)).select(
        "dn",
        (F.col("y") - F.col("alpha") - F.col("beta") * F.col("x")).alias(
            "e"
        ),
        "m",
        "beta",
        "alpha",
    )
    nxt = res.select((F.col("dn") - 1).alias("dn"), F.col("e").alias("e2"))
    dpair = res.join(nxt, "dn").select(
        (F.col("e2") - F.col("e")).alias("de"), F.col("e").alias("el")
    )
    df = dpair.agg(
        F.count(F.lit(1)).cast("long").alias("md"),
        F.sum(F.col("el") * F.col("de")).alias("sed"),
        F.sum(F.col("el") * F.col("el")).alias("see"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
    )
    gamma = F.col("sed") / F.col("see")
    t = gamma / F.sqrt(
        (F.col("sdd") - F.col("sed") * F.col("sed") / F.col("see"))
        / (F.col("md") - 1)
        / F.col("see")
    )
    return fit.crossJoin(F.broadcast(df)).select(
        F.col("m").alias("n_days"),
        F.col("md").alias("n_diffs"),
        F.round(F.col("beta"), 6).alias("eq_beta"),
        F.round(F.col("alpha"), 4).alias("eq_alpha"),
        F.round(gamma, 6).alias("gamma"),
        F.round(t, 4).alias("adf_t"),
        (F.round(t, 4) < -3.34).alias("cointegrated_5pct"),
    )


@register(
    "events_adstock_fit",
    f"""
    WITH {_DAILY_XY_SQL},
    lagk AS (
        SELECT t.dn, t.y, l.x * pow(0.5, t.dn - l.dn) AS wterm,
               t.x AS x0
        FROM jd t JOIN jd l
          ON l.dn BETWEEN t.dn - 6 AND t.dn
    ),
    ads AS (
        SELECT dn, max(y) AS y, max(x0) AS x0, sum(wterm) AS a
        FROM lagk GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               avg(a) AS ma, avg(y) AS my, avg(x0) AS mx,
               sum(a * y) AS say, sum(a * a) AS saa,
               sum(x0 * y) AS sxy, sum(x0 * x0) AS sxx,
               sum(y * y) AS syy
        FROM ads
    )
    SELECT m AS n_days,
           round((say - m * ma * my) / (saa - m * ma * ma), 6)
               AS beta_adstock,
           round(pow(say - m * ma * my, 2)
                 / ((saa - m * ma * ma) * (syy - m * my * my)), 6)
               AS r2_adstock,
           round(pow(sxy - m * mx * my, 2)
                 / ((sxx - m * mx * mx) * (syy - m * my * my)), 6)
               AS r2_raw,
           round(pow(say - m * ma * my, 2)
                 / ((saa - m * ma * ma) * (syy - m * my * my))
                 - pow(sxy - m * mx * my, 2)
                   / ((sxx - m * mx * mx) * (syy - m * my * my)), 6)
               AS r2_gain
    FROM mom
    """,
    tags=("events", "stats"),
)
def events_adstock_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock fit (the marketing-mix carryover model):
    adstock_t = Σ_{k=0..6} 0.5ᵏ·x_{t−k} of daily click value
    (missing calendar days simply contribute nothing — the range
    join is on day numbers), then purchase value is regressed on
    the adstocked series and on the raw same-day series, reporting
    both R²s and the gain — does last week's attention carry into
    today's purchases beyond the same-day effect? λ = 0.5 and the
    7-day window are pinned literals shared with the oracle; the
    carryover is built by a dn-range equi-ish join (l.dn BETWEEN
    t.dn−6 AND t.dn — a 7-row band per day on the calendar-bounded
    axis), never a global window.

    Scale shape: two daily reduces, one day equi-join, one 7-band
    range join over the bounded day axis, one keyed reduce, one
    9-sum reduce."""
    e = tbl(spark, sf_dir, "events")

    def daily(et: str, col: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum((dec2("value") * 100).cast("long"))
                .cast("long")
                .alias(col)
            )
        )

    jd = (
        daily("click", "xc")
        .join(daily("purchase", "yc"), "day")
        .select(
            F.datediff("day", F.lit("1990-01-01")).alias("dn"),
            (F.col("xc").cast("double") / 100).alias("x"),
            (F.col("yc").cast("double") / 100).alias("y"),
        )
    )
    # 7-band carryover via an offset explode + equi-join on dn (no
    # theta/range join: lag day = dn - k for k = 0..6)
    lagsrc = jd.select(
        F.col("dn").alias("ldn"), F.col("x").alias("lx")
    ).crossJoin(
        F.broadcast(
            jd.sparkSession.range(7).select(
                F.col("id").cast("int").alias("k")
            )
        )
    ).select(
        (F.col("ldn") + F.col("k")).alias("dn"),
        (F.col("lx") * F.pow(F.lit(0.5), F.col("k"))).alias("wterm"),
    )
    ads = (
        jd.join(lagsrc, "dn")
        .groupBy("dn")
        .agg(
            F.max("y").alias("y"),
            F.max("x").alias("x0"),
            F.sum("wterm").alias("a"),
        )
    )
    mom = ads.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg("a").alias("ma"),
        F.avg("y").alias("my"),
        F.avg("x0").alias("mx"),
        F.sum(F.col("a") * F.col("y")).alias("say"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("x0") * F.col("y")).alias("sxy"),
        F.sum(F.col("x0") * F.col("x0")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m = F.col("m")
    r2_ads = F.pow(F.col("say") - m * F.col("ma") * F.col("my"), F.lit(2)) / (
        (F.col("saa") - m * F.col("ma") * F.col("ma"))
        * (F.col("syy") - m * F.col("my") * F.col("my"))
    )
    r2_raw = F.pow(F.col("sxy") - m * F.col("mx") * F.col("my"), F.lit(2)) / (
        (F.col("sxx") - m * F.col("mx") * F.col("mx"))
        * (F.col("syy") - m * F.col("my") * F.col("my"))
    )
    return mom.select(
        m.alias("n_days"),
        F.round(
            (F.col("say") - m * F.col("ma") * F.col("my"))
            / (F.col("saa") - m * F.col("ma") * F.col("ma")),
            6,
        ).alias("beta_adstock"),
        F.round(r2_ads, 6).alias("r2_adstock"),
        F.round(r2_raw, 6).alias("r2_raw"),
        F.round(r2_ads - r2_raw, 6).alias("r2_gain"),
    )
