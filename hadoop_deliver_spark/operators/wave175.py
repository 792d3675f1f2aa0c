"""§2 extensions, hundred-seventy-fifth wave — the full periodogram
and its two classical tests.

- ts_fisher_g_test: Fisher's (1929) exact g-test for a hidden
  periodicity — is the LARGEST periodogram ordinate too large for
  white noise? With the EXACT null p-value
  P = Σⱼ (−1)^(j−1)·C(m,j)·(1−j·g)^(m−1) — one of the few classical
  tests with a closed-form exact p, computed here as a bounded
  alternating series.
- ts_bartlett_cumpgram: Bartlett's cumulative-periodogram
  white-noise test — the Kolmogorov distance between the normalized
  cumulative periodogram and the uniform line, the whole-spectrum
  complement to Fisher's single-peak question (a spectrum tilted
  everywhere but peaked nowhere fails Bartlett and passes Fisher).

Both share one ordinate construction: the day×frequency product
grid is calendar-bounded on BOTH axes (the ts_qn_scale envelope),
and ts_weekly_periodogram's single-frequency Schuster scan is the
m = 1 special case of this frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_PGRAM_SQL = """
    daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT cents, row_number() OVER (ORDER BY dn) - 1 AS t,
               count(*) OVER () AS n
        FROM daily
    ),
    mean_c AS (SELECT avg(CAST(cents AS DOUBLE)) AS mu FROM r),
    freq AS (
        SELECT unnest(range(1, CAST((max(n) - 1) // 2 + 1 AS BIGINT))) AS j,
               max(n) AS n
        FROM r
    ),
    ord_t AS (
        SELECT f.j,
               sum((CAST(r.cents AS DOUBLE) - m.mu)
                   * cos(2 * pi() * f.j * r.t / f.n)) AS aj,
               sum((CAST(r.cents AS DOUBLE) - m.mu)
                   * sin(2 * pi() * f.j * r.t / f.n)) AS bj
        FROM freq f CROSS JOIN r CROSS JOIN mean_c m
        GROUP BY f.j
    ),
    pgram AS (
        SELECT j, aj * aj + bj * bj AS i_j FROM ord_t
    )
"""


@register(
    "ts_fisher_g_test",
    f"""
    WITH {_PGRAM_SQL},
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               max(i_j) AS imax, sum(i_j) AS itot,
               CAST(arg_max(j, i_j * 1000000000 - j) AS BIGINT) AS jmax
        FROM pgram
    ),
    g AS (
        SELECT m, jmax, imax / itot AS gstat FROM s
    ),
    js AS (
        SELECT g.m, g.jmax, g.gstat, CAST(t.j AS BIGINT) AS tj
        FROM g, unnest(range(1, CAST(floor(1.0 / g.gstat) AS BIGINT) + 1))
                 AS t(j)
        WHERE t.j <= g.m
    ),
    binln AS (
        SELECT m, jmax, gstat, tj,
               sum(ln((m - tj + 1.0) / tj)) OVER (ORDER BY tj
                   ROWS UNBOUNDED PRECEDING) AS lnc
        FROM js
    ),
    terms AS (
        SELECT m, jmax, gstat,
               pow(-1.0, tj - 1) * exp(lnc)
               * pow(1.0 - tj * gstat, m - 1.0) AS term
        FROM binln
    )
    SELECT max(m) AS n_freqs, max(jmax) AS peak_freq_j,
           round(max(gstat), 6) AS fisher_g,
           round(least(greatest(sum(term), 0.0), 1.0), 6) AS exact_p,
           round(least(greatest(sum(term), 0.0), 1.0), 6) < 0.05
               AS periodic
    FROM terms
    """,
    tags=("timeseries", "stats"),
)
def ts_fisher_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact g-test for hidden periodicity (1929) on the
    daily revenue series: with periodogram ordinates
    I_j = a_j² + b_j² at the Fourier frequencies j/n
    (j = 1…⌊(n−1)/2⌋, mean-centered Schuster sums — the
    ts_weekly_periodogram construction swept over EVERY frequency),
    g = max I_j / ΣI_j and the EXACT null tail
    P(G > g) = Σ_{{j≥1, jg<1}} (−1)^(j−1)·C(m,j)·(1−jg)^(m−1) — the
    alternating series truncates itself at ⌊1/g⌋ terms, binomials
    via lgamma (both engines ship it), clamped to [0,1] against
    last-term wobble. Reports the winning frequency index (max
    ordinate, min-j tiebreak via the exact composite key). Fisher
    answers 'is there A cycle'; Bartlett's companion below answers
    'is the whole spectrum flat'.

    Scale shape: one daily reduce; the day×frequency Schuster grid
    (≤n·m ≈ n²/2 products, BOTH axes calendar-bounded — the
    ts_qn_scale envelope) reduced per frequency; a ≤⌊1/g⌋-term
    bounded series."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w0 = Window.orderBy("dn")
    # localCheckpoint the ≤days-row indexed series: the frequency
    # explode, the Schuster grid and the scalar probes all branch
    # from it, and an un-checkpointed copy makes Catalyst replan the
    # whole fact-scan subtree per branch (measured: 78s -> ~8s at
    # sf0.01 for the identical result)
    r = daily.select(
        "cents", (F.row_number().over(w0) - 1).alias("t")
    ).localCheckpoint()
    cnt = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("cents").cast("double")).alias("mu"),
    )
    freq = cnt.select(
        F.explode(
            F.sequence(F.lit(1), ((F.col("n") - 1) / 2).cast("long"))
        ).alias("j"),
        "n",
        "mu",
    )
    grid = freq.crossJoin(r)
    ang = 2 * F.lit(3.141592653589793) * F.col("j") * F.col("t") / F.col("n")
    ord_t = grid.groupBy("j").agg(
        F.sum(
            (F.col("cents").cast("double") - F.col("mu")) * F.cos(ang)
        ).alias("aj"),
        F.sum(
            (F.col("cents").cast("double") - F.col("mu")) * F.sin(ang)
        ).alias("bj"),
    )
    pgram = ord_t.select(
        "j", (F.col("aj") * F.col("aj") + F.col("bj") * F.col("bj")).alias("i_j")
    ).localCheckpoint()
    s = pgram.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("i_j").alias("imax"),
        F.sum("i_j").alias("itot"),
        F.max_by("j", F.col("i_j") * 1000000000 - F.col("j"))
        .cast("long")
        .alias("jmax"),
    )
    g = s.select(
        "m", "jmax", (F.col("imax") / F.col("itot")).alias("gstat")
    )
    js = g.select(
        "m",
        "jmax",
        "gstat",
        F.explode(
            F.sequence(
                F.lit(1), F.floor(1.0 / F.col("gstat")).cast("long")
            )
        ).alias("tj"),
    ).filter(F.col("tj") <= F.col("m"))
    wln = Window.orderBy("tj").rowsBetween(Window.unboundedPreceding, 0)
    binln = js.withColumn(
        "lnc",
        F.sum(
            F.log((F.col("m") - F.col("tj") + 1.0) / F.col("tj"))
        ).over(wln),
    )
    term = (
        F.pow(F.lit(-1.0), F.col("tj") - 1)
        * F.exp(F.col("lnc"))
        * F.pow(1.0 - F.col("tj") * F.col("gstat"), F.col("m") - 1.0)
    )
    out = binln.select(
        "m", "jmax", "gstat", term.alias("term")
    ).agg(
        F.max("m").alias("n_freqs"),
        F.max("jmax").alias("peak_freq_j"),
        F.round(F.max("gstat"), 6).alias("fisher_g"),
        F.round(
            F.least(F.greatest(F.sum("term"), F.lit(0.0)), F.lit(1.0)), 6
        ).alias("exact_p"),
        (
            F.round(
                F.least(
                    F.greatest(F.sum("term"), F.lit(0.0)), F.lit(1.0)
                ),
                6,
            )
            < 0.05
        ).alias("periodic"),
    )
    return out


@register(
    "ts_bartlett_cumpgram",
    f"""
    WITH {_PGRAM_SQL},
    tot AS (SELECT sum(i_j) AS itot, CAST(count(*) AS BIGINT) AS m
            FROM pgram),
    cum AS (
        SELECT j,
               sum(i_j) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING)
                   / t.itot AS ck,
               CAST(j AS DOUBLE) / t.m AS uk
        FROM pgram CROSS JOIN tot t
    )
    SELECT (SELECT m FROM tot) AS n_freqs,
           round(max(abs(ck - uk)), 6) AS bartlett_d,
           round(1.36 / sqrt((SELECT CAST(m AS DOUBLE) FROM tot)), 6)
               AS crit_05,
           round(max(abs(ck - uk)), 6)
               > 1.36 / sqrt((SELECT CAST(m AS DOUBLE) FROM tot))
               AS non_white
    FROM cum
    """,
    tags=("timeseries", "stats"),
)
def ts_bartlett_cumpgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's cumulative-periodogram white-noise test (1955;
    Priestley §6.2.6) on the daily revenue series: under white noise
    the normalized cumulative periodogram C_k = Σ_{{j≤k}}I_j / ΣI_j
    climbs the uniform diagonal, and D = max_k |C_k − k/m| obeys the
    Kolmogorov law with the classical 1.36/√m 5% critical. This is
    the WHOLE-spectrum flatness question — low-frequency tilt
    (trend), broadband color, or seasonal combs all push D up even
    when no single ordinate wins Fisher's g; reporting both
    separates 'one strong cycle' from 'colored noise'. Same ordinate
    frame as ts_fisher_g_test (shared SQL block); the cumulative
    scan runs over the ≤m-row frequency axis.

    Scale shape: the shared day×frequency Schuster reduce, then one
    prefix-sum window and a max reduce on the bounded frequency
    axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w0 = Window.orderBy("dn")
    r = daily.select(
        "cents", (F.row_number().over(w0) - 1).alias("t")
    ).localCheckpoint()
    cnt = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("cents").cast("double")).alias("mu"),
    )
    freq = cnt.select(
        F.explode(
            F.sequence(F.lit(1), ((F.col("n") - 1) / 2).cast("long"))
        ).alias("j"),
        "n",
        "mu",
    )
    ang = 2 * F.lit(3.141592653589793) * F.col("j") * F.col("t") / F.col("n")
    pgram = (
        freq.crossJoin(r)
        .groupBy("j")
        .agg(
            F.sum(
                (F.col("cents").cast("double") - F.col("mu")) * F.cos(ang)
            ).alias("aj"),
            F.sum(
                (F.col("cents").cast("double") - F.col("mu")) * F.sin(ang)
            ).alias("bj"),
        )
        .select(
            "j",
            (F.col("aj") * F.col("aj") + F.col("bj") * F.col("bj")).alias(
                "i_j"
            ),
        )
        .localCheckpoint()
    )
    tot = pgram.agg(
        F.sum("i_j").alias("itot"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    wj = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    cum = pgram.crossJoin(F.broadcast(tot)).select(
        "m",
        (F.sum("i_j").over(wj) / F.col("itot")).alias("ck"),
        (F.col("j").cast("double") / F.col("m")).alias("uk"),
    )
    d = F.max(F.abs(F.col("ck") - F.col("uk")))
    return cum.agg(
        F.max("m").alias("n_freqs"),
        F.round(d, 6).alias("bartlett_d"),
        F.round(1.36 / F.sqrt(F.max("m").cast("double")), 6).alias(
            "crit_05"
        ),
        (
            F.round(d, 6) > 1.36 / F.sqrt(F.max("m").cast("double"))
        ).alias("non_white"),
    )
