"""§2 extensions, seventy-ninth wave — completing the classical
randomness battery on the daily-revenue series (joins ts_runs_test,
ts_turning_points, ts_cox_stuart, ts_bartels_rvn from waves 37/49/50).

- ts_von_neumann_ratio: the PARAMETRIC original (von Neumann 1941)
  whose rank form already ships as ts_bartels_rvn — mean-square
  successive difference over variance, with Hart's (1942) EXACT null
  moments, sensitive to actual magnitudes where the rank form is not.
- ts_foster_stuart_records: the Foster-Stuart records test (1954) —
  upper minus lower record counts, the classical climate-style trend
  detector whose variance 2(H_n − 1) needs only a harmonic number.
- ts_difference_sign: the Moore-Wallis difference-sign test (1943) —
  the count of rises, the simplest member of the battery (trend-
  sensitive, oscillation-blind — the documented complement of the
  turning-point test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# shared literals (engine/oracle transcendental-parity convention):
# χ²₁(0.95) and 4·χ²₁(0.95) — the latter because the von Neumann
# verdict clears a /4 from the squared z
_CHI2_1_95 = "3.841459"
_CHI2_1_95_X4 = "15.365836"

_DAILY_CENTS_SQL = """
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    )
"""


@register(
    "ts_von_neumann_ratio",
    f"""
    WITH {_DAILY_CENTS_SQL},
    lagged AS (
        SELECT cents,
               lead(cents) OVER (ORDER BY day) AS nxt
        FROM daily
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q,
               CAST(sum(CASE WHEN nxt IS NOT NULL THEN
                   CAST(nxt - cents AS HUGEINT) * (nxt - cents)
                   ELSE 0 END) AS HUGEINT) AS num
        FROM lagged
    ),
    c AS (
        SELECT n, num,
               CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS b,
               CAST(n AS HUGEINT) * num
                   - 2 * (CAST(n AS HUGEINT) * q
                          - CAST(s AS HUGEINT) * s) AS a
        FROM m
    )
    SELECT n AS n_days,
           round(CAST(n AS DOUBLE) * n * CAST(num AS DOUBLE)
                 / ((n - 1) * CAST(b AS DOUBLE)), 4) AS vn_ratio,
           CAST(a AS DOUBLE) * CAST(a AS DOUBLE) * (n + 1) * (n - 1)
               > {_CHI2_1_95_X4} * CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
                 * (n - 2)
               AS nonrandom
    FROM c
    """,
    tags=("timeseries", "stats"),
)
def ts_von_neumann_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann's ratio (1941) on daily revenue: η = δ²/s² with
    δ² = Σ(y_{{i+1}}−y_i)²/(n−1) the mean-square successive
    difference and s² = Σ(y−ȳ)²/n — THE classical serial-dependence
    diagnostic (η ≈ 2 random, < 2 positively autocorrelated/trending,
    > 2 oscillating), and the parametric original of the rank form
    shipped as ts_bartels_rvn (the rank twin is distribution-free;
    this one is magnitude-sensitive — both belong to the battery).
    All inputs are EXACT integers: num = Σd² and the n-scaled
    centered SS B = nΣy² − S² in DECIMAL(38)/HUGEINT, so η =
    n²·num/((n−1)·B) is a fixed-order double assembly of three exact
    operands. The two-sided 5% verdict uses Hart's (1942) EXACT null
    moments E[η] = 2n/(n−1), Var[η] = 4n²(n−2)/((n+1)(n−1)³) — not
    the 4/n large-n shortcut — which clear to
    A²·(n+1)(n−1) > 4·χ²₁(0.95)·B²·(n−2) with A = n·num − 2B exact
    (≈10²⁵ at sf0.1, DECIMAL(38)-safe); A² and B² would burst
    DECIMAL(38) at scale, so each side takes ONE double cast per
    factor in the same fixed textual order (the
    events_poisson_dispersion device; 15.365836 = 4·3.841459 shared
    literal).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one bounded-axis lead window, a 1-row moment reduce —
    map-side-combinable."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    lagged = daily.select(
        "cents", F.lead("cents").over(Window.orderBy("day")).alias("nxt")
    )
    c38 = F.col("cents").cast("decimal(38,0)")
    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(c38 * F.col("cents")).alias("q"),
        F.sum(
            F.when(
                F.col("nxt").isNotNull(),
                (F.col("nxt") - F.col("cents")).cast("decimal(38,0)")
                * (F.col("nxt") - F.col("cents")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("num"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    b = n38 * F.col("q") - F.col("s").cast("decimal(38,0)") * F.col("s")
    c = m.select(
        "n",
        "num",
        b.alias("b"),
        (n38 * F.col("num") - 2 * b).alias("a"),
    )
    za, zb = F.col("a").cast("double"), F.col("b").cast("double")
    return c.select(
        n.alias("n_days"),
        F.round(
            n.cast("double") * n * F.col("num").cast("double")
            / ((n - 1) * zb),
            4,
        ).alias("vn_ratio"),
        (
            za * za * (n + 1) * (n - 1)
            > float(_CHI2_1_95_X4) * zb * zb * (n - 2)
        ).alias("nonrandom"),
    )


@register(
    "ts_foster_stuart_records",
    f"""
    WITH {_DAILY_CENTS_SQL},
    idx AS (
        SELECT cents,
               row_number() OVER (ORDER BY day) AS i,
               max(cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prevmax,
               min(cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prevmin,
               count(*) OVER () AS n
        FROM daily
    ),
    rec AS (
        SELECT CAST(count(*) FILTER (i > 1 AND cents > prevmax)
                    AS BIGINT) AS u,
               CAST(count(*) FILTER (i > 1 AND cents < prevmin)
                    AS BIGINT) AS l,
               CAST(max(n) AS BIGINT) AS n
        FROM idx
    ),
    harm AS (
        SELECT max(h) AS hn FROM (
            SELECT sum(1.0 / i) OVER (ORDER BY i
                ROWS UNBOUNDED PRECEDING) AS h
            FROM (SELECT row_number() OVER () AS i
                  FROM daily) t
        ) s
    )
    SELECT n AS n_days, u AS upper_records, l AS lower_records,
           u - l AS d_stat,
           round((u - l) / sqrt(2 * (hn - 1)), 4) AS z,
           CAST((u - l) * (u - l) AS DOUBLE)
               > {_CHI2_1_95} * (2 * (hn - 1)) AS trending
    FROM rec CROSS JOIN harm
    """,
    tags=("timeseries", "stats"),
)
def ts_foster_stuart_records(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Foster-Stuart records test (1954) on daily revenue: count the
    days that set a new all-time HIGH (strictly exceed every earlier
    day — the deterministic strict-inequality knob for integer
    cents) and the days that set a new all-time LOW; under
    exchangeability the record indicators at step i are independent
    Bernoulli(1/i) events and d = U − L has E[d] = 0 and Var[d] =
    Σ_{{i=2..n}} 2/i = 2(H_n − 1) — the classical trend detector of
    the climate-records literature (an upward trend manufactures
    highs and suppresses lows). U, L, d are EXACT integers from
    bounded running-extreme windows. The harmonic number H_n is the
    only non-integer input: it is assembled by an ORDERED cumulative
    sum over i = 1..n (sequential left-to-right on both engines —
    the running-window determinism device; all terms positive, so
    max(prefix) = the full sum), never an unordered aggregate. The
    verdict d² > χ²₁(0.95)·2(H_n−1) compares the exact integer d²
    against the literal-scaled harmonic term.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, bounded-axis running max/min windows, a 1-row reduce
    plus a 1-row harmonic cumsum over the same bounded axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w_prev = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    idx = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.max("cents").over(w_prev).alias("prevmax"),
        F.min("cents").over(w_prev).alias("prevmin"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    rec = idx.agg(
        F.count_if((F.col("i") > 1) & (F.col("cents") > F.col("prevmax")))
        .cast("long")
        .alias("u"),
        F.count_if((F.col("i") > 1) & (F.col("cents") < F.col("prevmin")))
        .cast("long")
        .alias("l"),
        F.max("n").cast("long").alias("n"),
    )
    harm = (
        daily.select(
            F.row_number().over(Window.orderBy("day")).alias("i")
        )
        .select(
            F.sum(1.0 / F.col("i"))
            .over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("h")
        )
        .agg(F.max("h").alias("hn"))
    )
    d = F.col("u") - F.col("l")
    return rec.crossJoin(F.broadcast(harm)).select(
        F.col("n").alias("n_days"),
        F.col("u").alias("upper_records"),
        F.col("l").alias("lower_records"),
        d.alias("d_stat"),
        F.round(d / F.sqrt(2 * (F.col("hn") - 1)), 4).alias("z"),
        (
            (d * d).cast("double")
            > float(_CHI2_1_95) * (2 * (F.col("hn") - 1))
        ).alias("trending"),
    )


@register(
    "ts_difference_sign",
    f"""
    WITH {_DAILY_CENTS_SQL},
    lagged AS (
        SELECT cents,
               lead(cents) OVER (ORDER BY day) AS nxt
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (nxt > cents) AS BIGINT) AS p
        FROM lagged
    )
    SELECT n AS n_days, p AS n_rises,
           round((2.0 * p - (n - 1)) / 2
                 / sqrt((n + 1) / 12.0), 4) AS z,
           3 * (2 * p - n + 1) * (2 * p - n + 1)
               > {_CHI2_1_95} * (n + 1) AS trending
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_difference_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Wallis difference-sign test (1943): count the rises
    P = #{{i : y_{{i+1}} > y_i}} in the daily-revenue series; under
    randomness E[P] = (n−1)/2 and Var[P] = (n+1)/12 (NOT the
    binomial (n−1)/4 — adjacent differences share a term, and the
    classical exchangeability variance is what both engines ship).
    The simplest member of the randomness battery: powerful against
    monotone trend, BLIND to oscillation — the exact documented
    complement of ts_turning_points (oscillation-sensitive,
    trend-blind); running both is the textbook practice. Zero
    differences count as non-rises (the strict-inequality knob;
    exact ties between consecutive daily cent sums are
    measure-zero-grade rare and deterministic identically on both
    engines). The two-sided 5% verdict clears the /4 and /12
    exactly: 3·(2P−n+1)² > χ²₁(0.95)·(n+1) — LHS a pure int64, only
    the shared literal side double. z displays round-4.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one bounded-axis lead window, a 1-row reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    lagged = daily.select(
        "cents", F.lead("cents").over(Window.orderBy("day")).alias("nxt")
    )
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("nxt") > F.col("cents")).cast("long").alias("p"),
    )
    n, p = F.col("n"), F.col("p")
    dev = 2 * p - n + 1
    return s.select(
        n.alias("n_days"),
        p.alias("n_rises"),
        F.round(
            (2.0 * p - (n - 1)) / 2 / F.sqrt((n + 1) / F.lit(12.0)), 4
        ).alias("z"),
        (3 * dev * dev > float(_CHI2_1_95) * (n + 1)).alias("trending"),
    )
