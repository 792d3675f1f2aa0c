"""§2 extensions, ninety-seventh wave — ordered-dose trend and
frequency-stability classics (published-method cadence).

- agg_trend_cuzick: Cuzick's Wilcoxon-type test for trend (1985)
  across the five ORDERED priorities — the rank-correlation trend
  test (Jonckheere-Terpstra counts pairs; Cuzick correlates dose
  with rank).
- events_allan_variance: the Allan variance ladder (Allan 1966) of
  daily event counts at τ = 1, 2, 4, 8 days — the frequency-
  stability diagnostic, with the exact white-noise 1/τ scaling
  check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# one-sided z 5% squared: χ²₁(0.90) = 2.705543 = 1.6448536²
# (Cuzick trend verdict)
_Z95_SQ = "2.705543"
_TAUS = (1, 2, 4, 8)


@register(
    "agg_trend_cuzick",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders
    ),
    rk AS (
        SELECT g, cents,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS rn
        FROM base
    ),
    b AS (
        SELECT cents,
               CAST(min(rn) AS BIGINT) AS mn,
               CAST(max(rn) AS BIGINT) AS mx
        FROM rk GROUP BY cents
    ),
    mid AS (
        SELECT rk.g, (b.mn + b.mx) AS r2
        FROM rk JOIN b USING (cents)
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(g) AS BIGINT) AS sg,
               CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg,
               CAST(sum(CAST(r2 AS HUGEINT)) AS HUGEINT) AS sr,
               CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS srr,
               CAST(sum(CAST(g AS HUGEINT) * r2) AS HUGEINT) AS t2
        FROM mid
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * t2 - CAST(sg AS HUGEINT) * sr
                    AS DOUBLE) AS a,
               CAST(CAST(n AS HUGEINT) * sgg
                    - CAST(sg AS HUGEINT) * sg AS DOUBLE) AS cg,
               CAST(CAST(n AS HUGEINT) * srr - sr * sr AS DOUBLE) AS cr
        FROM s
    )
    SELECT n AS n_orders,
           round(a / sqrt(cg * cr / (n - 1)), 4) AS z_stat,
           a > 0 AND a * a * (n - 1) > {_Z95_SQ} * cg * cr
               AS increasing_trend
    FROM c
    """,
    tags=("agg", "stats"),
)
def agg_trend_cuzick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuzick's Wilcoxon-type trend test (1985) — does order value
    trend MONOTONICALLY up the five ordered priorities? T = Σg_j·R_j
    correlates the dose index with the pooled rank; under
    permutation E[T] = Σg·ΣR/N and Var[T] = Σ(g−ḡ)²·Σ(R−R̄)²/(N−1),
    making z fully tie-robust with midranks (where
    agg_jonckheere_terpstra counts between-group pair orderings,
    Cuzick is its rank-correlation sibling — both ship, the
    textbook pair). Doubled midranks r2 = min+max per tie group (the
    agg_mann_whitney block device keeps the fact table out of any
    single-partition window) make every moment an exact
    DECIMAL(38)/HUGEINT; the centered A = N·T − Σg·ΣR, C_g, C_r
    cast ONCE to double (the exact-integer cross product A²·C_gC_r
    would need ~10⁴⁶ — the agg_lepage note), and z and the
    one-sided verdict A > 0 ∧ A²(N−1) > 2.705543·C_gC_r assemble in
    ONE fixed textual order.

    Scale shape: one block-ranked pass over orders, one
    distinct-value tie reduce, a 1-row moment reduce."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rn")
    b = ranked.groupBy("cents").agg(
        F.min("rn").cast("long").alias("mn"),
        F.max("rn").cast("long").alias("mx"),
    )
    mid = ranked.join(F.broadcast(b), "cents").select(
        "g", (F.col("mn") + F.col("mx")).alias("r2")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = mid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(d38("g") * F.col("g")).alias("sgg"),
        F.sum(d38("r2")).alias("sr"),
        F.sum(d38("r2") * F.col("r2")).alias("srr"),
        F.sum(d38("g") * F.col("r2")).alias("t2"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    c = s.select(
        "n",
        (n38 * F.col("t2") - d38("sg") * F.col("sr"))
        .cast("double")
        .alias("a"),
        (n38 * F.col("sgg") - d38("sg") * F.col("sg"))
        .cast("double")
        .alias("cg"),
        (n38 * F.col("srr") - F.col("sr") * F.col("sr"))
        .cast("double")
        .alias("cr"),
    )
    n, a, cg, cr = F.col("n"), F.col("a"), F.col("cg"), F.col("cr")
    return c.select(
        n.alias("n_orders"),
        F.round(a / F.sqrt(cg * cr / (n - 1)), 4).alias("z_stat"),
        ((a > 0) & (a * a * (n - 1) > float(_Z95_SQ) * cg * cr)).alias(
            "increasing_trend"
        ),
    )


def _allan_tau_sql(tau: int) -> str:
    return f"""
    SELECT CAST({tau} AS BIGINT) AS tau,
           CAST(count(*) + 1 AS BIGINT) AS m_blocks,
           round(CAST(sum(dd * dd) AS DOUBLE)
                 / (2 * count(*) * {tau * tau}), 4) AS avar,
           CAST(sum(dd * dd) AS HUGEINT) AS d2,
           CAST(count(*) AS BIGINT) AS ndiff
    FROM (
        SELECT CAST(s - lag(s) OVER (ORDER BY blk) AS HUGEINT) AS dd
        FROM (
            SELECT (t - 1) // {tau} AS blk,
                   CAST(sum(c) AS BIGINT) AS s
            FROM daily
            WHERE t <= ((SELECT max(t) FROM daily) // {tau}) * {tau}
            GROUP BY 1
        )
    )
    WHERE dd IS NOT NULL
    """


@register(
    "events_allan_variance",
    f"""
    WITH daily AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
               c
        FROM (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        )
    ),
    ladder AS (
        {" UNION ALL ".join(_allan_tau_sql(t) for t in _TAUS)}
    ),
    chk AS (
        SELECT
            (SELECT d2 FROM ladder WHERE tau = 1) AS d2_1,
            (SELECT ndiff FROM ladder WHERE tau = 1) AS nd_1,
            (SELECT d2 FROM ladder WHERE tau = 8) AS d2_8,
            (SELECT ndiff FROM ladder WHERE tau = 8) AS nd_8
    )
    SELECT l.tau, l.m_blocks, l.avar,
           4 * c.d2_8 * c.nd_1 <= 64 * c.d2_1 * c.nd_8
               AND 64 * c.d2_1 * c.nd_8 <= 16 * c.d2_8 * c.nd_1
               AS white_noise_scaling
    FROM ladder l, chk c
    ORDER BY l.tau
    """,
    tags=("events", "stats"),
)
def events_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance ladder (Allan 1966) of daily event counts at
    τ ∈ {{1, 2, 4, 8}} days: AVAR(τ) = E[(m̄_(i+1) − m̄_i)²]/2 over
    non-overlapping τ-day block means — the frequency-stability
    diagnostic whose log-log SLOPE identifies the noise color
    (white → 1/τ, flicker → flat, random walk → τ), used on
    everything from atomic clocks to event-rate pipelines; it
    complements the existing Fano/Goh-Barabási burstiness pair by
    separating noise TYPES, not just overdispersion. With exact
    block SUMS s_i, AVAR = Σ(s_(i+1)−s_i)²/(2(M−1)τ²) — the
    numerator an exact DECIMAL(38)/HUGEINT sum of squared integer
    diffs (trailing partial blocks dropped by the shared exact
    cutoff (max t div τ)·τ). The white-noise check AVAR(1)/AVAR(8)
    ∈ [4, 16] (nominal 8) is FULLY exact: 4·D₈·n₁ ≤ 64·D₁·n₈ ≤
    16·D₈·n₁.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, per-τ block reduces + one bounded lag window each, a
    4-row union."""
    e = tbl(spark, sf_dir, "events")
    daily0 = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    daily = daily0.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        "c",
    ).localCheckpoint()
    tmax = daily.agg(F.max("t").alias("tm"))
    frames = []
    for tau in _TAUS:
        cut = daily.crossJoin(F.broadcast(tmax)).where(
            F.col("t") <= F.expr(f"(tm div {tau}) * {tau}")
        )
        blk = cut.groupBy(
            F.expr(f"(t - 1) div {tau}").alias("blk")
        ).agg(F.sum("c").cast("long").alias("s"))
        dd = blk.select(
            (F.col("s") - F.lag("s").over(Window.orderBy("blk")))
            .cast("decimal(38,0)")
            .alias("dd")
        ).where(F.col("dd").isNotNull())
        fr = dd.agg(
            F.lit(tau).cast("long").alias("tau"),
            (F.count(F.lit(1)) + 1).cast("long").alias("m_blocks"),
            F.round(
                F.sum(F.col("dd") * F.col("dd")).cast("double")
                / (2 * F.count(F.lit(1)) * (tau * tau)),
                4,
            ).alias("avar"),
            F.sum(F.col("dd") * F.col("dd")).alias("d2"),
            F.count(F.lit(1)).cast("long").alias("ndiff"),
        )
        frames.append(fr)
    ladder = frames[0]
    for fr in frames[1:]:
        ladder = ladder.unionAll(fr)
    ladder = ladder.localCheckpoint()
    chk = (
        ladder.where(F.col("tau") == 1)
        .select(
            F.col("d2").alias("d2_1"), F.col("ndiff").alias("nd_1")
        )
        .crossJoin(
            F.broadcast(
                ladder.where(F.col("tau") == 8).select(
                    F.col("d2").alias("d2_8"),
                    F.col("ndiff").alias("nd_8"),
                )
            )
        )
    )
    out = ladder.crossJoin(F.broadcast(chk))
    return out.select(
        "tau",
        "m_blocks",
        "avar",
        (
            (
                4 * F.col("d2_8") * F.col("nd_1")
                <= 64 * F.col("d2_1") * F.col("nd_8")
            )
            & (
                64 * F.col("d2_1") * F.col("nd_8")
                <= 16 * F.col("d2_8") * F.col("nd_1")
            )
        ).alias("white_noise_scaling"),
    ).orderBy("tau")
