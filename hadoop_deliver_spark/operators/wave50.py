"""§2 extensions, seventy-fourth wave — paired ranks, concordance,
rank serial correlation, and seasonal trend (published-method
cadence).

- agg_wilcoxon_signedrank: the Wilcoxon signed-rank test (1945) on
  per-customer spend change across the 1995-01-01 boundary — the
  continuous sibling of events_mcnemar's paired flip test.
- agg_kendall_w: Kendall's coefficient of concordance (1939) — do
  calendar months agree on how the seven weekdays rank by revenue?
- ts_bartels_rvn: Bartels' rank von Neumann ratio test (1982) for
  serial dependence in the daily-revenue series — the rank twin of
  the classical von Neumann ratio.
- ts_seasonal_mann_kendall: the Hirsch-Slack seasonal Mann-Kendall
  trend test (1984) — within-calendar-month S statistics summed
  across years, immune to annual seasonality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₆ upper-5% critical value (Kendall-W verdict), shared round-6
# literal between the Spark plan and the oracle SQL
_CHI2_6_95 = "12.591587"


@register(
    "agg_wilcoxon_signedrank",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN o_orderdate < DATE '1995-01-01'
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN o_orderdate >= DATE '1995-01-01'
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS b
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT o_custkey, b - a AS diff, abs(b - a) AS ad
        FROM per WHERE b <> a
    ),
    o AS (
        SELECT diff, ad,
               row_number() OVER (ORDER BY ad, o_custkey) AS rk
        FROM d
    ),
    byval AS (
        SELECT ad, CAST(min(rk) AS BIGINT) AS mn,
               CAST(max(rk) AS BIGINT) AS mx,
               CAST(count(*) AS BIGINT) AS tc
        FROM o GROUP BY ad
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN o.diff > 0 THEN v.mn + v.mx
                             ELSE 0 END) AS BIGINT) AS w2,
               CAST(count(*) AS BIGINT) AS n
        FROM o JOIN byval v USING (ad)
    ),
    t AS (
        SELECT CAST(sum(tc * tc * tc - tc) AS BIGINT) AS tsum
        FROM byval
    )
    SELECT n AS n_pairs, w2,
           CAST(2 * n * (n + 1) * (2 * n + 1) - tsum AS BIGINT) AS v48,
           round((w2 - n * (n + 1) / 2.0)
                 / sqrt((2.0 * n * (n + 1) * (2 * n + 1) - tsum) / 12.0),
                 4) AS z,
           2 * w2 > n * (n + 1) AS spend_increased,
           CAST(1875 AS HUGEINT)
               * (2 * CAST(w2 AS HUGEINT) - CAST(n AS HUGEINT) * (n + 1))
               * (2 * CAST(w2 AS HUGEINT) - CAST(n AS HUGEINT) * (n + 1))
               > CAST(2401 AS HUGEINT)
                 * (2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - tsum)
               AS significant
    FROM s, t
    """,
    tags=("agg", "stats"),
)
def agg_wilcoxon_signedrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945): per customer, pair
    total spend before vs from 1995-01-01, drop zero differences,
    rank |d| and sum the ranks of the positive side. With DOUBLED
    midranks (minrank+maxrank of the |d| tie block) W2 = 2W⁺ is an
    exact int64; E[W2] = n(n+1)/2 exactly, and the tie-corrected
    variance enters as the exact integer V48 = 2n(n+1)(2n+1) − Σ(t³−t)
    (48·Var(W⁺); Var(W2) = V48/12). The two-sided 5% verdict clears
    every denominator: |z| > 49/25 ⇔ 1875·(2W2 − n(n+1))² > 2401·V48
    — cross-products promoted to DECIMAL(38)/HUGEINT (n⁴-scale), so
    no float ever decides; z is display-only (round-4).

    Envelope (n = non-zero-diff CUSTOMERS, corpus-proportional —
    unlike the calendar-bounded cousins): 1875·(2W2 − n(n+1))² peaks
    at 1875·n⁴ ≈ 10³⁸ at n ≈ 4.8e8, so past ~5e8 customers the
    DECIMAL(38) product overflows and Spark's non-ANSI multiply turns
    `significant` NULL rather than wrong — beyond that, rescale both
    sides by (1000·1000)² via W2 div 1000 / V48 div 10⁶ (a ±1-ulp
    band at the boundary) or flip on spark.sql.ansi.enabled to fail
    loudly. The driver fixture peaks at ~1.5e5 customers (sf0.1) —
    ~3000× under the ceiling.

    Scale shape: one keyed customer reduce, the block-ranked exact
    global rank (api core — rank windows partition by block), a
    per-distinct-|d| tie reduce, then 1-row × 1-row scalar joins."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit("1995-01-01").cast("date"), cents)
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"), cents
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("b"),
    )
    d = per.filter(F.col("b") != F.col("a")).select(
        "o_custkey",
        (F.col("b") - F.col("a")).alias("diff"),
        F.abs(F.col("b") - F.col("a")).alias("ad"),
    )
    ranked = api.exact_global_rank(d, "ad", "o_custkey", "rk")
    byval = ranked.groupBy("ad").agg(
        F.min("rk").cast("long").alias("mn"),
        F.max("rk").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("tc"),
    )
    # plain equi-join: byval has ~one row per distinct |d| (≈ n at any
    # scale) — too big to promise a broadcast at 100 TB
    s = (
        ranked.join(byval, "ad")
        .agg(
            F.sum(
                F.when(F.col("diff") > 0, F.col("mn") + F.col("mx")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("w2"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    t = byval.agg(
        F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
        .cast("long")
        .alias("tsum")
    )
    st = s.crossJoin(F.broadcast(t))
    n, w2, tsum = F.col("n"), F.col("w2"), F.col("tsum")
    dev38 = (
        2 * w2.cast("decimal(38,0)") - n.cast("decimal(38,0)") * (n + 1)
    )
    v48_38 = (
        2 * n.cast("decimal(38,0)") * (n + 1) * (2 * n + 1) - tsum
    )
    return st.select(
        n.alias("n_pairs"),
        "w2",
        (2 * n * (n + 1) * (2 * n + 1) - tsum).cast("long").alias("v48"),
        F.round(
            (w2 - n * (n + 1) / 2.0)
            / F.sqrt((2.0 * n * (n + 1) * (2 * n + 1) - tsum) / 12.0),
            4,
        ).alias("z"),
        (2 * w2 > n * (n + 1)).alias("spend_increased"),
        (1875 * dev38 * dev38 > 2401 * v48_38).alias("significant"),
    )


@register(
    "agg_kendall_w",
    f"""
    WITH cell AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               (CAST(o_orderdate AS DATE) - DATE '1970-01-05') % 7 AS dow,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    grid AS (
        SELECT mm.m, dd.dow,
               CAST(coalesce(cell.cents, 0) AS BIGINT) AS cents
        FROM (SELECT DISTINCT m FROM cell) mm
        CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6)) dd(dow)
        LEFT JOIN cell ON cell.m = mm.m AND cell.dow = dd.dow
    ),
    rk AS (
        SELECT m, dow, cents,
               row_number() OVER (PARTITION BY m
                                  ORDER BY cents, dow) AS r
        FROM grid
    ),
    mid AS (
        SELECT rk.m, rk.dow, b.mn + b.mx AS d2
        FROM rk JOIN (
            SELECT m, cents, CAST(min(r) AS BIGINT) AS mn,
                   CAST(max(r) AS BIGINT) AS mx,
                   CAST(count(*) AS BIGINT) AS tc
            FROM rk GROUP BY m, cents
        ) b ON b.m = rk.m AND b.cents = rk.cents
    ),
    ties AS (
        SELECT CAST(sum(tc * tc * tc - tc) AS BIGINT) AS tsum
        FROM (SELECT m, cents, CAST(count(*) AS BIGINT) AS tc
              FROM rk GROUP BY m, cents) x
    ),
    cols AS (
        SELECT dow, CAST(sum(d2) AS BIGINT) AS r2
        FROM mid GROUP BY dow
    ),
    mm AS (
        SELECT CAST(count(DISTINCT m) AS BIGINT) AS m FROM grid
    ),
    s AS (
        SELECT CAST(sum((r2 - mm.m * 8) * (r2 - mm.m * 8)) AS BIGINT)
                   AS s4,
               CAST(max(mm.m) AS BIGINT) AS m
        FROM cols, mm
    )
    SELECT s.m AS n_months, CAST(7 AS INT) AS k, s.s4,
           round(3.0 * s.s4
                 / (CAST(s.m AS DOUBLE) * (336 * s.m - ties.tsum)), 4)
               AS w,
           round(18.0 * s.s4
                 / (336.0 * s.m - ties.tsum), 4) AS chi2,
           18.0 * s.s4 > {_CHI2_6_95} * (336.0 * s.m - ties.tsum)
               AS significant
    FROM s, ties
    """,
    tags=("agg", "stats"),
)
def agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance (Kendall & Babington
    Smith 1939): judges = calendar months, items = the seven weekdays
    (epoch-anchored (date − 1970-01-05) mod 7 — identical arithmetic
    on both engines, no locale-dependent dayofweek), response = that
    month's revenue on that weekday (dense grid, missing cell = 0).
    With DOUBLED within-month midranks, column sums R2_j and
    S4 = Σ_j (R2_j − m(k+1))² = 4S are exact int64s, and the
    tie-corrected W = 12S/(m²(k³−k) − mΣT) reduces at k = 7 to
    3·S4/(m(336m − ΣT)). The verdict uses Friedman's χ² device:
    χ²₆ = m(k−1)W = 18·S4/(336m − ΣT), compared textually against
    the shared literal χ²₆(0.95) = 12.591587 on both engines.

    Scale shape: one keyed fact reduce to the (month × 7) grid; the
    rank window partitions by MONTH (calendar-bounded axis); the
    SinglePartitions are the 7-row column reduce and 1-row scalars."""
    o = tbl(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "m"
        ),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-05").cast("date"))
            % 7
        ).alias("dow"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    grid = (
        cell.select("m")
        .distinct()
        .select(
            "m", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("dow")
        )
        .join(cell, ["m", "dow"], "left")
        .select(
            "m",
            "dow",
            F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("m").orderBy("cents", "dow")
    rk = grid.withColumn("r", F.row_number().over(w))
    blocks = rk.groupBy("m", "cents").agg(
        F.min("r").cast("long").alias("mn"),
        F.max("r").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("tc"),
    )
    mid = rk.join(blocks, ["m", "cents"]).select(
        "m", "dow", (F.col("mn") + F.col("mx")).alias("d2")
    )
    ties = blocks.agg(
        F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
        .cast("long")
        .alias("tsum")
    )
    cols = mid.groupBy("dow").agg(F.sum("d2").cast("long").alias("r2"))
    mcnt = grid.agg(
        F.count_distinct(F.col("m")).cast("long").alias("m")
    )
    s = (
        cols.crossJoin(F.broadcast(mcnt))
        .agg(
            F.sum(
                (F.col("r2") - F.col("m") * 8)
                * (F.col("r2") - F.col("m") * 8)
            )
            .cast("long")
            .alias("s4"),
            F.max("m").cast("long").alias("m"),
        )
    )
    st = s.crossJoin(F.broadcast(ties))
    m, s4, tsum = F.col("m"), F.col("s4"), F.col("tsum")
    return st.select(
        m.alias("n_months"),
        F.lit(7).cast("int").alias("k"),
        "s4",
        F.round(
            3.0 * s4 / (m.cast("double") * (336 * m - tsum)), 4
        ).alias("w"),
        F.round(18.0 * s4 / (336.0 * m - tsum), 4).alias("chi2"),
        (18.0 * s4 > float(_CHI2_6_95) * (336.0 * m - tsum)).alias(
            "significant"
        ),
    )


@register(
    "ts_bartels_rvn",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    rk AS (
        SELECT day, cents,
               row_number() OVER (ORDER BY cents, day) AS r,
               count(*) OVER () AS n
        FROM daily
    ),
    mid AS (
        SELECT rk.day, b.mn + b.mx AS r2, rk.n
        FROM rk JOIN (
            SELECT cents, CAST(min(r) AS BIGINT) AS mn,
                   CAST(max(r) AS BIGINT) AS mx
            FROM rk GROUP BY cents
        ) b ON b.cents = rk.cents
    ),
    seq AS (
        SELECT r2, lead(r2) OVER (ORDER BY day) AS nxt, n
        FROM mid
    ),
    s AS (
        SELECT CAST(sum((r2 - nxt) * (r2 - nxt)) FILTER (nxt IS NOT NULL)
                    AS BIGINT) AS nm2,
               CAST(sum((r2 - (n + 1)) * (r2 - (n + 1))) AS BIGINT) AS d2,
               CAST(max(n) AS BIGINT) AS n
        FROM seq
    )
    SELECT n AS n_days, nm2, d2,
           round(CAST(nm2 AS DOUBLE) / d2, 4) AS rvn,
           round((CAST(nm2 AS DOUBLE) / d2 - 2)
                 * sqrt(CAST(n AS DOUBLE)) / 2, 4) AS z,
           CAST(625 AS HUGEINT) * n
               * (CAST(nm2 AS HUGEINT) - 2 * CAST(d2 AS HUGEINT))
               * (CAST(nm2 AS HUGEINT) - 2 * CAST(d2 AS HUGEINT))
               > CAST(9604 AS HUGEINT)
                 * CAST(d2 AS HUGEINT) * CAST(d2 AS HUGEINT)
               AS dependent
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_bartels_rvn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank version of von Neumann's ratio (Bartels 1982):
    RVN = Σ(R_i − R_{i+1})² / Σ(R_i − R̄)² over the daily-revenue
    series — RVN « 2 means positive serial dependence (trend), » 2
    means alternation. With DOUBLED midranks (R̄2 = n+1 exactly) both
    the successive-difference sum NM2 and the centered square sum D2
    are exact int64s, and the doubling cancels in the ratio. Under
    randomness E[RVN] = 2, Var[RVN] → 4/n (Bartels' asymptotic form,
    both engines share it textually); the two-sided 5% verdict clears
    the ratio: |z| > 49/25 ⇔ 625·n·(NM2 − 2·D2)² > 9604·D2² — n⁶-scale
    cross-products promoted to DECIMAL(38)/HUGEINT, so no float ever
    decides. RVN and z are display-only (round-4).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series; the rank/lead windows run over that bounded axis only
    (the ts_* bounded-window shape)."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w_r = Window.orderBy("cents", "day")
    w_n = Window.partitionBy()
    rk = daily.select(
        "day",
        "cents",
        F.row_number().over(w_r).alias("r"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    blocks = rk.groupBy("cents").agg(
        F.min("r").cast("long").alias("mn"),
        F.max("r").cast("long").alias("mx"),
    )
    mid = rk.join(F.broadcast(blocks), "cents").select(
        "day", (F.col("mn") + F.col("mx")).alias("r2"), "n"
    )
    seq = mid.select(
        "r2", F.lead("r2").over(Window.orderBy("day")).alias("nxt"), "n"
    )
    s = seq.agg(
        F.sum(
            F.when(
                F.col("nxt").isNotNull(),
                (F.col("r2") - F.col("nxt")) * (F.col("r2") - F.col("nxt")),
            )
        )
        .cast("long")
        .alias("nm2"),
        F.sum(
            (F.col("r2") - (F.col("n") + 1))
            * (F.col("r2") - (F.col("n") + 1))
        )
        .cast("long")
        .alias("d2"),
        F.max("n").cast("long").alias("n"),
    )
    nm2, d2, n = F.col("nm2"), F.col("d2"), F.col("n")
    dev38 = nm2.cast("decimal(38,0)") - 2 * d2.cast("decimal(38,0)")
    return s.select(
        n.alias("n_days"),
        "nm2",
        "d2",
        F.round(nm2.cast("double") / d2, 4).alias("rvn"),
        F.round(
            (nm2.cast("double") / d2 - 2) * F.sqrt(n.cast("double")) / 2, 4
        ).alias("z"),
        (
            625 * n.cast("decimal(38,0)") * dev38 * dev38
            > 9604 * d2.cast("decimal(38,0)") * d2.cast("decimal(38,0)")
        ).alias("dependent"),
    )


@register(
    "ts_seasonal_mann_kendall",
    """
    WITH monthly AS (
        SELECT CAST(strftime(o_orderdate, '%m') AS INT) AS season,
               CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM monthly a JOIN monthly b
          ON a.season = b.season AND a.yr < b.yr
    ),
    v AS (
        SELECT CAST(sum(n18 - tie18) AS BIGINT) AS var18,
               CAST(count(*) AS BIGINT) AS n_seasons
        FROM (
            SELECT season,
                   CAST(max(n) * (max(n) - 1) * (2 * max(n) + 5) AS BIGINT)
                       AS n18,
                   CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                       AS tie18
            FROM (SELECT season, cents,
                         CAST(count(*) AS BIGINT) AS tc,
                         CAST(sum(count(*)) OVER (PARTITION BY season)
                              AS BIGINT) AS n
                  FROM monthly GROUP BY season, cents) x
            GROUP BY season
        ) y
    )
    SELECT v.n_seasons, s.s_stat, v.var18,
           round(CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   / sqrt(CAST(v.var18 AS DOUBLE) / 18)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   / sqrt(CAST(v.var18 AS DOUBLE) / 18)
               ELSE 0.0 END, 4) AS z,
           CASE WHEN s.s_stat > 0 THEN
                    11250 * (s.s_stat - 1) * (s.s_stat - 1) > 2401 * v.var18
                WHEN s.s_stat < 0 THEN
                    11250 * (s.s_stat + 1) * (s.s_stat + 1) > 2401 * v.var18
                ELSE FALSE END AS significant
    FROM s, v
    """,
    tags=("timeseries", "stats"),
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984): compute
    the Mann-Kendall S within each calendar-month season (monthly
    revenue compared only across YEARS, never across months) and sum —
    a trend test immune to annual seasonality. S and the tie-corrected
    Var·18 = Σ_m [n_m(n_m−1)(2n_m+5) − Σ_t t(t−1)(2t+5)] are exact
    int64s; the ±1 continuity correction branches on the exact integer
    S, and the two-sided 5% verdict is the pure-integer cross-product
    11250·(S∓1)² > 2401·Var18 (from z² > (49/25)² with the /18
    cleared). Only the displayed z touches floats, textually identical
    on both engines.

    Scale shape: one keyed fact reduce to the (season × year) frame
    (≤ 12·years rows at ANY corpus scale); the pairwise join and tie
    reduces run on that bounded frame only."""
    o = tbl(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").alias("season"),
        F.year("o_orderdate").alias("yr"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = monthly.select(
        "season", F.col("yr").alias("ya"), F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("season").alias("season_b"),
        F.col("yr").alias("yb"),
        F.col("cents").alias("cb"),
    )
    s = (
        a.join(
            b,
            (F.col("season") == F.col("season_b"))
            & (F.col("ya") < F.col("yb")),
        )
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    per_val = monthly.groupBy("season", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    per_val = per_val.withColumn(
        "n", F.sum("tc").over(Window.partitionBy("season")).cast("long")
    )
    v = (
        per_val.groupBy("season")
        .agg(
            (
                F.max("n") * (F.max("n") - 1) * (2 * F.max("n") + 5)
            )
            .cast("long")
            .alias("n18"),
            F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5))
            .cast("long")
            .alias("tie18"),
        )
        .agg(
            F.sum(F.col("n18") - F.col("tie18")).cast("long").alias("var18"),
            F.count(F.lit(1)).cast("long").alias("n_seasons"),
        )
    )
    sv = s.crossJoin(F.broadcast(v))
    ss, var18 = F.col("s_stat"), F.col("var18")
    sd = F.sqrt(var18.cast("double") / 18)
    z = (
        F.when(ss > 0, (ss - 1) / sd)
        .when(ss < 0, (ss + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    sig = (
        F.when(ss > 0, 11250 * (ss - 1) * (ss - 1) > 2401 * var18)
        .when(ss < 0, 11250 * (ss + 1) * (ss + 1) > 2401 * var18)
        .otherwise(F.lit(False))
    )
    return sv.select(
        "n_seasons",
        "s_stat",
        "var18",
        F.round(z, 4).alias("z"),
        sig.alias("significant"),
    )
