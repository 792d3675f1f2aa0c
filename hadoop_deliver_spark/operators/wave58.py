"""§2 extensions, eighty-second wave — combined location-scale
testing, control charts, multiscale energy, and Lorenz shape
(published-method cadence).

- agg_lepage: the Lepage combined location-scale test (1971) —
  Wilcoxon² + Ansari-Bradley² against χ²₂, both components as
  general linear-rank statistics with tie-robust moments.
- ts_shewhart_xbar: the Shewhart X̄-R control chart (1931) over
  weekly subgroups of daily revenue, A₂ = 0.419 at n = 7.
- ts_haar_energy: Haar wavelet energy decomposition (Haar 1910;
  Percival & Walden 2000) — five levels of exact pairwise
  sum/difference cascades over the daily series.
- agg_lorenz_asymmetry: the Lorenz asymmetry coefficient (Damgaard
  & Weiner 2000) S = F(μ) + L(μ) of customer spend — which side of
  the Lorenz curve the inequality lives on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₂ upper-5% critical value (Lepage verdict), shared textually
_CHI2_2_95 = "5.991465"


@register(
    "agg_lepage",
    f"""
    WITH daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT smp, cents,
               row_number() OVER (ORDER BY cents, smp, day) AS rn
        FROM daily
    ),
    mid AS (
        SELECT rc.smp, b.mn + b.mx AS r2,
               CAST(count(*) OVER () AS BIGINT) AS nn
        FROM rc JOIN (
            SELECT cents, CAST(min(rn) AS BIGINT) AS mn,
                   CAST(max(rn) AS BIGINT) AS mx
            FROM rc GROUP BY cents
        ) b ON b.cents = rc.cents
    ),
    sc AS (
        SELECT smp, r2, nn,
               least(r2, 2 * nn + 2 - r2) AS a2
        FROM mid
    ),
    s AS (
        SELECT CAST(max(nn) AS BIGINT) AS nn,
               CAST(count(CASE WHEN smp = 1 THEN 1 END) AS BIGINT) AS n1,
               CAST(count(CASE WHEN smp = 2 THEN 1 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN smp = 1 THEN r2 ELSE 0 END) AS BIGINT)
                   AS t1,
               CAST(sum(CASE WHEN smp = 1 THEN a2 ELSE 0 END) AS BIGINT)
                   AS a1,
               CAST(sum(a2) AS BIGINT) AS sa,
               CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS sr2,
               CAST(sum(CAST(a2 AS HUGEINT) * a2) AS HUGEINT) AS sa2
        FROM sc
    ),
    z AS (
        SELECT nn, n1, n2,
               (CAST(nn AS DOUBLE) * t1
                - CAST(n1 AS DOUBLE) * (nn * (nn + 1)))
               * (CAST(nn AS DOUBLE) * t1
                  - CAST(n1 AS DOUBLE) * (nn * (nn + 1)))
               * (nn - 1)
               / (CAST(n1 AS DOUBLE) * n2
                  * (CAST(nn AS DOUBLE) * sr2
                     - CAST(nn AS DOUBLE) * (nn + 1)
                       * CAST(nn AS DOUBLE) * (nn + 1))) AS zw2,
               (CAST(nn AS DOUBLE) * a1 - CAST(n1 AS DOUBLE) * sa)
               * (CAST(nn AS DOUBLE) * a1 - CAST(n1 AS DOUBLE) * sa)
               * (nn - 1)
               / (CAST(n1 AS DOUBLE) * n2
                  * (CAST(nn AS DOUBLE) * sa2
                     - CAST(sa AS DOUBLE) * sa)) AS za2
        FROM s
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round(zw2, 4) AS z_wilcoxon_sq,
           round(za2, 4) AS z_ansari_sq,
           round(zw2 + za2, 4) AS lepage_l,
           zw2 + za2 > {_CHI2_2_95} AS significant
    FROM z
    """,
    tags=("agg", "stats"),
)
def agg_lepage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage combined location-scale test (Lepage 1971): L = Z²_W +
    Z²_A — the squared standardized Wilcoxon rank-sum PLUS the
    squared standardized Ansari-Bradley dispersion statistic — is
    asymptotically χ²₂ under H₀, catching shifts the location test
    misses and spreads the scale test misses. Both components are
    linear rank statistics evaluated with the GENERAL score-moment
    form (E = n1·s̄, Var = n1n2·Σ(s−s̄)²/(N(N−1))), which is
    tie-robust for ANY scores: Wilcoxon scores are the doubled
    combined midranks r2 (Σr2 = N(N+1) exactly), Ansari scores their
    doubled folds a2 = min(r2, 2N+2−r2). All score sums and square
    sums are exact DECIMAL(38)/HUGEINT; the two Z² terms and the
    verdict L > χ²₂(0.95) assemble in ONE fixed textual order of
    doubles (the agg_oneway_anova device — the exact-integer
    cross-product form of the SUM of two different-denominator
    rationals would need ~10⁴⁷). Samples: the two priorities' daily
    revenue series.

    Scale shape: one keyed reduce to ≤2·days rows, one bounded-axis
    rank window, a distinct-value tie reduce, a 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("smp"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    rc = daily.select(
        "smp",
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .alias("rn"),
    )
    b = rc.groupBy("cents").agg(
        F.min("rn").cast("long").alias("mn"),
        F.max("rn").cast("long").alias("mx"),
    )
    mid = rc.join(F.broadcast(b), "cents").select(
        "smp",
        (F.col("mn") + F.col("mx")).alias("r2"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("nn"),
    )
    sc = mid.select(
        "smp",
        "r2",
        "nn",
        F.least(F.col("r2"), 2 * F.col("nn") + 2 - F.col("r2")).alias(
            "a2"
        ),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = sc.agg(
        F.max("nn").cast("long").alias("nn"),
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .cast("long")
        .alias("n1"),
        F.count(F.when(F.col("smp") == 2, F.lit(1)))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("smp") == 1, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("t1"),
        F.sum(F.when(F.col("smp") == 1, F.col("a2")).otherwise(0))
        .cast("long")
        .alias("a1"),
        F.sum("a2").cast("long").alias("sa"),
        F.sum(d38("r2") * F.col("r2")).alias("sr2"),
        F.sum(d38("a2") * F.col("a2")).alias("sa2"),
    )
    nn, n1, n2 = F.col("nn"), F.col("n1"), F.col("n2")
    t1, a1, sa = F.col("t1"), F.col("a1"), F.col("sa")
    sr2, sa2 = F.col("sr2"), F.col("sa2")
    zw2 = (
        (nn.cast("double") * t1 - n1.cast("double") * (nn * (nn + 1)))
        * (nn.cast("double") * t1 - n1.cast("double") * (nn * (nn + 1)))
        * (nn - 1)
        / (
            n1.cast("double")
            * n2
            * (
                nn.cast("double") * sr2
                - nn.cast("double") * (nn + 1) * nn.cast("double") * (nn + 1)
            )
        )
    )
    za2 = (
        (nn.cast("double") * a1 - n1.cast("double") * sa)
        * (nn.cast("double") * a1 - n1.cast("double") * sa)
        * (nn - 1)
        / (
            n1.cast("double")
            * n2
            * (nn.cast("double") * sa2 - sa.cast("double") * sa)
        )
    )
    return s.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(zw2, 4).alias("z_wilcoxon_sq"),
        F.round(za2, 4).alias("z_ansari_sq"),
        F.round(zw2 + za2, 4).alias("lepage_l"),
        (zw2 + za2 > float(_CHI2_2_95)).alias("significant"),
    )


@register(
    "ts_shewhart_xbar",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS dollars
        FROM orders GROUP BY 1
    ),
    wk AS (
        SELECT strftime(date_trunc('week', day), '%Y-%m-%d') AS week,
               CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(dollars) AS BIGINT) AS s,
               CAST(max(dollars) - min(dollars) AS BIGINT) AS r
        FROM daily GROUP BY 1
    ),
    full7 AS (SELECT * FROM wk WHERE nd = 7),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS w,
               CAST(sum(s) AS BIGINT) AS ss,
               CAST(sum(r) AS BIGINT) AS sr
        FROM full7
    )
    SELECT f.week,
           round(CAST(f.s AS DOUBLE) / 7, 4) AS xbar,
           f.r AS range_dollars,
           1000 * g.w * f.s > 1000 * g.ss + 2933 * g.sr AS above_ucl,
           1000 * g.w * f.s < 1000 * g.ss - 2933 * g.sr AS below_lcl
    FROM full7 f CROSS JOIN g
    ORDER BY f.week
    """,
    tags=("timeseries", "stats"),
)
def ts_shewhart_xbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X̄-R control chart (Shewhart 1931; the SPC staple):
    weekly subgroups (n = 7, full ISO weeks only) of daily revenue;
    a week signals when its mean leaves X̄̄ ± A₂·R̄ with the standard
    chart constant A₂(7) = 0.419 (shared literal). Everything is
    exact integer arithmetic: per-week sums S_w and ranges R_w are
    int64s, and the control test S_w/7 ≷ ΣS/(7W) ± 0.419·ΣR/W
    cross-multiplies by 7000·W to 1000·W·S_w ≷ 1000·ΣS ± 2933·ΣR
    (0.419·7·1000 = 2933 exactly); x̄ is a display-only single
    division. Week identity is the ISO week-start date.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one weekly reduce, a 1-row grand reduce broadcast over
    the ≤weeks-of-history rows."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("dollars")
    )
    wk = daily.groupBy(
        F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd").alias(
            "week"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("dollars").cast("long").alias("s"),
        (F.max("dollars") - F.min("dollars")).cast("long").alias("r"),
    )
    full7 = wk.filter(F.col("nd") == 7)
    g = full7.agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("r").cast("long").alias("sr"),
    )
    return (
        full7.crossJoin(F.broadcast(g))
        .select(
            "week",
            F.round(F.col("s").cast("double") / 7, 4).alias("xbar"),
            F.col("r").alias("range_dollars"),
            (
                1000 * F.col("w") * F.col("s")
                > 1000 * F.col("ss") + 2933 * F.col("sr")
            ).alias("above_ucl"),
            (
                1000 * F.col("w") * F.col("s")
                < 1000 * F.col("ss") - 2933 * F.col("sr")
            ).alias("below_lcl"),
        )
        .orderBy("week")
    )


@register(
    "ts_haar_energy",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS i, cents
        FROM daily QUALIFY i < 2048
    ),
    l1 AS (
        SELECT i // 2 AS i,
               CAST(sum(CASE WHEN i % 2 = 0 THEN cents
                             ELSE -cents END) AS BIGINT) AS d,
               CAST(sum(cents) AS BIGINT) AS s
        FROM idx GROUP BY 1
    ),
    l2 AS (
        SELECT i // 2 AS i,
               CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END)
                    AS BIGINT) AS d,
               CAST(sum(s) AS BIGINT) AS s
        FROM l1 GROUP BY 1
    ),
    l3 AS (
        SELECT i // 2 AS i,
               CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END)
                    AS BIGINT) AS d,
               CAST(sum(s) AS BIGINT) AS s
        FROM l2 GROUP BY 1
    ),
    l4 AS (
        SELECT i // 2 AS i,
               CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END)
                    AS BIGINT) AS d,
               CAST(sum(s) AS BIGINT) AS s
        FROM l3 GROUP BY 1
    ),
    l5 AS (
        SELECT i // 2 AS i,
               CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END)
                    AS BIGINT) AS d,
               CAST(sum(s) AS BIGINT) AS s
        FROM l4 GROUP BY 1
    ),
    e AS (
        SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
               CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS e2
        FROM l1
        UNION ALL SELECT 2, count(*),
            CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) FROM l2
        UNION ALL SELECT 3, count(*),
            CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) FROM l3
        UNION ALL SELECT 4, count(*),
            CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) FROM l4
        UNION ALL SELECT 5, count(*),
            CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) FROM l5
    ),
    tot AS (
        SELECT sum(CAST(e2 AS DOUBLE) / pow(2.0, level)) AS te FROM e
    )
    SELECT CAST(e.level AS INT) AS level, e.n_coeffs,
           CAST(e.e2 AS DOUBLE) AS d2_raw,
           round(CAST(e.e2 AS DOUBLE) / pow(2.0, e.level) / tot.te, 6)
               AS energy_share
    FROM e CROSS JOIN tot
    ORDER BY level
    """,
    tags=("timeseries",),
)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition (Haar 1910; the wavelet
    variance of Percival & Walden 2000): five levels of the exact
    pairwise cascade s_j = a + b, d_j = a − b over the first 2048
    days of revenue (the dyadic truncation literal both engines
    share) — level j captures fluctuation at the 2^j-day scale,
    the multiscale twin of the weekly periodogram. Every
    coefficient is an exact integer and the raw detail energies
    Σd² promote to DECIMAL(38)/HUGEINT (at the 2⁵-day level the
    unnormalized smooth is a 32-day sum, so d² carries ~4n²·C²);
    the orthonormal Haar energy at level j is Σd²/2^j, applied
    only in the display-share division (fixed textual order). The
    exact Σd² column is the hash-strong surface.

    Scale shape: one keyed reduce to the bounded daily series, one
    rank window for the dyadic index, then five halving keyed
    reduces — each level is a groupBy(i div 2), map-side
    combinable, the classic parallel wavelet cascade."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    idx = (
        daily.select(
            (F.row_number().over(Window.orderBy("day")) - 1)
            .cast("long")
            .alias("i"),
            "cents",
        )
        .filter(F.col("i") < 2048)
        .withColumnRenamed("cents", "s")
    )
    levels = []
    cur = idx
    for lvl in range(1, 6):
        cur = cur.groupBy(
            (F.col("i") / 2).cast("long").alias("i")
        ).agg(
            F.sum(
                F.when(F.col("i") % 2 == 0, F.col("s")).otherwise(
                    -F.col("s")
                )
            )
            .cast("long")
            .alias("d"),
            F.sum("s").cast("long").alias("s"),
        )
        levels.append(
            cur.agg(
                F.lit(lvl).cast("int").alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_coeffs"),
                F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
                .alias("e2"),
            )
        )
    e = levels[0]
    for lv in levels[1:]:
        e = e.unionAll(lv)
    tot = e.agg(
        F.sum(
            F.col("e2").cast("double")
            / F.pow(F.lit(2.0), F.col("level").cast("double"))
        ).alias("te")
    )
    return (
        e.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "n_coeffs",
            F.col("e2").cast("double").alias("d2_raw"),
            F.round(
                F.col("e2").cast("double")
                / F.pow(F.lit(2.0), F.col("level").cast("double"))
                / F.col("te"),
                6,
            ).alias("energy_share"),
        )
        .orderBy("level")
    )


@register(
    "agg_lorenz_asymmetry",
    """
    WITH spend AS (
        SELECT c.c_custkey,
               CAST(coalesce(sum(CAST(CAST(o.o_totalprice
                        AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS t
        FROM spend
    ),
    parts AS (
        SELECT CAST(count(CASE WHEN g.n * s.cents < g.t THEN 1 END)
                    AS BIGINT) AS m,
               CAST(sum(CASE WHEN g.n * s.cents < g.t THEN s.cents
                             ELSE 0 END) AS BIGINT) AS lm,
               CAST(max(CASE WHEN g.n * s.cents < g.t THEN s.cents
                             END) AS BIGINT) AS xm,
               CAST(min(CASE WHEN g.n * s.cents >= g.t THEN s.cents
                             END) AS BIGINT) AS xm1,
               CAST(max(g.n) AS BIGINT) AS n,
               CAST(max(g.t) AS BIGINT) AS t
        FROM spend s CROSS JOIN g
    )
    SELECT n AS n_customers, m AS n_below_mean,
           round((m + (CAST(t AS DOUBLE) - CAST(n AS DOUBLE) * xm)
                      / (CAST(n AS DOUBLE) * (xm1 - xm)))
                 / n
                 + (CAST(lm AS DOUBLE)
                    + (CAST(t AS DOUBLE) - CAST(n AS DOUBLE) * xm)
                      / (CAST(n AS DOUBLE) * (xm1 - xm)) * xm1)
                   / t, 6) AS asym_s,
           CAST(t AS HUGEINT) * (CAST(n AS HUGEINT) * (xm1 - xm)) * m
               + CAST(t AS HUGEINT)
                 * (CAST(t AS HUGEINT) - CAST(n AS HUGEINT) * xm)
               + CAST(n AS HUGEINT)
                 * (CAST(n AS HUGEINT) * (xm1 - xm)) * lm
               + CAST(n AS HUGEINT)
                 * (CAST(t AS HUGEINT) - CAST(n AS HUGEINT) * xm) * xm1
               > CAST(n AS HUGEINT) * t
                 * (CAST(n AS HUGEINT) * (xm1 - xm))
               AS rich_tail
    FROM parts
    """,
    tags=("agg", "stats"),
)
def agg_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry coefficient (Damgaard & Weiner 2000):
    S = F(μ) + L(μ) — where the Lorenz curve is tangent to the
    diagonal's slope — distinguishes inequality caused by a few
    RICH units (S > 1) from many POOR units (S < 1), which the Gini
    (agg_gini) cannot see. With μ = T/n rational, the below-mean
    test n·x < T, the count m, partial sum L_m, bracketing order
    statistics x_(m) (largest below μ) and x_(m+1) (smallest ≥ μ),
    and the interpolation δ = (T − n·x_m)/(n·(x_(m+1) − x_m)) are
    all exact; the headline S > 1 verdict clears every denominator:
    T·D·m + T·A + n·D·L_m + n·A·x_(m+1) > n·T·D with A = T − n·x_m,
    D = n·(x_(m+1) − x_m) — DECIMAL(38)/HUGEINT cross-products
    (≈10³⁰ at sf0.1). S itself is a display-only fixed-order double.
    Customers with no orders enter at zero spend.

    Scale shape: one keyed reduce to per-customer spend, a 1-row
    total broadcast, one conditional reduce — no windows, no rank
    pass (the below-mean split needs only μ, not positions)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum((dec2("o_totalprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("cents")
        )
    )
    g = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    below = F.col("n") * F.col("cents") < F.col("t")
    parts = spend.crossJoin(F.broadcast(g)).agg(
        F.count(F.when(below, F.lit(1))).cast("long").alias("m"),
        F.sum(F.when(below, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("lm"),
        F.max(F.when(below, F.col("cents"))).cast("long").alias("xm"),
        F.min(F.when(~below, F.col("cents"))).cast("long").alias("xm1"),
        F.max("n").cast("long").alias("n"),
        F.max("t").cast("long").alias("t"),
    )
    n, t, m = F.col("n"), F.col("t"), F.col("m")
    lm, xm, xm1 = F.col("lm"), F.col("xm"), F.col("xm1")
    delta = (t.cast("double") - n.cast("double") * xm) / (
        n.cast("double") * (xm1 - xm)
    )
    a38 = t.cast("decimal(38,0)") - n.cast("decimal(38,0)") * xm
    d38 = n.cast("decimal(38,0)") * (xm1 - xm)
    return parts.select(
        n.alias("n_customers"),
        m.alias("n_below_mean"),
        F.round(
            (m + delta) / n
            + (lm.cast("double") + delta * xm1) / t,
            6,
        ).alias("asym_s"),
        (
            t.cast("decimal(38,0)") * d38 * m
            + t.cast("decimal(38,0)") * a38
            + n.cast("decimal(38,0)") * d38 * lm
            + n.cast("decimal(38,0)") * a38 * xm1
            > n.cast("decimal(38,0)") * t * d38
        ).alias("rich_tail"),
    )
