"""§2 extensions, seventy-sixth wave — parametric ANOVA, ordinal
association, a squared-rank dispersion test, and forecast-accuracy
ratios (published-method cadence).

- agg_oneway_anova: classical one-way fixed-effects ANOVA (Fisher)
  of dollar-quantized order totals across the five priorities —
  exact integer power sums, fixed-order pivoted assembly.
- agg_gk_gamma: Goodman-Kruskal gamma (1954) between order priority
  and a fixed value-bucket ladder — exact concordant/discordant
  pair counts from the 5×5 contingency table.
- agg_conover_squared_ranks: Conover's squared-ranks dispersion test
  (1980; median-centered variant) on URGENT vs LOW daily revenue —
  doubled medians, doubled midranks, DECIMAL(38) verdict.
- ts_theil_u2: Theil's U₂ relative forecast accuracy — does the
  seasonal-naive (lag-7) forecast of daily revenue beat the naive
  (lag-1)? Pure-integer verdict on exact squared-error sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₄(0.95) — shared literal (the agg_friedman device)
_CHI2_4_95 = "9.487729"

# fixed bucket edges (cents) for the ordinal value ladder
_BUCKET_EDGES = (5_000_000, 10_000_000, 20_000_000, 30_000_000)


@register(
    "agg_oneway_anova",
    f"""
    WITH g AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS t,
               CAST(sum(CAST(floor(o_totalprice) AS HUGEINT)
                        * CAST(floor(o_totalprice) AS BIGINT)) AS HUGEINT)
                   AS u
        FROM orders GROUP BY 1
    ),
    piv AS (
        SELECT
            {", ".join(
                f"max(CASE WHEN s = {i} THEN {m} END) AS {m}{i}"
                for i in range(1, 6)
                for m in ("n", "t", "u")
            )}
        FROM g
    ),
    m AS (
        SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS nn,
               CAST(t1 + t2 + t3 + t4 + t5 AS BIGINT) AS tt,
               CAST(t1 AS DOUBLE) * t1 / n1 + CAST(t2 AS DOUBLE) * t2 / n2
                   + CAST(t3 AS DOUBLE) * t3 / n3
                   + CAST(t4 AS DOUBLE) * t4 / n4
                   + CAST(t5 AS DOUBLE) * t5 / n5 AS btw,
               CAST(u1 + u2 + u3 + u4 + u5 AS HUGEINT) AS uu
        FROM piv
    )
    SELECT nn AS n_orders,
           CAST(btw - CAST(tt AS DOUBLE) * tt / nn AS REAL) AS ssb,
           CAST(CAST(uu AS DOUBLE) - btw AS REAL) AS ssw,
           round((btw - CAST(tt AS DOUBLE) * tt / nn) / 4
                 / ((CAST(uu AS DOUBLE) - btw) / (nn - 5)), 4) AS f_stat,
           (btw - CAST(tt AS DOUBLE) * tt / nn) * (nn - 5)
               > {_CHI2_4_95} * (CAST(uu AS DOUBLE) - btw) AS significant
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_oneway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way fixed-effects ANOVA (Fisher) of dollar-quantized order
    totals across the five priorities. Per group the count n_j, sum
    T_j and square sum U_j are exact integers (v ≤ ~6·10⁵ dollars ⇒
    ΣU inside DECIMAL(38)/HUGEINT at any plausible scale); the five
    (n, T, U) triples PIVOT to fixed columns and the between/within
    sums of squares assemble in one fixed textual order on both
    engines (float addition is not associative — the agg_mood_median
    device): SSB = Σ T_j²/n_j − T²/N, SSW = ΣU − Σ T_j²/n_j. The
    verdict uses the asymptotic F(4,∞) = χ²₄/4 form cross-multiplied
    to SSB·(N−5) > χ²₄(0.95)·SSW with the shared literal — at TPC-H
    row counts the finite-df correction is below the literal's
    round-6 resolution.

    SSB/SSW ship as FLOAT32, not round(·,4): at ~10¹³ magnitude the
    double ulp (≈0.004) exceeds 4-decimal resolution, and DuckDB's
    round(x,4) computes x·10⁴ past 2⁵³ — a lossy multiply that
    injects ulp artifacts Spark's exact BigDecimal round doesn't
    (round(3.131744805639e13, 4) → …390.004 in DuckDB). The float32
    cast of the bit-identical fixed-order doubles is exact on both
    engines at any magnitude.

    Scale shape: ONE keyed reduce of the fact table to five rows,
    then a 1-row pivot — map-side-combinable all the way."""
    o = tbl(spark, sf_dir, "orders")
    v = F.floor("o_totalprice").cast("long")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("t"),
        F.sum(v.cast("decimal(38,0)") * v).alias("u"),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(m))).alias(f"{m}{i}")
            for i in range(1, 6)
            for m in ("n", "t", "u")
        ]
    )
    nn = sum(F.col(f"n{i}") for i in range(2, 6)) + F.col("n1")
    tt = sum(F.col(f"t{i}") for i in range(2, 6)) + F.col("t1")
    btw = None
    for i in range(1, 6):
        term = F.col(f"t{i}").cast("double") * F.col(f"t{i}") / F.col(
            f"n{i}"
        )
        btw = term if btw is None else btw + term
    uu = sum(F.col(f"u{i}") for i in range(2, 6)) + F.col("u1")
    m = piv.select(
        nn.cast("long").alias("nn"),
        tt.cast("long").alias("tt"),
        btw.alias("btw"),
        uu.alias("uu"),
    )
    nn, tt, btw, uu = (
        F.col("nn"),
        F.col("tt"),
        F.col("btw"),
        F.col("uu"),
    )
    ssb = btw - tt.cast("double") * tt / nn
    ssw = uu.cast("double") - btw
    return m.select(
        nn.alias("n_orders"),
        ssb.cast("float").alias("ssb"),
        ssw.cast("float").alias("ssw"),
        F.round(ssb / 4 / (ssw / (nn - 5)), 4).alias("f_stat"),
        (ssb * (nn - 5) > float(_CHI2_4_95) * ssw).alias("significant"),
    )


@register(
    "agg_gk_gamma",
    f"""
    WITH cell AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CASE
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[0]} THEN 1
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[1]} THEN 2
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[2]} THEN 3
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[3]} THEN 4
                   ELSE 5
               END AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2
    ),
    pairs AS (
        SELECT CAST(sum(CASE WHEN (y.s > x.s AND y.b > x.b)
                             OR (y.s < x.s AND y.b < x.b)
                        THEN x.c * y.c ELSE 0 END) AS BIGINT) AS conc2,
               CAST(sum(CASE WHEN (y.s > x.s AND y.b < x.b)
                             OR (y.s < x.s AND y.b > x.b)
                        THEN x.c * y.c ELSE 0 END) AS BIGINT) AS disc2
        FROM cell x JOIN cell y ON TRUE
    )
    SELECT conc2 // 2 AS concordant, disc2 // 2 AS discordant,
           round(CAST(conc2 - disc2 AS DOUBLE) / nullif(conc2 + disc2, 0),
                 4) AS gamma,
           conc2 > disc2 AS positive_association
    FROM pairs
    """,
    tags=("agg", "stats"),
)
def agg_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma (Goodman & Kruskal 1954) between order
    priority (ordinal 1…5) and a fixed value-bucket ladder (cents
    edges 5M/10M/20M/30M — shared literals): γ = (C − D)/(C + D) over
    untied pairs. The 5×5 contingency table reduces the fact table to
    ≤25 cells; C and D come from the table self-join as exact int64
    products (each unordered pair counted twice and halved — integer
    division, no float), so γ's sign (the association verdict) is the
    pure integer compare C > D and only the displayed γ divides.

    Scale shape: ONE keyed reduce to ≤25 cells, a 25×25 broadcast
    self-join, a 1-row reduce — nothing else touches the data."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    b = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    cell = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
        b.alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    x = cell.select(
        F.col("s").alias("sx"), F.col("b").alias("bx"), F.col("c").alias("cx")
    )
    y = cell.select(
        F.col("s").alias("sy"), F.col("b").alias("by"), F.col("c").alias("cy")
    )
    conc = (
        ((F.col("sy") > F.col("sx")) & (F.col("by") > F.col("bx")))
        | ((F.col("sy") < F.col("sx")) & (F.col("by") < F.col("bx")))
    )
    disc = (
        ((F.col("sy") > F.col("sx")) & (F.col("by") < F.col("bx")))
        | ((F.col("sy") < F.col("sx")) & (F.col("by") > F.col("bx")))
    )
    pairs = x.crossJoin(F.broadcast(y)).agg(
        F.sum(F.when(conc, F.col("cx") * F.col("cy")).otherwise(0))
        .cast("long")
        .alias("conc2"),
        F.sum(F.when(disc, F.col("cx") * F.col("cy")).otherwise(0))
        .cast("long")
        .alias("disc2"),
    )
    c2, d2 = F.col("conc2"), F.col("disc2")
    return pairs.select(
        # exact integer halving (the double-counted symmetric join):
        # shiftright stays in int64 where /2 would round-trip a double
        F.shiftright(c2, 1).cast("long").alias("concordant"),
        F.shiftright(d2, 1).cast("long").alias("discordant"),
        F.round(
            (c2 - d2).cast("double") / F.nullif(c2 + d2, F.lit(0)), 4
        ).alias("gamma"),
        (c2 > d2).alias("positive_association"),
    )


@register(
    "agg_conover_squared_ranks",
    """
    WITH daily AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE substr(o_orderpriority, 1, 1) IN ('1', '5')
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT g, day, cents,
               row_number() OVER (PARTITION BY g
                                  ORDER BY cents, day) AS r,
               count(*) OVER (PARTITION BY g) AS ng
        FROM daily
    ),
    med AS (
        SELECT g,
               CAST(sum(cents * (CAST(r = (ng + 1) // 2 AS INT)
                                 + CAST(r = (ng + 2) // 2 AS INT)))
                    AS BIGINT) AS med2
        FROM rk GROUP BY g
    ),
    dev AS (
        SELECT daily.g, daily.day,
               abs(2 * daily.cents - med.med2) AS dev2
        FROM daily JOIN med USING (g)
    ),
    prk AS (
        SELECT g, dev2,
               row_number() OVER (ORDER BY dev2, day, g) AS pr,
               count(*) OVER () AS nn
        FROM dev
    ),
    scored AS (
        SELECT prk.g, prk.nn,
               CAST((v.mn + v.mx) * (v.mn + v.mx) AS BIGINT) AS u
        FROM prk JOIN (
            SELECT dev2, CAST(min(pr) AS BIGINT) AS mn,
                   CAST(max(pr) AS BIGINT) AS mx
            FROM prk GROUP BY dev2
        ) v USING (dev2)
    ),
    s AS (
        SELECT CAST(sum(u) FILTER (g = 1) AS BIGINT) AS t4,
               CAST(count(*) FILTER (g = 1) AS BIGINT) AS n1,
               CAST(count(*) FILTER (g = 5) AS BIGINT) AS n2,
               CAST(sum(u) AS BIGINT) AS sa,
               CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS sa2,
               CAST(max(nn) AS BIGINT) AS nn
        FROM scored
    )
    SELECT n1, n2, t4,
           round((CAST(nn AS DOUBLE) * t4 - CAST(n1 AS DOUBLE) * sa)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / (nn - 1.0)
                        * (CAST(nn AS DOUBLE) * CAST(sa2 AS DOUBLE)
                           - CAST(sa AS DOUBLE) * sa)), 4) AS z,
           CAST(625 AS HUGEINT) * (nn - 1)
               * (CAST(nn AS HUGEINT) * t4 - CAST(n1 AS HUGEINT) * sa)
               * (CAST(nn AS HUGEINT) * t4 - CAST(n1 AS HUGEINT) * sa)
               > CAST(2401 AS HUGEINT) * n1 * n2
                 * (CAST(nn AS HUGEINT) * sa2
                    - CAST(sa AS HUGEINT) * sa) AS dispersion_differs
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover's squared-ranks test for equal dispersion (Conover
    1980; median-centered variant) on URGENT vs LOW DAILY revenue:
    score each day by the squared pooled rank of its absolute
    deviation from its group's median — squared ranks upweight the
    tails, making this sensitive to variance, not location. Exactness
    end-to-end: each group's DOUBLED median med2 (sum of the two
    middle order statistics), deviations dev2 = |2·cents − med2|,
    DOUBLED pooled midranks and their squares u = (mn+mx)² are all
    exact int64s. For the linear rank statistic T4 = Σ_{g=1} u the
    hypergeometric null gives z² = (N·T4 − n1·Sa)²(N−1) /
    (n1·n2·(N·Sa2 − Sa²)), and the two-sided 5% verdict is the
    DECIMAL(38)/HUGEINT cross-product 625(N−1)(N·T4 − n1·Sa)² >
    2401·n1n2(N·Sa2 − Sa²) — no float ever decides. The daily grain
    keeps every magnitude calendar-bounded at ANY corpus scale.

    Scale shape: one keyed reduce to the two per-type daily series;
    all windows run over that calendar-bounded axis only."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
            F.to_date("o_orderdate").alias("day"),
            (dec2("o_totalprice") * 100).cast("long").alias("c0"),
        )
        .filter(F.col("g").isin(1, 5))
        .groupBy("g", "day")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    w_r = Window.partitionBy("g").orderBy("cents", "day")
    w_n = Window.partitionBy("g")
    rk = daily.select(
        "g",
        "day",
        "cents",
        F.row_number().over(w_r).alias("r"),
        F.count(F.lit(1)).over(w_n).alias("ng"),
    )
    is_mid = (
        (F.col("r") == F.floor((F.col("ng") + 1) / 2)).cast("int")
        + (F.col("r") == F.floor((F.col("ng") + 2) / 2)).cast("int")
    )
    med = rk.groupBy("g").agg(
        F.sum(F.col("cents") * is_mid).cast("long").alias("med2")
    )
    dev = daily.join(F.broadcast(med), "g").select(
        "g",
        "day",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2"),
    )
    w_p = Window.orderBy("dev2", "day", "g")
    w_all = Window.partitionBy()
    prk = dev.select(
        "g",
        "dev2",
        F.row_number().over(w_p).alias("pr"),
        F.count(F.lit(1)).over(w_all).alias("nn"),
    )
    blocks = prk.groupBy("dev2").agg(
        F.min("pr").cast("long").alias("mn"),
        F.max("pr").cast("long").alias("mx"),
    )
    scored = prk.join(F.broadcast(blocks), "dev2").select(
        "g",
        "nn",
        ((F.col("mn") + F.col("mx")) * (F.col("mn") + F.col("mx")))
        .cast("long")
        .alias("u"),
    )
    s = scored.agg(
        F.sum(F.when(F.col("g") == 1, F.col("u"))).cast("long").alias("t4"),
        F.count_if(F.col("g") == 1).cast("long").alias("n1"),
        F.count_if(F.col("g") == 5).cast("long").alias("n2"),
        F.sum("u").cast("long").alias("sa"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("sa2"),
        F.max("nn").cast("long").alias("nn"),
    )
    n1, n2, t4, sa, sa2, nn = (
        F.col("n1"),
        F.col("n2"),
        F.col("t4"),
        F.col("sa"),
        F.col("sa2"),
        F.col("nn"),
    )
    num38 = nn.cast("decimal(38,0)") * t4 - n1.cast("decimal(38,0)") * sa
    den38 = (
        n1.cast("decimal(38,0)")
        * n2
        * (nn.cast("decimal(38,0)") * sa2 - sa.cast("decimal(38,0)") * sa)
    )
    return s.select(
        "n1",
        "n2",
        "t4",
        F.round(
            (nn.cast("double") * t4 - n1.cast("double") * sa)
            / F.sqrt(
                n1.cast("double")
                * n2
                / (nn - 1.0)
                * (
                    nn.cast("double") * sa2.cast("double")
                    - sa.cast("double") * sa
                )
            ),
            4,
        ).alias("z"),
        (
            625 * (nn - 1).cast("decimal(38,0)") * num38 * num38
            > 2401 * den38
        ).alias("dispersion_differs"),
    )


@register(
    "ts_theil_u2",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT cents,
               lag(cents, 1) OVER (ORDER BY day) AS l1,
               lag(cents, 7) OVER (ORDER BY day) AS l7
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CAST(cents - l1 AS HUGEINT) * (cents - l1))
                    AS HUGEINT) AS sse1,
               CAST(sum(CAST(cents - l7 AS HUGEINT) * (cents - l7))
                    AS HUGEINT) AS sse7
        FROM lagged WHERE l1 IS NOT NULL AND l7 IS NOT NULL
    )
    SELECT n_eval,
           round(sqrt(CAST(sse7 AS DOUBLE) / CAST(sse1 AS DOUBLE)), 4)
               AS u2,
           sse7 < sse1 AS seasonal_beats_naive
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U₂ relative forecast accuracy (Theil 1966) on the
    daily-revenue series: compare the seasonal-naive forecast
    (same weekday last week, lag 7) against the no-change naive
    forecast (lag 1) over the common support where both exist.
    U₂ = √(SSE₇/SSE₁) < 1 means weekly seasonality carries real
    signal. Both squared-error sums accumulate as exact
    DECIMAL(38)/HUGEINT integers on cents, so the verdict
    SSE₇ < SSE₁ is a pure integer compare and only the displayed
    ratio touches floats (round-4).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series; the lag windows run over that bounded axis only (the
    ts_* bounded-window shape)."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 7).over(w).alias("l7"),
    ).filter(F.col("l1").isNotNull() & F.col("l7").isNotNull())
    d1 = (F.col("cents") - F.col("l1")).cast("decimal(38,0)")
    d7 = (F.col("cents") - F.col("l7")).cast("decimal(38,0)")
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(d1 * (F.col("cents") - F.col("l1"))).alias("sse1"),
        F.sum(d7 * (F.col("cents") - F.col("l7"))).alias("sse7"),
    )
    return s.select(
        "n_eval",
        F.round(
            F.sqrt(F.col("sse7").cast("double") / F.col("sse1").cast("double")),
            4,
        ).alias("u2"),
        (F.col("sse7") < F.col("sse1")).alias("seasonal_beats_naive"),
    )
