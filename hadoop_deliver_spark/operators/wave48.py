"""§2 extensions, seventy-second wave — blocked/paired nonparametrics
and a distribution-free effect size (published-method cadence).

- agg_friedman: Friedman's blocked rank test (1937) — do the five
  event types keep the same daily-volume ordering across calendar
  days? Doubled midranks make every sum an exact int64.
- events_cochran_q: Cochran's Q (1950) — did per-user purchase
  incidence change across the three month decades? Pure 0/1 integer
  marginals.
- agg_mood_median: Mood's median test — are the five priority classes
  split evenly around the GRAND median order value? Doubled-median
  selection keeps the above/below split exact.
- agg_cliffs_delta: Cliff's delta (1993) ordinal effect size between
  URGENT and LOW line-item quantities, with the Romano et al. (2006)
  magnitude bands as pure-integer verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ² upper-5% critical values, shared literals (transcendental parity)
_CHI2_4_95 = "9.487729"  # df = 4 (5 groups / 5 treatments)
_CHI2_2_95 = "5.991465"  # df = 2 (3 treatments)

_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "agg_friedman",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, t.event_type,
               CAST(coalesce(daily.c, 0) AS BIGINT) AS c
        FROM (SELECT DISTINCT day FROM daily) d
        CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in _TYPES)})
            t(event_type)
        LEFT JOIN daily ON daily.day = d.day
            AND daily.event_type = t.event_type
    ),
    rk AS (
        SELECT day, event_type, c,
               row_number() OVER (PARTITION BY day
                                  ORDER BY c, event_type) AS r
        FROM grid
    ),
    mid AS (
        SELECT rk.day, rk.event_type,
               b.mn + b.mx AS d2
        FROM rk JOIN (
            SELECT day, c, CAST(min(r) AS BIGINT) AS mn,
                   CAST(max(r) AS BIGINT) AS mx
            FROM rk GROUP BY day, c
        ) b ON b.day = rk.day AND b.c = rk.c
    ),
    cols AS (
        SELECT event_type, CAST(sum(d2) AS BIGINT) AS dj,
               CAST(count(*) AS BIGINT) AS n
        FROM mid GROUP BY event_type
    ),
    s AS (
        SELECT CAST(sum(dj * dj) AS BIGINT) AS sum_dj2,
               CAST(max(n) AS BIGINT) AS n
        FROM cols
    ),
    q AS (SELECT CAST(sum(d2 * d2) AS BIGINT) AS sum_d2sq FROM mid)
    SELECT n AS n_blocks, CAST(5 AS INT) AS k,
           CAST(sum_dj2 - n * n * 5 * 36 AS BIGINT) AS num_x4,
           CAST(sum_d2sq - n * 5 * 36 AS BIGINT) AS den_x4,
           round(4.0 * (sum_dj2 - CAST(n AS DOUBLE) * n * 5 * 36)
                 / (sum_d2sq - CAST(n AS DOUBLE) * 5 * 36), 4)
               AS chi2_f,
           4.0 * (sum_dj2 - CAST(n AS DOUBLE) * n * 5 * 36)
               > {_CHI2_4_95} * (sum_d2sq - CAST(n AS DOUBLE) * 5 * 36)
               AS significant
    FROM s, q
    """,
    tags=("agg", "stats"),
)
def agg_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's blocked rank ANOVA (Friedman 1937), tie-corrected:
    blocks = calendar days, treatments = the five event types,
    response = that type's daily event count (a missing (day, type)
    cell ranks as an explicit zero via the dense grid). With DOUBLED
    midranks d_ij = minrank+maxrank of the tie block, every Friedman
    quantity is an exact int64: χ²_F = (k−1)·(ΣD_j² − n²k(k+1)²) /
    (Σd² − nk(k+1)²) where the doubled form multiplies both the
    column-sum and the square-sum identities by 4 — the engine emits
    the integer numerator/denominator (×4) alongside the round-4
    statistic, and the significance verdict compares
    4·num > χ²crit·den with the critical value a shared literal.
    k = 5, (k+1)² = 36 appear as integer constants.

    Scale shape: one keyed fact reduce to the (day × 5) grid; ranks,
    midranks and every sum live on that calendar-bounded frame. The
    rank window partitions by day (high-cardinality axis), never by
    type; the SinglePartitions are the 1-row moment reduces."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    grid = (
        daily.select("day")
        .distinct()
        .select(
            "day",
            F.explode(
                F.array(*[F.lit(t) for t in _TYPES])
            ).alias("event_type"),
        )
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    w = Window.partitionBy("day").orderBy("c", "event_type")
    rk = grid.withColumn("r", F.row_number().over(w))
    blocks = rk.groupBy("day", "c").agg(
        F.min("r").cast("long").alias("mn"),
        F.max("r").cast("long").alias("mx"),
    )
    mid = rk.join(blocks, ["day", "c"]).select(
        "day", "event_type", (F.col("mn") + F.col("mx")).alias("d2")
    )
    cols = mid.groupBy("event_type").agg(
        F.sum("d2").cast("long").alias("dj"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    s = cols.agg(
        F.sum(F.col("dj") * F.col("dj")).cast("long").alias("sum_dj2"),
        F.max("n").cast("long").alias("n"),
    )
    q = mid.agg(
        F.sum(F.col("d2") * F.col("d2")).cast("long").alias("sum_d2sq")
    )
    num = F.col("sum_dj2") - F.col("n") * F.col("n") * 5 * 36
    den = F.col("sum_d2sq") - F.col("n") * 5 * 36
    numd = F.col("sum_dj2") - F.col("n").cast("double") * F.col("n") * 5 * 36
    dend = F.col("sum_d2sq") - F.col("n").cast("double") * 5 * 36
    return s.crossJoin(F.broadcast(q)).select(
        F.col("n").alias("n_blocks"),
        F.lit(5).cast("int").alias("k"),
        num.cast("long").alias("num_x4"),
        den.cast("long").alias("den_x4"),
        F.round(4.0 * numd / dend, 4).alias("chi2_f"),
        (4.0 * numd > F.expr(_CHI2_4_95) * dend).alias("significant"),
    )


@register(
    "events_cochran_q",
    f"""
    WITH x AS (
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'purchase'
                    AND dayofmonth(CAST(ts AS DATE)) <= 10) > 0
                    AS INT) AS x1,
               CAST(count(*) FILTER (event_type = 'purchase'
                    AND dayofmonth(CAST(ts AS DATE)) BETWEEN 11 AND 20) > 0
                    AS INT) AS x2,
               CAST(count(*) FILTER (event_type = 'purchase'
                    AND dayofmonth(CAST(ts AS DATE)) > 20) > 0
                    AS INT) AS x3
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x1) AS BIGINT) AS c1,
               CAST(sum(x2) AS BIGINT) AS c2,
               CAST(sum(x3) AS BIGINT) AS c3,
               CAST(sum(x1 + x2 + x3) AS BIGINT) AS tot,
               CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sumr2
        FROM x
    )
    SELECT n_users, c1, c2, c3,
           CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - tot * tot)
                AS BIGINT) AS q_num,
           CAST(3 * tot - sumr2 AS BIGINT) AS q_den,
           round(2.0 * (3.0 * (c1 * c1 + c2 * c2 + c3 * c3) - CAST(tot
                 AS DOUBLE) * tot) / nullif(3 * tot - sumr2, 0), 4) AS q,
           (3 * tot - sumr2 > 0
            AND 2.0 * (3.0 * (c1 * c1 + c2 * c2 + c3 * c3)
                       - CAST(tot AS DOUBLE) * tot)
                > {_CHI2_2_95} * (3 * tot - sumr2)) AS significant
    FROM s
    """,
    tags=("events", "stats"),
)
def events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) for k = 3 matched binary
    treatments: per user, did-purchase indicators for the three month
    decades (days 1-10 / 11-20 / 21-30) — the k-sample extension of
    McNemar that events_mcnemar covers at k = 2. Q = k(k−1)·(ΣC_j² −
    T²/k)/(kT − ΣR_i²) simplifies at k = 3 to 2·(3ΣC_j² − T²)/(3T −
    ΣR_i²): column totals C_j, row totals R_i, grand total T are all
    exact integer marginals of the 0/1 matrix, so the engine emits
    the integer numerator/denominator next to the round-4 statistic
    and decides significance by the cross-multiplied integer compare
    against the shared χ²₂ literal.

    Scale shape: ONE keyed reduce of the fact table to per-user
    indicator triples, then a 1-row moment aggregate — no window, no
    join, map-side-combinable all the way."""
    e = tbl(spark, sf_dir, "events")
    dom = F.dayofmonth(F.to_date("ts"))
    purch = F.col("event_type") == "purchase"
    x = e.groupBy("user_id").agg(
        (F.count_if(purch & (dom <= 10)) > 0).cast("int").alias("x1"),
        (F.count_if(purch & dom.between(11, 20)) > 0)
        .cast("int")
        .alias("x2"),
        (F.count_if(purch & (dom > 20)) > 0).cast("int").alias("x3"),
    )
    r = F.col("x1") + F.col("x2") + F.col("x3")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x1").cast("long").alias("c1"),
        F.sum("x2").cast("long").alias("c2"),
        F.sum("x3").cast("long").alias("c3"),
        F.sum(r).cast("long").alias("tot"),
        F.sum(r * r).cast("long").alias("sumr2"),
    )
    csq = (
        F.col("c1") * F.col("c1")
        + F.col("c2") * F.col("c2")
        + F.col("c3") * F.col("c3")
    )
    q_num = 2 * (3 * csq - F.col("tot") * F.col("tot"))
    q_den = 3 * F.col("tot") - F.col("sumr2")
    q_numd = 2.0 * (
        3.0 * csq - F.col("tot").cast("double") * F.col("tot")
    )
    return s.select(
        "n_users",
        "c1",
        "c2",
        "c3",
        q_num.cast("long").alias("q_num"),
        q_den.cast("long").alias("q_den"),
        # Q is undefined when every user hit all three decades
        # (3T − ΣR² = 0, e.g. the sf0.001 fixture): NULL q, no verdict
        F.round(
            q_numd / F.nullif(q_den, F.lit(0)), 4
        ).alias("q"),
        (
            (q_den > 0) & (q_numd > F.expr(_CHI2_2_95) * q_den)
        ).alias("significant"),
    )


@register(
    "agg_mood_median",
    f"""
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS rk,
               count(*) OVER () AS n
        FROM orders
    ),
    med AS (
        -- doubled median: weight the middle row twice when n is odd
        -- (positions coincide), so 2*cents > med2 stays scale-true
        SELECT CAST(sum(cents * (CAST(rk = (n + 1) // 2 AS INT)
                                 + CAST(rk = (n + 2) // 2 AS INT)))
                    AS BIGINT) AS med2
        FROM o
    ),
    cls AS (
        SELECT g,
               CAST(count(*) FILTER (2 * cents > med2) AS BIGINT) AS ab,
               CAST(count(*) AS BIGINT) AS ni
        FROM o, med GROUP BY g
    ),
    piv AS (
        SELECT CAST(sum(ab) AS BIGINT) AS a, CAST(sum(ni) AS BIGINT) AS n,
               {", ".join(
                   f"CAST(sum(ab) FILTER (g = {i}) AS BIGINT) AS a{i}, "
                   f"CAST(sum(ni) FILTER (g = {i}) AS BIGINT) AS n{i}"
                   for i in range(1, 6))}
        FROM cls
    )
    SELECT n, a AS n_above,
           round({" + ".join(
               f"(a{i} - CAST(n{i} AS DOUBLE) * a / n)"
               f" * (a{i} - CAST(n{i} AS DOUBLE) * a / n)"
               f" / (CAST(n{i} AS DOUBLE) * a / n)"
               f" + ((n{i} - a{i}) - CAST(n{i} AS DOUBLE) * (n - a) / n)"
               f" * ((n{i} - a{i}) - CAST(n{i} AS DOUBLE) * (n - a) / n)"
               f" / (CAST(n{i} AS DOUBLE) * (n - a) / n)"
               for i in range(1, 6))}, 4) AS chi2,
           {" + ".join(
               f"(a{i} - CAST(n{i} AS DOUBLE) * a / n)"
               f" * (a{i} - CAST(n{i} AS DOUBLE) * a / n)"
               f" / (CAST(n{i} AS DOUBLE) * a / n)"
               f" + ((n{i} - a{i}) - CAST(n{i} AS DOUBLE) * (n - a) / n)"
               f" * ((n{i} - a{i}) - CAST(n{i} AS DOUBLE) * (n - a) / n)"
               f" / (CAST(n{i} AS DOUBLE) * (n - a) / n)"
               for i in range(1, 6))} > {_CHI2_4_95} AS significant
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test (Mood 1950): are the five priority classes
    split identically around the GRAND median order value? The grand
    median rides the doubled-median device (med2 = the sum of the two
    middle order statistics from the block-ranked global rank — the
    strictly-above test 2·cents > med2 is a pure integer compare, no
    float median anywhere). Each group's above/below-or-equal counts
    form a 5×2 contingency table; χ²₄ = Σ(O−E)²/E is evaluated with
    the ten cell terms PIVOTED into one fixed textual expression (the
    agg_kruskal_wallis device — no order-dependent float reduce) and
    the verdict compares against the shared χ²₄ literal.

    Scale shape: one block-ranked pass over orders (the api core:
    rank windows partition by block), a 2-row median probe, one
    5-group aggregate, a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    nrow = ranked.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    # doubled median: the middle row weights twice when n is odd
    # (the two positions coincide), keeping 2*cents > med2 scale-true
    w_med = (
        (F.col("rk") == F.floor((F.col("n_all") + 1) / 2)).cast("int")
        + (F.col("rk") == F.floor((F.col("n_all") + 2) / 2)).cast("int")
    )
    med = (
        ranked.crossJoin(F.broadcast(nrow))
        .agg(F.sum(F.col("cents") * w_med).cast("long").alias("med2"))
    )
    cls = (
        ranked.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count_if(2 * F.col("cents") > F.col("med2"))
            .cast("long")
            .alias("ab"),
            F.count(F.lit(1)).cast("long").alias("ni"),
        )
    )
    piv = cls.agg(
        F.sum("ab").cast("long").alias("a"),
        F.sum("ni").cast("long").alias("n"),
        *[
            agg
            for i in range(1, 6)
            for agg in (
                F.sum(F.when(F.col("g") == i, F.col("ab")))
                .cast("long")
                .alias(f"a{i}"),
                F.sum(F.when(F.col("g") == i, F.col("ni")))
                .cast("long")
                .alias(f"n{i}"),
            )
        ],
    )
    a, n = F.col("a"), F.col("n")

    def cell(i: int):
        ai, ni = F.col(f"a{i}"), F.col(f"n{i}")
        ea = ni.cast("double") * a / n
        eb = ni.cast("double") * (n - a) / n
        return (ai - ea) * (ai - ea) / ea + ((ni - ai) - eb) * (
            (ni - ai) - eb
        ) / eb

    chi2 = cell(1) + cell(2) + cell(3) + cell(4) + cell(5)
    return piv.select(
        "n",
        a.alias("n_above"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > F.expr(_CHI2_4_95)).alias("significant"),
    )


@register(
    "agg_cliffs_delta",
    """
    WITH x AS (
        SELECT CAST(substr(o.o_orderpriority, 1, 1) AS INT) AS g,
               CAST(l.l_quantity AS INT) AS v
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE substr(o.o_orderpriority, 1, 1) IN ('1', '5')
    ),
    c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
          FROM x GROUP BY g, v),
    grid AS (SELECT v FROM range(1, 51) t(v)),
    cum AS (
        SELECT grid.v,
               CAST(coalesce(u.c, 0) AS BIGINT) AS cu,
               CAST(coalesce(l.c, 0) AS BIGINT) AS cl,
               CAST(sum(coalesce(l.c, 0)) OVER (ORDER BY grid.v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - CAST(coalesce(l.c, 0) AS BIGINT) AS l_below,
               CAST(sum(coalesce(l.c, 0)) OVER (ORDER BY grid.v DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - CAST(coalesce(l.c, 0) AS BIGINT) AS l_above
        FROM grid
        LEFT JOIN (SELECT v, c FROM c WHERE g = 1) u ON u.v = grid.v
        LEFT JOIN (SELECT v, c FROM c WHERE g = 5) l ON l.v = grid.v
    ),
    s AS (
        SELECT CAST(sum(cu * l_below) AS BIGINT) AS gt,
               CAST(sum(cu * l_above) AS BIGINT) AS lt,
               CAST(sum(cu) AS BIGINT) AS n1,
               (SELECT CAST(sum(c) AS BIGINT) FROM c WHERE g = 5) AS n2
        FROM cum
    )
    SELECT n1, n2, gt, lt,
           round((gt - lt) / (CAST(n1 AS DOUBLE) * n2), 6) AS delta,
           CASE WHEN 1000 * abs(gt - lt) < 147 * n1 * n2 THEN 'negligible'
                WHEN 100 * abs(gt - lt) < 33 * n1 * n2 THEN 'small'
                WHEN 1000 * abs(gt - lt) < 474 * n1 * n2 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta (Cliff 1993): the distribution-free ordinal
    effect size δ = (#{x>y} − #{x<y})/(n₁n₂) between URGENT (1) and
    LOW (5) priority line-item quantities — the companion MAGNITUDE
    for the rank tests (agg_mann_whitney gives significance; δ says
    how big). Both dominance counts come from the bounded quantity
    grid (1..50): #{x>y} = Σ_v c₁(v)·C₅(<v) via strictly-below /
    strictly-above prefix sums — exact int64 throughout, one double
    division for display. The Romano et al. (2006) magnitude bands
    (0.147/0.33/0.474) are decided by PURE INTEGER cross-products
    (1000·|gt−lt| vs 147·n₁n₂ …), so the label can never park on a
    float boundary.

    Scale shape: one equi-join fact reduce to the ≤100-cell filtered
    contingency table; prefix sums run over the 50-row literal grid."""
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("int").alias("v"),
    )
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    c = (
        li.join(o, "ok")
        .filter(F.col("g").isin(1, 5))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = spark.range(1, 51).select(F.col("id").cast("int").alias("v"))
    u = c.filter(F.col("g") == 1).select("v", F.col("c").alias("cu"))
    lo = c.filter(F.col("g") == 5).select("v", F.col("c").alias("cl"))
    w_up = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_dn = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cl0 = F.coalesce("cl", F.lit(0))
    cum = (
        grid.join(u, "v", "left")
        .join(lo, "v", "left")
        .select(
            "v",
            F.coalesce("cu", F.lit(0)).cast("long").alias("cu"),
            (F.sum(cl0).over(w_up) - cl0).cast("long").alias("l_below"),
            (F.sum(cl0).over(w_dn) - cl0).cast("long").alias("l_above"),
        )
    )
    n2df = lo.agg(F.sum("cl").cast("long").alias("n2"))
    s = (
        cum.agg(
            F.sum(F.col("cu") * F.col("l_below"))
            .cast("long")
            .alias("gt"),
            F.sum(F.col("cu") * F.col("l_above"))
            .cast("long")
            .alias("lt"),
            F.sum("cu").cast("long").alias("n1"),
        )
        .crossJoin(F.broadcast(n2df))
    )
    diff = F.col("gt") - F.col("lt")
    nn = F.col("n1") * F.col("n2")
    return s.select(
        "n1",
        "n2",
        "gt",
        "lt",
        F.round(diff / (F.col("n1").cast("double") * F.col("n2")), 6).alias(
            "delta"
        ),
        F.when(1000 * F.abs(diff) < 147 * nn, "negligible")
        .when(100 * F.abs(diff) < 33 * nn, "small")
        .when(1000 * F.abs(diff) < 474 * nn, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )
