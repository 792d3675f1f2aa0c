"""§2 extensions, hundred-twentieth wave — nonparametric density and
directed information flow.

- agg_kde_points: Gaussian kernel density estimate of order value at
  five pinned evaluation points, Silverman normal-reference
  bandwidth — the smooth complement of agg_histogram's binned
  density.
- ts_transfer_entropy: Schreiber's (2000) transfer entropy between
  the click and purchase daily series, median-binarized — the
  NONPARAMETRIC directed-information twin of ts_granger_1lag (which
  can only see linear flow); both directions plus the net.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# pinned evaluation points, dollars
_KDE_X0 = (50_000, 100_000, 150_000, 200_000, 250_000)


@register(
    "agg_kde_points",
    f"""
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2
        FROM v
    ),
    par AS (
        SELECT n,
               1.06 * sqrt((s2 - s1 * s1 / n) / (n - 1)) * pow(n, -0.2)
                   AS h
        FROM mom
    )
    SELECT p.n AS n_orders,
           round(p.h / 100, 2) AS bandwidth_dollars,
           {", ".join(
               f'''round(sum(exp(-0.5 * pow((v.cents - {x0 * 100}.0) / p.h, 2)))
                 / (p.n * p.h) * 3989422.804014327, 6)
                 AS density_{x0 // 1000}k'''
               for x0 in _KDE_X0
           )}
    FROM v, par p GROUP BY p.n, p.h
    """,
    tags=("aggregate", "stats"),
)
def agg_kde_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian KDE of order value evaluated at five pinned points
    ($50k…$250k): f̂(x₀) = Σφ((x−x₀)/h)/(n·h) with Silverman's
    normal-reference bandwidth h = 1.06·σ̂·n^(−1/5) (sample σ̂ from
    exact integer moments). Reported as density per $100k so the
    numbers are O(1) — the kernel-sum's engine-side exp() can differ
    in the last ulp between libm implementations, but the relative
    drift (~1e−15 of an O(1) number) is twelve orders below the
    round-6. Five output columns instead of an exploded eval grid —
    no literal-table smuggling, one single-pass aggregate. The one
    pinned constant 3 989 422.804… = (1/√2π)·100·10⁵ folds the
    normal kernel normalization and the cents→per-$100k rescale,
    shared with the oracle verbatim (numpy-audited).

    Scale shape: one exact-moment reduce for (n, h), one broadcast
    of the 1-row params, one map-side-combined 5-sum reduce."""
    o = tbl(spark, sf_dir, "orders")
    v = o.select((dec2("o_totalprice") * 100).cast("long").alias("cents"))
    mom = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("double").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2"),
    )
    par = mom.select(
        "n",
        (
            1.06
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            )
            * F.pow(F.col("n").cast("double"), F.lit(-0.2))
        ).alias("h"),
    )
    j = v.crossJoin(F.broadcast(par))
    aggs = [
        F.round(
            F.sum(
                F.exp(
                    -0.5
                    * F.pow(
                        (F.col("cents") - float(x0 * 100)) / F.col("h"),
                        F.lit(2),
                    )
                )
            )
            / (F.col("n") * F.col("h"))
            * 3989422.804014327,
            6,
        ).alias(f"density_{x0 // 1000}k")
        for x0 in _KDE_X0
    ]
    return j.groupBy("n", "h").agg(*aggs).select(
        F.col("n").alias("n_orders"),
        F.round(F.col("h") / 100, 2).alias("bandwidth_dollars"),
        *[f"density_{x0 // 1000}k" for x0 in _KDE_X0],
    )


_TE_DAILY_SQL = """
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
        SELECT dx.day, datediff('day', DATE '1990-01-01', dx.day) AS dn,
               dx.xc, dy.yc
        FROM dx JOIN dy ON dx.day = dy.day
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM jd),
    medx AS (
        SELECT min(xc) AS medx FROM (
            SELECT xc, row_number() OVER (ORDER BY xc, dn) AS rn FROM jd
        ), m WHERE 2 * rn >= m.m
    ),
    medy AS (
        SELECT min(yc) AS medy FROM (
            SELECT yc, row_number() OVER (ORDER BY yc, dn) AS rn FROM jd
        ), m WHERE 2 * rn >= m.m
    ),
    bits AS (
        SELECT dn,
               CASE WHEN xc > (SELECT medx FROM medx) THEN 1 ELSE 0 END
                   AS bx,
               CASE WHEN yc > (SELECT medy FROM medy) THEN 1 ELSE 0 END
                   AS by
        FROM jd
    ),
    pairs AS (
        SELECT t.bx AS xt, t.by AS yt, p.bx AS xp, p.by AS yp
        FROM bits t JOIN bits p ON t.dn = p.dn + 1
    ),
    np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pairs)
"""


@register(
    "ts_transfer_entropy",
    f"""
    WITH {_TE_DAILY_SQL},
    c3a AS (
        SELECT yt AS t, yp AS tp, xp AS op, CAST(count(*) AS BIGINT) AS c
        FROM pairs GROUP BY 1, 2, 3
    ),
    ma_tp AS (SELECT tp, CAST(sum(c) AS BIGINT) AS ctp FROM c3a GROUP BY 1),
    ma_tpop AS (
        SELECT tp, op, CAST(sum(c) AS BIGINT) AS ctpop
        FROM c3a GROUP BY 1, 2
    ),
    ma_ttp AS (
        SELECT t, tp, CAST(sum(c) AS BIGINT) AS cttp
        FROM c3a GROUP BY 1, 2
    ),
    te_xy AS (
        SELECT sum(CAST(a.c AS DOUBLE) / np.np
                   * log2(CAST(a.c AS DOUBLE) * m1.ctp
                          / (CAST(m2.ctpop AS DOUBLE) * m3.cttp))) AS te
        FROM c3a a
        JOIN ma_tp m1 ON a.tp = m1.tp
        JOIN ma_tpop m2 ON a.tp = m2.tp AND a.op = m2.op
        JOIN ma_ttp m3 ON a.t = m3.t AND a.tp = m3.tp
        CROSS JOIN np
    ),
    c3b AS (
        SELECT xt AS t, xp AS tp, yp AS op, CAST(count(*) AS BIGINT) AS c
        FROM pairs GROUP BY 1, 2, 3
    ),
    mb_tp AS (SELECT tp, CAST(sum(c) AS BIGINT) AS ctp FROM c3b GROUP BY 1),
    mb_tpop AS (
        SELECT tp, op, CAST(sum(c) AS BIGINT) AS ctpop
        FROM c3b GROUP BY 1, 2
    ),
    mb_ttp AS (
        SELECT t, tp, CAST(sum(c) AS BIGINT) AS cttp
        FROM c3b GROUP BY 1, 2
    ),
    te_yx AS (
        SELECT sum(CAST(b.c AS DOUBLE) / np.np
                   * log2(CAST(b.c AS DOUBLE) * m1.ctp
                          / (CAST(m2.ctpop AS DOUBLE) * m3.cttp))) AS te
        FROM c3b b
        JOIN mb_tp m1 ON b.tp = m1.tp
        JOIN mb_tpop m2 ON b.tp = m2.tp AND b.op = m2.op
        JOIN mb_ttp m3 ON b.t = m3.t AND b.tp = m3.tp
        CROSS JOIN np
    )
    SELECT np.np AS n_pairs,
           round(x.te, 6) AS te_click_to_purchase,
           round(y.te, 6) AS te_purchase_to_click,
           round(x.te - y.te, 6) AS te_net,
           CASE WHEN round(x.te - y.te, 6) > 0 THEN 'click->purchase'
                WHEN round(x.te - y.te, 6) < 0 THEN 'purchase->click'
                ELSE 'balanced' END AS dominant_direction
    FROM te_xy x, te_yx y, np
    """,
    tags=("timeseries", "stats"),
)
def ts_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schreiber (2000) transfer entropy between the click and
    purchase daily value series, median-binarized:
    TE(X→Y) = Σ p(y_t, y_{t−1}, x_{t−1}) ·
    log₂[ p(y_t|y_{t−1}, x_{t−1}) / p(y_t|y_{t−1}) ] — how many bits
    yesterday's clicks add about today's purchases beyond what
    yesterday's purchases already said. The nonparametric directed
    twin of ts_granger_1lag (which only sees LINEAR flow). Pinned
    conventions shared with the oracle: type-1 exact-rank medians on
    the joined-day sample (strict > above-median), consecutive-
    calendar-day pairs built by a daynum d ↔ d+1 equi-join (NO
    global lag window), the plug-in estimator over the 8 binary
    cells (absent cells contribute 0 by construction), both
    directions reported with the net and a rounded-difference
    direction verdict. All counts PURE INTEGER; floats enter at the
    final log₂ chain.

    Scale shape: two daily reduces, one day equi-join, two exact
    rank probes, a d ↔ d+1 self-equi-join, then 8-row cell algebra
    (three marginal joins on ≤8 rows)."""
    from hadoop_deliver_spark.api import exact_global_rank

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

    # r12: materialize the calendar-bounded daily join once — the two
    # median rank cores, the bit pass, the lag self-join and both TE
    # cell passes all re-ran the two filtered event scans + day join
    # (~6 full lineage executions measured at sf0.1).
    jd = (
        daily("click", "xc")
        .join(daily("purchase", "yc"), "day")
        .withColumn("dn", F.datediff("day", F.lit("1990-01-01")))
        .select("dn", "xc", "yc")
        .localCheckpoint(eager=True)
    )
    m = jd.agg(F.count(F.lit(1)).cast("long").alias("m"))

    def med(col: str, out: str) -> DataFrame:
        ranked = exact_global_rank(jd.select(col, "dn"), col, "dn", "rn")
        return (
            ranked.crossJoin(F.broadcast(m))
            .filter(2 * F.col("rn") >= F.col("m"))
            .agg(F.min(col).alias(out))
        )

    bits = (
        jd.crossJoin(F.broadcast(med("xc", "medx")))
        .crossJoin(F.broadcast(med("yc", "medy")))
        .select(
            "dn",
            F.when(F.col("xc") > F.col("medx"), 1).otherwise(0).alias("bx"),
            F.when(F.col("yc") > F.col("medy"), 1).otherwise(0).alias("by"),
        )
    )
    prev = bits.select(
        (F.col("dn") + 1).alias("dn"),
        F.col("bx").alias("xp"),
        F.col("by").alias("yp"),
    )
    pairs = bits.join(prev, "dn").select(
        F.col("bx").alias("xt"), F.col("by").alias("yt"), "xp", "yp"
    )
    np_ = pairs.agg(F.count(F.lit(1)).cast("long").alias("np"))

    def te(t: str, tp: str, op: str) -> DataFrame:
        c3 = pairs.groupBy(
            F.col(t).alias("t"), F.col(tp).alias("tp"), F.col(op).alias("op")
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))
        m_tp = c3.groupBy("tp").agg(F.sum("c").cast("long").alias("ctp"))
        m_tpop = c3.groupBy("tp", "op").agg(
            F.sum("c").cast("long").alias("ctpop")
        )
        m_ttp = c3.groupBy("t", "tp").agg(
            F.sum("c").cast("long").alias("cttp")
        )
        return (
            c3.join(m_tp, "tp")
            .join(m_tpop, ["tp", "op"])
            .join(m_ttp, ["t", "tp"])
            .crossJoin(F.broadcast(np_))
            .agg(
                F.sum(
                    F.col("c").cast("double")
                    / F.col("np")
                    * F.log2(
                        F.col("c").cast("double")
                        * F.col("ctp")
                        / (F.col("ctpop").cast("double") * F.col("cttp"))
                    )
                ).alias("te")
            )
        )

    te_xy = te("yt", "yp", "xp").select(F.col("te").alias("te_xy"))
    te_yx = te("xt", "xp", "yp").select(F.col("te").alias("te_yx"))
    net = F.round(F.col("te_xy") - F.col("te_yx"), 6)
    return (
        te_xy.crossJoin(F.broadcast(te_yx))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("np").alias("n_pairs"),
            F.round(F.col("te_xy"), 6).alias("te_click_to_purchase"),
            F.round(F.col("te_yx"), 6).alias("te_purchase_to_click"),
            net.alias("te_net"),
            F.when(net > 0, "click->purchase")
            .when(net < 0, "purchase->click")
            .otherwise("balanced")
            .alias("dominant_direction"),
        )
    )
