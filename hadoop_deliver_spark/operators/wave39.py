"""§2 extensions, sixty-third wave — long-range dependence, word-length
spectra, robust skewness, and welfare-weighted inequality.

- ts_hurst_exponent: the Hurst rescaled-range exponent of each event
  type's daily revenue series — persistence vs mean reversion vs
  random walk from R/S statistics at three window sizes.
- llm_mendenhall_curve: Mendenhall's word-length characteristic
  curve per documents source — the original (1887) stylometric
  fingerprint.
- agg_bowley_skewness: Bowley's quartile skewness of order value per
  priority — the outlier-immune asymmetry measure, exact integers
  until one division.
- agg_atkinson_index: the Atkinson ε=1 inequality index of customer
  revenue — 1 − geometric/arithmetic mean ratio, the welfare
  economist's counterpart of agg_gini.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# Hurst log-log regression constants for window sizes m = 5, 10, 15:
# x = ln m and the closed-form OLS weights (x − x̄)/Σ(x − x̄)², shipped
# as literals shared with the oracle so the slope is a fixed 3-term
# linear combination in both engines
_HURST_MS = [5, 10, 15]
_HURST_W = [-0.9675751528184137, 0.15535233941616758, 0.8122228134022442]


@register(
    "ts_hurst_exponent",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
                   AS i
        FROM daily
    ),
    spans AS (
        SELECT m, event_type, i // m AS wid, i % m AS j, cents
        FROM idx CROSS JOIN (VALUES (5), (10), (15)) ms(m)
    ),
    wstat AS (
        SELECT m, event_type, wid,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS q
        FROM spans GROUP BY 1, 2, 3
    ),
    cumdev AS (
        SELECT sp.m, sp.event_type, sp.wid,
               sp.m * CAST(sum(sp.cents) OVER (
                   PARTITION BY sp.m, sp.event_type, sp.wid
                   ORDER BY sp.j ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - (sp.j + 1) * ws.s AS dscaled,
               ws.s, ws.q
        FROM spans sp
        JOIN wstat ws ON ws.m = sp.m AND ws.event_type = sp.event_type
                     AND ws.wid = sp.wid AND ws.cnt = sp.m
    ),
    rs AS (
        SELECT m, event_type, wid,
               CAST(round(1e6 * ln(
                   CAST(greatest(max(dscaled), 0) - least(min(dscaled), 0)
                        AS DOUBLE)
                   / sqrt(CAST(m * max(q) AS DOUBLE)
                          - CAST(max(s) AS DOUBLE) * max(s)))) AS BIGINT)
                   AS lnrs_scaled
        FROM cumdev
        GROUP BY 1, 2, 3
        HAVING m * max(q) - max(s) * max(s) > 0
           AND greatest(max(dscaled), 0) - least(min(dscaled), 0) > 0
    ),
    per_m AS (
        SELECT event_type, m,
               CAST(count(*) AS BIGINT) AS nw,
               CAST(sum(lnrs_scaled) AS BIGINT) AS sl
        FROM rs GROUP BY 1, 2
    )
    SELECT event_type,
           round(({_HURST_W[0]!r} * (CAST(max(CASE WHEN m = 5 THEN sl END)
                                         AS DOUBLE)
                                    / max(CASE WHEN m = 5 THEN nw END))
                  + {_HURST_W[1]!r} * (CAST(max(CASE WHEN m = 10 THEN sl END)
                                           AS DOUBLE)
                                      / max(CASE WHEN m = 10 THEN nw END))
                  + {_HURST_W[2]!r} * (CAST(max(CASE WHEN m = 15 THEN sl END)
                                           AS DOUBLE)
                                      / max(CASE WHEN m = 15 THEN nw END)))
                 / 1e6, 4) AS hurst
    FROM per_m GROUP BY event_type ORDER BY event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst rescaled-range exponent (Hurst 1951; the R/S estimation
    convention per Mandelbrot & Wallis 1969) of each event type's
    daily revenue series: split the series into complete windows of
    m = 5/10/15 days, compute each window's rescaled range R/S
    (range of cumulative mean-deviations over the population σ), and
    regress the per-m log-average ln(R/S) on ln(m) — slope H ≈ 0.5
    for a random walk, > 0.5 persistent/trending, < 0.5 mean-
    reverting. Exactness devices: the cumulative deviations
    cross-multiply to integers (m·prefix − i·S), so R·m is an exact
    int64 range; R/S = R_scaled/√(m·Q − S²) is one fixed-order float
    per window shipped as the scaled integer round(10⁶·ln(R/S)) —
    per-m averages are exact-int sums with one division — and the
    final slope is a fixed 3-term linear combination with LITERAL
    closed-form OLS weights (ln m and x̄ folded in), so no engine
    ever sums floats in free order. Degenerate windows (zero
    variance or zero range) are dropped by exact-integer HAVING in
    both engines.

    Scale shape: one keyed daily aggregate; the 3× window expansion
    is a 3-row broadcast; cumulative windows partition by (m, type,
    window) over the calendar-bounded day axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents")
    )
    widx = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "cents",
        (F.row_number().over(widx) - 1).alias("i"),
    )
    ms = spark.range(1).select(
        F.explode(F.array(*[F.lit(m) for m in _HURST_MS])).alias("m")
    )
    spans = idx.crossJoin(F.broadcast(ms)).select(
        "m",
        "event_type",
        F.expr("i div m").alias("wid"),
        (F.col("i") % F.col("m")).alias("j"),
        "cents",
    )
    wstat = spans.groupBy("m", "event_type", "wid").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    wcum = (
        Window.partitionBy("m", "event_type", "wid")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spans.withColumn(
        "prefix", F.sum("cents").over(wcum).cast("long")
    )
    cd = cum.join(
        wstat.filter(F.col("cnt") == F.col("m")),
        ["m", "event_type", "wid"],
    ).select(
        "m",
        "event_type",
        "wid",
        (
            F.col("m") * F.col("prefix") - (F.col("j") + 1) * F.col("s")
        ).alias("dscaled"),
        "s",
        "q",
    )
    r_scaled = F.greatest(F.max("dscaled"), F.lit(0)) - F.least(
        F.min("dscaled"), F.lit(0)
    )
    var_num = F.col("m") * F.max("q") - F.max("s") * F.max("s")
    rs = (
        cd.groupBy("m", "event_type", "wid")
        .agg(
            r_scaled.alias("r_scaled"),
            var_num.alias("var_num"),
        )
        .filter((F.col("var_num") > 0) & (F.col("r_scaled") > 0))
        .select(
            "m",
            "event_type",
            F.round(
                F.lit(1e6)
                * F.log(
                    F.col("r_scaled").cast("double")
                    / F.sqrt(F.col("var_num").cast("double"))
                )
            )
            .cast("long")
            .alias("lnrs_scaled"),
        )
    )
    per_m = rs.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).cast("long").alias("nw"),
        F.sum("lnrs_scaled").cast("long").alias("sl"),
    )

    def ybar(m: int):
        return F.max(
            F.when(F.col("m") == m, F.col("sl"))
        ).cast("double") / F.max(F.when(F.col("m") == m, F.col("nw")))

    return (
        per_m.groupBy("event_type")
        .agg(
            F.round(
                (
                    F.lit(_HURST_W[0]) * ybar(5)
                    + F.lit(_HURST_W[1]) * ybar(10)
                    + F.lit(_HURST_W[2]) * ybar(15)
                )
                / 1e6,
                4,
            ).alias("hurst")
        )
        .orderBy("event_type")
    )


@register(
    "llm_mendenhall_curve",
    """
    WITH words AS (
        SELECT source,
               least(length(unnest(string_split(text, ' '))), 15) AS wlen
        FROM documents WHERE length(text) > 0
    ),
    f AS (
        SELECT source, wlen, CAST(count(*) AS BIGINT) AS n_words
        FROM words WHERE wlen > 0 GROUP BY 1, 2
    ),
    tot AS (
        SELECT source, CAST(sum(n_words) AS BIGINT) AS n_tot
        FROM f GROUP BY source
    )
    SELECT f.source, f.wlen, f.n_words,
           round(CAST(f.n_words AS DOUBLE) / t.n_tot, 6) AS share
    FROM f JOIN tot t ON t.source = f.source
    ORDER BY f.source, f.wlen
    """,
    tags=("llm", "text"),
)
def llm_mendenhall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mendenhall's characteristic curve of composition (Mendenhall
    1887 — the FIRST quantitative stylometry): the word-length
    frequency spectrum per documents source, lengths capped at 15+
    — authors and registers keep remarkably stable length spectra,
    so a source whose curve deviates from its siblings is template
    spam, OCR damage, or a different register wearing the same
    label; the count-based precursor of llm_burrows_delta's
    z-score distance. Exact int64 counts, empty tokens dropped by
    integer length compare, one rounded division per row.

    Scale shape: map-only explode + one (source, length≤15) keyed
    aggregate with map-side combine, one per-source total joined
    back (domain-bounded)."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).select("source", F.least(F.length("w"), F.lit(15)).alias("wlen"))
    f = (
        words.filter(F.col("wlen") > 0)
        .groupBy("source", "wlen")
        .agg(F.count(F.lit(1)).cast("long").alias("n_words"))
    )
    tot = f.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("n_tot")
    )
    return (
        f.join(tot, "source")
        .select(
            "source",
            "wlen",
            "n_words",
            F.round(
                F.col("n_words").cast("double") / F.col("n_tot"), 6
            ).alias("share"),
        )
        .orderBy("source", "wlen")
    )


@register(
    "agg_bowley_skewness",
    """
    WITH o AS (
        SELECT o_orderpriority AS pri,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT pri, v,
               row_number() OVER (PARTITION BY pri ORDER BY v, o_orderkey)
                   AS rk,
               count(*) OVER (PARTITION BY pri) AS n
        FROM o
    )
    SELECT pri,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN rk = (n + 3) // 4 THEN v END) AS BIGINT)
               AS q1,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN v END) AS BIGINT)
               AS q2,
           CAST(max(CASE WHEN rk = (3 * n + 3) // 4 THEN v END) AS BIGINT)
               AS q3,
           round(CAST(max(CASE WHEN rk = (n + 3) // 4 THEN v END)
                      + max(CASE WHEN rk = (3 * n + 3) // 4 THEN v END)
                      - 2 * max(CASE WHEN rk = (n + 1) // 2 THEN v END)
                      AS DOUBLE)
                 / (max(CASE WHEN rk = (3 * n + 3) // 4 THEN v END)
                    - max(CASE WHEN rk = (n + 3) // 4 THEN v END)),
                 6) AS bowley
    FROM r GROUP BY pri ORDER BY pri
    """,
    tags=("aggregate", "stats"),
)
def agg_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley's quartile skewness (Bowley 1920): B = (Q₁ + Q₃ −
    2·Q₂)/(Q₃ − Q₁) of order value per priority — the
    outlier-immune asymmetry coefficient in [−1, 1] (moment skewness
    is unbounded and one wild order moves it; Bowley needs a quarter
    of the data to budge), complementing agg_skew_kurtosis's moment
    form and agg_tukey_trimean's quartile location. Type-1 quartiles
    at exact ceil-division ranks ceil(n/4), ceil(n/2), ceil(3n/4)
    over the (value, key) total order — everything is exact int64
    until the single final division.

    Scale shape: per-priority rank windows (5 domain-bounded
    groups; swap in the block-ranked api.exact_global_rank per group
    if one group outgrows a task), then a 5-row conditional
    reduce."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("pri"),
        (dec2("o_totalprice") * 100).cast("long").alias("v"),
        "o_orderkey",
    )
    wr = Window.partitionBy("pri").orderBy("v", "o_orderkey")
    wn = Window.partitionBy("pri")
    r = base.select(
        "pri",
        "v",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q1 = F.max(F.when(F.col("rk") == F.expr("(n + 3) div 4"), F.col("v")))
    q2 = F.max(F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("v")))
    q3 = F.max(
        F.when(F.col("rk") == F.expr("(3 * n + 3) div 4"), F.col("v"))
    )
    return (
        r.groupBy("pri")
        .agg(
            F.max("n").cast("long").alias("n"),
            q1.cast("long").alias("q1"),
            q2.cast("long").alias("q2"),
            q3.cast("long").alias("q3"),
            F.round(
                (q1 + q3 - 2 * q2).cast("double") / (q3 - q1), 6
            ).alias("bowley"),
        )
        .orderBy("pri")
    )


@register(
    "agg_atkinson_index",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total,
               CAST(sum(CAST(round(1e6 * ln(cents)) AS BIGINT)) AS BIGINT)
                   AS sln
        FROM cust WHERE cents > 0
    )
    SELECT n, total,
           round(1 - exp(CAST(sln AS DOUBLE) / n / 1e6)
                     * n / total, 6) AS atkinson
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at ε = 1 (Atkinson 1970):
    A₁ = 1 − geometric mean / arithmetic mean of customer revenue —
    the welfare-economics member of the inequality family
    (agg_gini counts rank-weighted gaps, agg_hoover_index counts
    transferable share, agg_theil_index entropy; Atkinson states the
    fraction of total revenue society could discard and stay equally
    well off under log utility). Determinism device: each ln(cents)
    ships as the exact int64 round(10⁶·ln·) so the log-sum is
    order-independent integer arithmetic (the graph_adamic_adar
    device); the geometric mean exponentiates one identical double
    in both engines; zero-revenue customers are excluded by exact
    integer compare (ln 0 undefined — the ε=1 index is defined on
    positive incomes).

    Scale shape: one customer-keyed sum, one scalar reduce."""
    o = tbl(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    s = cust.filter(F.col("cents") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(
            F.round(F.lit(1e6) * F.log(F.col("cents").cast("double"))).cast(
                "long"
            )
        )
        .cast("long")
        .alias("sln"),
    )
    return s.select(
        "n",
        "total",
        F.round(
            1
            - F.exp(F.col("sln").cast("double") / F.col("n") / 1e6)
            * F.col("n")
            / F.col("total"),
            6,
        ).alias("atkinson"),
    )
