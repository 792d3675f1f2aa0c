"""§2 extensions, fifty-fifth wave — inequality attribution,
aggregation-reversal detection, term burstiness, and whiteness
testing.

- agg_theil_decomposition: the exact within/between split of the
  Theil-T index over market segments — the decomposability
  agg_theil_index exists for.
- events_simpson_check: the Simpson's-paradox detector — does any
  nation's A/B conversion direction contradict the pooled
  direction? All sign decisions in cross-multiplied integers.
- llm_term_burstiness: Church-Gale term burstiness (cf/df) — terms
  that cluster in few documents vs spread evenly; the feature
  behind topical-vs-function word splits.
- ts_ljung_box: the Ljung-Box portmanteau whiteness test (Q over
  ACF lags 1..7) per event-type daily series, flagged against the
  χ²₇(0.05) literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_theil_decomposition",
    """
    WITH o AS (
        SELECT c.c_mktsegment AS seg,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(cents) AS BIGINT) AS sg
        FROM o GROUP BY seg
    ),
    t AS (
        SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s
        FROM g
    ),
    within AS (
        SELECT o.seg,
               sum((CAST(o.cents AS DOUBLE) / gg.sg)
                   * ln(CAST(o.cents AS DOUBLE) * gg.ng / gg.sg)) AS tg
        FROM o JOIN g gg USING (seg)
        GROUP BY o.seg
    )
    SELECT CAST(count(*) AS BIGINT) AS n_segments,
           round(sum((CAST(g.sg AS DOUBLE) / t.s) * w.tg), 6) AS t_within,
           round(sum((CAST(g.sg AS DOUBLE) / t.s)
                     * ln((CAST(g.sg AS DOUBLE) / t.s)
                          / (CAST(g.ng AS DOUBLE) / t.n))), 6) AS t_between
    FROM g JOIN within w USING (seg) CROSS JOIN t
    """,
    tags=("aggregate", "stats"),
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact additive decomposition of the Theil-T index over
    market segments (Theil 1967): T = Σ s_g·T_g (within) +
    Σ s_g·ln(s_g/p_g) (between), where s_g is the segment's value
    share and p_g its population share — the attribution
    agg_theil_index's docstring promises: how much inequality lives
    INSIDE segments vs BETWEEN them (Gini cannot do this split).
    Totals and counts are exact int64; each share is one division of
    exact integers; the Σ share·ln passes are round-6 display (theil
    convention). T_within + T_between reproduces the global
    agg_theil_index by construction.

    Scale shape: one keyed segment aggregate, broadcast back onto
    one scan pass, then a segments-cardinality reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
    )
    t = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
    )
    term = (F.col("cents").cast("double") / F.col("sg")) * F.log(
        F.col("cents").cast("double") * F.col("ng") / F.col("sg")
    )
    within = (
        base.join(F.broadcast(g), "seg")
        .groupBy("seg")
        .agg(F.sum(term).alias("tg"))
    )
    sshare = F.col("sg").cast("double") / F.col("s")
    pshare = F.col("ng").cast("double") / F.col("n")
    return (
        g.join(within, "seg")
        .crossJoin(F.broadcast(t))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.round(F.sum(sshare * F.col("tg")), 6).alias("t_within"),
            F.round(F.sum(sshare * F.log(sshare / pshare)), 6).alias(
                "t_between"
            ),
        )
    )


@register(
    "events_simpson_check",
    """
    WITH s AS (
        SELECT u.nation, e.user_id % 2 = 0 AS grp_a,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (e.event_type = 'purchase') AS BIGINT)
                   AS conv
        FROM events e
        JOIN (SELECT c_custkey, c_nationkey % 5 AS nation FROM customer) u
          ON u.c_custkey = e.user_id
        GROUP BY 1, 2
    ),
    seg AS (
        SELECT nation,
               max(CASE WHEN grp_a THEN conv END) AS ca,
               max(CASE WHEN grp_a THEN n END) AS na,
               max(CASE WHEN NOT grp_a THEN conv END) AS cb,
               max(CASE WHEN NOT grp_a THEN n END) AS nb
        FROM s GROUP BY nation
        HAVING count(*) = 2
    ),
    pooled AS (
        SELECT CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(na) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS cb, CAST(sum(nb) AS BIGINT) AS nb
        FROM seg
    )
    SELECT CAST(count(*) AS BIGINT) AS n_segments,
           CAST(max(CASE WHEN p.ca * p.nb > p.cb * p.na THEN 1
                         WHEN p.ca * p.nb < p.cb * p.na THEN -1
                         ELSE 0 END) AS INT) AS pooled_sign,
           CAST(count(*) FILTER (
               (s.ca * s.nb > s.cb * s.na AND p.ca * p.nb < p.cb * p.na)
               OR (s.ca * s.nb < s.cb * s.na AND p.ca * p.nb > p.cb * p.na))
               AS BIGINT) AS n_reversed
    FROM seg s CROSS JOIN pooled p
    """,
    tags=("analytics", "stats"),
)
def events_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector (Simpson 1951; the
    trustworthy-experiments segment audit): compare each nation
    segment's A-vs-B conversion direction against the POOLED
    direction — n_reversed > 0 means segment-level conclusions
    contradict the aggregate and the pooled readout cannot be
    trusted without stratification. Every direction decision is a
    cross-multiplied exact-integer compare (ca·nb vs cb·na) — rate
    floats never decide anything. Users map to nation segments by a
    deterministic key join.

    Scale shape: one (segment, variant) conditional-count aggregate;
    everything after runs on the segment-cardinality table."""
    e = tbl(spark, sf_dir, "events")
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_nationkey") % 5).alias("nation")
    )
    s = (
        e.join(F.broadcast(c), e["user_id"] == c["c_custkey"])
        .groupBy("nation", (F.col("user_id") % 2 == 0).alias("grp_a"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("long")
            .alias("conv"),
        )
    )
    seg = (
        s.groupBy("nation")
        .agg(
            F.max(F.when(F.col("grp_a"), F.col("conv"))).alias("ca"),
            F.max(F.when(F.col("grp_a"), F.col("n"))).alias("na"),
            F.max(F.when(~F.col("grp_a"), F.col("conv"))).alias("cb"),
            F.max(F.when(~F.col("grp_a"), F.col("n"))).alias("nb"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .filter(F.col("n_variants") == 2)
    )
    pooled = seg.agg(
        F.sum("ca").cast("long").alias("pca"),
        F.sum("na").cast("long").alias("pna"),
        F.sum("cb").cast("long").alias("pcb"),
        F.sum("nb").cast("long").alias("pnb"),
    )
    seg_up = F.col("ca") * F.col("nb") > F.col("cb") * F.col("na")
    seg_dn = F.col("ca") * F.col("nb") < F.col("cb") * F.col("na")
    pool_up = F.col("pca") * F.col("pnb") > F.col("pcb") * F.col("pna")
    pool_dn = F.col("pca") * F.col("pnb") < F.col("pcb") * F.col("pna")
    return (
        seg.crossJoin(F.broadcast(pooled))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.max(
                F.when(pool_up, 1).when(pool_dn, -1).otherwise(0)
            )
            .cast("int")
            .alias("pooled_sign"),
            F.count_if((seg_up & pool_dn) | (seg_dn & pool_up))
            .cast("long")
            .alias("n_reversed"),
        )
    )


@register(
    "llm_term_burstiness",
    """
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    stats AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM t GROUP BY w
    ),
    scored AS (
        SELECT w, cf, df, CAST(cf AS DOUBLE) / df AS burst,
               row_number() OVER (
                   ORDER BY CAST(cf AS DOUBLE) / df DESC, w) AS rn
        FROM stats WHERE df >= 5
    )
    SELECT w, cf, df, round(burst, 4) AS burstiness
    FROM scored WHERE rn <= 20 ORDER BY burstiness DESC, w
    """,
    tags=("llm", "text"),
)
def llm_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness (Church & Gale 1995): cf/df — the
    mean occurrences per CONTAINING document. Function words spread
    evenly (burstiness ≈ cf/df ≈ corpus mean), topical terms cluster
    (one doc uses them many times) — the one-division feature behind
    topical-vs-function splits, Poisson-mixture LMs, and keyword
    heuristics. cf/df are exact int64; the ranking key is the one
    correctly-rounded division (bit-identical across engines, term
    tiebreak), df ≥ 5 support gate, top 20.

    Scale shape: one explode + one term-keyed aggregate with
    map-side combine; top-k via TakeOrderedAndProject."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    stats = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cf"),
            F.count_distinct("doc_id").cast("long").alias("df"),
        )
    )
    burst = F.col("cf").cast("double") / F.col("df")
    return (
        stats.filter(F.col("df") >= 5)
        .withColumn("burst", burst)
        .orderBy(F.desc("burst"), "w")
        .limit(20)
        .select("w", "cf", "df", F.round("burst", 4).alias("burstiness"))
        .orderBy(F.desc("burstiness"), "w")
    )


@register(
    "ts_ljung_box",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY event_type),
    r AS (
        SELECT a.event_type, k.lag AS k, corr(a.c, b.c) AS rk
        FROM d a
        CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k
        JOIN d b ON b.event_type = a.event_type
               AND b.day = a.day + CAST(k.lag AS INT)
        GROUP BY 1, 2
    )
    SELECT r.event_type, n.n,
           round(n.n * (n.n + 2.0)
                 * sum(r.rk * r.rk / (n.n - r.k)), 4) AS q_stat,
           (n.n * (n.n + 2.0) * sum(r.rk * r.rk / (n.n - r.k))) > 14.067
               AS reject_whiteness
    FROM r JOIN n USING (event_type)
    GROUP BY r.event_type, n.n
    ORDER BY r.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test (Ljung & Box 1978):
    Q = n(n+2)·Σ_{k=1..7} r_k²/(n−k) over the daily-series
    autocorrelations — the standard "is anything left in the
    residuals" gate after detrending/deseasonalizing, flagged
    against the χ²₇(0.05) = 14.067 literal shared with the oracle
    (no p-value function needed). The lag correlations come from
    exact-integer day-shift equi-joins (the ts_autocorr shape); Q
    assembles in one grouped reduce over the 7 lag rows (identical
    doubles both engines).

    Scale shape: everything runs on the calendar-bounded per-type
    daily aggregate; 7 lags via a tiny broadcast grid."""
    e = tbl(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = d.select(
        "event_type", F.col("day").alias("da"), F.col("c").alias("ca")
    )
    b = d.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("c").alias("cb"),
    )
    r = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("db") == F.date_add("da", F.col("k"))),
        )
        .groupBy("event_type", "k")
        .agg(F.corr("ca", "cb").alias("rk"))
    )
    q = F.col("n") * (F.col("n") + 2.0) * F.sum(
        F.col("rk") * F.col("rk") / (F.col("n") - F.col("k"))
    )
    return (
        r.join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.round(q, 4).alias("q_stat"),
            (q > 14.067).alias("reject_whiteness"),
        )
        .orderBy("event_type")
    )
