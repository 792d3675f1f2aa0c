"""§2 extensions, hundred-fortieth wave — tail dependence and
temporal memory.

- agg_tail_dependence: nonparametric upper/lower tail-dependence
  coefficients of (account balance, customer revenue) via the
  empirical survival copula at pinned integer rank thresholds — do
  the two extremes co-occur more than independence predicts? The
  tail-risk question agg_corr_regr's Pearson number cannot see.
- events_gap_memory: the Goh–Barabási (2008) (M, B) pair for the
  error inter-event gaps — memory M = correlation of consecutive
  gaps, burstiness B = (σ−μ)/(σ+μ) — the two-axis fingerprint that
  separates bursty-with-memory (earthquakes) from bursty-memoryless
  (human messaging); completes events_t_chart's SPC view of the
  same gap series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_tail_dependence",
    """
    WITH rev AS (
        SELECT o_custkey AS cust,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS r
        FROM orders GROUP BY 1
    ),
    v AS (
        SELECT c.c_custkey AS cust,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS a,
               rev.r
        FROM customer c JOIN rev ON rev.cust = c.c_custkey
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    ranked AS (
        SELECT cust,
               CAST(row_number() OVER (ORDER BY a, cust) AS BIGINT) AS rx,
               CAST(row_number() OVER (ORDER BY r, cust) AS BIGINT) AS ry
        FROM v
    ),
    thr AS (SELECT n, 19 * n // 20 AS t_hi, n - 19 * n // 20 AS t_lo
            FROM n),
    cnt AS (
        SELECT CAST(sum(CASE WHEN rk.rx > t.t_hi AND rk.ry > t.t_hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_hi,
               CAST(sum(CASE WHEN rk.rx <= t.t_lo AND rk.ry <= t.t_lo
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_lo
        FROM ranked rk, thr t
    )
    SELECT t.n AS n_customers, t.t_hi, t.t_lo,
           cnt.c_hi AS joint_upper, cnt.c_lo AS joint_lower,
           round(CAST(cnt.c_hi AS DOUBLE) / (t.n - t.t_hi), 6)
               AS lambda_upper,
           round(CAST(cnt.c_lo AS DOUBLE) / t.t_lo, 6) AS lambda_lower,
           round(CAST(t.n - t.t_hi AS DOUBLE) / t.n, 6) AS indep_ref,
           CAST(cnt.c_hi AS DOUBLE) / (t.n - t.t_hi)
               > 2 * CAST(t.n - t.t_hi AS DOUBLE) / t.n
               AS upper_tail_dependent
    FROM thr t, cnt
    """,
    tags=("aggregate", "stats"),
)
def agg_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical tail-dependence coefficients between a customer's
    account balance and their total order revenue: with exact ranks
    (rx, ry) and the pinned integer thresholds t_hi = ⌊19n/20⌋,
    t_lo = n − t_hi, the survival-copula estimates are
    λ̂_U = #{rx > t_hi ∧ ry > t_hi}/(n − t_hi) (the conditional
    probability of being a revenue extreme GIVEN a balance extreme)
    and mirror λ̂_L on the lower corner. Under independence both sit
    near (n − t_hi)/n ≈ 5 % — the reported reference — and the
    verdict flags λ_U above twice it. The question Pearson
    correlation structurally misses: two variables can be nearly
    uncorrelated overall yet crash together. Ranks are block-ranked
    integers (custkey tiebreak); counts PURE INTEGER; two divisions.

    Scale shape: one per-customer reduce + broadcast join, two
    block-ranked ranks, one count reduce against the broadcast
    1-row threshold frame."""
    from hadoop_deliver_spark.api import exact_global_rank

    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    rev = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("r")
    )
    v = c.join(rev, c.c_custkey == rev.cust).select(
        F.col("c_custkey").alias("cust"),
        (dec2("c_acctbal") * 100).cast("long").alias("a"),
        "r",
    )
    n = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    rk = exact_global_rank(v, "a", "cust", "rx")
    rk = exact_global_rank(rk, "r", "cust", "ry")
    thr = n.select(
        "n",
        F.expr("div(19 * n, 20)").cast("long").alias("t_hi"),
        (F.col("n") - F.expr("div(19 * n, 20)")).cast("long").alias("t_lo"),
    )
    cnt = rk.crossJoin(F.broadcast(thr)).agg(
        F.sum(
            F.when(
                (F.col("rx") > F.col("t_hi")) & (F.col("ry") > F.col("t_hi")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("c_hi"),
        F.sum(
            F.when(
                (F.col("rx") <= F.col("t_lo"))
                & (F.col("ry") <= F.col("t_lo")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("c_lo"),
    )
    lam_u = F.col("c_hi").cast("double") / (F.col("n") - F.col("t_hi"))
    ref = (F.col("n") - F.col("t_hi")).cast("double") / F.col("n")
    return thr.crossJoin(F.broadcast(cnt)).select(
        F.col("n").alias("n_customers"),
        "t_hi",
        "t_lo",
        F.col("c_hi").alias("joint_upper"),
        F.col("c_lo").alias("joint_lower"),
        F.round(lam_u, 6).alias("lambda_upper"),
        F.round(F.col("c_lo").cast("double") / F.col("t_lo"), 6).alias(
            "lambda_lower"
        ),
        F.round(ref, 6).alias("indep_ref"),
        (lam_u > 2 * ref).alias("upper_tail_dependent"),
    )


@register(
    "events_gap_memory",
    """
    WITH err AS (
        SELECT epoch_us(ts) AS us, event_id FROM events
        WHERE event_type = 'error'
    ),
    ranked AS (
        SELECT us, row_number() OVER (ORDER BY us, event_id) AS r
        FROM err
    ),
    gaps AS (
        SELECT a.r AS gr, CAST((b.us - a.us) // 1000000 AS DOUBLE)
            AS g
        FROM ranked a JOIN ranked b ON b.r = a.r + 1
    ),
    pairs AS (
        SELECT a.g AS g1, b.g AS g2
        FROM gaps a JOIN gaps b ON b.gr = a.gr + 1
    ),
    momp AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               avg(g1) AS m1, avg(g2) AS m2,
               sum(g1 * g2) AS s12, sum(g1 * g1) AS s11,
               sum(g2 * g2) AS s22
        FROM pairs
    ),
    momg AS (
        SELECT CAST(count(*) AS BIGINT) AS ng,
               avg(g) AS mu,
               sum(g * g) AS sgg
        FROM gaps
    )
    SELECT momg.ng AS n_gaps, momp.m AS n_pairs,
           round((momp.s12 - momp.m * momp.m1 * momp.m2)
                 / sqrt((momp.s11 - momp.m * momp.m1 * momp.m1)
                        * (momp.s22 - momp.m * momp.m2 * momp.m2)), 6)
               AS memory_m,
           round((sqrt(momg.sgg / momg.ng - momg.mu * momg.mu) - momg.mu)
                 / (sqrt(momg.sgg / momg.ng - momg.mu * momg.mu)
                    + momg.mu), 6) AS burstiness_b,
           round((sqrt(momg.sgg / momg.ng - momg.mu * momg.mu) - momg.mu)
                 / (sqrt(momg.sgg / momg.ng - momg.mu * momg.mu)
                    + momg.mu), 6) > 0
               AS bursty,
           abs(round((momp.s12 - momp.m * momp.m1 * momp.m2)
                 / sqrt((momp.s11 - momp.m * momp.m1 * momp.m1)
                        * (momp.s22 - momp.m * momp.m2 * momp.m2)), 6))
               > 0.1 AS has_memory
    FROM momp, momg
    """,
    tags=("events", "stats"),
)
def events_gap_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási (M, B) fingerprint of the error inter-event
    gaps: memory M = Pearson correlation of consecutive gaps
    (g_i, g_{i+1}) — built from two rank r ↔ r+1 equi-joins on the
    exact (epoch µs, event_id) order, no global lag window — and
    burstiness B = (σ − μ)/(σ + μ) of the gap distribution
    (population σ; B > 0 bursty, < 0 regular, ≈ 0 Poisson). The
    quadrant separates mechanisms: earthquakes are (M > 0, B > 0),
    human messaging (M ≈ 0, B > 0) — so the pair says WHETHER error
    bursts are self-exciting or just heavy-tailed, which decides
    retry-storm mitigation vs capacity planning. Gaps are PURE
    INTEGER seconds; the moment chain is identical on both sides;
    verdicts compare ROUNDED values.

    Scale shape: one filtered scan, block-ranked rank, two rank
    equi-joins, two moment reduces."""
    from hadoop_deliver_spark.api import exact_global_rank

    e = tbl(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    ranked = exact_global_rank(err, "us", "event_id", "r")
    nxt = ranked.select(
        (F.col("r") - 1).alias("r"), F.col("us").alias("us2")
    )
    gaps = ranked.join(nxt, "r").select(
        F.col("r").alias("gr"),
        F.expr("div(us2 - us, 1000000)").cast("double").alias("g"),
    )
    nxtg = gaps.select((F.col("gr") - 1).alias("gr"), F.col("g").alias("g2"))
    pairs = gaps.join(nxtg, "gr").select(F.col("g").alias("g1"), "g2")
    momp = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg("g1").alias("m1"),
        F.avg("g2").alias("m2"),
        F.sum(F.col("g1") * F.col("g2")).alias("s12"),
        F.sum(F.col("g1") * F.col("g1")).alias("s11"),
        F.sum(F.col("g2") * F.col("g2")).alias("s22"),
    )
    momg = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.avg("g").alias("mu"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    mem = (F.col("s12") - F.col("m") * F.col("m1") * F.col("m2")) / F.sqrt(
        (F.col("s11") - F.col("m") * F.col("m1") * F.col("m1"))
        * (F.col("s22") - F.col("m") * F.col("m2") * F.col("m2"))
    )
    sd = F.sqrt(F.col("sgg") / F.col("ng") - F.col("mu") * F.col("mu"))
    b = (sd - F.col("mu")) / (sd + F.col("mu"))
    return momp.crossJoin(F.broadcast(momg)).select(
        F.col("ng").alias("n_gaps"),
        F.col("m").alias("n_pairs"),
        F.round(mem, 6).alias("memory_m"),
        F.round(b, 6).alias("burstiness_b"),
        (F.round(b, 6) > 0).alias("bursty"),
        (F.abs(F.round(mem, 6)) > 0.1).alias("has_memory"),
    )
