"""§2 extensions, thirty-second wave — semantic dedup, recursive
smoothing, and the rank/proportion inference family.

- llm_semdedup: SemDeDup (Abbas et al. 2023) — embedding-space
  near-duplicate pruning inside k-means-style cells, keeping the
  most centroid-diverse member of each similar pair.
- ts_holt_winters: Holt's linear-trend exponential smoothing as a
  per-series applyInPandas recurrence, oracle-checked against a
  DuckDB RECURSIVE CTE running the identical recurrence — the
  template for sequential state Spark's built-ins can't express.
- agg_mann_whitney: the Mann-Whitney U / Wilcoxon rank-sum test on
  exact midranks from the block-ranked api.exact_global_rank core —
  rank statistics without a single-partition window.
- events_abtest_proportions: the two-proportion pooled z-test on an
  A/B split — the conversion-rate readout every experimentation
  pipeline ships.
- orders_benford: Benford's-law first-digit screen with mean
  absolute deviation — the classic fraud/DQ forensic on money
  columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_COS_TAU = 0.8  # SemDeDup within-cluster similarity threshold


@register(
    "llm_semdedup",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 10),
    d AS (
        SELECT v.vec_id, c.cid,
               list_dot_product(v.e, v.e)
                 - 2 * list_dot_product(v.e, c.ce)
                 + list_dot_product(c.ce, c.ce) AS d2,
               list_dot_product(v.e, c.ce)
                 / (sqrt(list_dot_product(v.e, v.e))
                    * sqrt(list_dot_product(c.ce, c.ce))) AS simc
        FROM v CROSS JOIN c
    ),
    asg AS (
        SELECT vec_id, cid AS cluster, simc FROM (
            SELECT vec_id, cid, simc,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cid) AS rn
            FROM d
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT x.vec_id AS va, y.vec_id AS vb, x.simc AS sa, y.simc AS sb
        FROM asg x
        JOIN asg y ON y.cluster = x.cluster AND x.vec_id < y.vec_id
        JOIN v vx ON vx.vec_id = x.vec_id
        JOIN v vy ON vy.vec_id = y.vec_id
        WHERE list_dot_product(vx.e, vy.e)
              / (sqrt(list_dot_product(vx.e, vx.e))
                 * sqrt(list_dot_product(vy.e, vy.e))) >= {_COS_TAU}
    ),
    drops AS (
        SELECT DISTINCT CASE WHEN sa > sb THEN va
                             WHEN sb > sa THEN vb
                             ELSE greatest(va, vb) END AS vec_id
        FROM pairs
    )
    SELECT asg.vec_id, cluster,
           CAST(simc AS REAL) AS centroid_sim,
           asg.vec_id NOT IN (SELECT vec_id FROM drops) AS kept
    FROM asg ORDER BY vec_id
    """,
    tags=("llm", "dedup"),
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning.
    Vectors are assigned to cells around fixed seed centroids (the
    first 10 vec_ids — a deterministic stand-in for the paper's
    k-means step, so the oracle can replay the assignment), pairwise
    cosine runs ONLY within a cell, and of each pair with cos ≥ 0.8
    the member MORE similar to its centroid is dropped — the paper's
    keep-the-diverse-outlier rule (ties break to the higher id).

    Scale shape: this is the whole point of SemDeDup — the cluster
    assignment bounds the quadratic: the pair join is an equi-join ON
    THE CELL KEY (hash-partitioned, never all-pairs), and cell
    populations are controlled by k. The 10-row centroid table rides
    a broadcast (allowlisted with llm_sim_ivf); dot products stay in
    codegen via api.dot's zip_with fold, whose left-to-right order
    matches DuckDB's list_dot_product bit-for-bit (the
    llm_dedup_embedding precedent). Float only in similarity;
    centroid_sim reported as REAL."""
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    cent = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    d2 = (
        api.dot(F.col("e"), F.col("e"))
        - 2 * api.dot(F.col("e"), F.col("ce"))
        + api.dot(F.col("ce"), F.col("ce"))
    )
    simc = api.dot(F.col("e"), F.col("ce")) / (
        api.vec_norm(F.col("e")) * api.vec_norm(F.col("ce"))
    )
    d = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", "e", d2.alias("d2"), simc.alias("simc")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    # r12: materialize the assignment once — both sides of the
    # within-cell pair join plus the final labeling re-ran the
    # 10-centroid crossJoin + argmin window otherwise (3 full lineage
    # executions measured at sf0.1).
    # the per-vector norm is also computed HERE once (it was
    # re-evaluated per PAIR inside the cosine below — two extra
    # interpreted 64-element folds per candidate pair; same double
    # value either way, the fold is deterministic per vector)
    asg = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cid").alias("cluster"),
            "simc",
            "e",
            api.vec_norm(F.col("e")).alias("nrm"),
        )
        .localCheckpoint(eager=True)
    )
    x = asg.select(
        F.col("cluster"),
        F.col("vec_id").alias("va"),
        F.col("simc").alias("sa"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = asg.select(
        F.col("cluster"),
        F.col("vec_id").alias("vb"),
        F.col("simc").alias("sb"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos_ab = api.dot(F.col("ea"), F.col("eb")) / (
        F.col("na") * F.col("nb")
    )
    pairs = (
        x.join(y, "cluster")
        .where(F.col("va") < F.col("vb"))
        .where(cos_ab >= _COS_TAU)
    )
    drops = pairs.select(
        F.when(F.col("sa") > F.col("sb"), F.col("va"))
        .when(F.col("sb") > F.col("sa"), F.col("vb"))
        .otherwise(F.greatest("va", "vb"))
        .alias("vec_id")
    ).distinct()
    return (
        asg.join(
            drops.withColumn("_drop", F.lit(1)), "vec_id", "left"
        )
        .select(
            "vec_id",
            "cluster",
            F.col("simc").cast("float").alias("centroid_sim"),
            F.col("_drop").isNull().alias("kept"),
        )
        .orderBy("vec_id")
    )


@register(
    "ts_holt_winters",
    """
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    ord AS (
        SELECT event_type, day, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS rn
        FROM daily
    ),
    hw AS (
        SELECT o1.event_type, o1.rn, o1.day, o1.cnt,
               CAST(o1.cnt AS DOUBLE) AS level,
               CAST(o2.cnt - o1.cnt AS DOUBLE) AS trend,
               CAST(o1.cnt AS DOUBLE) AS fcst
        FROM ord o1
        JOIN ord o2 ON o2.event_type = o1.event_type AND o2.rn = 2
        WHERE o1.rn = 1
        UNION ALL
        SELECT o.event_type, o.rn, o.day, o.cnt,
               0.5 * o.cnt + 0.5 * (hw.level + hw.trend),
               0.25 * ((0.5 * o.cnt + 0.5 * (hw.level + hw.trend))
                       - hw.level) + 0.75 * hw.trend,
               hw.level + hw.trend
        FROM hw JOIN ord o ON o.event_type = hw.event_type
                          AND o.rn = hw.rn + 1
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
           round(level, 4) AS level, round(trend, 4) AS trend,
           round(fcst, 4) AS fcst
    FROM hw ORDER BY event_type, day
    """,
    tags=("timeseries", "stateful"),
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (α=1/2, β=1/4) over
    each event type's daily series: l_t = αx_t + (1−α)(l_{t−1} +
    b_{t−1}), b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, seeded l_1 =
    x_1, b_1 = x_2 − x_1; fcst is the one-step-ahead forecast
    l_{t−1} + b_{t−1} (= x_1 at the seed). Series shorter than 2
    observations are dropped (no trend seed exists).

    This is the template for SEQUENTIAL state Spark's built-in
    operators cannot express (the recurrence reads its own previous
    output, not a window of inputs): one applyInPandas over the
    series key runs the loop per series with O(1) state, while the
    oracle replays the IDENTICAL recurrence as a DuckDB RECURSIVE
    CTE — binary coefficients keep every step's arithmetic the same
    IEEE operation sequence on both engines, so the match is exact
    before the display rounding.

    Scale shape: the fact table reduces to the per-(type, day)
    aggregate first; applyInPandas shuffles once on the series key
    and each group's state is two doubles — a million series run as
    a million independent O(days) loops."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))

    out = api.holt_smooth(daily, ["event_type"], "day", "cnt")
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        "level",
        "trend",
        "fcst",
    ).orderBy("event_type", "day")


@register(
    "agg_mann_whitney",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderpriority = '1-URGENT' AS urg,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS rk
        FROM orders
    ),
    byval AS (
        SELECT cents,
               count(*) AS cnt,
               CAST(count(*) FILTER (urg) AS BIGINT) AS cnt_a,
               CAST(min(rk) AS BIGINT) AS minr,
               CAST(max(rk) AS BIGINT) AS maxr
        FROM o GROUP BY cents
    ),
    s AS (
        SELECT CAST(sum(cnt_a) AS BIGINT) AS n1,
               CAST(sum(cnt - cnt_a) AS BIGINT) AS n2,
               CAST(sum(cnt_a * (minr + maxr)) AS BIGINT) AS r1x2,
               CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        FROM byval
    )
    SELECT n1, n2,
           CAST(r1x2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
               AS u1,
           round((CAST(r1x2 AS DOUBLE) / 2
                  - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n1 + n2 + 1)
                           - CAST(ties AS DOUBLE)
                             / ((n1 + n2) * CAST(n1 + n2 AS DOUBLE) - (n1 + n2)))),
                 4) AS z
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: do URGENT orders'
    prices stochastically dominate the rest? Midranks come from the
    block-ranked api.exact_global_rank core — tie groups occupy
    consecutive ranks, so the midrank is (min+max)/2 per distinct
    cents value and NO single-partition window touches the fact
    table. Doubling the rank sum keeps every moment an exact int64
    (midranks end in .5); U and the tie-corrected normal z then run
    in identically-ordered double arithmetic, Welch-style: bit-stable
    across engines at any partitioning. No continuity correction
    (both engines would apply the same one; omitting it keeps the
    formula the textbook large-sample form).

    Scale shape: one block-ranked pass over orders, one aggregate by
    distinct price (bounded by the price grid, not the row count),
    one 1-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(
        cents.alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    byval = ranked.groupBy("cents").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_if(F.col("urg")).alias("cnt_a"),
        F.min("rk").cast("long").alias("minr"),
        F.max("rk").cast("long").alias("maxr"),
    )
    s = byval.agg(
        F.sum("cnt_a").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n2"),
        F.sum(F.col("cnt_a") * (F.col("minr") + F.col("maxr")))
        .cast("long")
        .alias("r1x2"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("long")
        .alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n = F.col("n1") + F.col("n2")
    u1 = F.col("r1x2").cast("double") / 2 - n1d * (F.col("n1") + 1) / 2
    sigma = F.sqrt(
        n1d
        * F.col("n2")
        / 12
        * (
            (n + 1)
            - F.col("ties").cast("double")
            / (n * n.cast("double") - n)
        )
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round((u1 - n1d * F.col("n2") / 2) / sigma, 4).alias("z"),
    )


@register(
    "events_abtest_proportions",
    """
    WITH s AS (
        SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (user_id % 2 = 0
                                     AND event_type = 'purchase')
                    AS BIGINT) AS conv_a,
               CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b,
               CAST(count(*) FILTER (user_id % 2 = 1
                                     AND event_type = 'purchase')
                    AS BIGINT) AS conv_b
        FROM events
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a
                 - CAST(conv_b AS DOUBLE) / n_b, 4) AS rate_diff,
           round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z
    FROM s
    """,
    tags=("events", "stats"),
)
def events_abtest_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test on an A/B split (variant =
    user_id parity): the tested proportion is the PURCHASE SHARE of
    an arm's events — the per-exposure conversion rate an
    experimentation pipeline publishes per metric. (A per-user
    'ever purchased' flag degenerates on this fixture — every active
    user converts within the month, zeroing the pooled variance —
    so the per-event rate is the statistically meaningful choice.)
    Every count is exact; the closed form runs in identically-ordered
    doubles, so the statistic is bit-stable across engines before
    the display rounding.

    Scale shape: ONE conditional aggregate over the fact scan (four
    count_ifs, map-side partial) — no join, no window, no per-user
    shuffle."""
    e = tbl(spark, sf_dir, "events")
    a0 = F.col("user_id") % 2 == 0
    pur = F.col("event_type") == "purchase"
    s = e.agg(
        F.count_if(a0).alias("n_a"),
        F.count_if(a0 & pur).alias("conv_a"),
        F.count_if(~a0).alias("n_b"),
        F.count_if(~a0 & pur).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(pa - pb, 4).alias("rate_diff"),
        F.round(
            (pa - pb)
            / F.sqrt(
                pool
                * (1 - pool)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        ).alias("z"),
    )


@register(
    "orders_benford",
    """
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
        FROM orders
    ),
    d AS (
        SELECT digit, count(*) AS n,
               CAST(sum(count(*)) OVER () AS BIGINT) AS total
        FROM c GROUP BY digit
    ),
    x AS (
        SELECT digit, n,
               CAST(n AS DOUBLE) / total AS obs,
               log10(1 + 1.0 / digit) AS exp_share
        FROM d
    )
    SELECT digit, n,
           round(obs, 4) AS obs_share,
           round(exp_share, 4) AS exp_share,
           round(abs(obs - exp_share), 4) AS abs_dev,
           round((SELECT avg(abs(obs - exp_share)) FROM x), 4) AS mad
    FROM x ORDER BY digit
    """,
    tags=("aggregate", "dq"),
)
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen on the money column: the
    observed share of each leading digit of o_totalprice (in exact
    cents — leading digit is invariant to the ×100) against the
    Benford expectation log10(1 + 1/d), with per-digit absolute
    deviation and the mean absolute deviation (MAD — Nigrini's
    conformity statistic) on every row. A money column that drifts
    from Benford is the classic fabrication/entry-error signal, so
    this doubles as a delivery DQ gate.

    Scale shape: the digit extraction is map-only string algebra on
    exact cents; everything after runs over the 9-row digit
    aggregate (the OVER () total and the MAD are aggregates OF that
    9-row table — the 1-row MAD broadcast is allowlisted with the
    chi2 pattern). Counts exact; floats only in the final shares."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    c = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    d = c.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = d.agg(F.sum("n").cast("long").alias("total"))
    x = d.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("obs"),
        F.log10(1 + 1.0 / F.col("digit")).alias("exp_share"),
    )
    mad = x.agg(
        F.round(F.avg(F.abs(F.col("obs") - F.col("exp_share"))), 4).alias(
            "mad"
        )
    )
    return (
        x.crossJoin(F.broadcast(mad))
        .select(
            "digit",
            "n",
            F.round("obs", 4).alias("obs_share"),
            F.round("exp_share", 4).alias("exp_share"),
            F.round(F.abs(F.col("obs") - F.col("exp_share")), 4).alias(
                "abs_dev"
            ),
            "mad",
        )
        .orderBy("digit")
    )
