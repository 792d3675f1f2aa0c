"""§2 extensions, hundred-first wave — scale-correct resampling and
uplift targeting.

- agg_poisson_bootstrap_se: the online/streaming Poisson bootstrap
  (Oza & Russell 2001; the method every web-scale system uses for
  bootstrap SEs, because true resampling-with-replacement needs
  global coordination while Poisson(1) replicate weights are a pure
  per-row map) — made HASH-MATCHED by deriving the weights from a
  deterministic integer LCG both engines can compute, instead of
  engine RNG.
- events_qini_uplift: the Qini / uplift decile table (Radcliffe
  2007) — incremental-response targeting evaluation over a
  deterministic treatment split, block-ranked deciles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

#: Poisson(1) inverse-CDF cut points (cumulative P(X ≤ k), k = 0..4);
#: weights truncate at 5 — a stated knob discarding 5.9e-4 of mass.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)
_N_REPS = 20


@register(
    "agg_poisson_bootstrap_se",
    f"""
    WITH w AS (
        SELECT rep,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST((o_orderkey * 1103515245 + 12345 + 9973 * rep)
                    % 2147483648 AS DOUBLE) / 2147483648.0 AS u
        FROM orders
        CROSS JOIN (SELECT unnest(range(1, {_N_REPS + 1})) AS rep)
    ),
    wt AS (
        SELECT rep, cents,
               CASE WHEN u < {_POIS_CDF[0]!r} THEN 0
                    WHEN u < {_POIS_CDF[1]!r} THEN 1
                    WHEN u < {_POIS_CDF[2]!r} THEN 2
                    WHEN u < {_POIS_CDF[3]!r} THEN 3
                    WHEN u < {_POIS_CDF[4]!r} THEN 4
                    ELSE 5 END AS w
        FROM w
    ),
    per_rep AS (
        SELECT rep, CAST(sum(w) AS BIGINT) AS sw,
               CAST(sum(CAST(w AS HUGEINT) * cents) AS HUGEINT) AS swc
        FROM wt GROUP BY rep
    ),
    means AS (
        SELECT CAST(swc AS DOUBLE) / sw AS m FROM per_rep
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS r,
               sum(m) AS sm, sum(m * m) AS smm
        FROM means
    ),
    base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS sc
        FROM orders
    )
    SELECT base.n AS n_orders, {_N_REPS} AS n_reps,
           round(CAST(base.sc AS DOUBLE) / base.n / 100, 4)
               AS mean_value,
           round(sqrt((mom.r * mom.smm - mom.sm * mom.sm)
                      / (CAST(mom.r AS DOUBLE) * (mom.r - 1))) / 100, 4)
               AS boot_se,
           round(CAST(base.sc AS DOUBLE) / base.n / 100
                 - 1.96 * sqrt((mom.r * mom.smm - mom.sm * mom.sm)
                      / (CAST(mom.r AS DOUBLE) * (mom.r - 1))) / 100, 4)
               AS ci_lo,
           round(CAST(base.sc AS DOUBLE) / base.n / 100
                 + 1.96 * sqrt((mom.r * mom.smm - mom.sm * mom.sm)
                      / (CAST(mom.r AS DOUBLE) * (mom.r - 1))) / 100, 4)
               AS ci_hi
    FROM mom CROSS JOIN base
    """,
    tags=("aggregate", "stats"),
)
def agg_poisson_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap standard error of the mean order value —
    the resampling method that actually works at 100 TB: classical
    bootstrap draws n-with-replacement (a global shuffle per
    replicate), the Poisson bootstrap gives every row an independent
    Poisson(1) weight per replicate (a pure map; replicate sizes
    concentrate at n, and the SE estimator is asymptotically
    identical). Here the weights are DETERMINISTIC — an integer LCG
    u = ((key·1103515245 + 12345 + 9973·rep) mod 2³¹)/2³¹ pushed
    through the Poisson(1) inverse CDF (literal cut points, mass
    truncated at 5: 5.9e-4, a stated knob) — so both engines
    produce bit-identical weights and the query HASH-MATCHES (the
    agg_hll_firstprin device applied to resampling; engine-RNG
    bootstraps are inherently rows-only). Per-replicate weighted
    sums stay EXACT integers (w·cents in HUGEINT/DECIMAL); the only
    float math is one division per replicate and the closed-form
    20-row moment SD, identical textual order both engines.

    Scale shape: one map-side explode (×20), one map-side-combined
    per-replicate reduce (20 groups), a 20-row moment reduce, a
    1-row base aggregate — no shuffle wider than 20 keys."""
    o = tbl(spark, sf_dir, "orders")
    w = o.select(
        F.explode(F.sequence(F.lit(1), F.lit(_N_REPS))).alias("rep"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderkey"),
    ).select(
        "rep",
        "cents",
        (
            (
                F.col("o_orderkey") * 1103515245
                + 12345
                + 9973 * F.col("rep")
            )
            % F.lit(2147483648)
        ).cast("double").alias("u31"),
    )
    u = F.col("u31") / 2147483648.0
    wt = w.select(
        "rep",
        "cents",
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
        .alias("w"),
    )
    per_rep = wt.groupBy("rep").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("cents")).alias(
            "swc"
        ),
    )
    means = per_rep.select(
        (F.col("swc").cast("double") / F.col("sw")).alias("m")
    )
    mom = means.agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum("m").alias("sm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
    )
    base = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sc"),
    )
    se = (
        F.sqrt(
            (F.col("r") * F.col("smm") - F.col("sm") * F.col("sm"))
            / (F.col("r").cast("double") * (F.col("r") - 1))
        )
        / 100
    )
    mean = F.col("sc").cast("double") / F.col("n") / 100
    return mom.crossJoin(F.broadcast(base)).select(
        F.col("n").alias("n_orders"),
        F.lit(_N_REPS).alias("n_reps"),
        F.round(mean, 4).alias("mean_value"),
        F.round(se, 4).alias("boot_se"),
        F.round(mean - 1.96 * se, 4).alias("ci_lo"),
        F.round(mean + 1.96 * se, 4).alias("ci_hi"),
    )


@register(
    "events_qini_uplift",
    """
    WITH usr AS (
        SELECT user_id,
               CAST(user_id % 2 AS INT) AS t,
               CAST(count(*) FILTER (event_type IN ('click', 'view'))
                    AS BIGINT) AS score,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    dec AS (
        SELECT t, score, y,
               ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM usr
    ),
    cell AS (
        SELECT decile,
               CAST(count(*) FILTER (t = 1) AS BIGINT) AS n_t,
               CAST(count(*) FILTER (t = 0) AS BIGINT) AS n_c,
               CAST(coalesce(sum(y) FILTER (t = 1), 0) AS BIGINT) AS y_t,
               CAST(coalesce(sum(y) FILTER (t = 0), 0) AS BIGINT) AS y_c
        FROM dec GROUP BY decile
    ),
    cum AS (
        SELECT decile, n_t, n_c, y_t, y_c,
               sum(y_t) OVER w AS cy_t, sum(y_c) OVER w AS cy_c,
               sum(n_t) OVER w AS cn_t, sum(n_c) OVER w AS cn_c
        FROM cell
        WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    )
    SELECT decile, n_t, n_c, y_t, y_c,
           round(CAST(y_t AS DOUBLE) / nullif(n_t, 0)
                 - CAST(y_c AS DOUBLE) / nullif(n_c, 0), 6) AS uplift,
           round(cy_t - CAST(cy_c AS DOUBLE) * cn_t / nullif(cn_c, 0), 6)
               AS qini
    FROM cum ORDER BY decile
    """,
    tags=("events", "analytics"),
)
def events_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift decile table (Radcliffe 2007) — the standard
    incremental-response evaluation for targeting models: users
    split into treatment/control by the deterministic user_id parity
    (the fixture's stand-in for an assignment column), ranked by an
    engagement score (click+view count), cut into exact deciles, and
    each cumulative prefix scored with the Qini statistic
    Y_t(k) − Y_c(k)·N_t(k)/N_c(k) — the incremental purchases
    attributable to targeting the top k deciles, controlling for
    arm-size imbalance. Per-decile uplift is the plain rate gap. The
    decile assignment is the block-ranked exact-ntile core (ntile
    semantics bit-matched to the oracle's window ntile — the
    agg_cumulative_gains device); the cumulative window runs over
    the fixed 10-row decile table.

    Scale shape: one keyed user reduce, block-ranked ntile (windows
    partition by block), a 10-row pivot + cumsum."""
    from hadoop_deliver_spark.api import exact_global_ntile

    e = tbl(spark, sf_dir, "events")
    usr = e.groupBy("user_id").agg(
        F.sum(
            F.col("event_type").isin("click", "view").cast("long")
        ).cast("long").alias("score"),
        F.max((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("y"),
    ).select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("t"),
        # ntile core ranks ASCENDING; oracle ranks score DESC — negate
        (-F.col("score")).alias("neg_score"),
        "y",
    )
    dec = exact_global_ntile(usr, "neg_score", "user_id", 10, "decile")
    cell = dec.groupBy("decile").agg(
        F.sum((F.col("t") == 1).cast("long")).cast("long").alias("n_t"),
        F.sum((F.col("t") == 0).cast("long")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = cell.select(
        "decile",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.sum("y_t").over(wc).alias("cy_t"),
        F.sum("y_c").over(wc).alias("cy_c"),
        F.sum("n_t").over(wc).alias("cn_t"),
        F.sum("n_c").over(wc).alias("cn_c"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.round(
            F.col("y_t").cast("double") / F.nullif(F.col("n_t"), F.lit(0))
            - F.col("y_c").cast("double") / F.nullif(F.col("n_c"), F.lit(0)),
            6,
        ).alias("uplift"),
        F.round(
            F.col("cy_t")
            - F.col("cy_c").cast("double")
            * F.col("cn_t")
            / F.nullif(F.col("cn_c"), F.lit(0)),
            6,
        ).alias("qini"),
    ).orderBy("decile")
