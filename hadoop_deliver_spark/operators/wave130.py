"""§2 extensions, hundred-thirtieth wave — chained price indices and
censored duration MLE.

- orders_tornqvist_index: chained Törnqvist / Laspeyres / Paasche /
  Fisher price indices over the monthly brand basket — the
  superlative-index complement of orders_fisher_price_index (one
  base period) and orders_unit_value_index (no basket weighting);
  the whole chain reduces to ONE pass (log-links sum).
- events_exp_survival_mle: exponential MLE of time-to-first-purchase
  with right-censoring (λ̂ = events/total exposure — the textbook
  censored-data estimator) against the Kaplan-Meier-free exact
  convert-only median; the parametric twin of events_survival_km.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "orders_tornqvist_index",
    """
    WITH li AS (
        SELECT p.p_brand AS brand,
               CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) * 12
                   + CAST(strftime(l.l_shipdate, '%m') AS BIGINT) AS mo,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    mt AS (SELECT mo, CAST(sum(rev) AS BIGINT) AS mrev FROM li GROUP BY 1),
    bw AS (
        SELECT li.brand, li.mo,
               CAST(li.rev AS DOUBLE) / li.qty AS p,
               CAST(li.rev AS DOUBLE) / mt.mrev AS w
        FROM li JOIN mt ON li.mo = mt.mo
    ),
    pairs AS (
        SELECT t.mo, t.p AS pt, t.w AS wt, b.p AS pb, b.w AS wb
        FROM bw t JOIN bw b ON t.brand = b.brand AND t.mo = b.mo + 1
    ),
    links AS (
        SELECT mo,
               sum(0.5 * (wt + wb) * ln(pt / pb)) AS ln_tq,
               sum(wb * (pt / pb)) AS lasp,
               sum(wt * (pb / pt)) AS ipaas,
               CAST(count(*) AS BIGINT) AS n_brands
        FROM pairs GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_links,
           CAST(sum(n_brands) AS BIGINT) AS n_pair_terms,
           CAST(min(n_brands) AS BIGINT) AS min_common_brands,
           round(exp(sum(ln_tq)), 4) AS tornqvist_chained,
           round(exp(sum(ln(lasp))), 4) AS laspeyres_chained,
           round(exp(-sum(ln(ipaas))), 4) AS paasche_chained,
           round(sqrt(exp(sum(ln(lasp))) * exp(-sum(ln(ipaas)))), 4)
               AS fisher_chained
    FROM links
    """,
    tags=("orders", "analytics"),
)
def orders_tornqvist_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained price indices over the monthly brand basket (unit
    value = revenue/quantity per brand-month, weight = revenue share
    of the FULL month): Törnqvist link exp(Σ½(wₜ+wₜ₋₁)·ln(pₜ/pₜ₋₁))
    — the superlative index CPI programs use — beside chained
    Laspeyres Σwₜ₋₁·(pₜ/pₜ₋₁), chained Paasche (harmonic form
    1/Σwₜ·(pₜ₋₁/pₜ)), and Fisher = √(L·P). The chain trick: the
    full product of Törnqvist links is exp of ONE sum over all
    (brand, month-pair) terms, and each chained L/P is exp of a sum
    of per-month logs — no cumulative window anywhere. Conventions
    pinned: brands present in both adjacent months only, weights NOT
    renormalized to the common basket (documented), month key =
    12·year + month. Laspeyres ≥ Fisher ≥ Paasche ordering is the
    built-in sanity check.

    Scale shape: one join + (brand, month) reduce, one month-total
    reduce joined back, one brand-level month↔month+1 equi-join,
    one per-month reduce (bounded by calendar), one 1-row reduce."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("mo"),
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    mt = base.groupBy("mo").agg(F.sum("rev").cast("long").alias("mrev"))
    bw = base.join(mt, "mo").select(
        "brand",
        "mo",
        (F.col("rev").cast("double") / F.col("qty")).alias("p"),
        (F.col("rev").cast("double") / F.col("mrev")).alias("w"),
    )
    prev = bw.select(
        "brand",
        (F.col("mo") + 1).alias("mo"),
        F.col("p").alias("pb"),
        F.col("w").alias("wb"),
    )
    pairs = bw.join(prev, ["brand", "mo"])
    links = pairs.groupBy("mo").agg(
        F.sum(
            0.5 * (F.col("w") + F.col("wb")) * F.log(F.col("p") / F.col("pb"))
        ).alias("ln_tq"),
        F.sum(F.col("wb") * (F.col("p") / F.col("pb"))).alias("lasp"),
        F.sum(F.col("w") * (F.col("pb") / F.col("p"))).alias("ipaas"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )
    lasp_ch = F.exp(F.sum(F.log(F.col("lasp"))))
    paas_ch = F.exp(-F.sum(F.log(F.col("ipaas"))))
    return links.agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.sum("n_brands").cast("long").alias("n_pair_terms"),
        F.min("n_brands").cast("long").alias("min_common_brands"),
        F.round(F.exp(F.sum("ln_tq")), 4).alias("tornqvist_chained"),
        F.round(lasp_ch, 4).alias("laspeyres_chained"),
        F.round(paas_ch, 4).alias("paasche_chained"),
        F.round(F.sqrt(lasp_ch * paas_ch), 4).alias("fisher_chained"),
    )


@register(
    "events_exp_survival_mle",
    """
    WITH bounds AS (
        SELECT max(epoch_us(ts)) AS t_end FROM events
    ),
    u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS tp
        FROM events GROUP BY 1
    ),
    dur AS (
        SELECT CASE WHEN tp IS NOT NULL AND tp > t0 THEN 1 ELSE 0 END
                   AS converted,
               CASE WHEN tp IS NOT NULL AND tp > t0
                    THEN (tp - t0) // 1000000
                    ELSE (b.t_end - t0) // 1000000 END AS dur_sec
        FROM u, bounds b
        WHERE tp IS NULL OR tp > t0
    ),
    mle AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_events,
               CAST(sum(dur_sec) AS BIGINT) AS exposure_sec
        FROM dur
    )
    SELECT n_users, n_events, exposure_sec,
           round(CAST(n_events AS DOUBLE) / exposure_sec * 86400, 6)
               AS lambda_per_day,
           round(0.6931471805599453
                 / (CAST(n_events AS DOUBLE) / exposure_sec * 86400), 4)
               AS fitted_median_days,
           round(exposure_sec / CAST(n_events AS DOUBLE) / 86400, 4)
               AS mean_ttc_days,
           round(CAST(n_events AS DOUBLE) / n_users, 6) AS convert_share
    FROM mle
    """,
    tags=("events", "stats"),
)
def events_exp_survival_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential MLE of time-to-first-purchase with right
    censoring: users who never purchased (or whose first event IS
    the purchase — excluded as zero-duration by the pinned tp > t0
    rule) contribute exposure up to the corpus end; the censored
    MLE is the classic λ̂ = events / total exposure, whose inverse
    is the mean time-to-convert and ln2/λ̂ the fitted median —
    the one-parameter parametric twin of events_survival_km (which
    makes no shape assumption) and the model events_time_to_convert's
    exact empirical median can falsify. Durations are PURE INTEGER
    seconds (µs-floored); λ and the derived quantities are three
    float divisions.

    Scale shape: one 1-row corpus-end reduce, one per-user reduce,
    one broadcast-censoring projection, one 3-sum reduce."""
    e = tbl(spark, sf_dir, "events")
    bounds = e.agg(F.max(F.unix_micros("ts")).alias("t_end"))
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("tp"),
    )
    conv = F.col("tp").isNotNull() & (F.col("tp") > F.col("t0"))
    dur = (
        u.crossJoin(F.broadcast(bounds))
        .filter(F.col("tp").isNull() | (F.col("tp") > F.col("t0")))
        .select(
            F.when(conv, 1).otherwise(0).alias("converted"),
            F.when(
                conv, F.expr("div(tp - t0, 1000000)")
            )
            .otherwise(F.expr("div(t_end - t0, 1000000)"))
            .cast("long")
            .alias("dur_sec"),
        )
    )
    mle = dur.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_events"),
        F.sum("dur_sec").cast("long").alias("exposure_sec"),
    )
    lam = F.col("n_events").cast("double") / F.col("exposure_sec") * 86400
    return mle.select(
        "n_users",
        "n_events",
        "exposure_sec",
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(F.lit(0.6931471805599453) / lam, 4).alias(
            "fitted_median_days"
        ),
        F.round(
            F.col("exposure_sec") / F.col("n_events").cast("double") / 86400,
            4,
        ).alias("mean_ttc_days"),
        F.round(
            F.col("n_events").cast("double") / F.col("n_users"), 6
        ).alias("convert_share"),
    )
