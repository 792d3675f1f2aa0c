"""§2 extensions, fifty-seventh wave — FDR step-up, sequential drift,
a first-principles oracle-checkable HyperLogLog, and skew-safe top-k.

- events_bh_fdr: Benjamini–Hochberg step-UP false-discovery-rate
  control over the per-type weekend-effect z-tests — the power-side
  complement of events_holm_correction's familywise step-down.
- ts_page_hinkley: Page–Hinkley sequential drift detector over the
  per-type daily count series — the streaming-world mean-shift
  alarm next to ts_cusum_changepoint's retrospective scan.
- agg_hll_firstprin: HyperLogLog built from first principles on
  md5 bits shared with the oracle — the hash-exact twin of the
  rows-only engine-sketch entries (agg_approx_count_distinct,
  agg_hll_sketch_merge), with exact-distinct and error columns.
- win_topk_per_group_salted: exact top-k per group via the salted
  two-phase selection (partition-salted partial top-k, then final
  top-k over the bounded survivor set) — the skew-safe shape when
  one group dominates the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# two-sided BH step-up thresholds for m = 5 tests at FDR q = 0.05:
# z at (q·j/m)/2 for rank j = 1..5 — literals shared with the oracle
# so no inverse-normal function is needed in either engine
_BH_Z = [2.5758, 2.3263, 2.1701, 2.0537, 1.9600]

# Page–Hinkley magnitude/alarm parameters (literals shared with the
# oracle): delta absorbs drift smaller than ~5 events/day, lambda
# alarms once the cumulative excess tops 50
_PH_DELTA = 5.0
_PH_LAMBDA = 50.0

# HyperLogLog bias constant alpha_m for m = 256 registers:
# 0.7213 / (1 + 1.079/256) (Flajolet et al. 2007, Fig. 3)
_HLL_ALPHA_256 = 0.7182725932495458


@register(
    "events_bh_fdr",
    """
    WITH s AS (
        SELECT event_type,
               CAST(count(*) FILTER (dayofweek(CAST(ts AS DATE)) IN (0, 6))
                    AS BIGINT) AS n_we,
               CAST(count(*) FILTER (dayofweek(CAST(ts AS DATE))
                    NOT IN (0, 6)) AS BIGINT) AS n_wd
        FROM events GROUP BY event_type
    ),
    z AS (
        SELECT event_type, n_we, n_wd,
               (n_we - (n_we + n_wd) * 2.0 / 7)
               / sqrt((n_we + n_wd) * (2.0 / 7) * (5.0 / 7)) AS z
        FROM s
    ),
    ranked AS (
        SELECT event_type, n_we, n_wd, z,
               row_number() OVER (ORDER BY abs(z) DESC, event_type) AS rk
        FROM z
    ),
    dec AS (
        SELECT *, abs(z) > (BH_Z_LITERALS)[rk] AS passes_own
        FROM ranked
    )
    SELECT event_type, n_we, n_wd, round(z, 4) AS z, rk,
           CAST(max(CASE WHEN passes_own THEN 1 ELSE 0 END)
                OVER (ORDER BY rk
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BOOLEAN) AS rejected
    FROM dec ORDER BY rk
    """.replace(
        "BH_Z_LITERALS",
        "[" + ", ".join(repr(v) for v in _BH_Z) + "]",
    ),
    tags=("analytics", "stats"),
)
def events_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-UP FDR control (Benjamini & Hochberg
    1995) over the same per-type weekend-effect z-tests as
    events_holm_correction — the power-side complement: Holm's
    step-down controls familywise error (reject only while every
    stronger test passed), BH's step-up controls the false-discovery
    RATE (reject rank j if ANY rank ≥ j passes its own (q·j/m)/2
    threshold — a suffix-OR instead of Holm's prefix-AND), rejecting
    strictly more hypotheses at the same nominal level. The five
    thresholds are LITERALS shared with the oracle (no inverse-normal
    in either engine); z comes from exact integer counts in one
    fixed-order expression, so threshold compares are
    bit-deterministic; the suffix-OR is a running-max window over the
    m-row table (domain-bounded — on the single-partition window
    allowlist with events_holm_correction).

    Scale shape: one keyed conditional-count aggregate; everything
    after runs on m = |event_type| rows."""
    e = tbl(spark, sf_dir, "events")
    # Spark dayofweek: Sun=1, Sat=7; DuckDB dayofweek: Sun=0, Sat=6 —
    # both select the same weekend days
    is_we = F.dayofweek(F.to_date("ts")).isin(1, 7)
    s = e.groupBy("event_type").agg(
        F.count_if(is_we).cast("long").alias("n_we"),
        F.count_if(~is_we).cast("long").alias("n_wd"),
    )
    n = F.col("n_we") + F.col("n_wd")
    z = (F.col("n_we") - n * 2.0 / 7) / F.sqrt(n * (2.0 / 7) * (5.0 / 7))
    ranked = s.withColumn("z", z).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.abs(F.col("z")).desc(), "event_type")
        ),
    )
    thresholds = F.array(*[F.lit(v) for v in _BH_Z])
    dec = ranked.withColumn(
        "passes_own",
        F.abs(F.col("z")) > F.element_at(thresholds, F.col("rk")),
    )
    wsuffix = Window.orderBy("rk").rowsBetween(0, Window.unboundedFollowing)
    return dec.select(
        "event_type",
        "n_we",
        "n_wd",
        F.round("z", 4).alias("z"),
        "rk",
        F.max(F.when(F.col("passes_own"), 1).otherwise(0))
        .over(wsuffix)
        .cast("boolean")
        .alias("rejected"),
    ).orderBy("rk")


@register(
    "ts_page_hinkley",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    pre AS (
        SELECT event_type, day, cnt,
               row_number() OVER w AS i,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    dev AS (
        SELECT event_type, day, cnt,
               (cnt - CAST(s AS DOUBLE) / i - {_PH_DELTA!r}) AS a
        FROM pre
    ),
    mt AS (
        SELECT event_type, day, cnt,
               sum(a) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS m
        FROM dev
    ),
    ph AS (
        SELECT event_type, day, cnt, m,
               m - min(m) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS stat
        FROM mt
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
           round(m, 4) AS ph_cum, round(stat, 4) AS ph_stat,
           round(stat, 4) > {_PH_LAMBDA!r} AS drift
    FROM ph ORDER BY event_type, day
    """,
    tags=("timeseries", "stats"),
)
def ts_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential drift detector (Page 1954; Hinkley
    1971 — the standard concept-drift monitor in streaming-ML
    libraries) over each event type's daily count series:
    mₜ = Σ_{{i≤t}} (xᵢ − x̄ᵢ − δ) with x̄ᵢ the RUNNING prefix mean, and
    the alarm statistic PHₜ = mₜ − min_{{s≤t}} mₛ > λ — an upward mean
    shift makes m climb away from its historical minimum, unlike
    ts_cusum_changepoint's retrospective global-mean scan this needs
    only prefix state and is computable ONLINE. δ = 5 and λ = 50 are
    literals shared with the oracle; the prefix sums/counts are exact
    int64, each deviation is one fixed-order float expression, the
    cumulative sums accumulate in the same day order in both engines
    (the ts_cusum_changepoint precedent), and the drift flag compares
    the ROUNDED statistic so last-ulp drift cannot flip it.

    Scale shape: the fact table reduces to the per-type day aggregate
    in one keyed shuffle; all three windows partition by event_type
    over the calendar-bounded day axis."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wrow = Window.partitionBy("event_type").orderBy("day")
    wcum = wrow.rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "event_type",
        "day",
        "cnt",
        F.row_number().over(wrow).alias("i"),
        F.sum("cnt").over(wcum).cast("long").alias("s"),
    )
    dev = pre.withColumn(
        "a",
        F.col("cnt") - F.col("s").cast("double") / F.col("i") - _PH_DELTA,
    )
    mt = dev.withColumn("m", F.sum("a").over(wcum))
    ph = mt.withColumn("stat", F.col("m") - F.min("m").over(wcum))
    return ph.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        F.round("m", 4).alias("ph_cum"),
        F.round("stat", 4).alias("ph_stat"),
        (F.round("stat", 4) > _PH_LAMBDA).alias("drift"),
    ).orderBy("event_type", "day")


@register(
    "agg_hll_firstprin",
    f"""
    WITH h AS (
        SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ),
    br AS (
        SELECT from_hex(substr(hx, 1, 2))::BIT::INT AS bucket,
               CASE WHEN w = 0 THEN 33
                    ELSE 33 - length(ltrim(bin(w), '0')) END AS rho
        FROM (
            SELECT hx,
                   CAST(CASE WHEN v < 0 THEN v + 4294967296 ELSE v END
                        AS BIGINT) AS w
            FROM (SELECT hx, from_hex(substr(hx, 3, 8))::BIT::INT AS v
                  FROM h)
        )
    ),
    regs AS (
        SELECT bucket, CAST(max(rho) AS BIGINT) AS mreg
        FROM br GROUP BY bucket
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_regs,
               sum(1.0 / power(2.0, mreg)) AS z_present
        FROM regs
    ),
    est AS (
        SELECT 256 - n_regs AS v_zero,
               CAST({_HLL_ALPHA_256!r} AS DOUBLE) * 65536.0
                   / (z_present + (256 - n_regs)) AS e_raw
        FROM st
    ),
    fin AS (
        SELECT v_zero,
               CASE WHEN e_raw <= 640.0 AND v_zero > 0
                    THEN 256.0 * ln(256.0 / v_zero)
                    ELSE e_raw END AS estimate
        FROM est
    ),
    ex AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events
    )
    SELECT CAST(256 AS BIGINT) AS m, n_exact, v_zero,
           round(estimate, 4) AS estimate,
           round((estimate - n_exact) / n_exact, 4) AS rel_err,
           abs(round(estimate, 4) - n_exact) <= 0.195 * n_exact
               AS within_3sigma
    FROM fin CROSS JOIN ex
    """,
    tags=("aggregate", "sketch"),
)
def agg_hll_firstprin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from first principles (Flajolet–Furic–Gandouet–
    Meunier 2007), built on md5 bits SHARED with the oracle so the
    whole sketch is hash-exact — the oracle-checkable twin of the
    rows-only engine-sketch entries (agg_approx_count_distinct /
    agg_hll_sketch_merge, whose internal HLL++ bit layouts are
    engine-private): bucket = first 8 hash bits (m = 256 registers),
    ρ = leading-zero rank of the next 32 bits (via the shared
    minimal-bin() device — both engines print integers without
    leading zeros, so ρ = 33 − len(ltrim(bin(w),'0')), 33 for w = 0),
    register = max ρ per bucket, E = α₂₅₆·m²/Σ2^(−Mⱼ) with the
    Flajolet small-range linear-counting correction m·ln(m/V) when
    E ≤ 2.5m and V = empty registers > 0. The 2^(−M) terms are exact
    binary fractions whose sum fits a double mantissa (≤2⁹ values
    spanning 2⁰..2^(−33)), so Σ is order-independent and
    bit-identical across engines; α₂₅₆ is a shared literal; the
    hex→int parse normalizes DuckDB's signed-32 BIT cast against
    Spark's unsigned conv(,16,10). Columns report the exact distinct
    alongside estimate, relative error and the 3σ·(1.04/√m) sanity
    flag (on the ROUNDED estimate, so ulp drift in ln cannot flip
    it).

    Scale shape: one map-side-combined 256-group aggregate + a 1-row
    reduce — the mergeability that makes HLL the distributed-distinct
    workhorse is the max-per-register step, which Spark's partial
    aggregation performs on every partition before the 256-key
    shuffle. The exact-distinct column is the expensive side
    (full shuffle of the key domain) and exists to price the sketch;
    drop it at 100 TB."""
    e = tbl(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    w = F.conv(F.substring(hx, 3, 8), 16, 10).cast("bigint")
    br = e.select(
        F.conv(F.substring(hx, 1, 2), 16, 10).cast("int").alias("bucket"),
        F.when(w == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.ltrim(F.bin(w), F.lit("0"))))
        .cast("bigint")
        .alias("rho"),
    )
    regs = br.groupBy("bucket").agg(F.max("rho").cast("long").alias("mreg"))
    st = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("mreg"))).alias(
            "z_present"
        ),
    )
    est = st.select(
        (F.lit(256) - F.col("n_regs")).alias("v_zero"),
        (
            F.lit(_HLL_ALPHA_256)
            * 65536.0
            / (F.col("z_present") + (F.lit(256) - F.col("n_regs")))
        ).alias("e_raw"),
    )
    fin = est.select(
        "v_zero",
        F.when(
            (F.col("e_raw") <= 640.0) & (F.col("v_zero") > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("v_zero")),
        )
        .otherwise(F.col("e_raw"))
        .alias("estimate"),
    )
    ex = e.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return fin.crossJoin(F.broadcast(ex)).select(
        F.lit(256).cast("long").alias("m"),
        "n_exact",
        "v_zero",
        F.round("estimate", 4).alias("estimate"),
        F.round(
            (F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
        (
            F.abs(F.round("estimate", 4) - F.col("n_exact"))
            <= 0.195 * F.col("n_exact")
        ).alias("within_3sigma"),
    )


@register(
    "win_topk_per_group_salted",
    """
    SELECT event_type, event_id, value, rk
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC NULLS LAST,
                                           event_id) AS rk
        FROM events
    ) t
    WHERE rk <= 3
    ORDER BY event_type, rk
    """,
    tags=("window", "topk"),
)
def win_topk_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 per event type via the SALTED two-phase selection:
    phase 1 ranks within (group, input-partition-id) — the salt
    spreads even a single dominant group across every core instead of
    funneling the whole corpus through one window partition — and
    keeps ≤ k rows per (group, salt); phase 2 ranks the surviving
    ≤ k·partitions rows per group exactly. Lossless by the standard
    two-phase argument: each true global top-k row lives in some
    input partition and is within that partition's group top-k, so
    phase 1 never discards a winner; the salt value itself never
    affects the OUTPUT (any partitioning yields the same survivors'
    superset), so the nondeterministic spark_partition_id is safe
    here — the oracle is the plain one-window top-k. Both phases
    order by (value DESC NULLS LAST, event_id), so ties are
    deterministic. This is the shape to reach for when one group
    dominates (the naive single window sorts the dominant group on
    one task; the salted form is maximally parallel and its phase-2
    input is bounded by k·partitions·|groups| — thousands of rows at
    ANY corpus scale).

    Scale shape: one shuffle by (group, salt), one bounded shuffle by
    group."""
    e = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")
    k = 3
    salted = e.withColumn("_salt", F.spark_partition_id())
    w1 = Window.partitionBy("event_type", "_salt").orderBy(
        F.col("value").desc_nulls_last(), "event_id"
    )
    survivors = (
        salted.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_salt", "_rk1")
    )
    w2 = Window.partitionBy("event_type").orderBy(
        F.col("value").desc_nulls_last(), "event_id"
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("event_type", "event_id", "value", "rk")
        .orderBy("event_type", "rk")
    )
