"""§2 extensions, hundred-second wave — dependent-test FDR, reliability
ICC, and deterministic PPS sampling.

- events_by_fdr: Benjamini–Yekutieli step-up FDR — the
  arbitrary-dependence-safe variant that completes the multiplicity
  panel (Holm FWER → BH independent-FDR → BY dependent-FDR).
- agg_icc_oneway: the one-way intraclass correlation ICC(1,1)
  (Shrout-Fleiss 1979) — how much of order-value variance is
  BETWEEN customers, the reliability number behind clustered-design
  effects (the agg_kish_design_effect companion).
- agg_pps_systematic: deterministic systematic
  probability-proportional-to-size sampling (the Madow 1949 method
  every survey/ETL sampler uses for value-weighted audits) — made
  hash-matched by the block-ranked cumulative-cents selection rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

#: two-sided z cut points for BY at q = 0.05, m = 5: Φ⁻¹(1 −
#: (q·j/(m·H_m))/2) with the harmonic penalty H₅ = 1+…+1/5 =
#: 2.28333… (Benjamini-Yekutieli 2001 Thm 1.3) — precomputed
#: literals shared textually with the oracle (the events_bh_fdr
#: device; neither engine has an inverse normal).
_BY_Z = [2.8494, 2.6213, 2.48, 2.3756, 2.2921]


@register(
    "events_by_fdr",
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
        SELECT *, abs(z) > (BY_Z_LITERALS)[rk] AS passes_own
        FROM ranked
    )
    SELECT event_type, n_we, n_wd, round(z, 4) AS z, rk,
           CAST(max(CASE WHEN passes_own THEN 1 ELSE 0 END)
                OVER (ORDER BY rk
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BOOLEAN) AS rejected
    FROM dec ORDER BY rk
    """.replace(
        "BY_Z_LITERALS",
        "[" + ", ".join(repr(v) for v in _BY_Z) + "]",
    ),
    tags=("analytics", "stats"),
)
def events_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Yekutieli step-up FDR (2001) over the per-type
    weekend-effect z-tests — completing the multiplicity panel:
    Holm (events_holm_correction) controls familywise error under
    ANY dependence, BH (events_bh_fdr) controls FDR under
    independence/PRDS, BY controls FDR under ARBITRARY dependence by
    paying the harmonic penalty H_m = Σ1/i (≈ log m + γ): each rank
    threshold shrinks from q·j/m to q·j/(m·H_m). The five z cut
    points are precomputed literals shared textually with the oracle
    (no inverse normal in either engine); the suffix-OR rejection is
    the BH running-max device over the m = |event_type| row table
    (domain-bounded, allowlisted with events_bh_fdr). On the fixture
    BY necessarily rejects a SUBSET of BH's rejections — the
    conservativeness is the point.

    Scale shape: one keyed conditional-count aggregate; everything
    after runs on m = 5 rows."""
    e = tbl(spark, sf_dir, "events")
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
    thresholds = F.array(*[F.lit(v) for v in _BY_Z])
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
    "agg_icc_oneway",
    """
    WITH v AS (
        SELECT o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    g AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS ni,
               CAST(sum(cents) AS BIGINT) AS si
        FROM v GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ni) AS BIGINT) AS n,
               CAST(sum(si) AS BIGINT) AS s,
               sum(CAST(si AS DOUBLE) * si / ni) AS ssb_part,
               CAST(sum(CAST(ni AS HUGEINT) * ni) AS BIGINT) AS sn2
        FROM g
    ),
    q AS (
        SELECT CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS sq
        FROM v
    ),
    parts AS (
        SELECT k, n,
               (ssb_part - CAST(s AS DOUBLE) * s / n) / (k - 1) AS msb,
               (sq - ssb_part) / (n - k) AS msw,
               (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / n) / (k - 1)
                   AS k0
        FROM m CROSS JOIN q
    )
    SELECT k AS n_customers, n AS n_orders,
           round(k0, 4) AS k0,
           round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc,
           msb > msw AS clustered
    FROM parts
    """,
    tags=("aggregate", "stats"),
)
def agg_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way intraclass correlation ICC(1,1) (Shrout & Fleiss 1979)
    of order value within customers — the fraction of total variance
    that lives BETWEEN customers, i.e. how strongly orders cluster by
    who placed them. Unbalanced-design form: MSB and MSW from exact
    integer moments (Σ within-group s²/n via one double division per
    group, total SS in HUGEINT→double), with the ANOVA estimator's
    adjusted group size k₀ = (N − Σn_i²/N)/(k−1) (Searle 1971), then
    ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW). Only the SCALE-FREE
    outputs are emitted: the Σs_i²/n_i float sum is
    summation-order-dependent at ~1e-13 relative across engines,
    which at the raw mean squares' 1e10 magnitude overwhelms any
    useful rounding, while in the ICC ratio the noise cancels to
    ~1e-13 ABSOLUTE — round(6) is then a huge margin. This is the
    design-effect
    ingredient: Kish's deff ≈ 1 + (k̄−1)·ICC — the
    agg_kish_design_effect companion that tells a sampler how much
    clustering by customer costs. The ``clustered`` verdict MSB >
    MSW is one double comparison in fixed order.

    Scale shape: one keyed reduce per customer, one 1-row moment
    reduce, one 1-row raw-SS reduce — no window, no join wider than
    1 row."""
    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        "o_custkey", (dec2("o_totalprice") * 100).cast("long").alias("cents")
    )
    g = v.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("cents").cast("long").alias("si"),
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("si").cast("long").alias("s"),
        F.sum(
            F.col("si").cast("double") * F.col("si") / F.col("ni")
        ).alias("ssb_part"),
        F.sum(F.col("ni").cast("decimal(38,0)") * F.col("ni"))
        .cast("long")
        .alias("sn2"),
    )
    q = v.agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("sq")
    )
    parts = m.crossJoin(F.broadcast(q)).select(
        "k",
        "n",
        (
            (F.col("ssb_part") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("k") - 1)
        ).alias("msb"),
        ((F.col("sq") - F.col("ssb_part")) / (F.col("n") - F.col("k"))).alias(
            "msw"
        ),
        (
            (F.col("n").cast("double") - F.col("sn2").cast("double") / F.col("n"))
            / (F.col("k") - 1)
        ).alias("k0"),
    )
    return parts.select(
        F.col("k").alias("n_customers"),
        F.col("n").alias("n_orders"),
        F.round("k0", 4).alias("k0"),
        F.round(
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("k0") - 1) * F.col("msw")),
            6,
        ).alias("icc"),
        (F.col("msb") > F.col("msw")).alias("clustered"),
    )


@register(
    "agg_pps_systematic",
    """
    WITH v AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    c AS (
        SELECT o_orderkey, cents,
               CAST(sum(cents) OVER (ORDER BY o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM v
    ),
    t AS (
        SELECT CAST(sum(cents) AS BIGINT) AS total,
               CAST(sum(cents) AS BIGINT) // 1000 AS step
        FROM v
    ),
    sel AS (
        SELECT o_orderkey, cents, cum, t.step,
               cum // t.step - (cum - cents) // t.step AS hits
        FROM c CROSS JOIN t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (hits > 0) AS BIGINT) AS n_selected,
           CAST(max(step) AS BIGINT) AS step_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN hits > 0 THEN cents ELSE 0 END) AS BIGINT)
               AS selected_cents,
           CAST(sum(hits) AS BIGINT) AS n_draws
    FROM sel
    """,
    tags=("aggregate", "sampling"),
)
def agg_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949) — the value-weighted audit sampler (monetary-unit sampling
    in audit practice): lay every order's cents on a cumulative
    line, walk it with a fixed step = total/1000, and select each
    order whose cumulative interval contains a step boundary
    (``hits`` = boundaries inside (cum−cents, cum] — an order larger
    than the step is drawn multiple times, the defining PPS
    property). Deterministic (origin at 0, key-ordered line) so the
    whole selection is hash-matched; inclusion probability is
    exactly min(1, cents·1000/total) per draw. The cumulative line
    is the BLOCK-RANKED keyed cumsum core — no global window, no
    RNG (the seeded variant shifts the origin by a uniform; this is
    the reproducible-audit form).

    Scale shape: block-ranked cumsum over orders, a 1-row total
    broadcast, one summary reduce."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    o = tbl(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey", (dec2("o_totalprice") * 100).cast("long").alias("cents")
    )
    c = exact_global_keyed_cumsum(v, "o_orderkey", "cents", "o_orderkey", "cum")
    # integer `div` end-to-end: double division of the cumulative
    # line would lose exactness past 2^53 cents
    t = v.agg(F.sum("cents").cast("long").alias("total")).select(
        "total", F.expr("total div 1000").alias("step")
    )
    sel = c.crossJoin(F.broadcast(t)).select(
        "cents",
        "step",
        F.expr("cum div step - (cum - cents) div step").alias("hits"),
    )
    return sel.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_if(F.col("hits") > 0).cast("long").alias("n_selected"),
        F.max("step").cast("long").alias("step_cents"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("hits") > 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("selected_cents"),
        F.sum("hits").cast("long").alias("n_draws"),
    )
