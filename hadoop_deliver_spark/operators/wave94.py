"""§2 extensions, ninety-fourth wave — completing the SPC panel: the
attribute chart and process capability (ts_shewhart_xbar covers the
variables chart, events_cusum/page_hinkley the sequential side).

- events_c_chart: the Shewhart c-chart (attribute control chart) on
  daily event counts — Poisson-based 3σ limits, FULLY exact
  out-of-control flags.
- agg_process_capability: Cp / Cpk (the 1980s SPC capability
  indices) for order value against literal spec limits — how many
  "sigmas" of margin the process has inside its specification, with
  exact defect counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# cent spec limits for order value: LSL $100, USL $500,000 — literals
# shared textually by both engines (a real TPC-H order book violates
# the USL occasionally, so the capability story is non-degenerate)
_LSL = 10_000
_USL = 50_000_000


@register(
    "events_c_chart",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
        FROM daily
    ),
    flags AS (
        SELECT d.day, d.c, t.n, t.s,
               CAST(t.n AS HUGEINT) * d.c > t.s
               AND CAST(CAST(t.n AS HUGEINT) * d.c - t.s AS HUGEINT)
                   * (CAST(t.n AS HUGEINT) * d.c - t.s)
                   > 9 * CAST(t.n AS HUGEINT) * t.s AS high,
               CAST(t.n AS HUGEINT) * d.c < t.s
               AND CAST(t.s - CAST(t.n AS HUGEINT) * d.c AS HUGEINT)
                   * (t.s - CAST(t.n AS HUGEINT) * d.c)
                   > 9 * CAST(t.n AS HUGEINT) * t.s AS low
        FROM daily d CROSS JOIN tot t
    )
    SELECT max(n) AS n_days,
           round(CAST(max(s) AS DOUBLE) / max(n), 4) AS c_bar,
           round(CAST(max(s) AS DOUBLE) / max(n)
                 + 3 * sqrt(CAST(max(s) AS DOUBLE) / max(n)), 4) AS ucl,
           CAST(count(*) FILTER (high) AS BIGINT) AS n_above_ucl,
           CAST(count(*) FILTER (low) AS BIGINT) AS n_below_lcl,
           min(CASE WHEN high OR low THEN day END) AS first_ooc_day,
           count(*) FILTER (high OR low) = 0 AS in_control
    FROM flags
    """,
    tags=("events", "stats"),
)
def events_c_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart c-chart (the Poisson attribute control chart) on
    daily event counts: centerline c̄ = S/n, limits c̄ ± 3√c̄ — the
    count-data member of the SPC panel beside ts_shewhart_xbar
    (variables chart) and events_cusum / events_page_hinkley
    (sequential detectors). A day is out of control above when
    c > c̄ + 3√c̄, which clears ALL irrationals exactly: n·c > S AND
    (n·c − S)² > 9·n·S (multiply by n², square — the sign guard
    replaces the √; the low side mirrors it), so every flag, the
    violation counts, the first out-of-control day, and the
    in_control verdict are PURE-INTEGER decisions in
    DECIMAL(38)/HUGEINT. Only the displayed centerline/UCL are
    (exact-integer-ratio) doubles.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, a 1-row total broadcast, a bounded flag scan + 1-row
    reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    j = daily.crossJoin(F.broadcast(tot))
    n38 = F.col("n").cast("decimal(38,0)")
    dev = n38 * F.col("c") - F.col("s")
    high = (dev > 0) & (dev * dev > 9 * n38 * F.col("s"))
    low = (dev < 0) & (dev * dev > 9 * n38 * F.col("s"))
    flags = j.select("day", "c", "n", "s", high.alias("high"), low.alias("low"))
    return flags.agg(
        F.max("n").alias("n_days"),
        F.round(F.max("s").cast("double") / F.max("n"), 4).alias("c_bar"),
        F.round(
            F.max("s").cast("double") / F.max("n")
            + 3 * F.sqrt(F.max("s").cast("double") / F.max("n")),
            4,
        ).alias("ucl"),
        F.count_if(F.col("high")).cast("long").alias("n_above_ucl"),
        F.count_if(F.col("low")).cast("long").alias("n_below_lcl"),
        F.min(
            F.when(F.col("high") | F.col("low"), F.col("day"))
        ).alias("first_ooc_day"),
        (F.count_if(F.col("high") | F.col("low")) == 0).alias(
            "in_control"
        ),
    )


@register(
    "agg_process_capability",
    f"""
    WITH base AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q,
               CAST(count(*) FILTER (cents < {_LSL}) AS BIGINT)
                   AS n_below,
               CAST(count(*) FILTER (cents > {_USL}) AS BIGINT)
                   AS n_above
        FROM base
    ),
    c AS (
        SELECT n, s, q, n_below, n_above,
               CAST(CAST(n AS HUGEINT) * q
                    - CAST(s AS HUGEINT) * s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS var_,
               LEAST(CAST(n AS HUGEINT) * {_USL} - s,
                     CAST(s AS HUGEINT) - CAST(n AS HUGEINT) * {_LSL})
                   AS minside,
               CAST(s AS DOUBLE) / n AS mu
        FROM m
    )
    SELECT n AS n_orders, n_below, n_above,
           round(mu, 2) AS mean_cents,
           round(({_USL} - {_LSL}) / (6 * sqrt(var_)), 4) AS cp,
           round(CAST(minside AS DOUBLE) / n / (3 * sqrt(var_)), 4)
               AS cpk,
           minside > 0
               AND CAST(minside AS DOUBLE) * CAST(minside AS DOUBLE)
                   * (n - 1)
                   > 9.0 * n * CAST(CAST(n AS HUGEINT) * q
                                    - CAST(s AS HUGEINT) * s AS DOUBLE)
               AS capable
    FROM c
    """,
    tags=("agg", "stats"),
)
def agg_process_capability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Process capability Cp / Cpk (the Motorola/Six-Sigma SPC
    indices) for order value against the literal cent specification
    [LSL = $100, USL = $500,000]: Cp = (USL−LSL)/(6σ̂) is the
    POTENTIAL capability (spec width in process widths), Cpk =
    min(USL−μ̂, μ̂−LSL)/(3σ̂) the REALIZED capability (the nearer
    spec edge in half-widths) — Cpk < Cp measures off-centering, and
    the exact out-of-spec counts ship alongside (what capability
    predicts, defects confirm). Moments are exact (n, S, Q)
    DECIMAL(38)/HUGEINT; the nearer-edge numerator min(n·USL−S,
    S−n·LSL) is an EXACT integer via the n-clearing, and the
    capable verdict Cpk ≥ 1 squares it against 9·n·B/(n−1) (B =
    nΣy²−S², the n-scaled SS) with one double cast per factor in
    fixed textual order (minside² would burst DECIMAL(38) around
    sf100) and the sign guard minside > 0. Displays are fixed-order
    doubles.

    Scale shape: ONE keyed reduce over orders to a 1-row moment +
    defect-count record — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"))
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
        F.count_if(F.col("cents") < _LSL).cast("long").alias("n_below"),
        F.count_if(F.col("cents") > _USL).cast("long").alias("n_above"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    n38 = n.cast("decimal(38,0)")
    b = (n38 * q - s.cast("decimal(38,0)") * s).cast("double")
    var_ = b / (n.cast("double") * (n - 1))
    minside = F.least(
        n38 * _USL - s, s.cast("decimal(38,0)") - n38 * _LSL
    )
    return m.select(
        n.alias("n_orders"),
        "n_below",
        "n_above",
        F.round(s.cast("double") / n, 2).alias("mean_cents"),
        F.round((_USL - _LSL) / (6 * F.sqrt(var_)), 4).alias("cp"),
        F.round(
            minside.cast("double") / n / (3 * F.sqrt(var_)), 4
        ).alias("cpk"),
        (
            (minside > 0)
            & (
                minside.cast("double") * minside.cast("double") * (n - 1)
                > 9.0 * n * b
            )
        ).alias("capable"),
    )
