"""§2 extensions, hundred-eighth wave — actuarial credibility and the
QUALIFY clause.

- customers_buhlmann_credibility: Bühlmann credibility (1967) — the
  actuarial blend between a segment's own experience and the
  portfolio mean, weighted by how much of the variance is true signal
  (the continuous-outcome sibling of customers_eb_shrinkage's
  beta-binomial prior).
- sql_qualify: the QUALIFY clause (window-function filtering), which
  Spark 4.1 does not parse (verified) — emulated with the
  subquery-then-filter rewrite every QUALIFY desugars to, proven
  against DuckDB's NATIVE QUALIFY (the win_groups_frame engine-gap
  device).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "customers_buhlmann_credibility",
    """
    WITH v AS (
        SELECT c.c_mktsegment AS seg,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS q
        FROM v GROUP BY 1
    ),
    comp AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nt,
               CAST(sum(s) AS BIGINT) AS st,
               sum(q - CAST(s AS DOUBLE) * s / n) AS ssw,
               sum(CAST(s AS DOUBLE) * s / n) AS ssb_part,
               CAST(sum(CAST(n AS HUGEINT) * n) AS BIGINT) AS sn2
        FROM g
    ),
    parts AS (
        SELECT k, nt, st,
               ssw / (nt - k) AS ev,
               ((ssb_part - CAST(st AS DOUBLE) * st / nt) / (k - 1)
                - ssw / (nt - k))
               / ((CAST(nt AS DOUBLE) - CAST(sn2 AS DOUBLE) / nt)
                  / (k - 1)) AS vhm
        FROM comp
    )
    SELECT g.seg AS segment, g.n AS n_orders,
           round(CAST(g.s AS DOUBLE) / g.n / 100, 4) AS seg_mean,
           round(CAST(p.st AS DOUBLE) / p.nt / 100, 4) AS grand_mean,
           round(g.n / (g.n + p.ev / p.vhm), 6) AS z,
           round((g.n / (g.n + p.ev / p.vhm))
                     * (CAST(g.s AS DOUBLE) / g.n / 100)
                 + (1.0 - g.n / (g.n + p.ev / p.vhm))
                     * (CAST(p.st AS DOUBLE) / p.nt / 100), 4)
               AS credibility_premium
    FROM g CROSS JOIN parts p
    ORDER BY segment
    """,
    tags=("analytics", "stats"),
)
def customers_buhlmann_credibility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bühlmann credibility (1967) of mean order value per market
    segment — the actuarial answer to "how much should this
    segment's own experience count vs the portfolio?": Z =
    n/(n + K) with K = EV/VHM, where EV (expected process variance)
    and VHM (variance of hypothetical means) come from the one-way
    variance decomposition with the unbalanced Searle k₀ (the
    agg_icc_oneway machinery re-pointed at premium setting). The
    credibility premium Z·seg_mean + (1−Z)·grand_mean is what a
    rate-maker actually charges. Z is a ratio of same-noise variance
    components (summation-order float noise cancels to ~1e-13
    absolute — the ICC lesson), and the premiums are dollar-scale
    with 1e-8 absolute noise, both far inside their rounds.

    Scale shape: one broadcast dim join + keyed reduce to 5 segment
    rows, a 1-row component reduce broadcast back."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    v = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = v.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("q"),
    )
    comp = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.sum(
            F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("ssw"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
            "ssb_part"
        ),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
        .cast("long")
        .alias("sn2"),
    )
    parts = comp.select(
        "nt",
        "st",
        (F.col("ssw") / (F.col("nt") - F.col("k"))).alias("ev"),
        (
            (
                (
                    F.col("ssb_part")
                    - F.col("st").cast("double") * F.col("st") / F.col("nt")
                )
                / (F.col("k") - 1)
                - F.col("ssw") / (F.col("nt") - F.col("k"))
            )
            / (
                (
                    F.col("nt").cast("double")
                    - F.col("sn2").cast("double") / F.col("nt")
                )
                / (F.col("k") - 1)
            )
        ).alias("vhm"),
    )
    j = g.crossJoin(F.broadcast(parts))
    z = F.col("n") / (F.col("n") + F.col("ev") / F.col("vhm"))
    seg_mean = F.col("s").cast("double") / F.col("n") / 100
    grand = F.col("st").cast("double") / F.col("nt") / 100
    return j.select(
        F.col("seg").alias("segment"),
        F.col("n").alias("n_orders"),
        F.round(seg_mean, 4).alias("seg_mean"),
        F.round(grand, 4).alias("grand_mean"),
        F.round(z, 6).alias("z"),
        F.round(z * seg_mean + (1.0 - z) * grand, 4).alias(
            "credibility_premium"
        ),
    ).orderBy("segment")


@register(
    "sql_qualify",
    """
    SELECT c_mktsegment,
           c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    ORDER BY c_mktsegment, bal_cents DESC, c_custkey
    """,
    tags=("sql",),
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUALIFY clause — filtering on a window function without a
    subquery (Teradata heritage, now in DuckDB/Snowflake/BigQuery) —
    which Spark 4.1 does not parse (PARSE_SYNTAX_ERROR, verified on
    this build). Emulated with the exact rewrite QUALIFY desugars
    to: compute the window column in a derived relation, filter on
    it, project it away. The oracle runs DuckDB's NATIVE QUALIFY, so
    the emulation's semantics (filter applies AFTER windowing, on
    the full partition) are held by an engine that implements the
    real clause — the win_groups_frame engine-gap device. Query:
    top-3 customers by account balance per market segment.

    Scale shape: one keyed window partitioned by segment, one
    filter; the window input is the full dim table (the §2.E
    win_row_number_topk shape)."""
    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            (dec2("c_acctbal") * 100).cast("long").alias("bal_cents"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
        .orderBy(
            "c_mktsegment", F.col("bal_cents").desc(), "c_custkey"
        )
    )
