"""§2 extensions, fiftieth wave — diversity profiles, seasonality
strength, merge-join hints, and compressibility quality scoring.

- agg_hill_diversity: the Hill-number diversity profile (q = 0, 1,
  2) of each nation's purchased-brand distribution — richness,
  exp(Shannon), inverse-Simpson on one exact count table.
- ts_seasonal_strength: Hyndman's seasonal/trend strength measures
  from the classical decomposition — the one-row-per-series answer
  to "is this series actually seasonal?".
- join_hint_merge: the MERGE (sort-merge) join hint — the §2.C
  strategy-pinning surface next to join_hint_shuffle_hash.
- llm_compression_ratio: zlib compressibility per document — the
  classic boilerplate/repetition quality signal (rows-only: no SQL
  engine exposes a bit-identical deflate twin).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "agg_hill_diversity",
    """
    WITH cnt AS (
        SELECT n.n_name, p.p_brand, CAST(count(*) AS BIGINT) AS c
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = cu.c_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT n_name, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1)
    SELECT c.n_name,
           CAST(count(*) AS BIGINT) AS q0_richness,
           round(exp(-sum((CAST(c.c AS DOUBLE) / t.t)
                          * ln(CAST(c.c AS DOUBLE) / t.t))), 4)
               AS q1_shannon,
           round(1.0 / sum((CAST(c.c AS DOUBLE) / t.t)
                           * (CAST(c.c AS DOUBLE) / t.t)), 4)
               AS q2_simpson
    FROM cnt c JOIN tot t USING (n_name)
    GROUP BY c.n_name ORDER BY c.n_name
    """,
    tags=("aggregate", "stats"),
)
def agg_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill-number diversity profile (Hill 1973; the ecology standard
    MacArthur→Jost lineage) of each nation's purchased-brand mix:
    q=0 richness (brands present), q=1 exp(Shannon) ("effective
    brands", weighing by share), q=2 inverse Simpson (dominance-
    weighted) — read together they say whether a market is broad,
    balanced, or captured, and the same triple profiles corpus
    source mixes. Counts exact int64; shares are correctly-rounded
    divisions; the Σ p·ln p / Σ p² reduces are round-4 display
    (theil convention).

    Scale shape: star joins with broadcast dims, one (nation,
    brand) keyed aggregate, totals re-aggregated FROM it."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cnt = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n), cu["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("n_name", "p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cnt.groupBy("n_name").agg(F.sum("c").cast("long").alias("t"))
    share = F.col("c").cast("double") / F.col("t")
    return (
        cnt.join(F.broadcast(tot), "n_name")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("q0_richness"),
            F.round(F.exp(-F.sum(share * F.log(share))), 4).alias(
                "q1_shannon"
            ),
            F.round(1.0 / F.sum(share * share), 4).alias("q2_simpson"),
        )
        .orderBy("n_name")
    )


@register(
    "ts_seasonal_strength",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tr AS (
        SELECT event_type, day, c,
               CAST(dayofweek(day) AS INT) AS dow,
               CASE WHEN count(*) OVER win = 7
                    THEN CAST(sum(c) OVER win AS DOUBLE) / 7 END AS trend
        FROM d
        WINDOW win AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
        SELECT event_type, dow, avg(c - trend) AS seasonal
        FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2
    ),
    parts AS (
        SELECT t.event_type, t.c, t.trend, s.seasonal,
               t.c - t.trend - s.seasonal AS remainder
        FROM tr t JOIN seas s
          ON s.event_type = t.event_type AND s.dow = t.dow
        WHERE t.trend IS NOT NULL
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(greatest(0.0, 1.0 - var_pop(remainder)
                               / var_pop(seasonal + remainder)), 4)
               AS seasonal_strength,
           round(greatest(0.0, 1.0 - var_pop(remainder)
                               / var_pop(trend + remainder)), 4)
               AS trend_strength
    FROM parts GROUP BY event_type ORDER BY event_type
    """,
    tags=("timeseries",),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend strength (Hyndman & Athanasopoulos, FPP:
    F_s = max(0, 1 − Var(R)/Var(S+R)), F_t likewise against the
    trend) computed from the classical decomposition — the one-row
    answer to "is this series actually seasonal/trending, and how
    much?", which gates whether a forecaster should fit seasonal
    terms at all. Components re-derive exactly as in
    ts_classical_decompose; the var_pop reduces run over the
    calendar-bounded axis (round-4 display).

    Scale shape: identical to ts_classical_decompose plus two
    variance reduces per type."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    win = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "event_type",
        "day",
        "c",
        F.dayofweek("day").cast("int").alias("dow"),
        F.when(
            F.count(F.lit(1)).over(win) == 7,
            F.sum("c").over(win).cast("double") / 7,
        ).alias("trend"),
    ).filter(F.col("trend").isNotNull())
    seas = tr.groupBy("event_type", "dow").agg(
        F.avg(F.col("c") - F.col("trend")).alias("seasonal")
    )
    parts = tr.join(seas, ["event_type", "dow"]).select(
        "event_type",
        "c",
        "trend",
        "seasonal",
        (F.col("c") - F.col("trend") - F.col("seasonal")).alias("remainder"),
    )
    return (
        parts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0
                    - F.var_pop("remainder")
                    / F.var_pop(F.col("seasonal") + F.col("remainder")),
                ),
                4,
            ).alias("seasonal_strength"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0
                    - F.var_pop("remainder")
                    / F.var_pop(F.col("trend") + F.col("remainder")),
                ),
                4,
            ).alias("trend_strength"),
        )
        .orderBy("event_type")
    )


@register(
    "join_hint_merge",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS REAL) AS total
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    tags=("join",),
)
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE (sort-merge) join hint — pinning the strategy the
    planner would otherwise choose by stats: for two LARGE sides a
    sort-merge join spills gracefully where a shuffled hash join's
    build side must fit per-task memory, so at 100 TB fact-fact
    scale MERGE is the explicit safe harbor (the strategy-pinning
    twin of join_hint_shuffle_hash; broadcast hints cover the small-
    side case). The hint is observable in the plan as
    SortMergeJoin; results are strategy-invariant by definition —
    which is exactly what the oracle checks.

    Scale shape: one sort-merge join on the customer key, one
    segment aggregate."""
    from hadoop_deliver_spark.tables import dec2

    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").hint("merge")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(dec2("o_totalprice"))
            .cast("double")
            .cast("float")
            .alias("total"),
        )
        .orderBy("c_mktsegment")
    )


@register("llm_compression_ratio", None)  # rows-only: no SQL deflate twin
def llm_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compressibility per document — the classic boilerplate/
    repetition quality signal (low ratio = templated or repeated
    content; the Gopher-era pipelines filter on exactly this because
    a compressor is the cheapest universal repetition detector).
    Computed in an Arrow-batched pandas UDF (zlib level 6,
    deterministic for a given zlib build — but no SQL engine exposes
    a bit-identical deflate, so this is rows-only by design; the
    ratio's RANGE and monotonicity against llm_quality_repetition
    are test-asserted instead). Output: exact byte lengths and the
    round-4 ratio, plus an is_suspect flag decided by
    cross-multiplied integers (compressed·10 < raw·3).

    Scale shape: map-only Arrow-batched kernel — the multimodal
    mapInPandas shape, embarrassingly parallel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def zlen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    d = tbl(spark, sf_dir, "documents")
    raw_len = F.length(F.col("text")).cast("long")
    return (
        d.select(
            "doc_id",
            raw_len.alias("raw_bytes"),
            zlen("text").alias("compressed_bytes"),
        )
        .withColumn(
            "ratio",
            F.round(
                F.col("compressed_bytes").cast("double")
                / F.col("raw_bytes"),
                4,
            ),
        )
        .withColumn(
            "is_suspect",
            F.col("compressed_bytes") * 10 < F.col("raw_bytes") * 3,
        )
        .orderBy("doc_id")
    )
