"""§2 extensions, twenty-sixth wave — embedding hygiene, seasonality,
TRY casts, deterministic any_value.

- llm_embedding_outliers: vector-norm outlier gate decided with EXACT
  integer algebra — |q−μ| > 2σ evaluated as (n·q−S)² > 4(nQ−S²), no
  float boundary anywhere.
- events_seasonality: ISO-dow × hour traffic/revenue matrix.
- fn_try_cast: TRY_CAST sweep across int/double/date with malformed
  and empty inputs → NULL, never job-kill (fn_try_arith's casting
  twin).
- agg_any_value: any_value on a functionally-dependent column —
  deterministic BECAUSE the group has exactly one distinct value,
  which is the only contract under which any_value belongs in a
  reproducible pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_embedding_outliers",
    """
    WITH q AS (
        SELECT vec_id, label,
               CAST(floor(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * x))) * 1000) AS BIGINT) AS q3
        FROM embeddings
    ),
    s AS (
        SELECT label, count(*) AS n, CAST(sum(q3) AS BIGINT) AS s1,
               CAST(sum(q3 * q3) AS BIGINT) AS s2
        FROM q GROUP BY label
    )
    SELECT q.vec_id, q.label, q.q3 AS norm_x1000,
           ((s.n * q.q3 - s.s1) * (s.n * q.q3 - s.s1)
            > 4 * (s.n * s.s2 - s.s1 * s.s1)) AS is_outlier
    FROM q JOIN s ON q.label = s.label
    ORDER BY q.vec_id
    """,
    tags=("llm", "vector", "dq"),
)
def llm_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-hygiene gate: vectors whose L2 norm sits more than
    2σ from their label's mean norm (broken encoders emit
    near-zero or exploded vectors). The norm is quantized to an
    integer q=⌊1000·‖v‖⌋ — bit-identical on both engines because the
    in-array summation order is fixed — and the outlier test is pure
    integer algebra: |q−μ|>2σ ⟺ (n·q−S₁)² > 4(n·S₂−S₁²), so NO float
    mean/stddev ever decides a boundary. Per-label moments broadcast
    back onto the scan; magnitudes stay < 2⁶³ at the 3-decimal
    quantization for any realistic corpus."""
    em = tbl(spark, sf_dir, "embeddings")
    q3 = F.floor(
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        * 1000
    ).cast("long")
    q = em.select("vec_id", "label", q3.alias("q3"))
    s = q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q3").cast("long").alias("s1"),
        F.sum(F.col("q3") * F.col("q3")).cast("long").alias("s2"),
    )
    dev = F.col("n") * F.col("q3") - F.col("s1")
    var4 = 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return (
        q.join(F.broadcast(s), "label")
        .select(
            "vec_id",
            "label",
            F.col("q3").alias("norm_x1000"),
            (dev * dev > var4).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


@register(
    "events_seasonality",
    """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hr,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events GROUP BY 1, 2 ORDER BY dow, hr
    """,
    tags=("analytics", "events"),
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality matrix: ISO day-of-week × hour-of-day event
    counts and exact-cents value — the capacity-planning heatmap
    input. Dialect trap handled: Spark's dayofweek() is
    Sunday-1-based while the ISO convention is Monday-1 — weekday()+1
    produces ISO on the Spark side to match the oracle's isodow().
    One map-side-combined aggregate over a 7×24-bounded key space."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("dow", "hr")
    )


@register(
    "fn_try_cast",
    """
    WITH raw AS (
        SELECT o_orderkey,
               CASE o_orderkey % 3 WHEN 0 THEN '123'
                    WHEN 1 THEN '12x3' ELSE '' END AS int_s,
               CASE o_orderkey % 3 WHEN 0 THEN '3.5'
                    WHEN 1 THEN 'abc' ELSE '-0.25' END AS dbl_s,
               CASE o_orderkey % 3 WHEN 0 THEN '2024-02-28'
                    WHEN 1 THEN '2024-02-30' ELSE 'nope' END AS date_s
        FROM orders
    )
    SELECT o_orderkey,
           TRY_CAST(int_s AS INTEGER) AS as_int,
           TRY_CAST(dbl_s AS DOUBLE) AS as_dbl,
           strftime(TRY_CAST(date_s AS DATE), '%Y-%m-%d') AS as_date
    FROM raw ORDER BY o_orderkey
    """,
    tags=("fn",),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST sweep: malformed integers ('12x3', ''), garbage
    doubles, and impossible calendar dates ('2024-02-30') all land as
    NULL instead of killing the job — the schema-on-read survival
    contract for text feeds (fn_try_arith covers arithmetic overflow;
    this covers parsing). Both engines agree that empty string is not
    zero and Feb 30 is not a date. Map-only."""
    o = tbl(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 3
    raw = o.select(
        "o_orderkey",
        F.when(k == 0, "123").when(k == 1, "12x3").otherwise("").alias("int_s"),
        F.when(k == 0, "3.5").when(k == 1, "abc").otherwise("-0.25").alias("dbl_s"),
        F.when(k == 0, "2024-02-28")
        .when(k == 1, "2024-02-30")
        .otherwise("nope")
        .alias("date_s"),
    )
    return raw.select(
        "o_orderkey",
        F.expr("try_cast(int_s AS INT)").alias("as_int"),
        F.expr("try_cast(dbl_s AS DOUBLE)").alias("as_dbl"),
        F.date_format(F.expr("try_cast(date_s AS DATE)"), "yyyy-MM-dd")
        .alias("as_date"),
    ).orderBy("o_orderkey")


@register(
    "agg_any_value",
    """
    SELECT o.o_custkey,
           any_value(c.c_name) AS cust_name,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY o.o_custkey ORDER BY o.o_custkey
    """,
    tags=("agg",),
)
def agg_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """any_value under its ONLY reproducible contract: the aggregated
    column is functionally dependent on the group key (c_name is
    1:1 with c_custkey), so 'any' is deterministic because the group
    holds exactly one distinct value. This is the standard trick for
    carrying denormalized columns through a GROUP BY without adding
    them to the key (wider grouping keys = wider shuffle rows);
    planners also exploit it to avoid re-aggregating. A
    non-dependent column under any_value would be flagged by this
    engine's determinism policy — that variant is deliberately NOT
    registered."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.any_value("c_name").alias("cust_name"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )
