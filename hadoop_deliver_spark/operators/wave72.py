"""§2 extensions, ninety-sixth wave — data-layout and sketch-tuning
engineering surfaces.

- delivery_zorder_stats: Z-order (Morton 1966) multi-column layout
  vs a single-column sort — the data-skipping arithmetic behind
  Delta/Iceberg OPTIMIZE ZORDER, measured exactly on fixed bucket
  ladders.
- llm_lsh_band_tuning: the MinHash-LSH (b, r) band-tuning table
  (Leskovec-Rajaraman-Ullman ch. 3) — the S-curve P = 1−(1−J^r)^b
  for every factorization of a 128-hash signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# 8-bit × 8-bit Morton interleave; 32 fixed file-buckets per layout
_BITS = 8
_NBUCKETS = 32
_DIM = 1 << _BITS  # 256

_BR = [(128, 1), (64, 2), (32, 4), (16, 8), (8, 16), (4, 32), (2, 64),
       (1, 128)]
_J_GRID = ("0.5", "0.8", "0.95")


def _morton_sql(c: str, d: str) -> str:
    """16-bit Morton code of two 8-bit ints — pure div/mod
    arithmetic, textually shared by both engines."""
    terms = []
    for k in range(_BITS):
        terms.append(f"(({c} // {1 << k}) % 2) * {1 << (2 * k + 1)}")
        terms.append(f"(({d} // {1 << k}) % 2) * {1 << (2 * k)}")
    return " + ".join(terms)


@register(
    "delivery_zorder_stats",
    f"""
    WITH base AS (
        SELECT CAST(o_custkey % {_DIM} AS BIGINT) AS c,
               CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01')
                    // 10 % {_DIM} AS BIGINT) AS d
        FROM orders
    ),
    coded AS (
        SELECT c, d,
               ({_morton_sql("c", "d")}) // {(1 << (2 * _BITS))
                                             // _NBUCKETS} AS zb,
               (c * {_DIM} + d) // {(_DIM * _DIM) // _NBUCKETS} AS sb
        FROM base
    ),
    z AS (
        SELECT CAST('zorder' AS VARCHAR) AS layout,
               CAST(sum(mxc - mnc + 1) AS BIGINT) AS span_c,
               CAST(sum(mxd - mnd + 1) AS BIGINT) AS span_d,
               CAST(count(*) AS BIGINT) AS nb
        FROM (SELECT zb, min(c) AS mnc, max(c) AS mxc,
                     min(d) AS mnd, max(d) AS mxd
              FROM coded GROUP BY zb)
    ),
    s AS (
        SELECT CAST('sort_c' AS VARCHAR) AS layout,
               CAST(sum(mxc - mnc + 1) AS BIGINT) AS span_c,
               CAST(sum(mxd - mnd + 1) AS BIGINT) AS span_d,
               CAST(count(*) AS BIGINT) AS nb
        FROM (SELECT sb, min(c) AS mnc, max(c) AS mxc,
                     min(d) AS mnd, max(d) AS mxd
              FROM coded GROUP BY sb)
    ),
    u AS (SELECT * FROM z UNION ALL SELECT * FROM s)
    SELECT layout, nb AS n_buckets,
           round(CAST(span_c AS DOUBLE) / ({_DIM} * nb), 6)
               AS avg_c_span_frac,
           round(CAST(span_d AS DOUBLE) / ({_DIM} * nb), 6)
               AS avg_d_span_frac,
           {_DIM} * span_c + span_d
               < {_DIM} * ({_DIM} * nb) + {_DIM} * nb
               AS skips_both_dims
    FROM u
    ORDER BY layout
    """,
    tags=("delivery", "layout"),
)
def delivery_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout statistics (Morton 1966 interleaving — the
    arithmetic behind Delta/Iceberg OPTIMIZE ZORDER): bucket orders
    by the 16-bit Morton code of (custkey mod 256, epoch-decade mod
    256) into 32 fixed "files" and measure, per file, the min-max
    SPAN each dimension's zone map would report — the exact quantity
    min/max data skipping prunes on. The comparison layout sorts by
    c alone (span_c ≈ perfect, span_d ≈ full). avg span fraction =
    E[files scanned] for a uniform point predicate on that column:
    Z-order pays a small factor on c to make BOTH dimensions
    prunable — the multi-dimensional-locality tradeoff, here as two
    exact numbers instead of folklore. Buckets are FIXED literal
    ladders (code div literal — never the engine's range partitioner,
    whose sampled boundaries differ between engines and runs), so
    every span/count is an exact integer; the skips-both verdict is
    the exact lexicographic compare 256·span_c + span_d < the
    sort-layout's perfect-c/full-d bound.

    Scale shape: one map-side projection to (c, d, bucket), one
    32-key min/max reduce per layout — at 100 TB this IS the
    OPTIMIZE planning query (zone-map spans per candidate layout)
    and costs two scans of two int columns."""
    o = tbl(spark, sf_dir, "orders")
    epoch_dec = F.expr(
        "CAST(datediff(to_date(o_orderdate), date'1992-01-01') AS BIGINT)"
        " div 10"
    )
    base = o.select(
        (F.col("o_custkey") % _DIM).cast("long").alias("c"),
        (epoch_dec % _DIM).cast("long").alias("d"),
    )
    morton_terms = []
    for k in range(_BITS):
        morton_terms.append(
            f"((c div {1 << k}) % 2) * {1 << (2 * k + 1)}"
        )
        morton_terms.append(
            f"((d div {1 << k}) % 2) * {1 << (2 * k)}"
        )
    morton = " + ".join(morton_terms)
    coded = base.select(
        "c",
        "d",
        F.expr(
            f"({morton}) div {(1 << (2 * _BITS)) // _NBUCKETS}"
        )
        .cast("long")
        .alias("zb"),
        F.expr(
            f"(c * {_DIM} + d) div {(_DIM * _DIM) // _NBUCKETS}"
        )
        .cast("long")
        .alias("sb"),
    )

    def _layout(key: str, name: str) -> DataFrame:
        per = coded.groupBy(key).agg(
            F.min("c").alias("mnc"),
            F.max("c").alias("mxc"),
            F.min("d").alias("mnd"),
            F.max("d").alias("mxd"),
        )
        return per.agg(
            F.lit(name).alias("layout"),
            F.sum(F.col("mxc") - F.col("mnc") + 1)
            .cast("long")
            .alias("span_c"),
            F.sum(F.col("mxd") - F.col("mnd") + 1)
            .cast("long")
            .alias("span_d"),
            F.count(F.lit(1)).cast("long").alias("nb"),
        )

    u = _layout("zb", "zorder").unionAll(_layout("sb", "sort_c"))
    nb = F.col("nb")
    return u.select(
        "layout",
        nb.alias("n_buckets"),
        F.round(F.col("span_c").cast("double") / (_DIM * nb), 6).alias(
            "avg_c_span_frac"
        ),
        F.round(F.col("span_d").cast("double") / (_DIM * nb), 6).alias(
            "avg_d_span_frac"
        ),
        (
            _DIM * F.col("span_c") + F.col("span_d")
            < _DIM * (_DIM * nb) + _DIM * nb
        ).alias("skips_both_dims"),
    ).orderBy("layout")


@register(
    "llm_lsh_band_tuning",
    f"""
    WITH br AS (
        {" UNION ALL ".join(
            f"SELECT CAST({b} AS BIGINT) AS b, CAST({r} AS BIGINT) AS r"
            for b, r in _BR
        )}
    )
    SELECT b, r,
           round(pow(1.0 / b, 1.0 / r), 6) AS est_threshold,
           {", ".join(
               f"round(1 - pow(1 - pow({j}, r), b), 6) AS p_at_{j.replace('.', '')}"
               for j in _J_GRID
           )}
    FROM br
    ORDER BY b DESC
    """,
    tags=("llm", "sketch"),
)
def llm_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band tuning (the Leskovec-Rajaraman-Ullman S-curve
    analysis): for EVERY (bands b, rows r) factorization of a
    128-hash signature, the candidate probability P(J) = 1 −
    (1 − J^r)^b at J ∈ {{0.5, 0.8, 0.95}} plus the curve's midpoint
    threshold (1/b)^(1/r) — the table a dedup pipeline consults to
    pick its banding BEFORE paying for a corpus pass (the design-
    time complement of llm_minhash_estimate_quality's run-time
    accuracy contract; llm_dedup_minhash ships one point of this
    table). Pure closed-form arithmetic on the 8-row literal
    factorization frame — no data scan; pow() is library-evaluated
    on both engines but every emitted value is rounded to 6 decimals
    (ulp-level libm differences sit 10 orders below the rounding
    digit — the repo's display convention).

    Scale shape: an 8-row literal frame; O(1) at any corpus size —
    the whole point of tuning on the S-curve instead of the
    corpus."""
    rows = [(b, r) for b, r in _BR]
    br = spark.createDataFrame(rows, "b long, r long")
    cols = [
        F.col("b"),
        F.col("r"),
        F.round(
            F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 6
        ).alias("est_threshold"),
    ]
    for j in _J_GRID:
        cols.append(
            F.round(
                1 - F.pow(1 - F.pow(F.lit(float(j)), F.col("r")), F.col("b")),
                6,
            ).alias(f"p_at_{j.replace('.', '')}")
        )
    return br.select(*cols).orderBy(F.desc("b"))
