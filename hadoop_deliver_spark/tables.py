"""Fixture table loader.

All queries read the driver-generated parquet fixtures at
``{sf_dir}/{table}.parquet`` (see TESTDATA.md / FIXTURES.md). One
ingestion quirk, now generation-dependent: early fixture rounds wrote
``events.ts`` as parquet TIMESTAMP(NANOS), which PySpark 4.x cannot
decode natively — with ``spark.sql.legacy.parquet.nanosAsLong=true``
it arrives as int64 nanoseconds and ``timestamp_micros(ts div 1000)``
converts by *integer* µs truncation (bit-exact with DuckDB's native
ns→µs cast; a float ``/1e9`` division would drift by ~0.5 µs at 2024
epochs). Current fixtures write TIMESTAMP(MICROS) which decodes
natively as TIMESTAMP_NTZ; the shim is applied only when the column
actually arrives as int64.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs this engine depends on.

    The driver owns SparkSession creation, so everything here must be
    (and is) a *runtime-settable* SQL conf — verified on pyspark 4.1.2.
    Idempotent; called by every query entry point.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # A driver-owned session arrives with the 200-partition default;
    # size the shuffle to the machine (AQE coalesces the excess, but
    # the *cap* matters for small stages and streaming state dirs).
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # Bucketed scans stopped propagating their written sortBy order in
    # Spark 3.0 unless this (runtime-settable) conf is on; the engine's
    # bucketed tables are written one-file-per-bucket precisely so the
    # order can be trusted, letting join_bucketed_noshuffle skip both
    # Exchange and Sort. Session-wide by design: the returned DataFrame
    # is planned lazily at collect time (AQE), so a set/restore inside
    # the operator would be undone before execution reads it. Only
    # bucketed-table scans observe the conf.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    # Arrow-batched toPandas()/pandas_udf transfer: a driver-owned
    # vanilla session arrives with Arrow OFF, which silently pickles
    # every result row through Py4J — measured 12.7 s → 1.2 s on a
    # 150k-row full-table query at sf0.1. Runtime-settable; the
    # fallback conf (default true) keeps unsupported result types on
    # the slow-but-correct path instead of erroring.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying ingestion shims."""
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            # Legacy fixture generation: TIMESTAMP(NANOS) arrives as
            # int64 ns under nanosAsLong; ns → µs-truncated timestamp
            # via exact integer math (a float /1e9 would drift ~0.5 µs).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # Current generation: TIMESTAMP(MICROS) decodes as NTZ.
            # Streaming watermarks and epoch functions require
            # TimestampType; with the session pinned to UTC this cast
            # reinterprets the same wall-clock instant losslessly, so
            # every downstream query sees the dtype prior rounds saw.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def dec2(col):
    """2-decimal money column → DECIMAL(18,2), recovering the exact
    cents value from its double representation.

    Why: Spark and DuckDB sum doubles in different orders (partition
    tree vs per-thread sequential / window segment tree), so
    `sum(double) → float32` is only *probably* hash-identical — the
    last-ulp drift lands on a float32 rounding boundary for ~1 in 10⁴
    money groups (measured: 2 of 15,000 customers at sf0.1 in
    join_left_outer). Summing in DECIMAL is associative-exact: the
    total is the same value under ANY summation order, on both
    engines, at every scale. Every money sum/avg in the engine goes
    through this cast; quantity-like columns (integer-valued doubles)
    don't need it — integer sums below 2^53 are already exact."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def joined_str(col):
    """Canonical array→string surface for the driver's hasher: cast
    elements to string, comma-join. Shared by every query that returns
    array-shaped results (agg_collect, fn_array_basic, fn_array_setops)
    so the canonicalization cannot diverge between them or their
    oracles."""
    return F.array_join(col.cast("array<string>"), ",")
