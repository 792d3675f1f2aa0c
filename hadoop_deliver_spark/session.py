"""SparkSession factory.

Local dev/test runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads, one JVM). The config block is written for cluster scale:
everything here is equally valid on a 1000-executor deployment — AQE
handles post-shuffle coalescing and skew-join splitting at any scale,
and shuffle partitions are sized from parallelism, not hardcoded to
the data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hadoop-deliver-spark") -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Settings rationale (100 TB design notes in README):
      - AQE on: runtime partition coalescing + skew-join mitigation —
        at 100 TB the static shuffle-partition count is always wrong
        for *some* stage; AQE re-plans per-stage.
      - shuffle.partitions = cores locally; on a real cluster set
        ~2-3x total executor cores (AQE coalesces the excess).
      - nanosAsLong: the events fixture stores TIMESTAMP(NANOS) which
        Spark 4.x cannot read natively (PARQUET_TYPE_ILLEGAL).
      - session timezone UTC: keeps timestamp semantics identical to
        the DuckDB oracle (naive µs timestamps).
      - Arrow enabled: toPandas()/pandas_udf cross the JVM↔Python
        boundary as Arrow batches, not pickled rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
