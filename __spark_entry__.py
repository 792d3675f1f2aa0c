"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``hadoop_deliver_spark.registry`` — every operator from
SURVEY.md §2 registers itself there with a (spark_fn, oracle_sql)
pair; this module just re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_deliver_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hadoop_deliver_spark.operators.aggregates import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query (omitted ⇒ rows-only)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
