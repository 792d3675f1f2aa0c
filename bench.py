#!/usr/bin/env python
"""Per-round benchmark: the 7 BASELINE.md headline queries on
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), one shared tuned
SparkSession, warm twice + 5 timed runs with full result
materialization, reporting the per-query MEDIAN (and min alongside,
for noise diagnosis) — BASELINE.md used the same
materialization protocol, so the numbers are directly comparable
row-for-row. Round 3 showed ~1.6x run-to-run wobble on unchanged
code with median-of-3; 2 warmups + median-of-5 brings back-to-back
totals within ~20%.

Prints ONE JSON line:
  {"metric": "...", "value": <total of medians sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...},
   "queries_min": {...}, "value_min": sec, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hadoop_deliver_spark.session import get_spark
from hadoop_deliver_spark.tables import tbl


def q1_pricing_summary(spark, sf_dir):
    from hadoop_deliver_spark.operators.aggregates import flagship

    return flagship(spark, sf_dir)


def q3_top_orders(spark, sf_dir):
    # customer is a dimension at every scale ratio (1:10 vs lineitem):
    # broadcast it; the only shuffle is orders⋈lineitem + the 10-row
    # TakeOrderedAndProject.
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def q5_regional_join(spark, sf_dir):
    from hadoop_deliver_spark.operators.joins import join_broadcast

    return join_broadcast(spark, sf_dir)


def window_top3_orders(spark, sf_dir):
    from hadoop_deliver_spark.operators.windows import win_row_number_topk

    return win_row_number_topk(spark, sf_dir)


def events_hourly(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .orderBy("h", "event_type")
    )


def distinct_users(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return ev.agg(
        F.count_distinct("user_id").alias("du"),
        F.approx_count_distinct("user_id").alias("adu"),
    )


def topk_lineitem(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return li.orderBy(F.col("l_extendedprice").desc()).limit(100)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_regional_join": q5_regional_join,
    "window_top3_orders": window_top3_orders,
    "events_hourly": events_hourly,
    "distinct_users": distinct_users,
    "topk_lineitem": topk_lineitem,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("hds-bench")

    timings: dict[str, float] = {}
    minima: dict[str, float] = {}
    for name, fn in QUERIES.items():
        for _ in range(2):  # warm (JIT, codegen cache, parquet footers)
            fn(spark, sf_dir).collect()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        minima[name] = round(min(runs), 3)

    print(
        json.dumps(
            {
                "metric": "headline_7q_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_min": minima,
                "value_min": round(sum(minima.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
