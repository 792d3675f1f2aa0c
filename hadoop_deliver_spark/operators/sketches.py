"""§2 extensions, eleventh wave (1/3) — bounded-memory stream sketches.

events_heavy_hitters is the canonical two-pass frequent-items
pipeline: pass 1 runs a Misra–Gries summary (k counters, public
algorithm) INSIDE each partition via mapInPandas — bounded memory per
task no matter how many distinct keys stream past — and emits each
partition's surviving candidates. The MG guarantee makes the union of
candidates a SUPERSET of every key with global frequency > n/k, so a
second exact counting pass restricted to candidates (a semi-join —
the candidate set is tiny and broadcast) provably returns the exact
answer for any `count > n/T` threshold with T ≤ k. That turns an
approximate sketch into an exact operator whose memory is O(k) per
task and whose shuffle is O(candidates), not O(distinct keys) — the
100 TB reason to run a sketch at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_K = 64  # MG counters per partition
_T = 40  # report keys with count > n/_T  (2.5% of the stream)


@register(
    "events_heavy_hitters",
    f"""
    WITH tot AS (SELECT count(*) AS n FROM events)
    SELECT user_id % 37 AS cohort, count(*) AS cnt
    FROM events GROUP BY user_id % 37
    HAVING count(*) > (SELECT n FROM tot) / {_T}
    ORDER BY cnt DESC, cohort
    """,
    tags=("sketch", "llm"),
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters via Misra–Gries candidates + exact refine:
    user cohorts (user_id mod 37 — the fixture's raw user_ids are
    near-uniform, so the cohort population straddles the threshold
    and the filter discriminates at every sf) whose global count
    exceeds n/40 (2.5%) of the event stream. Pass 1: MG(64) per
    partition (mapInPandas, O(64) memory per task) → candidate
    superset — provably contains every key with count > n/64, hence
    every key over the n/40 threshold, by the MG undercount bound.
    Pass 2: exact counts for candidates only (broadcast semi-join) +
    the threshold filter. The oracle is the direct GROUP BY/HAVING —
    the sketch path must and does reproduce it exactly; what the
    sketch buys at scale is per-task memory independent of key
    cardinality and a candidates-only shuffle. Core:
    api.heavy_hitters (column-parameterized, any key type)."""
    from hadoop_deliver_spark.api import heavy_hitters

    e = tbl(spark, sf_dir, "events").select(
        (F.col("user_id") % 37).alias("cohort")
    )
    return heavy_hitters(e, "cohort", threshold_denom=_T, counters=_K).orderBy(
        F.desc("cnt"), "cohort"
    )
