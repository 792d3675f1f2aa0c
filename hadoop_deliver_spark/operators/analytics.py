"""§2.K extensions, third wave — event-sequence analytics and
benchmark decontamination.

Three operators a delivery pipeline runs on top of the base engine:

- funnel: ordered multi-step conversion (view → click → purchase)
  per user — the canonical event-sequence query; expressed as three
  chained min-timestamp aggregates so each step is one shuffle on
  user_id and the sequencing predicate rides the equi-join.
- retention: cohort × day-offset active-user matrix — the standard
  growth-analytics rollup; first-touch cohorts from one aggregate,
  offsets from integer date arithmetic (deterministic, no floats).
- contamination: asymmetric n-gram overlap of the corpus against a
  benchmark/eval set — DEcontamination is a distinct step from dedup
  (membership against a fixed reference, not pairwise similarity);
  the eval shingle set broadcasts, so the corpus-side scan is one
  pass at any scale.

All outputs are integers/timestamps — no float parity surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "events_funnel",
    """
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    advances a stage only with a strictly-later event of the next
    type. Three chained min-aggregates, each one user_id shuffle; the
    strictly-after predicate refines inside the equi-join (never a
    cartesian). At 100 TB this is the textbook funnel shape — state
    per user is one timestamp per stage."""
    ev = tbl(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame, tcol: str, out: str):
        e = ev.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").alias("ets")
        )
        return (
            e.join(prev, "user_id")
            .filter(F.col("ets") > F.col(tcol))
            .groupBy("user_id")
            .agg(F.min("ets").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    # one row: count(col) counts non-nulls, so left-joining the stage
    # tables and counting their timestamps gives the funnel totals in a
    # single final aggregate — no driver-side counts, no 1-row joins.
    staged = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return staged.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
    )


@register(
    "events_retention",
    """
    WITH firsts AS (
        SELECT user_id,
               date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day,
                     date_trunc('day', CAST(e.ts AS TIMESTAMP))) AS day_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    WHERE date_diff('day', f.cohort_day,
                    date_trunc('day', CAST(e.ts AS TIMESTAMP))) BETWEEN 0 AND 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, then
    distinct active users per (cohort, day-offset) for the first week.
    First-touch table is one aggregate; the offset is pure integer
    date arithmetic, so the whole result is count/timestamp-typed —
    no float parity surface. The firsts table is |users| rows and
    broadcasts; the fact table is scanned once."""
    ev = tbl(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    off = F.datediff(F.to_date(F.date_trunc("day", "ts")), F.to_date("cohort_day"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .withColumn("day_offset", off.cast("long"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "llm_contamination_check",
    """
    WITH sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' ')
               )) AS shingles
        FROM documents
    ),
    eval_sh AS (
        SELECT DISTINCT unnest(shingles) AS sh FROM sets WHERE doc_id % 100 = 0
    ),
    corpus AS (
        SELECT doc_id, unnest(shingles) AS sh FROM sets WHERE doc_id % 100 <> 0
    )
    SELECT c.doc_id, count(*) AS n_shared,
           count(*) >= 5 AS contaminated
    FROM corpus c JOIN eval_sh e ON e.sh = c.sh
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def llm_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count each corpus document's
    3-token-shingle overlap with the eval set (doc_id % 100 = 0 stands
    in for the benchmark) and flag docs sharing ≥ 5 shingles. Distinct
    from dedup: this is asymmetric membership against a FIXED
    reference set, so the eval shingles broadcast (a real benchmark is
    a few MB of n-grams at 100 TB corpus scale) and the corpus side is
    a single map+groupBy pass — no pairwise join ever forms."""
    from hadoop_deliver_spark.operators.llm import _shingle_sets

    d = tbl(spark, sf_dir, "documents")
    sets = _shingle_sets(d)
    eval_sh = (
        sets.filter(F.col("doc_id") % 100 == 0)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corpus = sets.filter(F.col("doc_id") % 100 != 0).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    return (
        corpus.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn("contaminated", F.col("n_shared") >= 5)
        .orderBy("doc_id")
    )


@register(
    "events_funnel_windowed",
    """
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND CAST(e.ts AS TIMESTAMP) > v.t1
          AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS TIMESTAMP) > c.t2
          AND CAST(e.ts AS TIMESTAMP) <= c.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: each stage must follow the
    previous one within 24 hours (the attribution-window form every
    product-analytics funnel actually uses — the unbounded variant is
    events_funnel). Same chained min-aggregate shape, the window bound
    rides the equi-join predicate, so state per user stays one
    timestamp per stage at any scale."""
    ev = tbl(spark, sf_dir, "events")

    def first_within(event_type: str, prev: DataFrame, tcol: str, out: str):
        e = ev.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").alias("ets")
        )
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ets") > F.col(tcol))
                & (F.col("ets") <= F.col(tcol) + F.expr("INTERVAL 24 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ets").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_within("click", v, "t1", "t2")
    p = first_within("purchase", c, "t2", "t3")
    staged = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return staged.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
    )
