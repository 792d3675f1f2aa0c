"""§2 extensions, thirty-fourth wave — ordered string aggregation,
locale sentence splitting, polymorphic UDTFs, weighted smoothing.

- agg_listagg: ANSI LISTAGG ... WITHIN GROUP (ORDER BY …) — ordered
  string aggregation as a first-class aggregate (agg_collect's
  collect_list+array_join is the pre-ANSI workaround; this is the
  standard spelling, new in Spark 4).
- fn_sentences: the sentences() locale text splitter — sentence/word
  nested arrays, surfaced as scalars.
- udtf_analyze: POLYMORPHIC Python UDTF — the output schema is
  computed at plan time by a static analyze() from the call's
  literal arguments (Spark 4); here top_words(text, k) returns k
  columns, k decided per query.
- ts_weighted_moving_avg: 3-point weighted moving average with
  INTEGER weights (3,2,1)/6 over daily revenue — the linear-decay
  smoother kept exact by scaling (×6 numerator stays integral).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "agg_listagg",
    """
    SELECT c_mktsegment,
           string_agg(c_name, '|' ORDER BY c_custkey DESC) AS top_names,
           count(*) AS n
    FROM (
        SELECT c_mktsegment, c_name, c_custkey,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_custkey DESC) AS rnk
        FROM customer
    ) WHERE rnk <= 5
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LISTAGG ... WITHIN GROUP (ORDER BY ...): ordered string
    aggregation as a standard aggregate (Spark 4) — agg_collect's
    collect_list → array_sort → array_join pipeline is the pre-ANSI
    workaround this replaces; the WITHIN GROUP order is part of the
    aggregate itself, so the concatenation order is deterministic by
    construction, not by a separate canonicalization step. Input
    capped to the top-5 names per segment, selected with the salted
    two-phase pattern (round-8 low-cardinality-window guard): phase 1
    ranks within (segment, 16-way deterministic hash salt) keeping
    ≤ 5 per cell, phase 2 takes the true top-5 of the ≤ 80 survivors
    per segment with a bounded collect_list → sort → slice aggregate
    — no window partitions on the bare 5-value segment key."""
    c = tbl(spark, sf_dir, "customer")
    w1 = Window.partitionBy("c_mktsegment", "_salt").orderBy(
        F.col("c_custkey").desc()
    )
    survivors = (
        c.withColumn("_salt", F.pmod(F.xxhash64("c_custkey"), F.lit(16)))
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= 5)
    )
    top = (
        survivors.groupBy("c_mktsegment")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("c_custkey", "c_name")),
                    asc=False,
                ),
                1,
                5,
            ).alias("top")
        )
        .select("c_mktsegment", F.explode("top").alias("s"))
        .select(
            "c_mktsegment",
            F.col("s.c_custkey").alias("c_custkey"),
            F.col("s.c_name").alias("c_name"),
        )
    )
    top.createOrReplaceTempView("hds_la_top")
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_custkey DESC)
                   AS top_names,
               count(*) AS n
        FROM hds_la_top
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@register(
    "fn_sentences",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[-1] AS last_word
    FROM documents ORDER BY doc_id
    """,
    tags=("fn", "string"),
)
def fn_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sentences() locale-aware text segmenter (BreakIterator
    under the hood): text → array of sentences, each an array of
    words. The fixture corpus is unpunctuated ASCII, so exactly one
    sentence whose words equal the whitespace split — which is what
    makes the oracle writable from first principles (punctuated
    multilingual text would be locale-dependent and rows-only).
    Surfaced as scalars from the nested array: word count, first and
    last word. Map-only."""
    d = tbl(spark, sf_dir, "documents")
    words = F.sentences("text")[0]  # single sentence by construction
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
    ).orderBy("doc_id")


@register(
    "udtf_analyze",
    """
    SELECT doc_id,
           coalesce(string_split(text, ' ')[1], '') AS w0,
           coalesce(string_split(text, ' ')[2], '') AS w1,
           coalesce(string_split(text, ' ')[3], '') AS w2
    FROM documents ORDER BY doc_id
    """,
    tags=("udf", "udtf"),
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the static analyze() hook
    computes the OUTPUT SCHEMA at plan time from the call's literal
    arguments — top_words(text, 3) returns three columns, and a
    caller asking for 5 would get five, from one registration.
    udtf_python's fixed returnType is the non-polymorphic baseline;
    analyze() is what makes generic table functions (unpivot-n,
    split-n, parse-n) writable once. Arrow-batched like every Python
    boundary; the lateral join is a generator, not a shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TopWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"w{i}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text: str, k: int):
            ws = (text or "").split()[:k]
            ws += [""] * (k - len(ws))
            yield tuple(ws)

    spark.udtf.register("hds_top_words", TopWords)
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("hds_ua_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.w0, t.w1, t.w2
        FROM hds_ua_docs d, LATERAL hds_top_words(d.text, 3) t
        ORDER BY d.doc_id
        """
    )


@register(
    "ts_weighted_moving_avg",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, cents,
               lag(cents, 1) OVER w AS c1,
               lag(cents, 2) OVER w AS c2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cents,
           CASE WHEN c2 IS NOT NULL THEN 3 * cents + 2 * c1 + c2 END
               AS wma_x6
    FROM lagged ORDER BY event_type, day
    """,
    tags=("timeseries",),
)
def ts_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-decay weighted moving average over daily revenue:
    weights (3,2,1)/6 across the last three observed days — the
    smoother dashboards use when a plain mean lags turns too much.
    Exactness by scaling: the published surface is the ×6 numerator
    (3·x₀+2·x₁+x₂), a pure BIGINT — the /6 division is the consumer's
    display step, so no float ever enters the pipeline (NULL until a
    full 3-day history exists, same cold-start rule as
    events_velocity_alerts). One keyed aggregate + two lags on one
    type-keyed window pass."""
    e = tbl(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("c1", F.lag("cents", 1).over(w)).withColumn(
        "c2", F.lag("cents", 2).over(w)
    )
    return lagged.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        F.when(
            F.col("c2").isNotNull(),
            3 * F.col("cents") + 2 * F.col("c1") + F.col("c2"),
        ).alias("wma_x6"),
    ).orderBy("event_type", "day")


@register(
    "win_range_interval",
    """
    WITH c AS (
        SELECT event_id, event_type, ts,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id, event_type,
           CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY ts
                RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_day_cents
    FROM c ORDER BY event_id
    """,
    tags=("window",),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a calendar INTERVAL bound: per event, the
    trailing-24h revenue of its type — the time-native spelling of
    win_range_frame (which demonstrates the same frame on numeric
    epoch seconds). RANGE semantics include PEERS: events sharing a
    timestamp contribute to each other's frame on both engines,
    which a ROWS frame would get wrong. Exact integer cents.

    Scale shape (round-7 verdict re-plan): the naive spelling —
    one window PARTITION BY event_type over the raw fact table —
    caps parallelism at the type cardinality (5), so five tasks
    sort everything at any data size. Because the frame horizon
    (24h) never spans more than TWO epoch-day buckets, the same
    math decomposes into (event_type, day)-keyed passes:

      trailing(e) = Σ cents in e's own bucket with ts' ≤ e.ts
                  + [prev-bucket total − Σ prev-bucket cents with
                     ts' < e.ts − 24h]

    Pass 1 is a running sum windowed by (type, bucket) — RANGE
    default frame, so equal-ts peers stay included. The strict
    prefix at the cutoff is resolved with the sorted-merge trick:
    per-distinct-ts prefix rows (tag 1) union query rows at their
    cutoff (tag 0), one (type, bucket)-keyed window ordered by
    (t_us, tag) — a query at exactly the cutoff ts sorts BEFORE the
    equal-time data row, giving strict `<` for free. Bucket totals
    are a broadcast-joined per-(type, day) aggregate (bounded by the
    calendar, not the corpus). Buckets are exact integer epoch-day
    ids via TRUE floor division (`(t_us − pmod(t_us, day)) div day`,
    not Spark's truncate-toward-zero `div`, which would make bucket 0
    span two days for pre-1970 timestamps), so the cutoff bucket is
    exactly `bucket − 1` for EVERY t_us and all comparisons stay in
    exact integers —
    parallelism is keyed by (type, day): ~1.8k partitions per year
    of history instead of 5, the same plan at 100 TB."""
    e = tbl(spark, sf_dir, "events")
    day_us = 86_400_000_000
    c = e.select(
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("t_us"),
        F.expr(
            f"(unix_micros(ts) - pmod(unix_micros(ts), {day_us})) "
            f"div {day_us}"
        ).alias("bucket"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_own = Window.partitionBy("event_type", "bucket").orderBy("t_us")
    own = c.withColumn("r_own", F.sum("cents").over(w_own))
    per_ts = c.groupBy("event_type", "bucket", "t_us").agg(
        F.sum("cents").alias("ts_cents")
    )
    data_pts = per_ts.withColumn(
        "prefix_le", F.sum("ts_cents").over(w_own)
    ).select(
        "event_type",
        F.col("bucket").alias("cday"),
        "t_us",
        F.lit(1).alias("tag"),
        "prefix_le",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("r_own"),
    )
    qry_pts = own.select(
        "event_type",
        (F.col("bucket") - 1).alias("cday"),
        (F.col("t_us") - day_us).alias("t_us"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("prefix_le"),
        "event_id",
        "r_own",
    )
    w_merge = (
        Window.partitionBy("event_type", "cday")
        .orderBy("t_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = data_pts.unionByName(qry_pts).withColumn(
        "pfx_lt", F.last("prefix_le", ignorenulls=True).over(w_merge)
    )
    totals = per_ts.groupBy(
        "event_type", F.col("bucket").alias("cday")
    ).agg(F.sum("ts_cents").alias("day_total"))
    return (
        merged.filter(F.col("tag") == 0)
        .join(F.broadcast(totals), ["event_type", "cday"], "left")
        .select(
            "event_id",
            "event_type",
            (
                F.col("r_own")
                + F.coalesce(
                    F.col("day_total")
                    - F.coalesce(F.col("pfx_lt"), F.lit(0)),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("trailing_day_cents"),
        )
        .orderBy("event_id")
    )


@register(
    "orders_revenue_waterfall",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                         AS BIGINT)) AS BIGINT) AS gross_cents,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(4,2)) * 100)
                         AS BIGINT)) AS BIGINT) AS discount_cents,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) * 100)
                         AS BIGINT)) AS BIGINT) AS net_cents,
           CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2)))
                         * CAST(l_tax AS DECIMAL(4,2)) * 100)
                         AS BIGINT)) AS BIGINT) AS tax_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("analytics",),
)
def orders_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall per return flag: gross list value → discount
    given → net → tax collected (the Q1 component family completed
    with the rarely-touched l_tax column). Every step multiplies
    DECIMAL-recovered exact values (price 18,2 × discount 4,2 stays
    inside DECIMAL exactness) and truncates to integer cents PER ROW
    before summing — the same per-row quantization on both engines,
    so the totals are associative-exact. One map-side-combined
    aggregate over a 3-value key."""
    li = tbl(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    cents = lambda e: F.sum(F.floor(e * 100).cast("long")).cast("long")  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            cents(price).alias("gross_cents"),
            cents(price * disc).alias("discount_cents"),
            cents(price * (F.lit(1) - disc)).alias("net_cents"),
            cents(price * (F.lit(1) - disc) * tax).alias("tax_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "udf_pandas_iter",
    """
    SELECT l_orderkey, l_linenumber,
           floor(((l_extendedprice * (1 - l_discount)) * 1.21) * 100) / 100
               AS gross_up
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[Series] → Iterator[Series]):
    the variant that amortizes EXPENSIVE ONE-TIME SETUP (model load,
    dictionary build — here a constant uplift factor standing in for
    it) across all Arrow batches of a partition, instead of paying it
    per batch like the plain series form (udf_pandas_scalar). Same
    vectorized per-batch math; the oracle mirrors the arithmetic in
    SQL. At 100 TB this is the tier every model-scoring UDF should
    use — setup cost scales with partitions, not batches."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gross_up(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        import numpy as np

        uplift = 1.21  # expensive setup would happen once, here
        for price, disc in it:
            # floor-quantize (pandas .round is half-even, SQL round is
            # half-away — floor is the only mode both sides share)
            yield np.floor((price * (1 - disc) * uplift) * 100) / 100

    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross_up("l_extendedprice", "l_discount").alias("gross_up"),
    ).orderBy("l_orderkey", "l_linenumber")
