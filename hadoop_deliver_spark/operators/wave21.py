"""§2 extensions, forty-fifth wave — pairwise edit distance, Spark-4
bitmap aggregates, Markov entropy rate, and intermittent-demand
forecasting.

- llm_edit_distance_pairs: blocked pairwise Levenshtein near-dup
  eval — the character-exact refinement the gram/minhash families
  approximate, on prefix-blocked candidates only.
- fn_bitmap_funcs: the Spark 4 bitmap aggregate family
  (bitmap_bucket_number / bit_position / construct_agg / count /
  or_agg) — exact distinct counting as bucketed bitmap algebra.
- events_entropy_rate: the Markov entropy rate of each user-stream
  transition matrix — the single-number predictability score of the
  event process (Shannon 1948).
- orders_croston_forecast: Croston's method (1972) for
  intermittent demand, per-customer: separate exact-binary EWMAs of
  nonzero demand sizes and inter-demand intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_edit_distance_pairs",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS n,
               substr(text, 1, 24) AS blk
        FROM documents WHERE length(text) >= 24
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
           CAST(greatest(a.n, b.n) AS BIGINT) AS max_len
    FROM d a JOIN d b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
     AND 5 * b.n >= 4 * a.n AND 5 * a.n >= 4 * b.n
    WHERE 5 * levenshtein(a.text, b.text) <= greatest(a.n, b.n)
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "dedup"),
)
def llm_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise Levenshtein near-duplicates: pairs whose edit
    distance is ≤ 20% of the longer text — the CHARACTER-exact
    refinement the gram/minhash families only approximate (edit
    distance is the metric plagiarism and OCR-dedup literature
    actually defines "near" in). Candidates are blocked on the
    24-char prefix plus a ±20% length band (both necessary for a
    qualifying pair given the shared-prefix block, so the block is a
    candidate restriction, not a result approximation *within
    prefix-stable corpora* — the honest contract: edits inside the
    first 24 chars move a pair to another block; for edit-anywhere
    recall compose with minhash_pairs blocking). Every decision is
    cross-multiplied integers: 5·lev ≤ max(len), 5·len bands — no
    float thresholds. Both engines ship the same byte-level
    levenshtein.

    Scale shape: the O(n·m) distance only ever runs on same-block,
    length-compatible pairs via one equi-join on the 24-char key —
    never all-pairs."""
    d = (
        tbl(spark, sf_dir, "documents")
        .where(F.length("text") >= 24)
        .select(
            "doc_id",
            "text",
            F.length("text").alias("n"),
            F.substring("text", 1, 24).alias("blk"),
        )
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
        F.col("n").alias("na"),
        "blk",
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
        F.col("n").alias("nb"),
        "blk",
    )
    lev = F.levenshtein("ta", "tb")
    return (
        a.join(b, "blk")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (5 * F.col("nb") >= 4 * F.col("na"))
            & (5 * F.col("na") >= 4 * F.col("nb"))
        )
        .filter(5 * lev <= F.greatest("na", "nb"))
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_dist"),
            F.greatest("na", "nb").cast("long").alias("max_len"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "fn_bitmap_funcs",
    """
    WITH b AS (
        SELECT event_type,
               -- Spark's 1-based bucket: ceil(v/32768) for v >= 1,
               -- and 0 -> bucket 0 (probed on 4.1: floor((v-1)/2^15)+1)
               CAST(floor((user_id - 1.0) / 32768) AS BIGINT) + 1
                   AS bucket,
               count(DISTINCT user_id) AS n_in_bucket
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n_in_bucket) AS BIGINT) AS n_distinct
    FROM b GROUP BY event_type ORDER BY event_type
    """,
    tags=("function", "aggregate"),
)
def fn_bitmap_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 bitmap aggregate family — exact distinct counting
    as bucketed bitmap algebra: bitmap_bucket_number / bitmap_bit_
    position split each user_id into a 32768-bit bucket and an
    in-bucket bit, bitmap_construct_agg ORs a bucket's bits into one
    binary value per (type, bucket), bitmap_count pops the bits, and
    the per-type SUM of bucket popcounts is the exact distinct count
    — the mergeable shape that lets a 100 TB pipeline materialize
    distinct-count state per partition and combine later (what
    api.bitmap_sets hand-builds, as built-ins). The oracle states the
    same two-level identity with plain COUNT(DISTINCT) per bucket,
    replicating Spark's exact 1-based bucket numbering
    (floor((v−1)/32768)+1, so v=0 lands in bucket 0 — probed
    empirically, id 32768 is bucket 1 / bit 32767).

    Scale shape: one (type, bucket) shuffle with partial bitmap ORs
    map-side, then a per-type sum over the tiny bucket table."""
    e = tbl(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct"),
        )
        .orderBy("event_type")
    )


@register(
    "events_entropy_rate",
    """
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    t AS (
        SELECT prev AS s, event_type AS d, CAST(count(*) AS BIGINT) AS n
        FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    row_tot AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns FROM t GROUP BY s),
    grand AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM t)
    SELECT CAST(g.nn AS BIGINT) AS n_transitions,
           round(-sum((CAST(t.n AS DOUBLE) / g.nn)
                      * ln(CAST(t.n AS DOUBLE) / r.ns)), 6)
               AS entropy_rate_nats
    FROM t JOIN row_tot r USING (s) CROSS JOIN grand g
    GROUP BY g.nn
    """,
    tags=("analytics", "stats"),
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of the event process (Shannon 1948):
    H = −Σ_i π_i Σ_j p_ij·ln p_ij with the stationary weights taken
    empirically (π_i = row share of transitions out of i), which
    collapses to one pass over the transition matrix:
    −Σ_ij (n_ij/N)·ln(n_ij/n_i·). The single number scores how
    PREDICTABLE the stream is — bot traffic and template sessions
    push it toward 0, organic browsing toward ln(k) — the scalar
    companion to events_transitions / events_type_entropy. Counts
    are exact int64; the ln terms run over the ≤ k² matrix cells
    (round-6 display, the theil convention).

    Scale shape: one partitioned lag window (shuffle on user_id),
    then everything lives on the k²-cell matrix."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("s"), F.col("event_type").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    row_tot = t.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    grand = t.agg(F.sum("n").cast("long").alias("nn"))
    term = (F.col("n").cast("double") / F.col("nn")) * F.log(
        F.col("n").cast("double") / F.col("ns")
    )
    return (
        t.join(F.broadcast(row_tot), "s")
        .crossJoin(F.broadcast(grand))
        .groupBy(F.col("nn").alias("n_transitions"))
        .agg(F.round(-F.sum(term), 6).alias("entropy_rate_nats"))
    )


@register(
    "orders_croston_forecast",
    """
    WITH occ AS (
        SELECT o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS i,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS gap
        FROM orders
    ),
    sized AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               max(i) AS last_i
        FROM occ GROUP BY o_custkey HAVING count(*) >= 3
    ),
    z AS (
        SELECT s.o_custkey,
               sum(CAST(b.price AS DOUBLE)
                   * power(0.5, s.last_i - b.i))
                 / sum(power(0.5, s.last_i - b.i)) AS z_hat
        FROM sized s JOIN occ b ON b.o_custkey = s.o_custkey
        GROUP BY s.o_custkey
    ),
    p AS (
        SELECT s.o_custkey,
               sum(CAST(b.gap AS DOUBLE)
                   * power(0.5, s.last_i - b.i))
                 / sum(power(0.5, s.last_i - b.i)) AS p_hat
        FROM sized s JOIN occ b
          ON b.o_custkey = s.o_custkey AND b.gap IS NOT NULL
        GROUP BY s.o_custkey
    )
    SELECT s.o_custkey AS cust_id, s.n_orders,
           round(z.z_hat, 4) AS z_hat,
           round(p.p_hat, 4) AS p_gap_days,
           CASE WHEN p.p_hat > 0
                THEN round(z.z_hat / p.p_hat, 4) END AS demand_per_day
    FROM sized s JOIN z USING (o_custkey) JOIN p USING (o_custkey)
    ORDER BY cust_id
    """,
    tags=("analytics", "forecast"),
)
def orders_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972): when
    a customer orders SPORADICALLY, smoothing the raw daily series
    biases toward zero — instead smooth two series observed only at
    demand points: the nonzero demand SIZE (order value) and the
    INTER-demand interval (gap days), then forecast demand/day as
    ẑ/p̂. Both EWMAs use α = 1/2 over the occurrence index: weights
    2^-k are exact binary doubles and inputs are exact
    (DECIMAL-derived cents, integer gap days), so every product is
    exact and the per-customer sums are bit-stable across engines
    before the round-4 display (the ts_ewma convention). Customers
    with < 3 orders are excluded (no interval signal).

    Scale shape: one partitioned window pass over orders (occurrence
    index + gap), then per-customer weighted reduces via equi-joins
    on the customer key — no global window, no recurrence state."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    occ = o.select(
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.row_number().over(w).alias("i"),
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        )
        .cast("long")
        .alias("gap"),
    )
    sized = (
        occ.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("i").alias("last_i"),
        )
        .filter(F.col("n_orders") >= 3)
    )
    wgt = F.pow(F.lit(0.5), F.col("last_i") - F.col("i"))
    z = (
        sized.join(occ, "o_custkey")
        .groupBy("o_custkey")
        .agg(
            (
                F.sum(F.col("price").cast("double") * wgt) / F.sum(wgt)
            ).alias("z_hat")
        )
    )
    p = (
        sized.join(occ.filter(F.col("gap").isNotNull()), "o_custkey")
        .groupBy("o_custkey")
        .agg(
            (
                F.sum(F.col("gap").cast("double") * wgt) / F.sum(wgt)
            ).alias("p_hat")
        )
    )
    return (
        sized.join(z, "o_custkey")
        .join(p, "o_custkey")
        .select(
            F.col("o_custkey").alias("cust_id"),
            "n_orders",
            F.round("z_hat", 4).alias("z_hat"),
            F.round("p_hat", 4).alias("p_gap_days"),
            F.when(
                F.col("p_hat") > 0, F.round(F.col("z_hat") / F.col("p_hat"), 4)
            ).alias("demand_per_day"),
        )
        .orderBy("cust_id")
    )
