"""§2 extensions, twenty-eighth wave — role-playing dims, feature
hashing, bigram LM, multi-distinct, VALUES tables, velocity alerts.

- orders_trade_matrix: the TPC-H Q7 shape — the SAME dimension
  (nation) joined twice under different roles (customer's vs
  supplier's nation), cross-nation revenue matrix.
- llm_feature_hashing: the hashing-trick feature vector (HashingTF's
  relational twin) with md5-derived buckets so the oracle reproduces
  every bucket id bit-exactly.
- llm_bigram_lm: bigram language model — P(next|word) with exact
  rational surfaces and per-word top-3 next-word ranking over the
  aggregate.
- agg_multi_distinct: several COUNT(DISTINCT ...) in one aggregate —
  including a composite-key distinct — pinning the Expand-based plan
  semantics.
- sql_values_inline: inline VALUES derived table joined against a
  fact — the seed-table idiom for small mappings that don't deserve
  files.
- events_velocity_alerts: traffic-spike detection — a 10-min bucket
  count flagged when it exceeds 3× the trailing-6-bucket average,
  decided in exact integer arithmetic (n·6 > 3·Σ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "orders_trade_matrix",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_items,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_nationkey != sn.n_nationkey
    GROUP BY 1, 2 ORDER BY cust_nation, supp_nation
    """,
    tags=("join", "analytics"),
)
def orders_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade matrix (the TPC-H Q7 shape): nation is a
    ROLE-PLAYING dimension — joined once as the customer's nation and
    once, under a separate alias, as the supplier's — and only
    cross-border flows survive. Every dimension (orders' customer
    path and lineitem's supplier path) broadcasts; the single
    fact-sized shuffle is lineitem⋈orders on the order key. Exact
    cents. The aliasing matters: engines without true alias scoping
    conflate the two nation roles — the oracle pins 25×24 directed
    pairs' worth of separation."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cn_key") != F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


@register(
    "llm_feature_hashing",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id,
               (instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(md5(term), 2, 1)) - 1)
                   AS h
        FROM toks
    )
    SELECT doc_id, h % 64 AS bucket, count(*) AS n
    FROM bucketed GROUP BY doc_id, h % 64
    ORDER BY doc_id, bucket
    """,
    tags=("llm", "features"),
)
def llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF's relational, oracle-checkable
    twin): each term maps to one of 64 feature buckets via its md5
    byte — no vocabulary build, no OOV, collisions by design — and
    the per-(doc, bucket) counts ARE the sparse feature vector. md5
    instead of xxhash64 because the oracle must reproduce bucket ids
    bit-exactly (fn_hash keeps xxhash64 rows-only for that reason).
    One explode + one hash aggregate; bucket count bounds the output
    at 64 rows per doc regardless of vocabulary."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    hexd = "0123456789abcdef"
    bucket = (
        (F.expr(f"instr('{hexd}', substring(md5(term), 1, 1))") - 1) * 16
        + (F.expr(f"instr('{hexd}', substring(md5(term), 2, 1))") - 1)
    ) % 64
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("doc_id", "bucket")
    )


@register(
    "llm_bigram_lm",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    bigrams AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM toks, LATERAL unnest(range(1, len(a))) AS t(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
    ranked AS (
        SELECT c2.w1, c2.w2, c2.c12, c1.c1,
               floor(CAST(c2.c12 AS DOUBLE) / c1.c1 * 10000) / 10000 AS p,
               row_number() OVER (PARTITION BY c2.w1
                                  ORDER BY c2.c12 DESC, c2.w2) AS rnk
        FROM c2 JOIN c1 ON c1.w1 = c2.w1
        WHERE c1.c1 >= 10
    )
    SELECT w1, w2, c12, c1, p
    FROM ranked WHERE rnk <= 3 ORDER BY w1, c12 DESC, w2
    """,
    tags=("llm", "lm"),
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model: P(next | word) = c(w1,w2)/c(w1) with the
    top-3 continuations per word (support ≥ 10) — the conditional
    twin of llm_quality_perplexity's unigram model and the statistic
    a Kneser-Ney smoother starts from. Bigrams come from zipping each
    token array with its own tail (map-side, no self-join); the
    context totals are an aggregate OF the bigram aggregate, joined
    back |vocab|-sized; the top-3 rank runs per w1 over ≤ |vocab|
    continuations. Probability floor-quantized; counts exact."""
    d = tbl(spark, sf_dir, "documents")
    a = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))).alias("w1"),
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))).alias("w2"),
    )
    bigrams = d.select(F.explode(pairs).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c2.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    w = Window.partitionBy("w1").orderBy(F.col("c12").desc(), F.col("w2"))
    return (
        c2.join(c1, "w1")
        .filter(F.col("c1") >= 10)
        .withColumn(
            "p",
            F.floor(F.col("c12").cast("double") / F.col("c1") * 10000) / 10000,
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("w1", "w2", "c12", "c1", "p")
        .orderBy("w1", F.col("c12").desc(), "w2")
    )


@register(
    "agg_multi_distinct",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS uniq_users,
           count(DISTINCT CAST(ts AS DATE)) AS active_days,
           count(DISTINCT (user_id, CAST(ts AS DATE))) AS user_days
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg",),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) over DIFFERENT keys in one aggregate —
    users, days, and the composite (user, day) — which the planner
    executes via Expand: each input row replicates once per distinct
    group, then one shuffle carries all the partial distincts. The
    alternative (N separate scans) reads the fact table N times;
    this shape reads it once at the cost of the expand factor —
    the right trade whenever the scan dominates. Composite distinct
    via struct on the Spark side = row-tuple on the oracle side."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("uniq_users"),
            F.count_distinct(F.to_date("ts")).alias("active_days"),
            F.count_distinct(F.struct("user_id", F.to_date("ts"))).alias(
                "user_days"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "sql_values_inline",
    """
    WITH tiers(o_orderpriority, tier, mult) AS (
        VALUES ('1-URGENT', 'hot', 3), ('2-HIGH', 'hot', 2),
               ('3-MEDIUM', 'warm', 1), ('4-NOT SPECIFIED', 'cold', 1),
               ('5-LOW', 'cold', 1)
    )
    SELECT t.tier, count(*) AS n_orders,
           CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) * t.mult) AS BIGINT)
               AS weighted_cents
    FROM orders o JOIN tiers t USING (o_orderpriority)
    GROUP BY t.tier ORDER BY t.tier
    """,
    tags=("sql",),
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES derived table — the seed-table idiom for small
    mappings (priority → tier/weight here) that live in the query
    instead of a file or catalog table. The literal table broadcasts
    by construction; weighting stays in exact integer cents. Same
    5-row table in both dialects; this is also the fixture pattern
    for unit-style SQL tests."""
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("hds_vi_orders")
    return spark.sql(
        """
        WITH tiers AS (
            SELECT * FROM VALUES
                ('1-URGENT', 'hot', 3), ('2-HIGH', 'hot', 2),
                ('3-MEDIUM', 'warm', 1), ('4-NOT SPECIFIED', 'cold', 1),
                ('5-LOW', 'cold', 1)
            AS t(o_orderpriority, tier, mult)
        )
        SELECT t.tier, count(*) AS n_orders,
               CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) * t.mult) AS BIGINT)
                   AS weighted_cents
        FROM hds_vi_orders o JOIN tiers t USING (o_orderpriority)
        GROUP BY t.tier ORDER BY t.tier
        """
    )


@register(
    "events_velocity_alerts",
    """
    WITH buckets AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 600000000 AS BIGINT) AS b,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    trail AS (
        SELECT event_type, b, n,
               CAST(sum(n) OVER w AS BIGINT) AS sum6,
               CAST(count(n) OVER w AS BIGINT) AS cnt6
        FROM buckets
        WINDOW w AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, b AS bucket, n, sum6,
           (cnt6 = 6 AND n * 6 > 3 * sum6) AS is_spike
    FROM trail ORDER BY event_type, bucket
    """,
    tags=("analytics", "events"),
)
def events_velocity_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-velocity alerting: a 10-minute bucket fires when its
    count exceeds 3× the average of the 6 preceding OBSERVED buckets
    (full history required — cnt6=6 — so cold starts never alert).
    The spike test is exact integer cross-multiplication (n·6 >
    3·Σ), never a float average, so the alert set is bit-stable
    across engines and reruns — the property an alerting pipeline
    needs most. One bounded-key aggregate + one type-keyed window
    over the bucket grid, which is time-bounded, not data-sized."""
    e = tbl(spark, sf_dir, "events")
    buckets = (
        e.select(
            "event_type",
            F.expr("unix_micros(ts) div 600000000").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(-6, -1)
    )
    return (
        buckets.withColumn("sum6", F.sum("n").over(w).cast("long"))
        .withColumn("cnt6", F.count("n").over(w).cast("long"))
        .select(
            "event_type",
            F.col("b").alias("bucket"),
            "n",
            "sum6",
            ((F.col("cnt6") == 6) & (F.col("n") * 6 > 3 * F.col("sum6"))).alias(
                "is_spike"
            ),
        )
        .orderBy("event_type", "bucket")
    )
