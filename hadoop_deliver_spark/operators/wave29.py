"""§2 extensions, fifty-third wave — weighted robust location, burst
dynamics, reconciliation checksums, and vocabulary health.

- agg_weighted_median: the quantity-weighted median unit price per
  return flag — exact via block-ranked weighted cumsums and a
  cross-multiplied crossing decision.
- events_burstiness: the Goh-Barabási burstiness coefficient
  B = (σ−μ)/(σ+μ) of inter-event times per event type — bots sit
  near −1 (metronomes), humans are bursty (B > 0).
- delivery_row_checksums: order-independent per-partition row
  checksums (md5-derived integer sums) — the distcp-style
  reconciliation primitive that proves two copies match without
  moving either.
- llm_hapax_ratio: hapax-legomena share per source — the
  lexicostatistics vocabulary-health probe (OCR noise mints
  hapaxes; templates starve them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_weighted_median",
    """
    WITH li AS (
        SELECT l_returnflag AS flag,
               -- the ratio is cast to DOUBLE before the round on BOTH
               -- engines (a DECIMAL division would quantize differently)
               CAST(round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                               AS DOUBLE) / l_quantity) AS BIGINT)
                   AS unit_cents,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey * 10 + l_linenumber AS rid
        FROM lineitem
    ),
    cum AS (
        SELECT flag, unit_cents, w, rid,
               sum(w) OVER (PARTITION BY flag
                            ORDER BY unit_cents, rid) AS cw,
               sum(w) OVER (PARTITION BY flag) AS tw
        FROM li
    ),
    pick AS (
        SELECT flag, unit_cents, tw,
               row_number() OVER (PARTITION BY flag
                                  ORDER BY unit_cents, rid) AS pk
        FROM cum WHERE 2 * cw >= tw
    )
    SELECT flag, CAST(max(tw) AS BIGINT) AS total_weight,
           round(CAST(max(CASE WHEN pk = 1 THEN unit_cents END) AS DOUBLE)
                 / 100, 4) AS weighted_median_price
    FROM pick GROUP BY flag ORDER BY flag
    """,
    tags=("aggregate", "stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median unit price per return flag — "the
    price at which half the UNITS (not half the line items) trade",
    the robust location every pricing/inventory analysis wants when
    line items carry very different volumes. Exact end to end: unit
    price quantized to integer cents (one deterministic half-up
    round of a DECIMAL ratio), weights are integer quantities, the
    crossing decision is cross-multiplied (2·cumweight ≥ total), and
    the picked value is the FIRST row past the crossing in the
    (price, rowid) total order. The weighted running sum uses the
    per-flag window over the fact table — the partition key carries
    the scale (for an unkeyed global weighted median swap in the
    api.exact_global_keyed_cumsum block core).

    Scale shape: one partitioned window pass + a tiny pick reduce."""
    li = tbl(spark, sf_dir, "lineitem")
    unit_cents = F.round(
        (dec2("l_extendedprice") * 100).cast("double") / F.col("l_quantity")
    ).cast("long")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        unit_cents.alias("unit_cents"),
        F.col("l_quantity").cast("long").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
    )
    from pyspark.sql import Window

    wo = Window.partitionBy("flag").orderBy("unit_cents", "rid")
    wt = Window.partitionBy("flag")
    cum = base.select(
        "flag",
        "unit_cents",
        "rid",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    pick = (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .withColumn(
            "pk",
            F.row_number().over(
                Window.partitionBy("flag").orderBy("unit_cents", "rid")
            ),
        )
    )
    return (
        pick.groupBy("flag")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.round(
                F.max(
                    F.when(F.col("pk") == 1, F.col("unit_cents"))
                ).cast("double")
                / 100,
                4,
            ).alias("weighted_median_price"),
        )
        .orderBy("flag")
    )


@register(
    "events_burstiness",
    """
    WITH g AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
        FROM events
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS s1,
               sum(CAST(gap AS DOUBLE) * gap) AS s2
        FROM g WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(CAST(s1 AS DOUBLE) / n_gaps / 1000000, 4) AS mean_gap_s,
           round((sqrt(s2 / n_gaps
                       - (CAST(s1 AS DOUBLE) / n_gaps)
                         * (CAST(s1 AS DOUBLE) / n_gaps))
                  - CAST(s1 AS DOUBLE) / n_gaps)
                 / (sqrt(s2 / n_gaps
                         - (CAST(s1 AS DOUBLE) / n_gaps)
                           * (CAST(s1 AS DOUBLE) / n_gaps))
                    + CAST(s1 AS DOUBLE) / n_gaps), 4) AS burstiness
    FROM m ORDER BY event_type
    """,
    tags=("analytics", "stats"),
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Goh-Barabási burstiness coefficient (Goh & Barabási 2008):
    B = (σ−μ)/(σ+μ) of the inter-event time distribution per event
    type — B → −1 for a metronome (bots, cron), 0 for a Poisson
    process, → +1 for extreme burst-and-silence (humans, incidents).
    Gaps are exact integer MICROSECONDS from one lag window; the
    moment sums s1 (int64) and s2 (doubles of exact int products)
    partial-merge; σ and B evaluate in one fixed textual order
    (population σ, the paper's form), round-4 display.

    Scale shape (round-8 re-plan, low-cardinality-window guard): the
    lag is decomposed by epoch-day bucket so no window partitions on
    the bare 5-value type key. Within-bucket gaps come from a
    (type, day)-keyed lag; the one gap per bucket boundary is exactly
    (first of bucket b) − (last of the previous non-empty bucket),
    recovered from per-bucket min/max structs with a lag over the
    per-(type, day) AGGREGATE (calendar-bounded at any corpus size).
    The union of the two sets is the identical gap multiset; the
    moment sums are order-free."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    c = e.select(
        "event_type",
        us.alias("us"),
        "event_id",
        F.expr("unix_micros(ts) div 86400000000").alias("bucket"),
    )
    w_in = Window.partitionBy("event_type", "bucket").orderBy(
        "us", "event_id"
    )
    within = c.select(
        "event_type", (F.col("us") - F.lag("us").over(w_in)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    per_bucket = c.groupBy("event_type", "bucket").agg(
        F.min(F.struct("us", "event_id")).alias("first"),
        F.max(F.struct("us", "event_id")).alias("last"),
    )
    w_day = Window.partitionBy("event_type").orderBy("bucket")
    boundary = per_bucket.select(
        "event_type",
        (F.col("first.us") - F.lag("last.us").over(w_day)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    g = within.unionByName(boundary)
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s1"),
        F.sum(F.col("gap").cast("double") * F.col("gap")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    sigma = F.sqrt(F.col("s2") / F.col("n_gaps") - mu * mu)
    return m.select(
        "event_type",
        "n_gaps",
        F.round(mu / 1000000, 4).alias("mean_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 4).alias("burstiness"),
    ).orderBy("event_type")


@register(
    "delivery_row_checksums",
    """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(from_hex(substr(
                md5(CAST(o.o_orderkey AS VARCHAR) || '|'
                    || CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                    || '|' || o.o_orderstatus), 1, 8)) AS BIT)::INT::BIGINT)
                AS BIGINT) AS checksum
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    tags=("delivery",),
)
def delivery_row_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent partition checksums — the distcp-style
    reconciliation primitive: each row collapses to a 32-bit integer
    window of md5(key|price|status) and a partition's checksum is
    the plain SUM (commutative, so it is identical under ANY row
    order, partitioning, or engine — proven here by the cross-engine
    hex-parse parity device). Two copies of a delivery reconcile by
    comparing one tiny (partition, count, checksum) table each, no
    data movement; a single flipped row flips the sum with
    probability ≈ 1 − 2⁻³². The canonical serialization pins
    DECIMAL(18,2) text for money so both sides hash identical bytes.

    Scale shape: map-side hash + one keyed sum; the checksum table
    is partition-cardinality sized."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        dec2("o_totalprice").cast("string"),
        F.col("o_orderstatus"),
    )
    # DuckDB's ::BIT::INT reads the 32-bit window SIGNED; conv() is
    # unsigned — normalize to signed-32 so summed checksums agree for
    # hashes with the top bit set
    raw32 = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    h32 = F.when(raw32 >= 2**31, raw32 - 2**32).otherwise(raw32)
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(h32).cast("long").alias("checksum"),
        )
        .orderBy("n_name")
    )


@register(
    "llm_hapax_ratio",
    """
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    cnt AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS hapax,
           round(CAST(count(*) FILTER (c = 1) AS DOUBLE) / count(*), 4)
               AS hapax_ratio,
           CAST(count(*) FILTER (c = 2) AS BIGINT) AS dis_legomena
    FROM cnt GROUP BY source ORDER BY source
    """,
    tags=("llm", "text"),
)
def llm_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena share per source — the lexicostatistics
    vocabulary-health probe (natural corpora run ~40-60% hapaxes by
    Zipf; OCR noise and tokenizer damage MINT hapaxes, template spam
    STARVES them — either direction is a data-quality alarm), plus
    the dis-legomena count that Good-Turing smoothing feeds on.
    Exact int64 counts, one correctly-rounded division per source.

    Scale shape: one explode + one (source, term) keyed aggregate
    with map-side combine, then a per-source conditional-count
    reduce FROM it."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.count_if(F.col("c") == 1).cast("long").alias("hapax"),
            F.round(
                F.count_if(F.col("c") == 1).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("hapax_ratio"),
            F.count_if(F.col("c") == 2).cast("long").alias("dis_legomena"),
        )
        .orderBy("source")
    )
