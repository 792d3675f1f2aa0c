"""§2 extensions, thirty-ninth wave — causal panel inference and
cross-source contamination forensics.

- events_did: difference-in-differences on the user panel — the
  workhorse causal estimator for staggered rollouts, as Welch's t
  on per-user post−pre deltas (paired within user, robust between).
- llm_source_containment: the directed shingle-containment matrix
  between corpus sources — 'how much of source A already lives in
  source B', the statistic that decides mixture weights and
  cross-source dedup order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.operators.wave7 import _shingles
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "events_did",
    """
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS treated,
               CAST(count(*) FILTER (event_type = 'purchase'
                                     AND CAST(ts AS DATE) >= DATE '2024-01-16')
                    AS BIGINT)
               - CAST(count(*) FILTER (event_type = 'purchase'
                                       AND CAST(ts AS DATE) < DATE '2024-01-16')
                      AS BIGINT) AS delta
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT
            CAST(count(*) FILTER (treated = 1) AS BIGINT) AS n_t,
            CAST(sum(delta) FILTER (treated = 1) AS BIGINT) AS s_t,
            CAST(sum(delta * delta) FILTER (treated = 1) AS BIGINT) AS ss_t,
            CAST(count(*) FILTER (treated = 0) AS BIGINT) AS n_c,
            CAST(sum(delta) FILTER (treated = 0) AS BIGINT) AS s_c,
            CAST(sum(delta * delta) FILTER (treated = 0) AS BIGINT) AS ss_c
        FROM u
    ),
    v AS (
        SELECT n_t, n_c, s_t, s_c,
               (ss_t - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1) AS v_t,
               (ss_c - CAST(s_c AS DOUBLE) * s_c / n_c) / (n_c - 1) AS v_c
        FROM m
    )
    SELECT n_t, n_c,
           round(CAST(s_t AS DOUBLE) / n_t, 4) AS mean_delta_t,
           round(CAST(s_c AS DOUBLE) / n_c, 4) AS mean_delta_c,
           round(CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c, 4)
               AS did,
           round((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c)
                 / sqrt(v_t / n_t + v_c / n_c), 4) AS t_stat
    FROM v
    """,
    tags=("events", "stats"),
)
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the user panel: treated = odd
    user_ids, outcome = purchase count, periods split at Jan 16. The
    estimator is Welch's t on PER-USER post−pre deltas — pairing
    within user removes each user's level (the panel trick that
    makes DiD robust to fixed differences between arms), and the
    between-user variance of the deltas gives the SE. Every moment
    (delta sums and squares per arm) is an exact integer from ONE
    per-user aggregate + a scalar reduce; the closed form runs in
    identically-ordered doubles.

    Completes the experimentation family: events_abtest_proportions
    (rates), events_cuped (covariate variance reduction), events_did
    (panel causal estimate).

    Scale shape: one shuffle keyed on user_id with map-side partial
    combine, one 1-row reduce. No join, no window."""
    e = tbl(spark, sf_dir, "events")
    pur = F.col("event_type") == "purchase"
    post = F.to_date("ts") >= F.lit("2024-01-16").cast("date")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("long").alias("treated")
    ).agg(
        (F.count_if(pur & post) - F.count_if(pur & ~post)).alias("delta")
    )
    t1 = F.col("treated") == 1
    m = u.agg(
        F.count_if(t1).alias("n_t"),
        F.sum(F.when(t1, F.col("delta"))).cast("long").alias("s_t"),
        F.sum(F.when(t1, F.col("delta") * F.col("delta")))
        .cast("long")
        .alias("ss_t"),
        F.count_if(~t1).alias("n_c"),
        F.sum(F.when(~t1, F.col("delta"))).cast("long").alias("s_c"),
        F.sum(F.when(~t1, F.col("delta") * F.col("delta")))
        .cast("long")
        .alias("ss_c"),
    )
    v = m.select(
        "n_t",
        "n_c",
        "s_t",
        "s_c",
        (
            (F.col("ss_t") - F.col("s_t").cast("double") * F.col("s_t") / F.col("n_t"))
            / (F.col("n_t") - 1)
        ).alias("v_t"),
        (
            (F.col("ss_c") - F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c"))
            / (F.col("n_c") - 1)
        ).alias("v_c"),
    )
    mt = F.col("s_t").cast("double") / F.col("n_t")
    mc = F.col("s_c").cast("double") / F.col("n_c")
    return v.select(
        "n_t",
        "n_c",
        F.round(mt, 4).alias("mean_delta_t"),
        F.round(mc, 4).alias("mean_delta_c"),
        F.round(mt - mc, 4).alias("did"),
        F.round(
            (mt - mc)
            / F.sqrt(F.col("v_t") / F.col("n_t") + F.col("v_c") / F.col("n_c")),
            4,
        ).alias("t_stat"),
    )


@register(
    "llm_source_containment",
    """
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS a FROM documents
    ),
    sh AS (
        SELECT DISTINCT source, array_to_string(a[i:i+7], ' ') AS s
        FROM toks, LATERAL unnest(range(1, len(a) - 6)) AS t(i)
    ),
    sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    ix AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM sh a JOIN sh b ON b.s = a.s AND a.source != b.source
        GROUP BY 1, 2
    )
    SELECT ix.src_a, ix.src_b, ix.n_common,
           CAST(sz.n AS BIGINT) AS n_a,
           round(CAST(ix.n_common AS DOUBLE) / sz.n, 4) AS containment
    FROM ix JOIN sz ON sz.source = ix.src_a
    WHERE ix.n_common * 100 >= sz.n
    ORDER BY src_a, src_b
    """,
    tags=("llm", "dedup"),
)
def llm_source_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed cross-source contamination matrix: what fraction of
    source A's distinct 8-gram shingles also appear in source B
    (containment ≥ 1% reported). THE statistic that orders a
    cross-source dedup (scrub the contained source against the
    containing one, not vice versa) and flags mixture double-counting
    before mixture weights are fit — asymmetric by design, unlike
    Jaccard. The report threshold is exact integer arithmetic
    (n_common·100 ≥ |A|); only the displayed ratio is float.

    Scale shape: shingling is the map-only in-row transform
    (wave7._shingles); per-source distinct + size are keyed
    aggregates; the intersection is ONE equi-join keyed on the
    shingle (shuffle volume = shingle occurrences, never a source
    cross product) re-aggregated to the ≤|sources|² matrix."""
    d = tbl(spark, sf_dir, "documents")
    sh = (
        _shingles(d.select(F.col("source").alias("doc_id"), "text"))
        .withColumnRenamed("doc_id", "source")
        .distinct()
    )
    sz = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "s")
    b = sh.select(F.col("source").alias("src_b"), "s")
    ix = (
        a.join(b, "s")
        .where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        ix.join(
            F.broadcast(sz.select(F.col("source").alias("src_a"), "n")),
            "src_a",
        )
        .where(F.col("n_common") * 100 >= F.col("n"))
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.col("n").cast("long").alias("n_a"),
            F.round(F.col("n_common").cast("double") / F.col("n"), 4).alias(
                "containment"
            ),
        )
        .orderBy("src_a", "src_b")
    )
