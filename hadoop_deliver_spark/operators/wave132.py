"""§2 extensions, hundred-thirty-second wave — privacy census and
cooperative-game attribution.

- llm_kanonymity: k-anonymity census of the documents table over
  the (lang, source, length-bucket) quasi-identifier — equivalence
  class sizes, the k the corpus actually achieves, and the share of
  rows in sub-k classes; the release-gate complement of
  llm_pii_scrub (which removes identifiers; this MEASURES
  re-identifiability of what remains).
- events_attribution_shapley: Shapley-value channel attribution for
  the any-touch conversion game — for this game the Shapley value
  is exactly an equal split across the user's DISTINCT touched
  channels (closed form, no 2^n enumeration); head-to-head with
  last-touch credit (events_attribution_last_touch's rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_kanonymity",
    """
    WITH q AS (
        SELECT lang, source,
               CAST(n_chars // 200 AS BIGINT) AS len_bucket
        FROM documents
    ),
    eq AS (
        SELECT lang, source, len_bucket,
               CAST(count(*) AS BIGINT) AS sz
        FROM q GROUP BY 1, 2, 3
    ),
    cens AS (
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(sz) AS BIGINT) AS n_docs,
               CAST(min(sz) AS BIGINT) AS k_achieved,
               CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                   AS docs_below_5,
               CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS classes_below_5,
               CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS singletons
        FROM eq
    )
    SELECT n_docs, n_classes, k_achieved,
           singletons, classes_below_5, docs_below_5,
           round(CAST(docs_below_5 AS DOUBLE) / n_docs, 6)
               AS below_5_share,
           k_achieved >= 5 AS is_5_anonymous
    FROM cens
    """,
    tags=("llm", "governance"),
)
def llm_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over the (lang, source, ⌊n_chars/200⌋)
    quasi-identifier: the size of every equivalence class, the k the
    corpus ACHIEVES (the minimum class size — Sweeney 2002's
    re-identification bound), singleton count, and the share of
    documents living in classes smaller than the k = 5 release
    threshold. The governance gate that decides whether metadata
    columns can ship alongside scrubbed text: llm_pii_scrub removes
    in-text identifiers, but a singleton (lang, source, length)
    combination re-identifies a document all the same. All counts
    PURE INTEGER (the length bucket is integer division); one final
    share division; the verdict compares integers.

    Scale shape: one map-side bucket projection, one keyed
    equivalence-class reduce, one census reduce."""
    d = tbl(spark, sf_dir, "documents")
    q = d.select(
        "lang",
        "source",
        F.expr("div(n_chars, 200)").cast("long").alias("len_bucket"),
    )
    eq = q.groupBy("lang", "source", "len_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    cens = eq.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.min("sz").cast("long").alias("k_achieved"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("docs_below_5"),
        F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_5"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
        .cast("long")
        .alias("singletons"),
    )
    return cens.select(
        "n_docs",
        "n_classes",
        "k_achieved",
        "singletons",
        "classes_below_5",
        "docs_below_5",
        F.round(
            F.col("docs_below_5").cast("double") / F.col("n_docs"), 6
        ).alias("below_5_share"),
        (F.col("k_achieved") >= 5).alias("is_5_anonymous"),
    )


@register(
    "events_attribution_shapley",
    """
    WITH conv AS (
        SELECT user_id, min(epoch_us(ts)) AS tconv
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touches AS (
        SELECT DISTINCT e.user_id, e.event_type AS channel
        FROM events e JOIN conv c ON e.user_id = c.user_id
        WHERE epoch_us(e.ts) < c.tconv
          AND e.event_type IN ('click', 'view', 'signup')
    ),
    paths AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_ch
        FROM touches GROUP BY 1
    ),
    shap AS (
        SELECT t.channel,
               sum(1.0 / p.n_ch) AS credit,
               CAST(count(*) AS BIGINT) AS touched_users
        FROM touches t JOIN paths p ON t.user_id = p.user_id
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_conv FROM paths
    ),
    last_t AS (
        SELECT channel, CAST(count(*) AS BIGINT) AS last_touch_conv
        FROM (
            SELECT user_id, channel FROM (
                SELECT e.user_id, e.event_type AS channel,
                       row_number() OVER (PARTITION BY e.user_id
                           ORDER BY epoch_us(e.ts) DESC,
                                    e.event_id DESC) AS rn
                FROM events e JOIN conv c ON e.user_id = c.user_id
                WHERE epoch_us(e.ts) < c.tconv
                  AND e.event_type IN ('click', 'view', 'signup')
            ) WHERE rn = 1
        ) GROUP BY 1
    )
    SELECT s.channel, s.touched_users,
           round(s.credit, 4) AS shapley_conversions,
           round(s.credit / tot.n_conv, 6) AS shapley_share,
           coalesce(l.last_touch_conv, 0) AS last_touch_conv,
           round(CAST(coalesce(l.last_touch_conv, 0) AS DOUBLE)
                 / tot.n_conv, 6) AS last_touch_share
    FROM shap s LEFT JOIN last_t l ON s.channel = l.channel
    CROSS JOIN tot
    ORDER BY s.channel
    """,
    tags=("events", "analytics"),
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution for the any-touch conversion
    game: a converting user's coalition value is 1 whenever at least
    one touched channel is present, for which the Shapley value
    collapses in closed form to an equal split of the conversion
    across the user's DISTINCT pre-purchase channels (1/|S| each) —
    no 2ⁿ coalition enumeration, one division per (user, channel).
    Reported head-to-head with last-touch credit (deterministic
    (epoch, event_id) max_by tiebreak), whose winner-takes-all rule
    Shapley redistributes. Pre-purchase = strictly before the FIRST
    purchase; channels pinned to {click, view, signup}. Counts are
    PURE INTEGER; credits are sums of exact reciprocals of small
    integers (1/1, 1/2, 1/3 — identical floats on both engines).

    Scale shape: one per-user conversion reduce broadcast into the
    event scan, one distinct-(user, channel) reduce, one per-user
    path-size reduce joined back, one per-channel reduce, plus the
    max_by last-touch reduce."""
    e = tbl(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("tconv"))
    )
    pre = (
        e.join(conv, "user_id")
        .filter(
            (F.unix_micros("ts") < F.col("tconv"))
            & F.col("event_type").isin("click", "view", "signup")
        )
    )
    touches = pre.select(
        "user_id", F.col("event_type").alias("channel")
    ).distinct()
    paths = touches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ch")
    )
    shap = (
        touches.join(paths, "user_id")
        .groupBy("channel")
        .agg(
            F.sum(1.0 / F.col("n_ch")).alias("credit"),
            F.count(F.lit(1)).cast("long").alias("touched_users"),
        )
    )
    tot = paths.agg(F.count(F.lit(1)).cast("long").alias("n_conv"))
    last = (
        pre.groupBy("user_id")
        .agg(
            F.max_by(
                "event_type",
                F.struct(F.unix_micros("ts"), F.col("event_id")),
            ).alias("channel")
        )
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("long").alias("last_touch_conv"))
    )
    return (
        shap.join(last, "channel", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "touched_users",
            F.round(F.col("credit"), 4).alias("shapley_conversions"),
            F.round(F.col("credit") / F.col("n_conv"), 6).alias(
                "shapley_share"
            ),
            F.coalesce(F.col("last_touch_conv"), F.lit(0))
            .cast("long")
            .alias("last_touch_conv"),
            F.round(
                F.coalesce(F.col("last_touch_conv"), F.lit(0)).cast("double")
                / F.col("n_conv"),
                6,
            ).alias("last_touch_share"),
        )
        .orderBy("channel")
    )
