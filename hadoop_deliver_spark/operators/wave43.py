"""§2 extensions, sixty-seventh wave — distribution-free two-sample
testing, experiment sizing, and exact ranking-quality metrics.

- agg_cvm_test: the two-sample Cramér–von Mises test (URGENT order
  prices vs the rest) — the whole-distribution complement of the KS
  and Mann-Whitney tests, in exact doubled-midrank integers.
- events_abtest_power: minimum detectable effect and sensitivity
  verdict for the standing A/B split — the experiment-sizing
  companion of events_abtest_proportions.
- llm_auc_roc: exact ROC-AUC of a score against a binary label via
  the rank (Mann-Whitney) identity — no curve discretization.
- llm_classifier_gains: the decile gains/lift table of the same
  score — where the positives concentrate, exact block-ranked
  deciles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# two-sided 5% and 80%-power normal quantiles for the MDE formula —
# literals shared with the oracle
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143
# two-sample Cramér–von Mises 5% critical value (Anderson 1962)
_CVM_CRIT = 0.461


@register(
    "agg_cvm_test",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v,
               o_orderkey,
               o_orderpriority = '1-URGENT' AS grp_a
        FROM orders
    ),
    r AS (
        SELECT grp_a, v, o_orderkey,
               2 * rank() OVER (ORDER BY v)
                   + count(*) OVER (PARTITION BY v) - 1 AS r2,
               row_number() OVER (PARTITION BY grp_a
                                  ORDER BY v, o_orderkey) AS i
        FROM o
    ),
    s AS (
        SELECT CAST(count(*) FILTER (grp_a) AS BIGINT) AS n,
               CAST(count(*) FILTER (NOT grp_a) AS BIGINT) AS m,
               CAST(sum(CASE WHEN grp_a
                             THEN (r2 - 2 * i) * (r2 - 2 * i) END)
                    AS BIGINT) AS ua4,
               CAST(sum(CASE WHEN NOT grp_a
                             THEN (r2 - 2 * i) * (r2 - 2 * i) END)
                    AS BIGINT) AS ub4
        FROM r
    )
    SELECT n, m,
           round((CAST(n AS DOUBLE) * ua4 + CAST(m AS DOUBLE) * ub4)
                 / (4.0 * n * m * (n + m))
                 - (4.0 * n * m - 1) / (6.0 * (n + m)), 6) AS t_stat,
           (CAST(n AS DOUBLE) * ua4 + CAST(m AS DOUBLE) * ub4)
               / (4.0 * n * m * (n + m))
               - (4.0 * n * m - 1) / (6.0 * (n + m)) > 0.461
               AS reject_5pct
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test (Anderson 1962's rank
    computing formula) of URGENT order prices against the rest:
    T = U/(4nm(n+m)) − (4nm−1)/(6(n+m)) with U = n·Σ(Rᵢ−2i)²/4 +
    m·Σ(Sⱼ−2j)²/4 over combined-sample midranks — integrates the
    SQUARED ECDF gap over the whole distribution, catching
    spread/shape differences that agg_mann_whitney's location shift
    and agg_ks_test's single largest gap both miss. Doubled midranks
    (2·rank + ties − 1, the agg_mann_whitney device) keep every
    squared deviation an exact int64 (the doubled form absorbs the
    /4 into the final constant); T is one fixed-order float
    expression and the 5% verdict compares against Anderson's 0.461
    critical literal. Combined midranks come from the block-ranked
    api.exact_global_rank core + per-value min/max (the
    agg_mann_whitney device); the within-sample index i is a window
    over the TWO sample partitions (swap per-group block ranks if one
    sample outgrows a task).

    Scale shape: one block-ranked pass, a value-keyed midrank join,
    two-partition index windows, one conditional reduce."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("v"),
        "o_orderkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("grp_a"),
    )
    ranked = api.exact_global_rank(base, "v", "o_orderkey", "rk")
    byval = ranked.groupBy("v").agg(
        (F.min("rk") + F.max("rk")).cast("long").alias("r2")
    )
    wgrp = Window.partitionBy("grp_a").orderBy("v", "o_orderkey")
    r = ranked.join(byval, "v").select(
        "grp_a",
        "r2",
        F.row_number().over(wgrp).alias("i"),
    )
    dev2 = (F.col("r2") - 2 * F.col("i")) * (F.col("r2") - 2 * F.col("i"))
    s = r.agg(
        F.count_if(F.col("grp_a")).cast("long").alias("n"),
        F.count_if(~F.col("grp_a")).cast("long").alias("m"),
        F.sum(F.when(F.col("grp_a"), dev2)).cast("long").alias("ua4"),
        F.sum(F.when(~F.col("grp_a"), dev2)).cast("long").alias("ub4"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    t = (nd * F.col("ua4") + md * F.col("ub4")) / (
        4.0 * F.col("n") * F.col("m") * (F.col("n") + F.col("m"))
    ) - (4.0 * F.col("n") * F.col("m") - 1) / (
        6.0 * (F.col("n") + F.col("m"))
    )
    return s.select(
        "n",
        "m",
        F.round(t, 6).alias("t_stat"),
        (t > _CVM_CRIT).alias("reject_5pct"),
    )


@register(
    "events_abtest_power",
    f"""
    WITH arms AS (
        SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b,
               CAST(count(*) FILTER (user_id % 2 = 0
                    AND event_type = 'purchase') AS BIGINT) AS c_a,
               CAST(count(*) FILTER (user_id % 2 = 1
                    AND event_type = 'purchase') AS BIGINT) AS c_b
        FROM events
    )
    SELECT n_a, n_b, c_a, c_b,
           round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
           round(({_Z_ALPHA!r} + {_Z_BETA!r})
                 * sqrt(2.0 * ((c_a + c_b) / (CAST(n_a AS DOUBLE) + n_b))
                        * (1 - (c_a + c_b) / (CAST(n_a AS DOUBLE) + n_b))
                        / least(n_a, n_b)), 6) AS mde_80pct,
           abs(CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               > ({_Z_ALPHA!r} + {_Z_BETA!r})
                 * sqrt(2.0 * ((c_a + c_b) / (CAST(n_a AS DOUBLE) + n_b))
                        * (1 - (c_a + c_b) / (CAST(n_a AS DOUBLE) + n_b))
                        / least(n_a, n_b)) AS lift_detectable
    FROM arms
    """,
    tags=("analytics", "stats"),
)
def events_abtest_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the standing A/B split (the
    two-proportion power formula of Cohen 1988 / every experiment
    calculator): MDE at 80% power and two-sided 5% significance =
    (z_{{α/2}} + z_β)·√(2p̄(1−p̄)/n) on the purchase-share metric and
    user-parity arms of events_abtest_proportions — the sizing
    companion that tells the experimenter whether the arms can SEE an
    effect of the observed magnitude at all (chasing a significant
    p-value on an underpowered test is the classic false-discovery
    factory). Counts are exact int64 from one conditional aggregate;
    both normal quantiles are literals shared with the oracle;
    the detectability verdict compares two identically-computed
    fixed-order doubles.

    Scale shape: ONE conditional aggregate over the fact scan —
    map-side partial, no join, no window."""
    e = tbl(spark, sf_dir, "events")
    even = F.col("user_id") % 2 == 0
    purch = F.col("event_type") == "purchase"
    arms = e.agg(
        F.count_if(even).cast("long").alias("n_a"),
        F.count_if(~even).cast("long").alias("n_b"),
        F.count_if(even & purch).cast("long").alias("c_a"),
        F.count_if(~even & purch).cast("long").alias("c_b"),
    )
    pbar = (F.col("c_a") + F.col("c_b")) / (
        F.col("n_a").cast("double") + F.col("n_b")
    )
    mde = (_Z_ALPHA + _Z_BETA) * F.sqrt(
        2.0 * pbar * (1 - pbar) / F.least(F.col("n_a"), F.col("n_b"))
    )
    lift = F.abs(
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    )
    return arms.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        F.round(F.col("c_a").cast("double") / F.col("n_a"), 6).alias(
            "rate_a"
        ),
        F.round(F.col("c_b").cast("double") / F.col("n_b"), 6).alias(
            "rate_b"
        ),
        F.round(mde, 6).alias("mde_80pct"),
        (lift > mde).alias("lift_detectable"),
    )


@register(
    "llm_auc_roc",
    """
    WITH d AS (
        SELECT CAST(n_chars AS BIGINT) AS score, doc_id,
               lang = 'en' AS pos
        FROM documents
    ),
    r AS (
        SELECT pos,
               2 * rank() OVER (ORDER BY score)
                   + count(*) OVER (PARTITION BY score) - 1 AS r2
        FROM d
    ),
    s AS (
        SELECT CAST(count(*) FILTER (pos) AS BIGINT) AS n_pos,
               CAST(count(*) FILTER (NOT pos) AS BIGINT) AS n_neg,
               CAST(sum(CASE WHEN pos THEN r2 END) AS BIGINT) AS rsum2
        FROM r
    )
    SELECT n_pos, n_neg,
           round((CAST(rsum2 AS DOUBLE) / 2 - CAST(n_pos AS DOUBLE)
                  * (n_pos + 1) / 2)
                 / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
    FROM s
    """,
    tags=("llm", "stats"),
)
def llm_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the rank identity (the Mann-Whitney/AUC
    equivalence, Hanley & McNeil 1982): AUC = (R⁺ − n⁺(n⁺+1)/2)/
    (n⁺·n⁻) with R⁺ the positive class's midrank sum — the standard
    classifier-quality metric computed EXACTLY (ties counted as ½ by
    the midrank), with no threshold sweep or curve discretization to
    drift across engines. Demonstrated on document length scoring
    "is English" — the score/label pair is the harness, the rank
    machinery is the product: point it at any (score, label) pair.
    Doubled midranks keep the rank sum an exact int64; AUC is one
    fixed-order float expression.

    Scale shape: one block-ranked pass, one per-value reduce, one
    conditional reduce — no single-partition window."""
    d = tbl(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        "doc_id",
        (F.col("lang") == "en").alias("pos"),
    )
    ranked = api.exact_global_rank(d, "score", "doc_id", "rk")
    byval = ranked.groupBy("score").agg(
        (F.min("rk") + F.max("rk")).cast("long").alias("r2")
    )
    r = ranked.join(byval, "score").select("pos", "r2")
    s = r.agg(
        F.count_if(F.col("pos")).cast("long").alias("n_pos"),
        F.count_if(~F.col("pos")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos"), F.col("r2"))).cast("long").alias(
            "rsum2"
        ),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("rsum2").cast("double") / 2
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


@register(
    "llm_classifier_gains",
    """
    WITH d AS (
        SELECT CAST(n_chars AS BIGINT) AS score, doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ),
    r AS (
        SELECT pos,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
               count(*) OVER () AS n
        FROM d
    ),
    binned AS (
        SELECT CAST((10 * rk + n - 1) // n AS BIGINT) AS decile, pos
        FROM r
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM binned GROUP BY decile
    ),
    tot AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS n,
               CAST(sum(n_pos) AS BIGINT) AS p
        FROM per
    )
    SELECT decile, n_rows, n_pos,
           CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
           round(CAST(sum(n_pos) OVER w AS DOUBLE)
                 / (SELECT p FROM tot), 6) AS cum_gain,
           round((CAST(sum(n_pos) OVER w AS DOUBLE) / sum(n_rows) OVER w)
                 / (CAST((SELECT p FROM tot) AS DOUBLE)
                    / (SELECT n FROM tot)), 6) AS cum_lift
    FROM per
    WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    ORDER BY decile
    """,
    tags=("llm", "stats"),
)
def llm_classifier_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table (the standard campaign-targeting and
    classifier-triage chart of the data-mining literature; the
    tabular form of the CAP curve): rank documents by score
    descending, cut into 10 exact deciles, and report each decile's
    positives, the cumulative gain (share of ALL positives captured
    so far) and cumulative lift vs random — "the top 20% of docs by
    length hold X% of the English ones"; AUC condenses this table to
    one number (llm_auc_roc), the table says WHERE the ranking earns
    it. Same score/label harness as llm_auc_roc. Ranks come from the
    block-ranked api.exact_global_rank core over the negated score
    (no single-partition window touches the table), deciles from the
    exact integer ceil-division device (the agg_lorenz_curve shape);
    all counts exact int64, two rounded divisions per row.

    Scale shape: one block-ranked pass, a 1-row total broadcast, a
    10-row reduce + domain-bounded cumulative window
    (allowlisted)."""
    d = tbl(spark, sf_dir, "documents").select(
        (-F.col("n_chars")).cast("long").alias("neg_score"),
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    ranked = api.exact_global_rank(d, "neg_score", "doc_id", "rk")
    tot_n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    binned = ranked.crossJoin(F.broadcast(tot_n)).select(
        F.expr("(10 * rk + n - 1) div n").cast("long").alias("decile"),
        "pos",
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_rows").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("p"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_rows",
            "n_pos",
            F.sum("n_pos").over(wcum).cast("long").alias("cum_pos"),
            F.round(
                F.sum("n_pos").over(wcum).cast("double") / F.col("p"), 6
            ).alias("cum_gain"),
            F.round(
                (
                    F.sum("n_pos").over(wcum).cast("double")
                    / F.sum("n_rows").over(wcum)
                )
                / (F.col("p").cast("double") / F.col("n")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )
