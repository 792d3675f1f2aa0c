"""§2 extensions, hundred-sixty-ninth wave — exact relational ML:
the decision stump and categorical Naive Bayes.

- agg_decision_stump: the best single Gini split of the discount
  axis predicting returns — CART's depth-1 special case, computed
  EXACTLY because the candidate-threshold set is the (bounded)
  discount domain; the interpretable baseline every tree model is
  benchmarked against.
- agg_naive_bayes_eval: a full categorical Naive Bayes classifier —
  train (Laplace-smoothed priors and likelihoods over the
  discount×tax grid), predict (argmax log-posterior per cell), and
  evaluate (3×3 confusion + accuracy vs the majority baseline) —
  entirely as relational algebra over exact counts; resubstitution
  evaluation stated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "agg_decision_stump",
    """
    WITH base AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    per AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM base GROUP BY 1
    ),
    cum AS (
        SELECT d,
               CAST(sum(n) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
               CAST(sum(pos) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
               CAST(sum(n) OVER () AS BIGINT) AS nt,
               CAST(sum(pos) OVER () AS BIGINT) AS pt
        FROM per
    ),
    gain AS (
        SELECT d AS thr, nl, nt - nl AS nr, pl, pt - pl AS pr, nt, pt,
               (2.0 * pt / nt * (1 - CAST(pt AS DOUBLE) / nt))
               - (CAST(nl AS DOUBLE) / nt)
                 * (2.0 * pl / nl * (1 - CAST(pl AS DOUBLE) / nl))
               - (CAST(nt - nl AS DOUBLE) / nt)
                 * (2.0 * (pt - pl) / (nt - nl)
                    * (1 - CAST(pt - pl AS DOUBLE) / (nt - nl))) AS g
        FROM cum WHERE nl < nt
    )
    SELECT thr AS split_discount_pct,
           nl AS n_left, nr AS n_right,
           round(CAST(pl AS DOUBLE) / nl, 6) AS return_rate_left,
           round(CAST(pr AS DOUBLE) / nr, 6) AS return_rate_right,
           round(g, 8) AS gini_gain,
           round(g, 8) > 0.0001 AS informative_split
    FROM (SELECT *, row_number() OVER (ORDER BY g DESC, thr) AS rn
          FROM gain)
    WHERE rn = 1
    """,
    tags=("agg", "stats", "ml"),
)
def agg_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact depth-1 CART split (Breiman et al. 1984) on the
    discount axis predicting the return flag: for every candidate
    threshold t in the discount domain (≤11 integer-percent values —
    a DOMAIN bound, so the search is exhaustive, not sampled), the
    Gini gain of splitting at d ≤ t is
    G(parent) − (n_L/n)·G(L) − (n_R/n)·G(R) with the binary Gini
    G = 2p(1−p), and the reported stump is the max-gain threshold
    (min-threshold tiebreak, pinned). All counts are exact integers
    via one keyed reduce + a running sum over the ≤11-row domain
    frame; the gain is a fixed textual float chain and the
    'informative' flag reads the ROUNDED gain against a stated 1e-4
    screening literal. The interpretable baseline every tree
    benchmark starts from — and the exactness contrast to sampled
    split finders.

    Scale shape: one map-side-combined keyed reduce to ≤11 rows;
    everything after lives on that domain frame."""
    li = tbl(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per = base.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "d",
        F.sum("n").over(w).cast("long").alias("nl"),
        F.sum("pos").over(w).cast("long").alias("pl"),
        F.sum("n").over(wall).cast("long").alias("nt"),
        F.sum("pos").over(wall).cast("long").alias("pt"),
    )
    nl, pl, nt, pt = (F.col(c) for c in ("nl", "pl", "nt", "pt"))
    gini = lambda p, n: 2.0 * p / n * (1 - p.cast("double") / n)  # noqa: E731
    g = (
        gini(pt, nt)
        - (nl.cast("double") / nt) * gini(pl, nl)
        - ((nt - nl).cast("double") / nt) * gini(pt - pl, nt - nl)
    )
    gain = cum.filter(nl < nt).select(
        F.col("d").alias("thr"),
        nl.alias("nl"),
        (nt - nl).alias("nr"),
        pl.alias("pl"),
        (pt - pl).alias("pr"),
        g.alias("g"),
    )
    best = gain.orderBy(F.col("g").desc(), "thr").limit(1)
    return best.select(
        F.col("thr").alias("split_discount_pct"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.round(F.col("pl").cast("double") / F.col("nl"), 6).alias(
            "return_rate_left"
        ),
        F.round(F.col("pr").cast("double") / F.col("nr"), 6).alias(
            "return_rate_right"
        ),
        F.round("g", 8).alias("gini_gain"),
        (F.round("g", 8) > 0.0001).alias("informative_split"),
    )


@register(
    "agg_naive_bayes_eval",
    """
    WITH base AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_tax * 100) AS BIGINT) AS t,
               l_returnflag AS c
        FROM lineitem
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
    pri AS (
        SELECT c, CAST(count(*) AS BIGINT) AS nc FROM base GROUP BY 1
    ),
    dom_d AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS kd FROM base),
    dom_t AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS kt FROM base),
    like_d AS (
        SELECT c, d, CAST(count(*) AS BIGINT) AS ndc
        FROM base GROUP BY 1, 2
    ),
    like_t AS (
        SELECT c, t, CAST(count(*) AS BIGINT) AS ntc
        FROM base GROUP BY 1, 2
    ),
    cells AS (
        SELECT dd.d, tt.t, p.c,
               ln(CAST(p.nc AS DOUBLE) / n.nt)
               + ln((coalesce(ld.ndc, 0) + 1.0) / (p.nc + dom_d.kd))
               + ln((coalesce(lt.ntc, 0) + 1.0) / (p.nc + dom_t.kt))
                   AS logp
        FROM (SELECT DISTINCT d FROM base) dd
        CROSS JOIN (SELECT DISTINCT t FROM base) tt
        CROSS JOIN pri p
        LEFT JOIN like_d ld ON ld.c = p.c AND ld.d = dd.d
        LEFT JOIN like_t lt ON lt.c = p.c AND lt.t = tt.t
        CROSS JOIN n CROSS JOIN dom_d CROSS JOIN dom_t
    ),
    pred AS (
        SELECT d, t, c AS pred_c
        FROM (SELECT *, row_number() OVER (PARTITION BY d, t
                        ORDER BY logp DESC, c) AS rn
              FROM cells)
        WHERE rn = 1
    ),
    conf AS (
        SELECT b.c AS actual, p.pred_c AS predicted,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM base b JOIN pred p ON p.d = b.d AND p.t = b.t
        GROUP BY 1, 2
    )
    SELECT actual, predicted, n_lines,
           round((SELECT CAST(sum(CASE WHEN actual = predicted
                                       THEN n_lines ELSE 0 END) AS DOUBLE)
                         / sum(n_lines)
                  FROM conf), 6) AS accuracy
    FROM conf
    ORDER BY actual, predicted
    """,
    tags=("agg", "stats", "ml"),
)
def agg_naive_bayes_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical Naive Bayes as pure relational algebra: train
    Laplace-smoothed (α=1, pinned) class priors and per-feature
    likelihoods over the discount×tax percent grid, predict the
    argmax log-posterior per grid cell (class-name tiebreak,
    pinned), and report the 3×3 confusion matrix with resubstitution
    accuracy on every row (train = test, stated — the operator is
    the exact-relational TRAINING/SCORING machinery, not a
    generalization claim; llm_classifier_eval handles held-out
    metric surfaces). The grid is a DOMAIN bound (≤11×9 cells at any
    corpus scale), so scoring is a cell-table broadcast join, never
    a per-row model call. Counts are exact integers; log-posteriors
    are fixed textual chains whose argmax ties break by name.

    Scale shape: three keyed reduces (priors, two likelihood
    tables), a ≤99-cell assembly with a per-cell 3-row window, one
    fact join against the bounded cell table, a 9-row confusion
    reduce."""
    li = tbl(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
        F.col("l_returnflag").alias("c"),
    )
    n = base.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    pri = base.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("nc"))
    kd = base.agg(F.count_distinct("d").cast("long").alias("kd"))
    kt = base.agg(F.count_distinct("t").cast("long").alias("kt"))
    like_d = base.groupBy("c", "d").agg(
        F.count(F.lit(1)).cast("long").alias("ndc")
    )
    like_t = base.groupBy("c", "t").agg(
        F.count(F.lit(1)).cast("long").alias("ntc")
    )
    dd = base.select("d").distinct()
    tt = base.select("t").distinct()
    cells = (
        dd.crossJoin(tt)
        .crossJoin(F.broadcast(pri))
        .join(like_d, ["c", "d"], "left")
        .join(like_t, ["c", "t"], "left")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(kd))
        .crossJoin(F.broadcast(kt))
        .select(
            "d",
            "t",
            "c",
            (
                F.log(F.col("nc").cast("double") / F.col("nt"))
                + F.log(
                    (F.coalesce(F.col("ndc"), F.lit(0)) + 1.0)
                    / (F.col("nc") + F.col("kd"))
                )
                + F.log(
                    (F.coalesce(F.col("ntc"), F.lit(0)) + 1.0)
                    / (F.col("nc") + F.col("kt"))
                )
            ).alias("logp"),
        )
    )
    wcell = Window.partitionBy("d", "t").orderBy(
        F.col("logp").desc(), "c"
    )
    pred = (
        cells.withColumn("rn", F.row_number().over(wcell))
        .filter(F.col("rn") == 1)
        .select("d", "t", F.col("c").alias("pred_c"))
    )
    conf = (
        base.join(F.broadcast(pred), ["d", "t"])
        .groupBy(
            F.col("c").alias("actual"), F.col("pred_c").alias("predicted")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = (
        F.sum(
            F.when(
                F.col("actual") == F.col("predicted"), F.col("n_lines")
            ).otherwise(0)
        )
        .over(wall)
        .cast("double")
        / F.sum("n_lines").over(wall)
    )
    return (
        conf.select(
            "actual",
            "predicted",
            "n_lines",
            F.round(acc, 6).alias("accuracy"),
        )
        .orderBy("actual", "predicted")
    )
