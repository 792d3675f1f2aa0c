"""§2 extensions, forty-first wave — held-out LM evaluation, robust
means, network assortativity.

- llm_perplexity_eval: train a Kneser-Ney bigram LM on the even
  half of the corpus and measure held-out perplexity per language
  on the odd half — the actual train/eval loop a data-quality
  experiment runs, entirely in relational algebra.
- agg_trimmed_mean: exact 5% trimmed and winsorized means of the
  money column — robust location estimates with every cut decided
  by integer rank comparisons.
- graph_assortativity: degree assortativity of the co-activity
  graph (Newman 2002) — do well-connected users meet well-connected
  users? — as Pearson over the directed edge list from exact
  integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_D = 0.75  # KN absolute discount


@register(
    "llm_perplexity_eval",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents
    ),
    bg AS (
        SELECT doc_id, lang, a[i] AS w1, a[i + 1] AS w2
        FROM toks, LATERAL unnest(range(1, len(a))) AS t(i)
    ),
    c2 AS (
        SELECT w1, w2, count(*) AS c12 FROM bg
        WHERE doc_id % 2 = 0 GROUP BY 1, 2
    ),
    c1 AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n_cont
        FROM c2 GROUP BY w1
    ),
    pc AS (SELECT w2, count(*) AS n_pred FROM c2 GROUP BY w2),
    nt AS (
        SELECT count(*) AS n_types,
               (SELECT count(DISTINCT w1) FROM c2) AS v
        FROM c2
    ),
    ev AS (
        SELECT bg.lang,
               CASE
                 WHEN c1.c1 IS NULL THEN 1.0 / (nt.v + 1)
                 ELSE greatest(coalesce(c2.c12, 0) - {_D}, 0) / c1.c1
                      + ({_D} * c1.n_cont / c1.c1)
                        * (CASE WHEN pc.n_pred IS NULL
                                THEN 1.0 / (nt.n_types + nt.v)
                                ELSE CAST(pc.n_pred AS DOUBLE) / nt.n_types
                           END)
               END AS p,
               CASE WHEN c2.c12 IS NULL THEN 1 ELSE 0 END AS unseen
        FROM bg
        LEFT JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
        LEFT JOIN c1 ON c1.w1 = bg.w1
        LEFT JOIN pc ON pc.w2 = bg.w2
        CROSS JOIN nt
        WHERE bg.doc_id % 2 = 1
    )
    SELECT lang,
           count(*) AS n_bigrams,
           round(CAST(sum(unseen) AS DOUBLE) / count(*), 4)
               AS unseen_rate,
           round(exp(-sum(ln(p)) / count(*)), 4) AS ppl
    FROM ev GROUP BY lang ORDER BY lang
    """,
    tags=("llm", "lm"),
)
def llm_perplexity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation — the loop a data-quality
    experiment actually runs: train an interpolated Kneser-Ney
    bigram LM on even doc_ids, score the odd half, report per-lang
    perplexity exp(−Σ ln P / N) and the unseen-bigram rate. Unseen
    CONTEXTS fall to a uniform 1/(V+1) floor, unseen continuations
    to 1/(types+V) inside the KN interpolation — fixed, documented
    conventions mirrored exactly by the oracle, so the eval is
    reproducible (the property LM-eval harnesses routinely lose to
    tokenizer/smoothing drift).

    Scale shape: train-side aggregates are the llm_kneser_ney plan;
    the eval pass is the bigram stream LEFT-joined to three keyed
    aggregates (hash joins on w1/w2) plus a 1-row scalar broadcast,
    then one per-lang reduce. The ln-sum is the only float
    accumulation (error ~1e-12 relative; displayed at 1e-4)."""
    d = tbl(spark, sf_dir, "documents")
    a = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))).alias("w1"),
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))).alias("w2"),
    )
    bg = d.select(
        "doc_id", "lang", F.explode(pairs).alias("b")
    ).select(
        "doc_id",
        "lang",
        F.col("b.w1").alias("w1"),
        F.col("b.w2").alias("w2"),
    )
    train = bg.where(F.col("doc_id") % 2 == 0)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).alias("n_cont"),
    )
    pc = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n_pred"))
    nt = c2.agg(F.count(F.lit(1)).alias("n_types")).crossJoin(
        F.broadcast(
            c2.select("w1").distinct().agg(F.count(F.lit(1)).alias("v"))
        )
    )
    pcont = F.when(
        F.col("n_pred").isNull(),
        1.0 / (F.col("n_types") + F.col("v")),
    ).otherwise(F.col("n_pred").cast("double") / F.col("n_types"))
    p = F.when(
        F.col("c1").isNull(), 1.0 / (F.col("v") + 1)
    ).otherwise(
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - _D, F.lit(0.0))
        / F.col("c1")
        + (_D * F.col("n_cont") / F.col("c1")) * pcont
    )
    ev = (
        bg.where(F.col("doc_id") % 2 == 1)
        .join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(pc, "w2", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "lang",
            p.alias("p"),
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("unseen"),
        )
    )
    return (
        ev.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("unseen").cast("double") / F.count(F.lit(1)), 4
            ).alias("unseen_rate"),
            F.round(
                F.exp(-F.sum(F.log("p")) / F.count(F.lit(1))), 4
            ).alias("ppl"),
        )
        .orderBy("lang")
    )


@register(
    "agg_trimmed_mean",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rk,
               count(*) OVER () AS n
        FROM o
    ),
    k AS (SELECT n, CAST(n // 20 AS BIGINT) AS cut FROM r LIMIT 1),
    mid AS (
        SELECT r.cents FROM r CROSS JOIN k
        WHERE r.rk > k.cut AND r.rk <= k.n - k.cut
    ),
    lo AS (SELECT min(cents) AS v FROM mid),
    hi AS (SELECT max(cents) AS v FROM mid),
    winz AS (
        SELECT CASE WHEN r.cents < lo.v THEN lo.v
                    WHEN r.cents > hi.v THEN hi.v
                    ELSE r.cents END AS w
        FROM r CROSS JOIN lo CROSS JOIN hi
    )
    SELECT (SELECT CAST(max(n) AS BIGINT) FROM k) AS n,
           (SELECT CAST(count(*) AS BIGINT) FROM mid) AS n_kept,
           (SELECT round(CAST(sum(cents) AS DOUBLE) / count(*) / 100, 4)
            FROM mid) AS trimmed_mean,
           (SELECT round(CAST(sum(w) AS DOUBLE) / count(*) / 100, 4)
            FROM winz) AS winsorized_mean
    """,
    tags=("aggregate", "stats"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-trimmed and winsorized means of order value — the
    robust location estimates a metrics pipeline reports next to the
    raw mean when the money column has a heavy tail. The trim cut is
    a pure integer rank comparison (rank > ⌊n/20⌋ from the
    block-ranked api.exact_global_rank core — no percentile_approx,
    no interpolation), the winsorized variant clamps to the kept
    range's exact min/max, and every sum is exact cents; the only
    floats are the two final divisions.

    Scale shape: one block-ranked pass, a 1-row cut broadcast
    against the ranked rows, two scalar reduces."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"), "o_orderkey")
    r = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    k = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.count(F.lit(1)) / 20).cast("long").alias("cut"),
    )
    mid = r.crossJoin(F.broadcast(k)).where(
        (F.col("rk") > F.col("cut")) & (F.col("rk") <= F.col("n") - F.col("cut"))
    )
    bounds = mid.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    tm = mid.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum("cents").cast("double") / F.count(F.lit(1)) / 100, 4
        ).alias("trimmed_mean"),
    )
    wz = (
        r.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("cents") < F.col("lo"), F.col("lo"))
            .when(F.col("cents") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("cents"))
            .alias("w")
        )
        .agg(
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)) / 100, 4
            ).alias("winsorized_mean")
        )
    )
    return (
        k.select(F.col("n").cast("long").alias("n"))
        .crossJoin(F.broadcast(tm))
        .crossJoin(F.broadcast(wz))
        .select("n", "n_kept", "trimmed_mean", "winsorized_mean")
    )


@register(
    "graph_assortativity",
    """
    WITH du AS (
        SELECT DISTINCT time_bucket(INTERVAL 10 MINUTE, ts) AS b, user_id
        FROM events
    ),
    e AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM du a JOIN du b ON b.b = a.b AND a.user_id != b.user_id
    ),
    deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
    el AS (
        SELECT da.d AS du, db.d AS dv
        FROM e JOIN deg da ON da.u = e.u JOIN deg db ON db.u = e.v
    ),
    s AS (
        SELECT count(*) AS m,
               CAST(sum(du) AS BIGINT) AS sx,
               CAST(sum(dv) AS BIGINT) AS sy,
               CAST(sum(du * dv) AS DOUBLE) AS sxy,
               CAST(sum(du * du) AS DOUBLE) AS sxx,
               CAST(sum(dv * dv) AS DOUBLE) AS syy
        FROM el
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           round((m * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((m * sxx - CAST(sx AS DOUBLE) * sx)
                        * (m * syy - CAST(sy AS DOUBLE) * sy)), 4)
               AS assortativity
    FROM s
    """,
    tags=("graph", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the 10-minute
    co-activity graph: the Pearson correlation of endpoint degrees
    over the DIRECTED edge list — positive means hubs meet hubs
    (social nets), negative means hubs serve spokes
    (infrastructure). Both orientations of each edge are scored, the
    standard symmetrization. Every moment is an exact integer sum
    (DECIMAL-safe pattern available beyond int64 ranges); the closed
    form runs in identically-ordered doubles.

    Scale shape: the bucket pair join is keyed on the time bucket
    (co-activity bounds the quadratic per bucket); degrees are one
    keyed aggregate joined back by hash on each endpoint; one scalar
    reduce. Same-day caveat as graph_triangle_count: on a dense
    co-activity graph the edge list is the dominant shuffle, and a
    sparser edge rule (finer buckets) is the knob."""
    e = tbl(spark, sf_dir, "events")
    du = e.select(
        F.window("ts", "10 minutes").getField("start").alias("b"),
        "user_id",
    ).distinct()
    a_, b_ = du.alias("a"), du.alias("b")
    edges = (
        a_.join(
            b_,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .distinct()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    el = (
        edges.join(deg.withColumnsRenamed({"u": "u1", "d": "du"}), F.col("u") == F.col("u1"))
        .join(deg.withColumnsRenamed({"u": "u2", "d": "dv"}), F.col("v") == F.col("u2"))
        .select("du", "dv")
    )
    s = el.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("du").cast("long").alias("sx"),
        F.sum("dv").cast("long").alias("sy"),
        F.sum((F.col("du") * F.col("dv")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("du") * F.col("du")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("dv") * F.col("dv")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return (
        s.crossJoin(F.broadcast(nn))
        .select(
            "n_nodes",
            (F.col("m") / 2).cast("long").alias("n_edges"),
            F.round(
                (F.col("m") * F.col("sxy") - sxd * F.col("sy"))
                / F.sqrt(
                    (F.col("m") * F.col("sxx") - sxd * F.col("sx"))
                    * (F.col("m") * F.col("syy") - syd * F.col("sy"))
                ),
                4,
            ).alias("assortativity"),
        )
    )
