"""§2 extensions, fortieth wave — retrieval evaluation and
inventory classification.

- llm_retrieval_metrics: the IR evaluation harness (NDCG@10 /
  recall@10 per query) over the BM25 ranking with graded term-count
  relevance — the readout a retrieval pipeline gates reranker
  deploys on.
- orders_abc_xyz: the ABC-XYZ inventory matrix — Pareto revenue
  classes (block-ranked exact cumulative shares) crossed with
  demand-variability classes (CV² in cross-multiplied integers) —
  the supply-chain planning staple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_IR_TERMS = ("table", "scan", "merge", "sort", "key")


@register(
    "llm_retrieval_metrics",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN {_IR_TERMS!r}
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT (SELECT count(*) FROM documents) AS n,
               (SELECT avg(dl) FROM dl) AS avgdl
    ),
    scored AS (
        SELECT tf.term, tf.doc_id,
               least(tf.tf, 5) AS rel,
               CAST(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
                    AS REAL) AS s
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
    ),
    ranked AS (
        SELECT term, rel,
               row_number() OVER (PARTITION BY term
                                  ORDER BY s DESC, doc_id) AS rk
        FROM scored
    ),
    ideal AS (
        SELECT term, rel,
               row_number() OVER (PARTITION BY term
                                  ORDER BY rel DESC, doc_id) AS rk
        FROM scored
    ),
    m AS (
        SELECT r.term,
               sum(CASE WHEN r.rk <= 10
                        THEN (pow(2, r.rel) - 1) / log2(r.rk + 1)
                        ELSE 0 END) AS dcg,
               sum(CASE WHEN r.rk <= 10 THEN r.rel ELSE 0 END) AS rel10,
               CAST(sum(r.rel) AS BIGINT) AS rel_total,
               count(*) AS n_cand
        FROM ranked r GROUP BY r.term
    ),
    mi AS (
        SELECT term,
               sum(CASE WHEN rk <= 10
                        THEN (pow(2, rel) - 1) / log2(rk + 1)
                        ELSE 0 END) AS idcg
        FROM ideal GROUP BY term
    )
    SELECT m.term, m.n_cand, m.rel_total,
           round(m.dcg / mi.idcg, 4) AS ndcg10,
           round(CAST(m.rel10 AS DOUBLE) / m.rel_total, 4) AS recall10
    FROM m JOIN mi USING (term)
    ORDER BY term
    """,
    tags=("llm", "retrieval"),
)
def llm_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation harness over the BM25 ranking: per single-term
    query, NDCG@10 and graded recall@10 against term-count relevance
    (tf capped at 5 — the graded label an eval set would carry). The
    metric machinery is the point: ranked list per query via a
    keyed window on the float32 score surface (the REAL cast is
    llm_bm25's established ulp-absorber, with doc_id tiebreak),
    ideal list by relevance, DCG with the 2^rel−1 gain, recall as
    rel-mass capture. NDCG < 1 here measures exactly BM25's length
    normalization trading against raw tf — the effect a reranker
    A/B would read.

    Scale shape: the same three keyed token aggregates as llm_bm25;
    ranking windows partition per query; metric rollups are
    per-query aggregates of ≤|candidates| rows."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    qt = toks.where(F.col("term").isin(*_IR_TERMS))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = d.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        F.broadcast(dl.agg(F.avg("dl").alias("avgdl")))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = (
        idf
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    ).cast("float")
    scored = (
        tf.join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            F.least("tf", F.lit(5)).alias("rel"),
            score.alias("s"),
        )
    )
    wr = Window.partitionBy("term").orderBy(F.col("s").desc(), "doc_id")
    wi = Window.partitionBy("term").orderBy(F.col("rel").desc(), "doc_id")
    gain = lambda rk: F.when(  # noqa: E731
        rk <= 10,
        (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(rk + 1),
    ).otherwise(F.lit(0.0))
    ranked = scored.withColumn("rk", F.row_number().over(wr))
    ideal = scored.withColumn("rk", F.row_number().over(wi))
    m = ranked.groupBy("term").agg(
        F.sum(gain(F.col("rk"))).alias("dcg"),
        F.sum(F.when(F.col("rk") <= 10, F.col("rel")).otherwise(0)).alias(
            "rel10"
        ),
        F.sum("rel").cast("long").alias("rel_total"),
        F.count(F.lit(1)).alias("n_cand"),
    )
    mi = ideal.groupBy("term").agg(F.sum(gain(F.col("rk"))).alias("idcg"))
    return (
        m.join(mi, "term")
        .select(
            "term",
            "n_cand",
            "rel_total",
            F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg10"),
            F.round(
                F.col("rel10").cast("double") / F.col("rel_total"), 4
            ).alias("recall10"),
        )
        .orderBy("term")
    )


@register(
    "orders_abc_xyz",
    """
    WITH p AS (
        SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    mq AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS mon,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
        SELECT l_partkey,
               count(*) AS nm,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS ss
        FROM mq GROUP BY l_partkey
    ),
    abc AS (
        SELECT l_partkey, rev,
               CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum,
               CAST(sum(rev) OVER () AS BIGINT) AS total
        FROM p
    ),
    cls AS (
        SELECT abc.l_partkey,
               CASE WHEN abc.cum * 10 <= abc.total * 7 THEN 'A'
                    WHEN abc.cum * 10 <= abc.total * 9 THEN 'B'
                    ELSE 'C' END AS abc_class,
               CASE WHEN 4 * xyz.nm * xyz.ss <= 5 * xyz.s * xyz.s THEN 'X'
                    WHEN xyz.nm * xyz.ss <= 2 * xyz.s * xyz.s THEN 'Y'
                    ELSE 'Z' END AS xyz_class,
               abc.rev
        FROM abc JOIN xyz USING (l_partkey)
    )
    SELECT abc_class, xyz_class,
           count(*) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS rev_cents
    FROM cls GROUP BY 1, 2 ORDER BY abc_class, xyz_class
    """,
    tags=("analytics", "ranking"),
)
def orders_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification — the supply-chain planning
    matrix: ABC = Pareto revenue classes (A = parts inside the top
    70% of cumulative revenue, B to 90%, C the tail) on the
    revenue-descending order via the block-ranked
    api.exact_global_cumsum_desc core; XYZ = demand variability from
    monthly quantities, classified on CV² ≤ 0.25 / ≤ 1 decided in
    CROSS-MULTIPLIED integers (4·n·Σq² ≤ 5·(Σq)² ⇔ CV ≤ 0.5 under
    the population variance) — no float ever touches a class
    boundary. A-X cells are forecast-and-automate; C-Z cells are
    order-on-demand.

    Scale shape: two keyed aggregates over lineitem (per-part, per
    part-month), one block-ranked cumsum pass over the per-part
    aggregate, one 1-row total broadcast, a ≤9-row matrix rollup."""
    li = tbl(spark, sf_dir, "lineitem")
    cents = (dec2("l_extendedprice") * 100).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("rev"))
    mq = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mon")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    xyz = mq.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("nm"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    cum = api.exact_global_cumsum_desc(p, "rev", "l_partkey", "cum")
    total = p.agg(F.sum("rev").cast("long").alias("total"))
    abc = cum.crossJoin(F.broadcast(total))
    abc_class = (
        F.when(F.col("cum") * 10 <= F.col("total") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("total") * 9, "B")
        .otherwise("C")
    )
    xyz_class = (
        F.when(
            4 * F.col("nm") * F.col("ss") <= 5 * F.col("s") * F.col("s"),
            "X",
        )
        .when(F.col("nm") * F.col("ss") <= 2 * F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
    )
    return (
        abc.join(xyz, "l_partkey")
        .select(
            abc_class.alias("abc_class"),
            xyz_class.alias("xyz_class"),
            "rev",
        )
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("long").alias("rev_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )
