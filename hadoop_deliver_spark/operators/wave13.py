"""§2 extensions, thirty-seventh wave — smoothed LM estimation,
eTLD+1 extraction, rank correlation.

- llm_kneser_ney: interpolated Kneser-Ney smoothing over the bigram
  table (Kneser & Ney 1995; Chen & Goodman 1998) — the estimator
  production n-gram LMs actually ship, built from the same exact
  count surfaces as llm_bigram_lm's MLE.
- fn_url_registrable_domain: eTLD+1 (registrable domain) extraction
  against a public-suffix table — the grouping key URL dedup and
  per-site rate limiting actually need (host alone over-splits,
  TLD alone over-merges).
- agg_spearman: Spearman rank correlation on exact doubled midranks
  (the Pearson-of-ranks form, tie-correct by construction) between
  a customer's total spend and order count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_KN_D = 0.75  # absolute discount (exact binary: 3/4)


@register(
    "llm_kneser_ney",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    bigrams AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM toks, LATERAL unnest(range(1, len(a))) AS t(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
    c1 AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               count(*) AS n_cont
        FROM c2 GROUP BY w1
    ),
    pc AS (SELECT w2, count(*) AS n_pred FROM c2 GROUP BY w2),
    nt AS (SELECT count(*) AS n_types FROM c2),
    scored AS (
        SELECT c2.w1, c2.w2, c2.c12, c1.c1,
               (greatest(c2.c12 - {_KN_D}, 0) / c1.c1)
               + ({_KN_D} * c1.n_cont / c1.c1)
                 * (CAST(pc.n_pred AS DOUBLE) / nt.n_types) AS p_kn
        FROM c2
        JOIN c1 USING (w1)
        JOIN pc USING (w2)
        CROSS JOIN nt
        WHERE c1.c1 >= 10
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY w1
                                     ORDER BY p_kn DESC, w2) AS rnk
        FROM scored
    )
    SELECT w1, w2, c12, c1, round(p_kn, 6) AS p_kn
    FROM ranked WHERE rnk <= 3 ORDER BY w1, round(p_kn, 6) DESC, w2
    """,
    tags=("llm", "lm"),
)
def llm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    1995; Chen & Goodman 1998's interpolated form with absolute
    discount D=3/4): P(w2|w1) = max(c−D,0)/c1 + λ(w1)·Pcont(w2),
    where λ = D·N1+(w1·)/c1 backs off mass to the CONTINUATION
    unigram Pcont(w2) = N1+(·w2)/|bigram types| — 'how many contexts
    does w2 complete', the insight that makes KN the estimator
    shipped in production n-gram LMs instead of MLE or add-k. Top-3
    continuations per context (support ≥ 10), ranked BEFORE display
    rounding — every input to the float expression is an exact
    integer (or the exact-binary D), identically ordered on both
    engines.

    Scale shape: the same two aggregates as llm_bigram_lm (bigram
    counts, then context totals as an aggregate OF the aggregate),
    plus one vocabulary-sized predecessor aggregate joined back by
    hash and a 1-row type count broadcast; the rank window
    partitions by context."""
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
    c1 = c2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).alias("n_cont"),
    )
    pc = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n_pred"))
    nt = c2.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        F.greatest(F.col("c12") - _KN_D, F.lit(0.0)) / F.col("c1")
    ) + (_KN_D * F.col("n_cont") / F.col("c1")) * (
        F.col("n_pred").cast("double") / F.col("n_types")
    )
    scored = (
        c2.join(c1, "w1")
        .join(pc, "w2")
        .crossJoin(F.broadcast(nt))
        .where(F.col("c1") >= 10)
        .withColumn("p_kn", p_kn)
    )
    w = Window.partitionBy("w1").orderBy(F.col("p_kn").desc(), "w2")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("w1", "w2", "c12", "c1", F.round("p_kn", 6).alias("p_kn"))
        .orderBy("w1", F.col("p_kn").desc(), "w2")
    )


_PSL2 = ("co.uk", "com.au", "github.io")
_PSL1 = ("com", "org", "net", "uk", "au", "io")
_SUFFIXES = ("com", "co.uk", "org", "com.au", "github.io", "net")


@register(
    "fn_url_registrable_domain",
    f"""
    WITH hosts AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
               || source || '.'
               || ({list(_SUFFIXES)!r}::VARCHAR[])[(doc_id % 6) + 1]
                   AS host
        FROM documents
    ),
    lab AS (
        SELECT doc_id, host, string_split(host, '.') AS l,
               len(string_split(host, '.')) AS n
        FROM hosts
    ),
    reg AS (
        SELECT doc_id, host,
               CASE WHEN l[n - 1] || '.' || l[n] IN {_PSL2!r}
                    THEN l[n - 2] || '.' || l[n - 1] || '.' || l[n]
                    WHEN l[n] IN {_PSL1!r}
                    THEN l[n - 1] || '.' || l[n]
                    ELSE host END AS regdom
        FROM lab
    )
    SELECT regdom,
           count(*) AS n_docs,
           count(DISTINCT host) AS n_hosts
    FROM reg GROUP BY regdom ORDER BY regdom
    """,
    tags=("function", "url"),
)
def fn_url_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain (eTLD+1) extraction against a public-suffix
    table: the label left of the LONGEST matching public suffix plus
    the suffix — so a.src0.co.uk groups as src0.co.uk (not co.uk,
    which the naive last-two-labels rule would give, merging every
    UK site) and user.github.io stays user.github.io (github.io is
    itself a public suffix). THE grouping key URL dedup, per-site
    crawl budgets, and cookie scoping need. Hosts are synthesized
    deterministically over six suffix classes (the llm_dedup_url
    device); suffix matching is longest-first CASE over the label
    array — pure column algebra.

    Scale shape: map-only extraction (split + element_at + CASE — in
    whole-stage codegen; a full ~10k-entry PSL would broadcast-join
    on the candidate suffix instead of inlining, same shape), then
    one keyed aggregate bounded by the domain count."""
    d = tbl(spark, sf_dir, "documents")
    sfx = F.array(*[F.lit(s) for s in _SUFFIXES])
    host = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("."),
        F.element_at(sfx, (F.col("doc_id") % 6 + 1).cast("int")),
    )
    lab = d.select("doc_id", host.alias("host")).select(
        "doc_id",
        "host",
        F.split("host", "\\.").alias("l"),
        F.size(F.split("host", "\\.")).alias("n"),
    )
    el = lambda k: F.element_at(F.col("l"), (F.col("n") + k).cast("int"))  # noqa: E731
    last2 = F.concat(el(-1), F.lit("."), el(0))
    regdom = (
        F.when(
            last2.isin(*_PSL2),
            F.concat(el(-2), F.lit("."), last2),
        )
        .when(
            el(0).isin(*_PSL1),
            F.concat(el(-1), F.lit("."), el(0)),
        )
        .otherwise(F.col("host"))
    )
    return (
        lab.select("host", regdom.alias("regdom"))
        .groupBy("regdom")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("host").alias("n_hosts"),
        )
        .orderBy("regdom")
    )


@register(
    "agg_spearman",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS spend,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    rx AS (
        SELECT o_custkey, spend, n_orders,
               CAST(2 * avg(rn) OVER (PARTITION BY spend) AS BIGINT) AS rx2
        FROM (SELECT *, row_number() OVER (ORDER BY spend, o_custkey) AS rn
              FROM cust)
    ),
    ry AS (
        SELECT o_custkey,
               CAST(2 * avg(rn) OVER (PARTITION BY n_orders) AS BIGINT) AS ry2
        FROM (SELECT *, row_number() OVER (ORDER BY n_orders, o_custkey)
                  AS rn
              FROM cust)
    ),
    j AS (SELECT rx.rx2, ry.ry2 FROM rx JOIN ry USING (o_custkey)),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(rx2) AS BIGINT) AS sx,
               CAST(sum(ry2) AS BIGINT) AS sy,
               CAST(sum(rx2 * ry2) AS DOUBLE) AS sxy,
               CAST(sum(rx2 * rx2) AS DOUBLE) AS sxx,
               CAST(sum(ry2 * ry2) AS DOUBLE) AS syy
        FROM j
    )
    SELECT n,
           round((n * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * sxx - CAST(sx AS DOUBLE) * sx)
                        * (n * syy - CAST(sy AS DOUBLE) * sy)), 4) AS rho
    FROM s
    """,
    tags=("aggregate", "stats"),
)
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's total spend and
    order count — the monotone-association test that ignores the
    money column's heavy tail. Computed as Pearson over DOUBLED
    MIDRANKS (tie groups share their average rank; doubling keeps
    every midrank an exact int64), with both rank passes on the
    block-ranked api.exact_global_rank core — midrank per tie group
    is (min+max)/2 of its consecutive ranks, so no single-partition
    window touches the table. Moments are exact (DECIMAL-exact
    products cast once to double); the closed form is
    identically-ordered double arithmetic. Doubling cancels in ρ.

    Scale shape: one keyed aggregate to per-customer rows, two
    block-ranked rank passes, one hash self-join on the customer
    key, one scalar reduce."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    cust = o.groupBy("o_custkey").agg(
        F.sum(cents).cast("long").alias("spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    def midranks2(df: DataFrame, col: str, out: str) -> DataFrame:
        ranked = api.exact_global_rank(df, col, "o_custkey", "_r")
        g = ranked.groupBy(col).agg(
            (F.min("_r") + F.max("_r")).alias(out)
        )
        return ranked.join(g, col).select("o_custkey", out)

    rx = midranks2(cust, "spend", "rx2")
    ry = midranks2(cust, "n_orders", "ry2")
    j = rx.join(ry, "o_custkey")
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return s.select(
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - sxd * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - sxd * F.col("sx"))
                * (F.col("n") * F.col("syy") - syd * F.col("sy"))
            ),
            4,
        ).alias("rho"),
    )
