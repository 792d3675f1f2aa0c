"""§2 extensions, thirty-fifth wave — exact-quantile DQ fences, RAKE
keywords, crosstab surface, reproducible sampling.

- dq_outlier_iqr: Tukey IQR outlier fences with EXACT quantiles read
  off the block-ranked CDF (api.exact_global_keyed_cumsum) — no
  percentile_approx in a correctness gate.
- llm_keyword_rake: RAKE keyword extraction (Rose et al. 2010) —
  stopword-delimited phrases via a per-document running stop count,
  word degree/frequency scores, phrase ranking.
- agg_crosstab: DataFrame.stat.crosstab parity — the contingency
  pivot whose COLUMNS come from the data, checked against an
  explicit conditional-aggregate oracle.
- sample_stratified_hash: reproducible stratified sampling — an
  exact 10% per stratum taken on the md5 order, so every engine and
  every rerun draws the SAME sample (sampleBy's seeded Bernoulli
  draw is neither exact nor cross-engine reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "dq_outlier_iqr",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    byval AS (SELECT cents, count(*) AS cnt FROM o GROUP BY cents),
    cdf AS (
        SELECT cents, cnt,
               CAST(sum(cnt) OVER (ORDER BY cents
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
        FROM byval
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM byval),
    q AS (
        SELECT
            (SELECT min(cents) FROM cdf CROSS JOIN tot
             WHERE cum * 4 >= n) AS q1,
            (SELECT min(cents) FROM cdf CROSS JOIN tot
             WHERE cum * 4 >= 3 * n) AS q3,
            (SELECT n FROM tot) AS n
    )
    SELECT n, q1, q3,
           q3 - q1 AS iqr,
           (SELECT CAST(count(*) AS BIGINT) FROM o CROSS JOIN q qq
            WHERE o.cents * 2 < 2 * qq.q1 - 3 * (qq.q3 - qq.q1)
               OR o.cents * 2 > 2 * qq.q3 + 3 * (qq.q3 - qq.q1))
               AS n_outliers
    FROM q
    """,
    tags=("dq", "stats"),
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier gate on the money column with EXACT
    quantiles: Q1/Q3 are the lowest values whose CDF reaches
    ¼ and ¾ (type-1 quantiles, integer comparisons cum·4 ≥ k·n — no
    float, no interpolation, no percentile_approx in a correctness
    gate), and the 1.5·IQR fences are compared in DOUBLED integers
    (x·2 < 2·Q1 − 3·IQR) so the half-step fence never touches a
    float either. Reports the population, the fences' ingredients,
    and the outlier count a quarantine step would divert.

    Scale shape: the CDF is the block-ranked keyed cumsum over the
    per-cents aggregate (bounded by the price grid); the quantile
    reads and the fence count are one broadcast of a 1-row quantile
    table against the scan. Everything is int64."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    base = o.select(cents.alias("cents"))
    byval = base.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    cdf = api.exact_global_keyed_cumsum(byval, "cents", "cnt", "cents", "cum")
    tot = byval.agg(F.sum("cnt").cast("long").alias("n"))
    cq = cdf.crossJoin(F.broadcast(tot))
    q1 = cq.where(F.col("cum") * 4 >= F.col("n")).agg(
        F.min("cents").alias("q1")
    )
    q3 = cq.where(F.col("cum") * 4 >= 3 * F.col("n")).agg(
        F.min("cents").alias("q3")
    )
    q = tot.crossJoin(F.broadcast(q1)).crossJoin(F.broadcast(q3))
    iqr = F.col("q3") - F.col("q1")
    flagged = (
        base.crossJoin(F.broadcast(q))
        .where(
            (F.col("cents") * 2 < 2 * F.col("q1") - 3 * iqr)
            | (F.col("cents") * 2 > 2 * F.col("q3") + 3 * iqr)
        )
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return q.crossJoin(F.broadcast(flagged)).select(
        "n", "q1", "q3", iqr.alias("iqr"), "n_outliers"
    )


_RAKE_STOPS = (
    "the",
    "be",
    "to",
    "of",
    "and",
    "that",
    "have",
    "with",
    "a",
)


@register(
    "llm_keyword_rake",
    f"""
    WITH toks AS (
        SELECT doc_id, a[i] AS tok, i
        FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
             LATERAL unnest(range(1, len(a) + 1)) AS t(i)
    ),
    marked AS (
        SELECT doc_id, tok, i,
               CAST(count(*) FILTER (tok IN {_RAKE_STOPS!r})
                    OVER (PARTITION BY doc_id ORDER BY i
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pid,
               tok IN {_RAKE_STOPS!r} AS is_stop
        FROM toks
    ),
    phrases AS (
        SELECT doc_id, pid,
               string_agg(tok, ' ' ORDER BY i) AS phrase,
               count(*) AS plen
        FROM marked WHERE NOT is_stop
        GROUP BY doc_id, pid
    ),
    words AS (
        SELECT doc_id, pid, plen, unnest(string_split(phrase, ' ')) AS w
        FROM phrases
    ),
    wstat AS (
        SELECT w,
               count(*) AS freq,
               CAST(sum(plen) AS BIGINT) AS degree
        FROM words GROUP BY w
    ),
    pscore AS (
        SELECT p.phrase,
               CAST(count(DISTINCT (p.doc_id, p.pid)) AS BIGINT) AS n_occur,
               round(sum(CAST(ws.degree AS DOUBLE) / ws.freq)
                     / count(DISTINCT (p.doc_id, p.pid)), 4) AS score
        FROM phrases p
        JOIN words wd ON wd.doc_id = p.doc_id AND wd.pid = p.pid
        JOIN wstat ws ON ws.w = wd.w
        GROUP BY p.phrase
    )
    SELECT phrase, n_occur, score
    FROM pscore
    ORDER BY score DESC, phrase LIMIT 25
    """,
    tags=("llm", "keywords"),
)
def llm_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs — the phrase id is the
    RUNNING STOPWORD COUNT within the document (a per-document
    window, so the segmentation shuffles on doc_id and never sees a
    global order) — and each phrase scores the sum of its words'
    degree/frequency ratios (degree = Σ phrase length over the
    word's occurrences). Top 25 phrases by score with deterministic
    tiebreak. One float: the degree/freq ratio sum, rounded.

    Scale shape: tokenize + window per doc (keyed), two keyed
    aggregates (phrases, word stats — the word-stat table is
    vocabulary-sized and broadcast back), one phrase-keyed rollup,
    and a global top-k (TakeOrdered, no full sort)."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "tok"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    is_stop = F.col("tok").isin(*_RAKE_STOPS)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = toks.select(
        "doc_id",
        "tok",
        "i",
        F.sum(F.when(is_stop, 1).otherwise(0)).over(w).alias("pid"),
        is_stop.alias("is_stop"),
    )
    phrases = (
        marked.where(~F.col("is_stop"))
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("i", "tok")))
                        .getField("tok")).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
    )
    words = phrases.select(
        "doc_id", "pid", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    wstat = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").cast("long").alias("degree"),
    )
    pscore = (
        phrases.join(
            words.select("doc_id", "pid", "w"), ["doc_id", "pid"]
        )
        .join(F.broadcast(wstat), "w")
        .groupBy("phrase")
        .agg(
            F.count_distinct("doc_id", "pid").alias("n_occur"),
            F.sum(F.col("degree").cast("double") / F.col("freq")).alias(
                "_s"
            ),
        )
    )
    return (
        pscore.select(
            "phrase",
            "n_occur",
            F.round(F.col("_s") / F.col("n_occur"), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(25)
    )


@register(
    "agg_crosstab",
    """
    SELECT c.c_mktsegment AS segment_region,
           CAST(count(*) FILTER (r.r_name = 'AFRICA') AS BIGINT) AS "AFRICA",
           CAST(count(*) FILTER (r.r_name = 'AMERICA') AS BIGINT) AS "AMERICA",
           CAST(count(*) FILTER (r.r_name = 'ASIA') AS BIGINT) AS "ASIA",
           CAST(count(*) FILTER (r.r_name = 'EUROPE') AS BIGINT) AS "EUROPE",
           CAST(count(*) FILTER (r.r_name = 'MIDDLE EAST') AS BIGINT)
               AS "MIDDLE EAST"
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("aggregate", "surface"),
)
def agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.stat.crosstab parity: the contingency pivot whose
    COLUMN SET comes from the data (one column per region value) —
    the API pandas users reach for first. The oracle pins the
    semantics as explicit conditional aggregates over the fixed
    5-region domain, so a crosstab regression (mis-escaped values,
    dropped empty cells) hash-fails rather than shifting shape
    silently. Output column renamed to match across engines.

    Scale shape: crosstab compiles to one pivot aggregate — a single
    keyed shuffle with map-side partials; the column domain (regions)
    must be driver-small BY CONTRACT, which a 5-value dimension
    satisfies at any fact scale (dims broadcast)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    ct = joined.stat.crosstab("c_mktsegment", "r_name")
    cols = sorted([col for col in ct.columns if col != "c_mktsegment_r_name"])
    return ct.select(
        F.col("c_mktsegment_r_name").alias("segment_region"),
        *[F.col(f"`{col}`").cast("long").alias(col) for col in cols],
    ).orderBy("segment_region")


@register(
    "sample_stratified_hash",
    """
    WITH ranked AS (
        SELECT event_type, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY md5(CAST(event_id AS VARCHAR)),
                                           event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_type
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(n_type) AS BIGINT) AS n_stratum,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM ranked
    WHERE rn * 10 <= n_type
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("sample",),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible EXACT stratified sampling: each stratum
    contributes its first ⌊n/10⌋ rows in md5(event_id) order — a
    deterministic pseudo-random order both engines reproduce
    bit-identically, unlike sampleBy's seeded Bernoulli draw (whose
    RNG stream is engine-specific AND whose stratum counts are only
    binomially close to the target). The take condition rn·10 ≤ n
    is exact integer arithmetic. The checksum column proves the
    SAME ROWS were drawn, not merely the same number.

    Scale shape (round-8 re-plan, low-cardinality-window guard): the
    per-stratum rank rides api.exact_stratified_rank — windows
    partition by (stratum, hash-block), never by the bare 5-value
    stratum key, with the md5-prefix integer as the monotone block
    axis (uniform splits by construction). The stratum sizes join
    back as a broadcast 5-row aggregate instead of an unordered
    count window."""
    e = tbl(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("hx"),
    ).withColumn(
        "h32", F.conv(F.substring("hx", 1, 8), 16, 10).cast("long")
    )
    sizes = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_type")
    )
    from hadoop_deliver_spark import api

    ranked = api.exact_stratified_rank(
        h, "event_type", "h32", ["hx", "event_id"], "rn"
    ).join(F.broadcast(sizes), "event_type")
    return (
        ranked.where(F.col("rn") * 10 <= F.col("n_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("n_type").cast("long").alias("n_stratum"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("event_type")
    )
