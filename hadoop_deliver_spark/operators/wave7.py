"""§2 extensions, thirty-first wave — corpus-forensics and inference
statistics: duplicated-span inventory, DSIR importance weights, a
Bloom-prefiltered incremental dedup, autocorrelation, CUSUM
changepoints, Welch's t, and the chi-square independence test.

- llm_dedup_spans: the exact duplicated-substring inventory of Lee et
  al. 2022 ("Deduplicating Training Data Makes Language Models
  Better") at 8-token-gram granularity — per document, how many of
  its token positions start a span that occurs elsewhere in the
  corpus.
- llm_dsir_weights: DSIR (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling") — hashed-unigram
  log-importance weights of the raw corpus against an in-domain
  target slice, smoothed add-one over the hash buckets.
- llm_dedup_bloom: the Dolma/CCNet-style incremental ingest
  prefilter — a Bloom bitmap (m=65536, k=3, md5-derived positions)
  built over the already-ingested half's shingles, probed by the
  incoming half, with the exact-confirm join alongside so false
  positives are measured, not guessed.
- ts_autocorr: the autocorrelation function of each event type's
  daily series at lags 1..7 — the statistic a seasonality detector
  reads before picking its period.
- ts_cusum_changepoint: standardized CUSUM scan over the global
  daily series, peak-flagged — the classic mean-shift changepoint
  statistic (Page 1954).
- agg_welch_ttest: Welch's unequal-variance t on exact-cents sums —
  every moment is an exact integer before the closed form runs in
  (identically-ordered) double arithmetic, so the statistic is
  bit-stable across engines.
- agg_chi2_independence: Pearson's chi-square of independence on the
  region x market-segment contingency table, expected counts from
  integer marginals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_K = 8  # span/shingle width in tokens for the dedup family below


def _shingles(d: DataFrame, k: int = _K) -> DataFrame:
    """(doc_id, s): every k-token-gram of each document, one row per
    POSITION (duplicates within a doc preserved — the span inventory
    counts positions, not types). Map-only: the token array is never
    self-joined; shingles come from an in-row transform over the
    position sequence, then one explode."""
    a = F.split("text", " ")
    grams = F.when(
        F.size(a) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(a, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(grams).alias("s"))


@register(
    "llm_dedup_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    sh AS (
        SELECT doc_id, array_to_string(a[i:i+{_K - 1}], ' ') AS s
        FROM toks, LATERAL unnest(range(1, len(a) - {_K - 2})) AS t(i)
    ),
    cnt AS (SELECT s, count(*) AS c FROM sh GROUP BY s)
    SELECT sh.doc_id,
           count(*) AS n_spans,
           CAST(count(*) FILTER (cnt.c > 1) AS BIGINT) AS dup_spans,
           floor(count(*) FILTER (cnt.c > 1) * 10000.0 / count(*))
               / 10000 AS dup_frac
    FROM sh JOIN cnt USING (s)
    GROUP BY sh.doc_id ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span inventory (Lee et al. 2022's ExactSubstr
    diagnostic at fixed 8-gram granularity): for each document, the
    number of token positions whose 8-token span occurs MORE THAN
    ONCE in the corpus (cross- or intra-document), and the duplicated
    fraction. This is the statistic that decides whether span-level
    dedup is worth running at all — and the positions it counts are
    exactly the ones ExactSubstr would cut.

    Scale shape: shingles are generated map-side (in-row transform +
    explode — the token array is never joined against itself); one
    shuffle keyed on the shingle builds the corpus-wide occurrence
    count; the join back to positions re-uses the same shingle key
    (AQE plans both sides of one exchange); the final per-doc rollup
    is a second keyed shuffle. No step holds more than one document's
    tokens in a row, so a 100 TB corpus streams through at constant
    memory. Fraction floor-quantized to 1e-4 (integer-exact counts
    either side of the division)."""
    d = tbl(spark, sf_dir, "documents")
    sh = _shingles(d)
    cnt = sh.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    return (
        sh.join(cnt, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count_if(F.col("c") > 1).alias("dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            (
                F.floor(F.col("dup_spans") * 10000.0 / F.col("n_spans"))
                / 10000
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_dsir_weights",
    """
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               from_hex(substr(md5(term), 1, 2))::BIT::INT % 128 AS bkt
        FROM toks
    ),
    stats AS (
        SELECT bkt,
               count(*) FILTER (lang = 'en') AS ct,
               count(*) AS cr
        FROM b GROUP BY bkt
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS t_tot,
               CAST(sum(cr) AS BIGINT) AS r_tot
        FROM stats
    )
    SELECT b.doc_id,
           count(*) AS n_toks,
           round(sum(  ln((stats.ct + 1) / CAST(tot.t_tot + 128 AS DOUBLE))
                     - ln((stats.cr + 1) / CAST(tot.r_tot + 128 AS DOUBLE))),
                 4) AS logw
    FROM b JOIN stats USING (bkt) CROSS JOIN tot
    GROUP BY b.doc_id ORDER BY doc_id
    """,
    tags=("llm", "sampling"),
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every raw
    document by how target-like its hashed-unigram bag is. Features
    hash into 128 buckets (md5 byte — the oracle reproduces bucket
    ids bit-exactly, same device as llm_feature_hashing); the target
    distribution is the English slice, the raw distribution the whole
    corpus, both add-one smoothed over the bucket space; a document's
    log-weight is the sum of its tokens' log probability ratios.
    Sampling ∝ exp(logw) is the paper's selection step.

    Scale shape: the two n-gram distributions are ONE 128-row
    aggregate of the exploded token stream (map-side partial combine
    does the heavy lifting); the per-token ratio lookup is a
    broadcast join against those 128 rows; the per-doc sum is the
    only fact-sized shuffle. Rounded to 4 decimals (the bucket
    counts and totals are exact integers; only the final ln-sum is
    float)."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    b = toks.select(
        "doc_id",
        "lang",
        (F.expr("cast(conv(substring(md5(term), 1, 2), 16, 10) as int)") % 128)
        .alias("bkt"),
    )
    stats = b.groupBy("bkt").agg(
        F.count_if(F.col("lang") == "en").alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tot = stats.agg(
        F.sum("ct").cast("long").alias("t_tot"),
        F.sum("cr").cast("long").alias("r_tot"),
    )
    ratio = F.log((F.col("ct") + 1) / (F.col("t_tot") + 128).cast("double")) - F.log(
        (F.col("cr") + 1) / (F.col("r_tot") + 128).cast("double")
    )
    return (
        b.join(F.broadcast(stats), "bkt")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum(ratio), 4).alias("logw"),
        )
        .orderBy("doc_id")
    )


def _bloom_pos(col: str, off: int) -> str:
    """SQL expression: one of the k=3 Bloom bit positions (16 bits of
    the md5 hex digest starting at 1-based nibble ``off``)."""
    return f"cast(conv(substring(md5({col}), {off}, 4), 16, 10) as int)"


@register(
    "llm_dedup_bloom",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(a[i:i+7], ' ') AS s
        FROM toks, LATERAL unnest(range(1, len(a) - 6)) AS t(i)
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
    bits AS (
        SELECT DISTINCT bit FROM ev, LATERAL unnest([
            from_hex(substr(md5(s), 1, 4))::BIT::INT,
            from_hex(substr(md5(s), 5, 4))::BIT::INT,
            from_hex(substr(md5(s), 9, 4))::BIT::INT
        ]) AS t(bit)
    ),
    flag AS (
        SELECT doc_id, s,
               (from_hex(substr(md5(s), 1, 4))::BIT::INT IN (SELECT bit FROM bits)
                AND from_hex(substr(md5(s), 5, 4))::BIT::INT IN (SELECT bit FROM bits)
                AND from_hex(substr(md5(s), 9, 4))::BIT::INT IN (SELECT bit FROM bits))
                   AS bloom,
               s IN (SELECT s FROM ev) AS ex
        FROM sh WHERE doc_id % 2 = 1
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(count(*) FILTER (bloom) AS BIGINT) AS bloom_hits,
           CAST(count(*) FILTER (ex) AS BIGINT) AS exact_hits
    FROM flag GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental shingle dedup (the Dolma/CCNet
    ingest pattern): even doc_ids play the already-ingested corpus,
    odd doc_ids the incoming batch. The ingested side's distinct
    8-gram shingles populate a Bloom bitmap (m=65536 bits, k=3
    probes, positions = three 16-bit windows of the md5 digest); each
    incoming shingle is a *candidate* duplicate iff all three of its
    bits are set. The exact-confirm join runs alongside, so the
    output carries both counts per incoming doc — bloom_hits ≥
    exact_hits by construction, and the gap IS the measured
    false-positive load the exact stage must absorb.

    Scale shape: this is why trillion-token pipelines Bloom-filter
    first — the bitmap's set-bit table is bounded by m (65536 rows)
    no matter how large the ingested corpus grows, so the candidate
    test is a broadcast join against a fixed-size structure, while
    the exact-confirm shuffle only ever carries the candidates. Here
    both halves run over the full data so the FP gap is observable;
    in production the exact join's left side would be pre-filtered to
    bloom candidates (identical plan shape, strictly less data).
    Counts exact; no floats anywhere."""
    d = tbl(spark, sf_dir, "documents")
    sh = _shingles(d).distinct()
    ev = sh.where(F.col("doc_id") % 2 == 0).select("s").distinct()
    pos = [F.expr(_bloom_pos("s", off)) for off in (1, 5, 9)]
    bits = ev.select(F.explode(F.array(*pos)).alias("bit")).distinct()
    inc = sh.where(F.col("doc_id") % 2 == 1)
    probes = inc.select(
        "doc_id", "s", F.posexplode(F.array(*pos)).alias("k", "bit")
    )
    hit = (
        probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("doc_id", "s")
        .agg((F.count("_set") == 3).alias("bloom"))
    )
    ex = ev.withColumn("_ex", F.lit(1))
    flag = hit.join(ex, "s", "left").select(
        "doc_id", "bloom", F.col("_ex").isNotNull().alias("ex")
    )
    return (
        flag.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_if(F.col("bloom")).alias("bloom_hits"),
            F.count_if(F.col("ex")).alias("exact_hits"),
        )
        .orderBy("doc_id")
    )


@register(
    "ts_autocorr",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag)
    SELECT a.event_type, lags.lag,
           count(*) AS n_pairs,
           round(corr(a.cnt, b.cnt), 4) AS acf
    FROM daily a CROSS JOIN lags
    JOIN daily b ON b.event_type = a.event_type
               AND b.day = a.day - lags.lag
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("timeseries", "stats"),
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of each event type's daily count
    series at lags 1..7 (the statistic behind ts_seasonality's period
    choice): Pearson r between the series and its lag-k shift, over
    the days where both exist. n_pairs makes the estimator's support
    auditable — ACF at lag 7 over a 30-day window rests on 23 pairs.

    Scale shape: the fact table collapses to the per-(type, day)
    aggregate first (one keyed shuffle, map-side combine); the 7 lags
    come from an in-row sequence explode of that SMALL aggregate —
    never of the fact table — and the lag join is an equi-join on
    (event_type, shifted day), so it hash-partitions freely. corr is
    scale-free (sample/population normalization cancels), rounded to
    4 decimals."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a = daily.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(7)))
    ).alias("a")
    b = daily.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.day") == F.date_sub(F.col("a.day"), F.col("a.lag"))),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.lag").alias("lag"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr(F.col("a.cnt"), F.col("b.cnt")), 4).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@register(
    "ts_cusum_changepoint",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1
    ),
    st AS (
        SELECT avg(cnt) AS m, stddev_samp(cnt) AS sd FROM daily
    ),
    cs AS (
        SELECT day, cnt,
               round((CAST(sum(cnt) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      - CAST(row_number() OVER (ORDER BY day) AS DOUBLE)
                        * st.m) / st.sd,
                     4) AS cusum
        FROM daily CROSS JOIN st
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, cnt, cusum,
           abs(cusum) = (SELECT max(abs(cusum)) FROM cs) AS is_peak
    FROM cs ORDER BY day
    """,
    tags=("timeseries", "stats"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized CUSUM mean-shift scan (Page 1954) over the global
    daily event count: S_t = Σ_{d≤t} (x_d − x̄)/s, evaluated in the
    algebraically equal closed form (Σ_{d≤t} x_d − t·x̄)/s — the
    integer prefix sum Σx_d comes from the BLOCK-RANKED keyed cumsum
    core and t from the block-ranked rank core
    (api.exact_global_keyed_cumsum / exact_global_rank over the
    epoch-day axis; windows partition by block, so NO
    single-partition window exists in the plan — round-12
    conversion), and the float arithmetic is ONE subtract/multiply/
    divide in fixed textual order on both engines. A sustained level
    shift makes |S| ramp to a peak at the change day; is_peak flags
    the argmax. The flag compares the ROUNDED cusum to the rounded
    maximum, so it is stable across engines (and deterministically
    flags all tied days).

    Scale shape: the fact table reduces to the day aggregate in one
    keyed shuffle; the prefix sums are block-ranked core passes. The
    mean/σ pair is a 1-row aggregate broadcast back by cross join,
    and the peak test reuses the same 1-row pattern on the rounded
    column."""
    from hadoop_deliver_spark.api import (
        exact_global_keyed_cumsum,
        exact_global_rank,
    )

    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    st = daily.agg(
        F.avg("cnt").alias("m"), F.stddev_samp("cnt").alias("sd")
    )
    dd = daily.withColumn(
        "di", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    dd = exact_global_keyed_cumsum(dd, "di", "cnt", "di", "cum")
    dd = exact_global_rank(dd, "di", "di", "t")
    cs = dd.crossJoin(F.broadcast(st)).select(
        "day",
        "cnt",
        F.round(
            (
                F.col("cum").cast("double")
                - F.col("t").cast("double") * F.col("m")
            )
            / F.col("sd"),
            4,
        ).alias("cusum"),
    )
    peak = cs.agg(F.max(F.abs("cusum")).alias("pk"))
    return (
        cs.crossJoin(F.broadcast(peak))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            "cusum",
            (F.abs("cusum") == F.col("pk")).alias("is_peak"),
        )
        .orderBy("day")
    )


@register(
    "agg_welch_ttest",
    """
    WITH m AS (
        SELECT
            count(*) FILTER (o_orderpriority = '1-URGENT') AS n1,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS sx1,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 FILTER (o_orderpriority = '1-URGENT') AS DOUBLE) AS sxx1,
            count(*) FILTER (o_orderpriority != '1-URGENT') AS n2,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 FILTER (o_orderpriority != '1-URGENT') AS BIGINT) AS sx2,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 FILTER (o_orderpriority != '1-URGENT') AS DOUBLE) AS sxx2
        FROM orders
    ),
    v AS (
        SELECT n1, n2, sx1, sx2,
               (sxx1 - CAST(sx1 AS DOUBLE) * sx1 / n1) / (n1 - 1) AS v1,
               (sxx2 - CAST(sx2 AS DOUBLE) * sx2 / n2) / (n2 - 1) AS v2
        FROM m
    )
    SELECT n1 AS n_urgent, n2 AS n_rest,
           round(CAST(sx1 AS DOUBLE) / 100 / n1, 4) AS mean_urgent,
           round(CAST(sx2 AS DOUBLE) / 100 / n2, 4) AS mean_rest,
           round((CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2)
                 / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                 4) AS dof
    FROM v
    """,
    tags=("aggregate", "stats"),
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: do URGENT orders carry a
    different mean price than the rest? Both moments per group are
    EXACT integers before any float op — sums of cents and of
    squared cents (bounded: 10^14 per row × row count ≪ 2^63) — and
    the closed form (t, plus the Welch–Satterthwaite degrees of
    freedom) then runs in double arithmetic with the same expression
    tree on both engines, so the statistic is bit-stable under any
    partitioning, at any scale. One scan, one 1-row aggregate, zero
    shuffles beyond the final combine.

    t in cents cancels to t in dollars (scale-invariant); means are
    reported in dollars."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    u = F.col("o_orderpriority") == "1-URGENT"
    # squared cents fit int64 per row (≤ ~10^15) but their SUM does not
    # at large SF — sum exactly in DECIMAL(38,0) (any-order associative,
    # like dec2), then ONE cast of the exact total to double: both
    # engines round the same integer to the same double.
    sq = (cents * cents).cast("decimal(38,0)")
    m = o.agg(
        F.count_if(u).alias("n1"),
        F.sum(F.when(u, cents)).cast("long").alias("sx1"),
        F.sum(F.when(u, sq)).cast("double").alias("sxx1"),
        F.count_if(~u).alias("n2"),
        F.sum(F.when(~u, cents)).cast("long").alias("sx2"),
        F.sum(F.when(~u, sq)).cast("double").alias("sxx2"),
    )
    v = m.select(
        "n1",
        "n2",
        "sx1",
        "sx2",
        (
            (F.col("sxx1") - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("sxx2") - F.col("sx2").cast("double") * F.col("sx2") / F.col("n2"))
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return v.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_rest"),
        F.round(F.col("sx1").cast("double") / 100 / F.col("n1"), 4).alias(
            "mean_urgent"
        ),
        F.round(F.col("sx2").cast("double") / 100 / F.col("n2"), 4).alias(
            "mean_rest"
        ),
        F.round(
            (
                F.col("sx1").cast("double") / F.col("n1")
                - F.col("sx2").cast("double") / F.col("n2")
            )
            / F.sqrt(se2),
            4,
        ).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            4,
        ).alias("dof"),
    )


@register(
    "agg_chi2_independence",
    """
    WITH cells AS (
        SELECT r.r_name, c.c_mktsegment, count(*) AS n_obs
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    rt AS (SELECT r_name, CAST(sum(n_obs) AS BIGINT) AS row_tot
           FROM cells GROUP BY r_name),
    ct AS (SELECT c_mktsegment, CAST(sum(n_obs) AS BIGINT) AS col_tot
           FROM cells GROUP BY c_mktsegment),
    g AS (SELECT CAST(sum(n_obs) AS BIGINT) AS grand,
                 CAST((count(DISTINCT r_name) - 1)
                      * (count(DISTINCT c_mktsegment) - 1) AS BIGINT) AS dof
          FROM cells),
    x AS (
        SELECT cells.r_name, cells.c_mktsegment, cells.n_obs,
               CAST(rt.row_tot * ct.col_tot AS DOUBLE) / g.grand AS e,
               g.dof
        FROM cells JOIN rt USING (r_name)
        JOIN ct USING (c_mktsegment) CROSS JOIN g
    )
    SELECT r_name, c_mktsegment, n_obs,
           round(e, 4) AS expected,
           round((n_obs - e) * (n_obs - e) / e, 4) AS contrib,
           round((SELECT sum((n_obs - e) * (n_obs - e) / e) FROM x), 4)
               AS chi2_total,
           dof
    FROM x ORDER BY r_name, c_mktsegment
    """,
    tags=("aggregate", "stats"),
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson's chi-square of independence on the region x market
    segment contingency table: is a customer's segment independent of
    their region? Expected counts come from integer marginals
    (row_tot · col_tot exact in int64, ONE double division), each
    cell carries its (O−E)²/E contribution, and chi2_total with its
    (r−1)(c−1) dof rides on every row for direct comparison against
    the critical value.

    Scale shape: one fact-sized keyed shuffle builds the contingency
    cells (dims broadcast); everything after runs over the CELL table
    whose cardinality is |regions|×|segments| — marginals are
    re-aggregates of cells, never of the fact table, joined back
    broadcast, and the chi2 total is a 1-row aggregate of the cells
    cross-joined back. Float only in the final division; rounded to
    4 decimals."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    rt = cells.groupBy("r_name").agg(
        F.sum("n_obs").cast("long").alias("row_tot")
    )
    ct = cells.groupBy("c_mktsegment").agg(
        F.sum("n_obs").cast("long").alias("col_tot")
    )
    g = cells.agg(
        F.sum("n_obs").cast("long").alias("grand"),
        (
            (F.count_distinct("r_name") - 1)
            * (F.count_distinct("c_mktsegment") - 1)
        )
        .cast("long")
        .alias("dof"),
    )
    x = (
        cells.join(F.broadcast(rt), "r_name")
        .join(F.broadcast(ct), "c_mktsegment")
        .crossJoin(F.broadcast(g))
        .select(
            "r_name",
            "c_mktsegment",
            "n_obs",
            (
                (F.col("row_tot") * F.col("col_tot")).cast("double")
                / F.col("grand")
            ).alias("e"),
            "dof",
        )
    )
    contrib = (F.col("n_obs") - F.col("e")) * (
        F.col("n_obs") - F.col("e")
    ) / F.col("e")
    tot = x.agg(F.round(F.sum(contrib), 4).alias("chi2_total"))
    return (
        x.crossJoin(F.broadcast(tot))
        .select(
            "r_name",
            "c_mktsegment",
            "n_obs",
            F.round("e", 4).alias("expected"),
            F.round(contrib, 4).alias("contrib"),
            "chi2_total",
            "dof",
        )
        .orderBy("r_name", "c_mktsegment")
    )
