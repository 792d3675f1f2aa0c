"""§2 extensions, fifty-sixth wave — robust five-number location,
split-drift divergence, network centralization, and local trend.

- agg_tukey_trimean: Tukey's trimean (Q1 + 2·median + Q3)/4 per
  order status — the five-number-summary location estimator.
- llm_split_divergence: Jensen-Shannon divergence between the
  content-hash train and val splits' unigram distributions — the
  drift audit run before trusting a held-out metric.
- graph_centralization: Freeman degree centralization of the
  co-purchase part graph — one number for "hub-dominated vs flat".
- ts_rolling_slope: rolling 7-day OLS slope per event-type daily
  series from exact windowed integer sums — the local-trend
  detector behind "is this metric turning?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "agg_tukey_trimean",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round((quantile_cont(o_totalprice, 0.25)
                  + 2 * quantile_cont(o_totalprice, 0.5)
                  + quantile_cont(o_totalprice, 0.75)) / 4, 4) AS trimean,
           round(quantile_cont(o_totalprice, 0.75)
                 - quantile_cont(o_totalprice, 0.25), 4) AS iqr
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregate", "stats"),
)
def agg_tukey_trimean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's trimean (Q₁ + 2·median + Q₃)/4 per order status — the
    five-number-summary location estimator (≈88% Gaussian efficiency
    with quartile-level robustness; Tukey's EDA workhorse), with the
    IQR alongside. Built on Spark's EXACT sort-based percentile
    (which hash-matches DuckDB's quantile_cont — the agg_percentile
    parity, reused); the trimean combines the three quantiles in one
    fixed textual order, round-4 display.

    Scale shape: one exact-percentile aggregate per group (the
    sort-based exact path; at 100 TB swap percentile_approx and
    accept the t-digest error bars)."""
    o = tbl(spark, sf_dir, "orders")
    q1 = F.percentile("o_totalprice", 0.25)
    q2 = F.percentile("o_totalprice", 0.5)
    q3 = F.percentile("o_totalprice", 0.75)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round((q1 + 2 * q2 + q3) / 4, 4).alias("trimean"),
            F.round(q3 - q1, 4).alias("iqr"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "llm_split_divergence",
    """
    WITH lab AS (
        SELECT CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd')
                    THEN 'val' ELSE 'train' END AS split,
               text
        FROM documents
        WHERE length(text) > 0
          AND substr(md5(text), 1, 1) NOT IN ('e', 'f')
    ),
    cnt AS (
        SELECT split, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT split, unnest(string_split(text, ' ')) AS w FROM lab)
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT w,
               CAST(coalesce(max(CASE WHEN split = 'train' THEN c END), 0)
                    AS BIGINT) AS ct,
               CAST(coalesce(max(CASE WHEN split = 'val' THEN c END), 0)
                    AS BIGINT) AS cv
        FROM cnt GROUP BY w
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cv) AS BIGINT) AS nv
        FROM wide
    )
    SELECT t.nt AS n_train_tokens, t.nv AS n_val_tokens,
           round(sum(
               CASE WHEN w.ct > 0 THEN
                   0.5 * (CAST(w.ct AS DOUBLE) / t.nt)
                   * ln((CAST(w.ct AS DOUBLE) / t.nt)
                        / (0.5 * CAST(w.ct AS DOUBLE) / t.nt
                           + 0.5 * CAST(w.cv AS DOUBLE) / t.nv))
               ELSE 0.0 END
               + CASE WHEN w.cv > 0 THEN
                   0.5 * (CAST(w.cv AS DOUBLE) / t.nv)
                   * ln((CAST(w.cv AS DOUBLE) / t.nv)
                        / (0.5 * CAST(w.ct AS DOUBLE) / t.nt
                           + 0.5 * CAST(w.cv AS DOUBLE) / t.nv))
               ELSE 0.0 END), 6) AS jsd_nats
    FROM wide w CROSS JOIN tot t
    GROUP BY t.nt, t.nv
    """,
    tags=("llm", "stats"),
)
def llm_split_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991) between the TRAIN and VAL
    splits' unigram distributions, with the splits drawn by the same
    content-hash rule as llm_dataset_split (md5 first nibble;
    test nibbles excluded) — the drift audit that decides whether a
    held-out metric measures generalization or just a lopsided
    split (JSD ≈ 0: representative; large: the val set is a
    different distribution). JSD is symmetric and bounded by ln 2,
    defined even where one side has zero mass (each term guards its
    own support). Counts exact int64; each share one division; the
    Σ share·ln pass is round-6 display (theil convention).

    Scale shape: one map-side split label (no shuffle), one
    (split, term) keyed aggregate, a term-keyed pivot, one 1-row
    totals broadcast."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    nib = F.substring(F.md5("text"), 1, 1)
    lab = d.filter(~nib.isin("e", "f")).select(
        F.when(nib.isin("c", "d"), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "text",
    )
    cnt = (
        lab.select("split", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("split", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wide = cnt.groupBy("w").agg(
        F.coalesce(F.max(F.when(F.col("split") == "train", F.col("c"))), F.lit(0))
        .cast("long")
        .alias("ct"),
        F.coalesce(F.max(F.when(F.col("split") == "val", F.col("c"))), F.lit(0))
        .cast("long")
        .alias("cv"),
    )
    tot = wide.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cv").cast("long").alias("nv"),
    )
    pt = F.col("ct").cast("double") / F.col("nt")
    pv = F.col("cv").cast("double") / F.col("nv")
    m = 0.5 * pt + 0.5 * pv
    term = F.when(F.col("ct") > 0, 0.5 * pt * F.log(pt / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cv") > 0, 0.5 * pv * F.log(pv / m)).otherwise(
        F.lit(0.0)
    )
    return (
        wide.crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("nt").alias("n_train_tokens"),
            F.col("nv").alias("n_val_tokens"),
        )
        .agg(F.round(F.sum(term), 6).alias("jsd_nats"))
    )


@register(
    "graph_centralization",
    """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY p),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(max(d) AS BIGINT) AS dmax,
               CAST(sum(d) AS BIGINT) AS dsum
        FROM deg
    )
    SELECT n, dmax,
           round(CAST(n * dmax - dsum AS DOUBLE)
                 / (CAST(n - 1 AS DOUBLE) * (n - 2)), 6)
               AS centralization,
           round(CAST(dsum AS DOUBLE) / n, 4) AS mean_degree
    FROM s
    """,
    tags=("graph",),
)
def graph_centralization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeman-style degree centralization (after Freeman 1979) of
    the part side of the co-purchase graph: Σ(d_max − d_i) divided by
    the one-mode star-graph maximum (n−1)(n−2). NOTE the scale: in
    this BIPARTITE projection a part's degree counts distinct
    customers and is not bounded by n−1 (n = part count), so the
    statistic is a RELATIVE hub-dominance index — higher means more
    hub-dominated, 0 a perfectly flat degree profile — not a
    [0,1]-bounded share as in the one-mode original (and n ≤ 2 yields
    NULL via the zero denominator). The single-number structure
    summary next to graph_degree_stats' distribution view. Degrees,
    max, and the deviation sum are exact int64
    (Σ(dmax − d) = n·dmax − Σd); one final division, round-6.

    Scale shape: deduped edge list, one keyed degree count, one
    1-row reduce."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    deg = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    s = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("d").cast("long").alias("dmax"),
        F.sum("d").cast("long").alias("dsum"),
    )
    return s.select(
        "n",
        "dmax",
        F.round(
            (F.col("n") * F.col("dmax") - F.col("dsum")).cast("double")
            / ((F.col("n") - 1).cast("double") * (F.col("n") - 2)),
            6,
        ).alias("centralization"),
        F.round(F.col("dsum").cast("double") / F.col("n"), 4).alias(
            "mean_degree"
        ),
    )


@register(
    "ts_rolling_slope",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, c,
               count(*) OVER win AS wn,
               CAST(sum(x) OVER win AS BIGINT) AS sx,
               CAST(sum(c) OVER win AS BIGINT) AS sy,
               CAST(sum(x * c) OVER win AS BIGINT) AS sxy,
               CAST(sum(x * x) OVER win AS BIGINT) AS sxx
        FROM d
        WINDOW win AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day, c,
           round(CAST(7 * sxy - sx * sy AS DOUBLE)
                 / (7 * sxx - sx * sx), 4) AS slope_7d
    FROM w WHERE wn = 7
    ORDER BY event_type, day
    """,
    tags=("timeseries",),
)
def ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS slope per event-type daily series — the
    local-trend detector behind "is this metric turning?": slope =
    (n·Σxy − Σx·Σy)/(n·Σxx − (Σx)²) over each trailing week, with
    ALL four moment sums as exact int64 WINDOW aggregates (day index
    and counts are integers, so n·Σxy − Σx·Σy is exact — the one
    float op per row is the final division, bit-identical across
    engines). Full windows only; gaps in the day axis simply widen
    the x spread, handled by the formula.

    Scale shape: one keyed shuffle to the daily aggregate, one
    partitioned window pass with four integer running sums."""
    e = tbl(spark, sf_dir, "events")
    d = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "x",
            F.datediff("day", F.lit("2024-01-01").cast("date")).cast(
                "long"
            ),
        )
    )
    win = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    w = d.select(
        "event_type",
        "day",
        "c",
        F.count(F.lit(1)).over(win).alias("wn"),
        F.sum("x").over(win).cast("long").alias("sx"),
        F.sum("c").over(win).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("c")).over(win).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("long").alias("sxx"),
    ).filter(F.col("wn") == 7)
    slope = (7 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        7 * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return w.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "c",
        F.round(slope, 4).alias("slope_7d"),
    ).orderBy("event_type", "day")
