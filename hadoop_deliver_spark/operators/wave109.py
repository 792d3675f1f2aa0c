"""§2 extensions, hundred-ninth wave — corpus governance and funnel
latency.

- llm_license_detect: marker-phrase license classification — the
  training-data governance step every C4/Pile-style pipeline runs
  before ingestion (keep permissive, quarantine restrictive, flag
  unlicensed). Fixture stand-in marker sets, the llm_lang_id
  precedent: the corpus is synthetic word salad, so the marker LISTS
  are substitutes while the multi-set scoring, precedence rule, and
  per-source rollup are the real pipeline shape.
- events_time_to_convert: first-click→first-purchase latency with
  EXACT median/P90 order statistics — the funnel-velocity number
  events_funnel's conversion counts do not carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

#: fixture stand-in marker sets (documented substitutes — the real
#: deployment swaps SPDX phrases in; shared textually with the oracle)
_PERMISSIVE = ("merge", "join", "stream")
_RESTRICTIVE = ("key", "lock", "hash")


@register(
    "llm_license_detect",
    f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               len(list_filter(toks, x -> x IN {_PERMISSIVE!r}))
                   AS s_perm,
               len(list_filter(toks, x -> x IN {_RESTRICTIVE!r}))
                   AS s_restr
        FROM t
    ),
    cls AS (
        SELECT doc_id, source,
               CASE WHEN s_perm = 0 AND s_restr = 0 THEN 'unlicensed'
                    WHEN s_restr > s_perm THEN 'restrictive'
                    ELSE 'permissive' END AS license
        FROM scored
    )
    SELECT source, license, CAST(count(*) AS BIGINT) AS n_docs
    FROM cls GROUP BY source, license
    ORDER BY source, license
    """,
    tags=("llm", "governance"),
)
def llm_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License classification by marker-phrase scoring with a
    precedence rule — the corpus-governance gate run before training
    ingestion: count permissive-marker and restrictive-marker hits
    per document, classify restrictive-if-it-dominates (conservative:
    ties go permissive only when evidence exists; zero evidence =
    'unlicensed', the bucket a compliant pipeline quarantines), and
    roll up to (source, license) counts — per-SOURCE license mix is
    what actually drives keep/drop decisions at corpus scale. Marker
    sets are fixture stand-ins (the llm_lang_id precedent — the
    scoring/precedence/rollup shape is the real pipeline; swap SPDX
    phrase lists in production), shared textually with the oracle.

    Scale shape: map-only token filters (no explode — HOF filters
    count in place), one keyed (source, license) reduce."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # two explicit filter expressions — NOT built in a loop (the
    # llm_lang_id lambda-capture note)
    s_perm = F.size(F.filter(toks, lambda x: x.isin(*_PERMISSIVE)))
    s_restr = F.size(F.filter(toks, lambda x: x.isin(*_RESTRICTIVE)))
    cls = d.select(
        "source",
        F.when((s_perm == 0) & (s_restr == 0), "unlicensed")
        .when(s_restr > s_perm, "restrictive")
        .otherwise("permissive")
        .alias("license"),
    )
    return (
        cls.groupBy("source", "license")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "license")
    )


@register(
    "events_time_to_convert",
    """
    WITH first_click AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS tc
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
        SELECT f.user_id,
               CAST(floor(epoch_us(min(CAST(e.ts AS TIMESTAMP)))
                          / 60000000.0
                          - epoch_us(f.tc) / 60000000.0) AS BIGINT)
                   AS lat_min
        FROM first_click f
        JOIN events e ON e.user_id = f.user_id
                     AND e.event_type = 'purchase'
                     AND CAST(e.ts AS TIMESTAMP) >= f.tc
        GROUP BY f.user_id, f.tc
    ),
    grid AS (
        SELECT lat_min, CAST(count(*) AS BIGINT) AS c
        FROM conv GROUP BY lat_min
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(lat_min * c) AS BIGINT) AS s FROM grid),
    cdf AS (
        SELECT lat_min, CAST(sum(c) OVER (ORDER BY lat_min
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid
    )
    SELECT n.n AS n_converted,
           (SELECT min(lat_min) FROM cdf WHERE 2 * cum >= n.n)
               AS median_min,
           (SELECT min(lat_min) FROM cdf WHERE 10 * cum >= 9 * n.n)
               AS p90_min,
           round(CAST(n.s AS DOUBLE) / n.n, 4) AS mean_min
    FROM n
    """,
    tags=("events", "analytics"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel VELOCITY: minutes from a user's first click to their
    first purchase at or after it, with EXACT median and P90 order
    statistics — the latency distribution the funnel's conversion
    counts (events_funnel) cannot show, and the number an SLA on
    "time to convert" is actually written against. Latencies reduce
    to a bounded distinct-minute grid (≤ the stream's span in
    minutes at ANY corpus scale); the percentiles are pure integer
    rank selections on the block-ranked cumulative grid (min value
    with 2·cum ≥ n / 10·cum ≥ 9n — the ts_qn_scale device, no float
    percentile).

    Scale shape: one keyed click reduce, one equi-join + keyed
    purchase reduce, a bounded-grid reduce, block-ranked cumsum,
    two 1-row rank probes."""
    from hadoop_deliver_spark.api import exact_global_keyed_cumsum

    e = tbl(spark, sf_dir, "events")
    fc = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    conv = (
        fc.join(p, (F.col("pu") == F.col("user_id")) & (F.col("pt") >= F.col("tc")))
        .groupBy("user_id", "tc")
        .agg(F.min("pt").alias("tp"))
        .select(
            F.floor(
                F.unix_micros("tp") / 60000000.0
                - F.unix_micros("tc") / 60000000.0
            )
            .cast("long")
            .alias("lat_min")
        )
    )
    grid = conv.groupBy("lat_min").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = grid.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("lat_min") * F.col("c")).cast("long").alias("s"),
    )
    cdf = exact_global_keyed_cumsum(grid, "lat_min", "c", "lat_min", "cum")
    j = cdf.crossJoin(F.broadcast(n))
    med = j.filter(2 * F.col("cum") >= F.col("n")).agg(
        F.min("lat_min").alias("median_min")
    )
    p90 = j.filter(10 * F.col("cum") >= 9 * F.col("n")).agg(
        F.min("lat_min").alias("p90_min")
    )
    return (
        n.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p90))
        .select(
            F.col("n").alias("n_converted"),
            "median_min",
            "p90_min",
            F.round(F.col("s").cast("double") / F.col("n"), 4).alias(
                "mean_min"
            ),
        )
    )
