"""§2.K extensions, tenth wave (2/3) — URL-canonicalization dedup.

Web-crawl corpora dedup on the *canonical* URL before any content
hash is computed: scheme/host case, default ports, fragments,
tracking parameters (utm_*) and trailing slashes all vary between
crawls of the same resource. The canonicalizer here is the standard
recipe (RFC 3986 normalization + tracker stripping + query-param
sorting) expressed entirely in JVM-side column ops — lower/regexp/
split/array_sort — so it is map-only and runs at wire speed; the
dedup itself is then an ordinary groupBy on the canonical key, the
same one-shuffle shape as llm_dedup_exact.

The fixture has no URL column, so a deterministically messy URL is
constructed per document first (varying case, optional :80, optional
trailing slash, utm_ tracker, fragment) — the canonicalizer must
collapse all variants. The DuckDB oracle builds the same messy URL
and canonicalizes it with the same first-principles string algebra
(str_split/list_filter/list_sort on its side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


def _messy_url() -> Column:
    """Deterministic messy URL per doc (Spark side)."""
    did = F.col("doc_id")
    scheme = (
        F.when(did % 3 == 0, "HTTP")
        .when(did % 3 == 1, "https")
        .otherwise("http")
    )
    host = F.concat(
        F.when(did % 2 == 0, F.upper("source")).otherwise(F.lower("source")),
        F.lit(".Example.COM"),
        F.when(did % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
    )
    path = F.concat(
        F.lit("/docs/"),
        (did % 50).cast("string"),
        F.when(did % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.concat(
        F.when(did % 2 == 0, F.lit("?utm_source=feed&lang=")).otherwise(
            F.lit("?lang=")
        ),
        F.col("lang"),
        F.when(did % 7 == 0, F.lit("&utm_campaign=x")).otherwise(F.lit("")),
    )
    frag = F.when(did % 3 == 0, F.concat(F.lit("#sec"), (did % 4).cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, path, query, frag)


_MESSY_URL_SQL = """
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP'
          WHEN doc_id % 3 = 1 THEN 'https' ELSE 'http' END)
    || '://'
    || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE lower(source) END)
    || '.Example.COM'
    || (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END)
    || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&lang='
        ELSE '?lang=' END)
    || lang
    || (CASE WHEN doc_id % 7 = 0 THEN '&utm_campaign=x' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR)
        ELSE '' END)
"""


def _canonicalize(url: Column) -> Column:
    """RFC-3986-style canonical form — the public core
    api.canonical_url (which carries the recipe rationale)."""
    from hadoop_deliver_spark.api import canonical_url

    return canonical_url(url)


_CANONICAL_SQL = """
    lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))
    || '://'
    || regexp_replace(regexp_replace(
           lower(regexp_extract(regexp_replace(regexp_replace({u}, '#.*$', ''),
                                               '^[A-Za-z]+://', ''),
                                '^([^/?]+)', 1)),
           ':80$', ''), '^www\\.', '')
    || regexp_replace(
           regexp_extract(
               regexp_replace(regexp_replace(regexp_replace({u}, '#.*$', ''),
                              '^[A-Za-z]+://', ''), '^[^/?]+', ''),
               '^([^?]*)', 1),
           '/$', '')
    || (CASE WHEN len(list_filter(
                 str_split(regexp_extract(
                     regexp_replace(regexp_replace({u}, '#.*$', ''),
                                    '^[A-Za-z]+://', ''),
                     '\\?(.*)$', 1), '&'),
                 x -> x <> '' AND NOT starts_with(x, 'utm_'))) > 0
        THEN '?' || array_to_string(list_sort(list_filter(
                 str_split(regexp_extract(
                     regexp_replace(regexp_replace({u}, '#.*$', ''),
                                    '^[A-Za-z]+://', ''),
                     '\\?(.*)$', 1), '&'),
                 x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')
        ELSE '' END)
"""


@register(
    "llm_dedup_url",
    f"""
    WITH urls AS (
        SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, {_CANONICAL_SQL.format(u="url")} AS curl FROM urls
    )
    SELECT curl AS canonical_url,
           count(*) AS n_dups,
           min(doc_id) AS keeper_doc,
           max(doc_id) AS last_doc
    FROM canon GROUP BY curl HAVING count(*) >= 2
    ORDER BY canonical_url
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: normalize scheme/host case, strip
    default :80 port, www. prefix, fragments, utm_* tracking params
    and trailing slashes, sort the surviving query params — then
    group documents by the canonical URL and emit every dup group
    with its keeper (min doc_id). Canonicalization is map-only column
    algebra; the dedup is one groupBy shuffle on the canonical key.
    At 100 TB this is exactly the first pass of a crawl dedup
    pipeline — no content is read at all, and the key cardinality
    (#distinct resources) bounds the shuffle, not the raw row
    count."""
    d = tbl(spark, sf_dir, "documents")
    urls = d.select("doc_id", _messy_url().alias("url"))
    canon = urls.select(
        "doc_id", _canonicalize(F.col("url")).alias("curl")
    )
    return (
        canon.groupBy("curl")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .where(F.col("n_dups") >= 2)
        .select(
            F.col("curl").alias("canonical_url"),
            "n_dups",
            "keeper_doc",
            "last_doc",
        )
        .orderBy("canonical_url")
    )
