"""§2.J — UDF / UDAF / UDTF surface.

UDFs are the slow path by design: everything else in the engine stays
JVM-side. Where Python is unavoidable the Arrow-vectorized forms
(`pandas_udf`, `applyInPandas`, `mapInPandas`) move data in columnar
batches (~10-100× over row-at-a-time pickling); the one row-at-a-time
`@udf` here exists to cover the API, not as a pattern to copy.

Every UDF output is still oracle-checked: the Python logic is
mirrored in DuckDB SQL, so the check also proves the UDF computes
the relationally-expressible thing it claims to.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "udf_python_scalar",
    """
    SELECT c_custkey, lower(replace(c_name, '#', '-')) AS slug
    FROM customer ORDER BY c_custkey
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (slugify). Each row crosses the
    JVM→Python boundary individually — kept off every hot path; the
    oracle mirrors the logic in SQL so output is fully hash-checked."""

    @udf(returnType="string")
    def slugify(name: str) -> str:
        return name.replace("#", "-").lower()

    c = tbl(spark, sf_dir, "customer")
    return c.select("c_custkey", slugify("c_name").alias("slug")).orderBy(
        "c_custkey"
    )


@register(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice / l_quantity AS REAL) AS unit_price
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow UDF: series→series unit price. Data crosses as
    Arrow batches and is processed with numpy vector ops."""

    @pandas_udf("double")
    def unit_price(price: pd.Series, qty: pd.Series) -> pd.Series:
        return price / qty

    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        unit_price("l_extendedprice", "l_quantity").cast("float").alias(
            "unit_price"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "udaf_pandas_grouped",
    """
    SELECT l_returnflag,
           CAST(exp(avg(ln(l_extendedprice))) AS REAL) AS geo_mean_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via grouped-agg pandas_udf: geometric mean.
    Runs as a real aggregate (one Arrow batch per group partition);
    the oracle recomputes it as exp(avg(ln)) — an independent
    formulation of the same statistic."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(math.exp(np.log(v.to_numpy()).mean()))

    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(geo_mean("l_extendedprice").cast("float").alias("geo_mean_price"))
        .orderBy("l_returnflag")
    )


@register(
    "udtf_grouped_map",
    """
    SELECT event_id,
           CAST((value - avg(value) OVER (PARTITION BY user_id))
                / stddev_samp(value) OVER (PARTITION BY user_id) AS REAL) AS znorm
    FROM events ORDER BY event_id
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group table transform via applyInPandas: z-normalize event
    values within each user (whole group as one pandas frame — the
    escape hatch for logic that needs the full group in memory; fine
    while the largest single group fits an executor, which is the
    same constraint any grouped-map carries at 100 TB)."""

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "znorm": (v - v.mean()) / v.std(ddof=1),
            }
        )
        return out

    ev = tbl(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(znorm, "event_id bigint, znorm double")
        .select("event_id", F.col("znorm").cast("float").alias("znorm"))
        .orderBy("event_id")
    )


@register(
    "udtf_python",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(t) - 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' ')
               )) AS shingle
        FROM toks
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           count(DISTINCT shingle) AS n_distinct,
           min(shingle) AS first_shingle
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True UDTF (one row → N rows): 3-token shingle generator over
    document text — the same expansion the MinHash pipeline uses. The
    oracle regenerates shingles relationally with list_slice."""

    @udtf(returnType="doc_id: bigint, shingle: string")
    class ShingleGen:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield doc_id, " ".join(toks[i : i + 3])

    d = tbl(spark, sf_dir, "documents")
    spark.udtf.register("hds_shingle_gen", ShingleGen)
    d.select("doc_id", "text").createOrReplaceTempView("hds_udtf_docs")
    shingles = spark.sql(
        "SELECT s.doc_id, s.shingle FROM hds_udtf_docs d, "
        "LATERAL hds_shingle_gen(d.doc_id, d.text) s"
    )
    return (
        shingles.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_distinct("shingle").alias("n_distinct"),
            F.min("shingle").alias("first_shingle"),
        )
        .orderBy("doc_id")
    )


@register(
    "udf_map_partitions",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           n_chars,
           CAST(n_chars AS REAL) / len(string_split(text, ' ')) AS chars_per_token
    FROM documents ORDER BY doc_id
    """,
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition transform via mapInPandas: iterator of Arrow
    batches in, iterator out — the shape for per-partition setup cost
    amortization (model loading, dictionary init). Logic here is
    per-row (token stats) so the output is partitioning-independent
    and fully hash-checkable."""

    def stats(batches):
        for pdf in batches:
            ntok = pdf["text"].str.split(" ").str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": ntok,
                    "n_chars": pdf["n_chars"],
                    "chars_per_token": pdf["n_chars"].astype("float32") / ntok,
                }
            )

    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "text", "n_chars")
        .mapInPandas(
            stats,
            "doc_id bigint, n_tokens bigint, n_chars bigint, chars_per_token float",
        )
        .orderBy("doc_id")
    )
