"""§2 extensions, hundred-sixty-third wave — watermark detection.

- llm_watermark_detect: Kirchenbauer-style greenlist watermark
  detection per source — the z-test every provenance pipeline runs
  over suspect corpora, with the greenlist derived from a hash both
  engines share bit-for-bit (md5), so the null is exactly Bin(N, ½)
  by construction.
The crafted-corpus test in tests/test_hypothesis.py drives the
detector's POSITIVE path (greenlist-chasing token choice) that the
unwatermarked fixture cannot exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "llm_watermark_detect",
    """
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    bg AS (
        SELECT source,
               unnest(CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i + 1])
                      ELSE [] END) AS p
        FROM toks
    ),
    g AS (
        SELECT source,
               CASE WHEN instr('02468ace', substr(md5(p), 1, 1)) > 0
                    THEN 1 ELSE 0 END AS green
        FROM bg
    ),
    s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(green) AS BIGINT) AS ng
        FROM g GROUP BY 1
    )
    SELECT source, n AS n_bigrams, ng AS n_green,
           round(CAST(ng AS DOUBLE) / n, 6) AS green_frac,
           round((ng - CAST(n AS DOUBLE) / 2)
                 / sqrt(CAST(n AS DOUBLE) / 4), 4) AS z_stat,
           round((ng - CAST(n AS DOUBLE) / 2)
                 / sqrt(CAST(n AS DOUBLE) / 4), 4) > 4.0 AS watermarked
    FROM s ORDER BY source
    """,
    tags=("llm", "text", "stats"),
)
def llm_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenlist watermark detection (Kirchenbauer, Geiping et al.
    2023) per documents source: a soft watermark biases each next
    token toward a pseudorandom 'green' half of the vocabulary keyed
    on the previous token; the detector needs no model — just the
    keyed green indicator and a one-proportion z-test. Here the
    greenlist is green(prev, cur) = first md5 hex digit of
    'prev cur' is even — md5 is bit-identical across both engines,
    so under the no-watermark null each bigram is green with
    probability EXACTLY ½ (averaged over the hash) and
    z = (G − N/2)/√(N/4) per source, flagged at the z > 4 threshold
    the paper uses. An actually-watermarked corpus (tokens chosen to
    chase the greenlist) drives the green fraction toward the bias
    γ+δ-share and z into the hundreds; the unwatermarked fixture
    sits at |z| ≈ O(1), which IS the correct negative result. Counts
    are exact integers; the z is one fixed textual expression on the
    ROUNDED display.

    Scale shape: one bigram explode (map-only), one md5-indicator
    projection, one source-keyed reduce with map-side combine."""
    d = tbl(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = d.select("source", F.split("text", " ").alias("t"))
    bg = toks.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                " ELSE array() END"
            )
        ).alias("p"),
    )
    green = F.when(
        F.instr(
            F.lit("02468ace"), F.substring(F.md5(F.col("p")), 1, 1)
        )
        > 0,
        1,
    ).otherwise(0)
    s = bg.select("source", green.alias("green")).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("green").cast("long").alias("ng"),
    )
    z = (F.col("ng") - F.col("n").cast("double") / 2) / F.sqrt(
        F.col("n").cast("double") / 4
    )
    return s.select(
        "source",
        F.col("n").alias("n_bigrams"),
        F.col("ng").alias("n_green"),
        F.round(F.col("ng").cast("double") / F.col("n"), 6).alias(
            "green_frac"
        ),
        F.round(z, 4).alias("z_stat"),
        (F.round(z, 4) > 4.0).alias("watermarked"),
    ).orderBy("source")
