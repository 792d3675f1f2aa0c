"""§2 extensions, hundred-sixty-eighth wave — supplier quality and
Taguchi robustness.

- supplier_return_quality: the return-rate league table per supplier
  with Wilson-score intervals — small-sample-honest supplier quality
  ranking (a supplier with 2/3 returns must NOT outrank one with
  40/100; the interval lower bound is the sort key, the standard
  trick from rating systems).
- agg_taguchi_sn: Taguchi's three signal-to-noise ratios per order
  priority — smaller-is-better on fulfilment lag, larger-is-better
  on order value, nominal-is-best on quantity — the robust-design
  summary that penalizes VARIANCE alongside the mean, beside
  agg_process_capability's spec-limit view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_Z = "1.959964"


@register(
    "supplier_return_quality",
    f"""
    WITH r AS (
        SELECT l_suppkey AS sk,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ),
    w AS (
        SELECT sk, n, x,
               CAST(x AS DOUBLE) / n AS p,
               ((CAST(x AS DOUBLE) / n + {_Z} * {_Z} / (2 * n))
                - {_Z} * sqrt((CAST(x AS DOUBLE) / n)
                              * (1 - CAST(x AS DOUBLE) / n) / n
                              + {_Z} * {_Z} / (4.0 * n * n)))
                   / (1 + {_Z} * {_Z} / n) AS lo,
               ((CAST(x AS DOUBLE) / n + {_Z} * {_Z} / (2 * n))
                + {_Z} * sqrt((CAST(x AS DOUBLE) / n)
                              * (1 - CAST(x AS DOUBLE) / n) / n
                              + {_Z} * {_Z} / (4.0 * n * n)))
                   / (1 + {_Z} * {_Z} / n) AS hi
        FROM r
    )
    SELECT sk AS suppkey, n AS n_lines, x AS n_returns,
           round(p, 6) AS return_rate,
           round(lo, 6) AS wilson_lo,
           round(hi, 6) AS wilson_hi
    FROM (SELECT *, row_number() OVER (ORDER BY lo DESC, sk) AS rn
          FROM w)
    WHERE rn <= 10 ORDER BY wilson_lo DESC, suppkey
    """,
    tags=("supplier", "dq", "stats"),
)
def supplier_return_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier return-rate league table ranked by the Wilson-score
    LOWER bound (Wilson 1927; the 'how not to sort by average
    rating' construction): for each supplier the exact
    (returned, total) line counts give p̂ with the score interval
    (p̂ + z²/2n ± z√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n), and the
    worst-10 list sorts by the lower bound so a 2-of-3 supplier
    cannot outrank a 40-of-100 one on noise alone — the difference
    between this and sorting raw rates IS the operator's point.
    Counts are exact integers; the interval is one fixed textual
    chain with the shared z literal; suppkey breaks ties.

    Scale shape: ONE supplier-keyed reduce of the fact table with
    map-side combine, a bounded top-10 (TakeOrdered), no joins."""
    li = tbl(spark, sf_dir, "lineitem")
    r = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    z = float(_Z)
    p = F.col("x").cast("double") / F.col("n")
    n = F.col("n")
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    w = r.select(
        "sk",
        "n",
        "x",
        p.alias("p"),
        ((center - half) / denom).alias("lo"),
        ((center + half) / denom).alias("hi"),
    )
    return (
        w.orderBy(F.col("lo").desc(), "sk")
        .limit(10)
        .select(
            F.col("sk").alias("suppkey"),
            F.col("n").alias("n_lines"),
            F.col("x").alias("n_returns"),
            F.round("p", 6).alias("return_rate"),
            F.round("lo", 6).alias("wilson_lo"),
            F.round("hi", 6).alias("wilson_hi"),
        )
        .orderBy(F.col("wilson_lo").desc(), "suppkey")
    )


@register(
    "agg_taguchi_sn",
    """
    WITH base AS (
        SELECT o.o_orderpriority AS priority,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(l.l_quantity AS BIGINT) AS q
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) > 0
    ),
    m AS (
        SELECT priority, CAST(count(*) AS BIGINT) AS n,
               avg(CAST(lag AS DOUBLE) * lag) AS msq_lag,
               avg(1.0 / (CAST(cents AS DOUBLE) / 100)
                   / (CAST(cents AS DOUBLE) / 100)) AS minv_val,
               avg(CAST(q AS DOUBLE)) AS mq,
               avg(CAST(q AS DOUBLE) * q) AS mq2
        FROM base GROUP BY 1
    )
    SELECT priority, n AS n_lines,
           round(-10 * log10(msq_lag), 4) AS sn_lag_smaller_better,
           round(-10 * log10(minv_val), 4) AS sn_value_larger_better,
           round(10 * log10(mq * mq
                            / ((mq2 - mq * mq) * n / (n - 1))), 4)
               AS sn_qty_nominal_best
    FROM m ORDER BY priority
    """,
    tags=("agg", "stats"),
)
def agg_taguchi_sn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taguchi signal-to-noise ratios (Taguchi 1986) per order
    priority, one per response type: smaller-is-better on the
    fulfilment lag SN = −10·log₁₀(mean lag²) — variance AND level
    both hurt; larger-is-better on order value (dollars)
    SN = −10·log₁₀(mean 1/y²); nominal-is-best on line quantity
    SN = 10·log₁₀(ȳ²/s²) — pure precision about the process mean.
    The three are the robust-design trinity every DOE text tabulates
    per control-factor level; agg_process_capability compares
    against spec LIMITS, Taguchi's loss view needs none.
    Nonpositive lags are excluded on both sides (log of the
    smaller-better response family assumes positive responses —
    pinned). Power sums are fixed textual float chains over exact
    integer (lag, cents, quantity) inputs, rounded at 4.

    Scale shape: one orders⋈lineitem equi-join and one
    priority-keyed 5-sum reduce — map-side combine, no windows."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    base = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(lag > 0)
        .select(
            F.col("o_orderpriority").alias("priority"),
            lag.cast("long").alias("lag"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
    )
    dollars = F.col("cents").cast("double") / 100
    m = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("lag").cast("double") * F.col("lag")).alias("msq_lag"),
        F.avg(1.0 / dollars / dollars).alias("minv_val"),
        F.avg(F.col("q").cast("double")).alias("mq"),
        F.avg(F.col("q").cast("double") * F.col("q")).alias("mq2"),
    )
    n, mq, mq2 = F.col("n"), F.col("mq"), F.col("mq2")
    return m.select(
        "priority",
        n.alias("n_lines"),
        F.round(-10 * F.log10("msq_lag"), 4).alias(
            "sn_lag_smaller_better"
        ),
        F.round(-10 * F.log10("minv_val"), 4).alias(
            "sn_value_larger_better"
        ),
        F.round(
            10
            * F.log10(mq * mq / ((mq2 - mq * mq) * n / (n - 1))),
            4,
        ).alias("sn_qty_nominal_best"),
    ).orderBy("priority")
