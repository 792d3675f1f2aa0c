"""§2 extensions, hundred-first wave — actuarial development
(published-method cadence).

- orders_chain_ladder: the chain-ladder development triangle
  (standard actuarial practice; distribution-free treatment in
  Mack 1993) — cohort-month × development-age cumulative revenue
  and the age-to-age link ratios, fully exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_MAX_AGE = 4
# cohorts must have all 0.._MAX_AGE development months observed:
# calendar ends 1998-08, so the last complete cohort month is 1998-03
_COHORT_CUTOFF = "1998-04-01"


@register(
    "orders_chain_ladder",
    f"""
    WITH cells AS (
        SELECT ((year(CAST(o.o_orderdate AS DATE)) - 1992) * 12
                + month(CAST(o.o_orderdate AS DATE)) - 1) AS m0,
               least((year(CAST(l.l_shipdate AS DATE)) - 1992) * 12
                     + month(CAST(l.l_shipdate AS DATE)) - 1
                     - ((year(CAST(o.o_orderdate AS DATE)) - 1992) * 12
                        + month(CAST(o.o_orderdate AS DATE)) - 1),
                     {_MAX_AGE}) AS age,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE CAST(o.o_orderdate AS DATE) < DATE '{_COHORT_CUTOFF}'
    ),
    coh AS (
        SELECT m0,
            {", ".join(
                f"CAST(sum(CASE WHEN age <= {a} THEN v ELSE 0 END)"
                f" AS BIGINT) AS c{a}"
                for a in range(_MAX_AGE + 1)
            )}
        FROM cells GROUP BY m0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cohorts,
            {", ".join(
                f"CAST(sum(c{a}) AS HUGEINT) AS s{a}"
                for a in range(_MAX_AGE + 1)
            )}
        FROM coh
    )
    {" UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS age, n_cohorts,"
        f" CAST(s{a} AS BIGINT) AS cum_cents,"
        f" CAST(s{a + 1} AS BIGINT) AS cum_next_cents,"
        f" round(CAST(s{a + 1} AS DOUBLE) / CAST(s{a} AS DOUBLE), 6)"
        f" AS link_ratio,"
        f" s{a + 1} > s{a} AS still_developing FROM s"
        for a in range(_MAX_AGE)
    )}
    ORDER BY age
    """,
    tags=("orders", "stats"),
)
def orders_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development triangle (the standard actuarial
    reserving method; Mack 1993 gave it its distribution-free
    footing): cohort = order MONTH, development age = months from
    order to line shipment (capped at 4), value =
    cumulative shipped revenue — the age-to-age link ratios
    f_a = ΣC(·, a+1)/ΣC(·, a) are what reserving projects
    ultimate revenue from, and what a delivery pipeline uses to
    forecast how much of a cohort's value is still in flight. Only
    COMPLETE cohorts enter (order month < 1998-04, the
    exact literal giving every cohort its full 4-month
    development window — the standard right-edge truncation).
    Month indices are exact integer (y−1992)·12 + m−1 arithmetic;
    cumulative cells are literal conditional sums (age ≤ a — no
    window), every Σ is exact DECIMAL(38)/HUGEINT, each link ratio
    is ONE exact-input double division, and the still-developing
    flag ΣC_(a+1) > ΣC_a is FULLY exact.

    Scale shape: one keyed header-lines join reduce to the bounded
    (cohort-month × age) triangle (~75 × 5 cells at ANY corpus
    scale), a 1-row pivot, a 4-row literal unstack."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    m_ord = (
        (F.year(F.to_date("o_orderdate")) - 1992) * 12
        + F.month(F.to_date("o_orderdate"))
        - 1
    )
    m_ship = (
        (F.year(F.to_date("l_shipdate")) - 1992) * 12
        + F.month(F.to_date("l_shipdate"))
        - 1
    )
    cells = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(
            F.to_date("o_orderdate")
            < F.lit(_COHORT_CUTOFF).cast("date")
        )
        .select(
            m_ord.alias("m0"),
            F.least(m_ship - m_ord, F.lit(_MAX_AGE)).alias("age"),
            (dec2("l_extendedprice") * 100).cast("long").alias("v"),
        )
    )
    coh = cells.groupBy("m0").agg(
        *[
            F.sum(F.when(F.col("age") <= a, F.col("v")).otherwise(0))
            .cast("long")
            .alias(f"c{a}")
            for a in range(_MAX_AGE + 1)
        ]
    )
    s = coh.agg(
        F.count(F.lit(1)).cast("long").alias("n_cohorts"),
        *[
            F.sum(F.col(f"c{a}").cast("decimal(38,0)")).alias(f"s{a}")
            for a in range(_MAX_AGE + 1)
        ],
    )
    out = None
    for a in range(_MAX_AGE):
        row = s.select(
            F.lit(a).cast("long").alias("age"),
            "n_cohorts",
            F.col(f"s{a}").cast("long").alias("cum_cents"),
            F.col(f"s{a + 1}").cast("long").alias("cum_next_cents"),
            F.round(
                F.col(f"s{a + 1}").cast("double")
                / F.col(f"s{a}").cast("double"),
                6,
            ).alias("link_ratio"),
            (F.col(f"s{a + 1}") > F.col(f"s{a}")).alias(
                "still_developing"
            ),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("age")
