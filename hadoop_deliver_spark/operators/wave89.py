"""§2 extensions, eighty-ninth wave — the shift-share decomposition.

- orders_shift_share: Dunn's (1960) shift-share analysis of
  per-nation order growth 1996 → 1997 across the five priority
  "industries" — the regional-economics standard that splits each
  region's growth into the national tide, the industry mix it rode,
  and the genuinely local competitive shift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl


@register(
    "orders_shift_share",
    """
    WITH base AS (
        SELECT n_name,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS ind,
               CAST(count(*) FILTER (
                   o_orderdate >= DATE '1996-01-01'
                   AND o_orderdate < DATE '1997-01-01') AS BIGINT) AS n0,
               CAST(count(*) FILTER (
                   o_orderdate >= DATE '1997-01-01'
                   AND o_orderdate < DATE '1998-01-01') AS BIGINT) AS n1
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1998-01-01'
        GROUP BY 1, 2
    ),
    ind_tot AS (
        SELECT ind, CAST(sum(n0) AS BIGINT) AS i0,
               CAST(sum(n1) AS BIGINT) AS i1
        FROM base GROUP BY ind
    ),
    tot AS (
        SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1
        FROM base
    ),
    piv AS (
        SELECT b.n_name,
               CAST(coalesce(max(CASE WHEN b.ind = 1 THEN b.n0 END), 0) AS BIGINT) AS n0_1,
               CAST(coalesce(max(CASE WHEN b.ind = 1 THEN b.n1 END), 0) AS BIGINT) AS n1_1,
               CAST(max(CASE WHEN i.ind = 1 THEN i.i0 END) AS BIGINT) AS i0_1,
               CAST(max(CASE WHEN i.ind = 1 THEN i.i1 END) AS BIGINT) AS i1_1,
               CAST(coalesce(max(CASE WHEN b.ind = 2 THEN b.n0 END), 0) AS BIGINT) AS n0_2,
               CAST(coalesce(max(CASE WHEN b.ind = 2 THEN b.n1 END), 0) AS BIGINT) AS n1_2,
               CAST(max(CASE WHEN i.ind = 2 THEN i.i0 END) AS BIGINT) AS i0_2,
               CAST(max(CASE WHEN i.ind = 2 THEN i.i1 END) AS BIGINT) AS i1_2,
               CAST(coalesce(max(CASE WHEN b.ind = 3 THEN b.n0 END), 0) AS BIGINT) AS n0_3,
               CAST(coalesce(max(CASE WHEN b.ind = 3 THEN b.n1 END), 0) AS BIGINT) AS n1_3,
               CAST(max(CASE WHEN i.ind = 3 THEN i.i0 END) AS BIGINT) AS i0_3,
               CAST(max(CASE WHEN i.ind = 3 THEN i.i1 END) AS BIGINT) AS i1_3,
               CAST(coalesce(max(CASE WHEN b.ind = 4 THEN b.n0 END), 0) AS BIGINT) AS n0_4,
               CAST(coalesce(max(CASE WHEN b.ind = 4 THEN b.n1 END), 0) AS BIGINT) AS n1_4,
               CAST(max(CASE WHEN i.ind = 4 THEN i.i0 END) AS BIGINT) AS i0_4,
               CAST(max(CASE WHEN i.ind = 4 THEN i.i1 END) AS BIGINT) AS i1_4,
               CAST(coalesce(max(CASE WHEN b.ind = 5 THEN b.n0 END), 0) AS BIGINT) AS n0_5,
               CAST(coalesce(max(CASE WHEN b.ind = 5 THEN b.n1 END), 0) AS BIGINT) AS n1_5,
               CAST(max(CASE WHEN i.ind = 5 THEN i.i0 END) AS BIGINT) AS i0_5,
               CAST(max(CASE WHEN i.ind = 5 THEN i.i1 END) AS BIGINT) AS i1_5,
               max(t.t0) AS t0, max(t.t1) AS t1
        FROM base b
        JOIN ind_tot i ON i.ind = b.ind
        CROSS JOIN tot t
        GROUP BY b.n_name
    ),
    terms AS (
        SELECT n_name,
               n0_1 + n0_2 + n0_3 + n0_4 + n0_5 AS r0,
               n1_1 + n1_2 + n1_3 + n1_4 + n1_5 AS r1,
               n0_1 * CAST(i1_1 AS DOUBLE) / i0_1 + n0_2 * CAST(i1_2 AS DOUBLE) / i0_2 + n0_3 * CAST(i1_3 AS DOUBLE) / i0_3 + n0_4 * CAST(i1_4 AS DOUBLE) / i0_4 + n0_5 * CAST(i1_5 AS DOUBLE) / i0_5 AS expected_ind,
               CAST(t1 AS DOUBLE) / t0 AS g,
               t0, t1
        FROM piv
    )
    SELECT n_name, r0 AS n_1996, r1 AS n_1997,
           round(r0 * (g - 1), 4) AS national_share,
           round(expected_ind - r0 * g, 4) AS industry_mix,
           round(r1 - expected_ind, 4) AS competitive_shift,
           r1 - expected_ind > 0 AS locally_competitive,
           CAST(r1 AS HUGEINT) * t0 > CAST(r0 AS HUGEINT) * t1
               AS gained_share
    FROM terms ORDER BY n_name
    """,
    tags=("analytics", "stats"),
)
def orders_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's shift-share decomposition (1960) of per-nation order
    growth, 1996 → 1997, with the five priorities as "industries":
    Δ_k = NS_k + IM_k + CS_k, where NS_k = n0_k·(g−1) is the national
    tide (what the region gains by existing in a growing total),
    IM_k = Σ_i n0_ki·(g_i − g) is the industry mix (was the region
    loaded with fast- or slow-growing priorities), and CS_k = n1_k −
    Σ_i n0_ki·g_i is the competitive shift — growth the region
    earned beyond its composition, the number regional economists
    actually argue about. The CS form avoids per-cell growth rates
    entirely (n0_ki = 0 cells contribute their raw n1_ki — no
    division-by-zero guard needed, a deliberate formulation choice),
    so every term is a fixed-order assembly over the FIVE industry
    ratios g_i = i1_i/i0_i from exact integer counts; the three
    components sum to Δ_k exactly in exact arithmetic and to within
    ulps in the displayed doubles. Verdicts: locally_competitive
    compares the bit-identical fixed-order CS to 0;
    gained_share (the region outgrew the total) is FULLY exact by
    cross-multiplication r1_k·T0 > r0_k·T1 (DECIMAL(38)/HUGEINT).

    Scale shape: one keyed reduce of the dim-joined fact slice to
    25×5 cells (customer/nation dims broadcast), 5-row and 1-row
    totals joined back broadcast, a 25-row fixed-order assembly."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    d0 = F.lit("1996-01-01").cast("date")
    d1 = F.lit("1997-01-01").cast("date")
    d2 = F.lit("1998-01-01").cast("date")
    base = (
        o.filter((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d2))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            "n_name",
            F.substring("o_orderpriority", 1, 1).cast("int").alias("ind"),
        )
        .agg(
            F.count_if(
                (F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1)
            )
            .cast("long")
            .alias("n0"),
            F.count_if(
                (F.col("o_orderdate") >= d1) & (F.col("o_orderdate") < d2)
            )
            .cast("long")
            .alias("n1"),
        )
    )
    ind_tot = base.groupBy("ind").agg(
        F.sum("n0").cast("long").alias("i0"),
        F.sum("n1").cast("long").alias("i1"),
    )
    tot = base.agg(
        F.sum("n0").cast("long").alias("t0"),
        F.sum("n1").cast("long").alias("t1"),
    )
    j = base.join(F.broadcast(ind_tot), "ind").crossJoin(F.broadcast(tot))
    piv = j.groupBy("n_name").agg(
        *[
            expr
            for i in range(1, 6)
            for expr in (
                F.coalesce(
                    F.max(F.when(F.col("ind") == i, F.col("n0"))),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"n0_{i}"),
                F.coalesce(
                    F.max(F.when(F.col("ind") == i, F.col("n1"))),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"n1_{i}"),
                F.max(F.when(F.col("ind") == i, F.col("i0")))
                .cast("long")
                .alias(f"i0_{i}"),
                F.max(F.when(F.col("ind") == i, F.col("i1")))
                .cast("long")
                .alias(f"i1_{i}"),
            )
        ],
        F.max("t0").alias("t0"),
        F.max("t1").alias("t1"),
    )
    r0 = sum(F.col(f"n0_{i}") for i in range(2, 6)) + F.col("n0_1")
    r1 = sum(F.col(f"n1_{i}") for i in range(2, 6)) + F.col("n1_1")
    expected = None
    for i in range(1, 6):
        t = (
            F.col(f"n0_{i}")
            * F.col(f"i1_{i}").cast("double")
            / F.col(f"i0_{i}")
        )
        expected = t if expected is None else expected + t
    g = F.col("t1").cast("double") / F.col("t0")
    terms = piv.select(
        "n_name",
        r0.alias("r0"),
        r1.alias("r1"),
        expected.alias("expected_ind"),
        g.alias("g"),
        "t0",
        "t1",
    )
    r0, r1 = F.col("r0"), F.col("r1")
    cs = r1 - F.col("expected_ind")
    return terms.select(
        "n_name",
        r0.alias("n_1996"),
        r1.alias("n_1997"),
        F.round(r0 * (F.col("g") - 1), 4).alias("national_share"),
        F.round(F.col("expected_ind") - r0 * F.col("g"), 4).alias(
            "industry_mix"
        ),
        F.round(cs, 4).alias("competitive_shift"),
        (cs > 0).alias("locally_competitive"),
        (
            r1.cast("decimal(38,0)") * F.col("t0")
            > r0.cast("decimal(38,0)") * F.col("t1")
        ).alias("gained_share"),
    ).orderBy("n_name")
