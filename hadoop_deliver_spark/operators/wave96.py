"""§2 extensions, ninety-sixth wave — the runs-based two-sample
omnibus.

- orders_runs_ww: the Wald-Wolfowitz two-sample runs test (1940) —
  sort both samples together and count label runs; ANY difference
  (location, scale, shape) depresses the run count. The historical
  omnibus that completes the two-sample ladder: KS (sup), CvM
  (integral), AD (tails), BWS (variance-weighted), runs (pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CHI2_1_95 = "3.841459"


@register(
    "orders_runs_ww",
    f"""
    WITH o AS (
        SELECT o_orderpriority = '1-URGENT' AS urg,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS r
        FROM orders
    ),
    adj AS (
        SELECT a.urg AS ua, b.urg AS ub
        FROM o a JOIN o b ON b.r = a.r + 1
    ),
    s AS (
        SELECT CAST((SELECT count(*) FILTER (urg) FROM o) AS BIGINT)
                   AS n1,
               CAST((SELECT count(*) FILTER (NOT urg) FROM o) AS BIGINT)
                   AS n2,
               CAST(count(*) FILTER (ua <> ub) + 1 AS BIGINT) AS runs
        FROM adj
    ),
    c AS (
        SELECT n1, n2, runs, n1 + n2 AS n,
               CAST(runs - 1 AS HUGEINT) * (n1 + n2)
                   - 2 * CAST(n1 AS HUGEINT) * n2 AS a
        FROM s
    )
    SELECT n1 AS n_urgent, n2 AS n_rest, runs,
           round(2.0 * n1 * n2 / n + 1, 4) AS expected_runs,
           round(CAST(a AS DOUBLE) / n
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 4) AS z,
           CAST(a AS DOUBLE) * CAST(a AS DOUBLE) * (n - 1)
               > {_CHI2_1_95} * (2.0 * n1 * n2)
                 * (2.0 * n1 * n2 - n)
               AS distributions_differ
    FROM c
    """,
    tags=("agg", "stats"),
)
def orders_runs_ww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz two-sample runs test (1940): pool the URGENT
    and non-urgent order values, sort by (cents, orderkey) — the
    deterministic no-ties adaptation every rank test in this tree
    uses — and count the RUNS of same-group labels; under H₀ the
    labels are an exchangeable shuffle with E[R] = 2n₁n₂/N + 1 and
    Var[R] = 2n₁n₂(2n₁n₂−N)/(N²(N−1)), and ANY distributional
    difference (location, scale, shape) clumps the labels and
    depresses R — the historical omnibus completing the two-sample
    ladder (KS sup / CvM integral / AD tails / BWS weights / runs
    pattern). The run count needs only ADJACENT ranks, so the Spark
    side joins the block-ranked order (api.exact_global_rank) to
    itself on r+1 = r — an ordinary equi-join shuffle, NO
    single-partition window over the fact table (the oracle's
    row_number is the single-node twin). A = (R−1)·N − 2n₁n₂ is an
    EXACT DECIMAL(38)/HUGEINT integer; the two-sided 5% verdict
    clears Var's N²(N−1) denominator to A²·(N−1) >
    χ²₁(0.95)·2n₁n₂·(2n₁n₂−N) with one double cast per factor in
    fixed textual order (A² bursts DECIMAL(38) around sf10); R, E,
    z display as fixed-order doubles of exact integers.

    Scale shape: one block-ranked pass over orders, one consecutive-
    rank equi-join (rank is an ordinary shuffle key), a 1-row
    reduce."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(
        base, "cents", "o_orderkey", "r"
    ).select("urg", F.col("r").cast("long").alias("r"))
    a = ranked.select(F.col("urg").alias("ua"), F.col("r").alias("ra"))
    b = ranked.select(
        F.col("urg").alias("ub"), (F.col("r") - 1).alias("rb")
    )
    adj = a.join(b, a.ra == b.rb)
    tots = ranked.agg(
        F.count_if(F.col("urg")).cast("long").alias("n1"),
        F.count_if(~F.col("urg")).cast("long").alias("n2"),
    )
    runs = adj.agg(
        (F.count_if(F.col("ua") != F.col("ub")) + 1)
        .cast("long")
        .alias("runs")
    )
    s = tots.crossJoin(F.broadcast(runs))
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("runs")
    n = n1 + n2
    c = s.select(
        "n1",
        "n2",
        "runs",
        n.alias("n"),
        (
            (r - 1).cast("decimal(38,0)") * n
            - 2 * n1.cast("decimal(38,0)") * n2
        ).alias("a"),
    )
    n, av = F.col("n"), F.col("a")
    return c.select(
        n1.alias("n_urgent"),
        n2.alias("n_rest"),
        "runs",
        F.round(2.0 * n1 * n2 / n + 1, 4).alias("expected_runs"),
        F.round(
            av.cast("double")
            / n
            / F.sqrt(
                2.0
                * n1
                * n2
                * (2.0 * n1 * n2 - n)
                / (n.cast("double") * n * (n - 1))
            ),
            4,
        ).alias("z"),
        (
            av.cast("double") * av.cast("double") * (n - 1)
            > float(_CHI2_1_95)
            * (2.0 * n1 * n2)
            * (2.0 * n1 * n2 - n)
        ).alias("distributions_differ"),
    )
