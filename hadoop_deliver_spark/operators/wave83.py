"""§2 extensions, eighty-third wave — segregation indices and a
robust-quantile shape measure.

- orders_duncan_dissimilarity: the Duncan & Duncan index of
  dissimilarity (1955) — THE canonical two-group segregation measure
  (what share of urgent orders would have to move nations to equalize
  the distributions), FULLY exact.
- orders_isolation_index: the Bell (1954) isolation index xP*x — the
  probability that a random same-group contact is same-group, the
  exposure-family complement of Duncan's D.
- agg_moors_kurtosis: Moors' octile kurtosis (1988) — the robust,
  outlier-proof kurtosis that pairs with the shipped Bowley quartile
  skewness (wave39) the way IQR pairs with SD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_NATION_URGENT_SQL = """
    cells AS (
        SELECT n_name,
               CAST(count(*) FILTER (o_orderpriority = '1-URGENT')
                    AS BIGINT) AS a,
               CAST(count(*) FILTER (o_orderpriority <> '1-URGENT')
                    AS BIGINT) AS b
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    ),
    tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM cells
    )
"""


@register(
    "orders_duncan_dissimilarity",
    f"""
    WITH {_NATION_URGENT_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_nations, max(t.ta) AS n_urgent,
           max(t.tb) AS n_rest,
           round(CAST(sum(abs(CAST(c.a AS HUGEINT) * t.tb
                              - CAST(c.b AS HUGEINT) * t.ta)) AS DOUBLE)
                 / (2 * CAST(max(t.ta) AS DOUBLE) * max(t.tb)), 6)
               AS duncan_d,
           5 * CAST(sum(abs(CAST(c.a AS HUGEINT) * t.tb
                            - CAST(c.b AS HUGEINT) * t.ta)) AS HUGEINT)
               > 2 * CAST(max(t.ta) AS HUGEINT) * max(t.tb)
               AS segregated
    FROM cells c CROSS JOIN tot t
    """,
    tags=("analytics", "stats"),
)
def orders_duncan_dissimilarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duncan & Duncan index of dissimilarity (1955) between URGENT
    and non-urgent orders across the 25 customer nations: D =
    ½·Σ_k|a_k/A − b_k/B| — the share of either group that would have
    to relocate for the two nation distributions to coincide, THE
    canonical segregation/market-split measure. Clearing the
    per-group denominators makes the whole numerator ONE exact
    integer: Σ_k|a_k·B − b_k·A| in DECIMAL(38)/HUGEINT (each term ≤
    N²/25 — int64-safe to ~sf500, DECIMAL(38)-safe everywhere), so D
    displays as a single division of exact integers and the verdict
    D > 0.2 (the conventional "moderate segregation" reading)
    clears FULLY exactly to 5·Σ|a_kB − b_kA| > 2·A·B — no double in
    the decision.

    Scale shape: one keyed reduce of the fact join to 25 nation
    cells (customer/nation dims broadcast), a 1-row total, a 25-row
    exact reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("a"),
            F.count_if(F.col("o_orderpriority") != "1-URGENT")
            .cast("long")
            .alias("b"),
        )
    )
    tot = cells.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    term = F.abs(
        F.col("a").cast("decimal(38,0)") * F.col("tb")
        - F.col("b").cast("decimal(38,0)") * F.col("ta")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.max("ta").alias("n_urgent"),
        F.max("tb").alias("n_rest"),
        F.round(
            F.sum(term).cast("double")
            / (2 * F.max("ta").cast("double") * F.max("tb")),
            6,
        ).alias("duncan_d"),
        (
            5 * F.sum(term)
            > 2 * F.max("ta").cast("decimal(38,0)") * F.max("tb")
        ).alias("segregated"),
    )


@register(
    "orders_isolation_index",
    f"""
    WITH {_NATION_URGENT_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_nations,
           max(t.ta) AS n_urgent,
           round(sum((CAST(c.a AS DOUBLE) / t.ta)
                     * (CAST(c.a AS DOUBLE) / (c.a + c.b))), 6)
               AS isolation_xpx,
           round(CAST(max(t.ta) AS DOUBLE) / (max(t.ta) + max(t.tb)), 6)
               AS evenness_baseline,
           sum((CAST(c.a AS DOUBLE) / t.ta)
               * (CAST(c.a AS DOUBLE) / (c.a + c.b)))
               > 1.05 * (CAST(max(t.ta) AS DOUBLE)
                         / (max(t.ta) + max(t.tb)))
               AS clustered
    FROM cells c CROSS JOIN tot t
    """,
    tags=("analytics", "stats"),
)
def orders_isolation_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bell's isolation index (1954) for URGENT orders across the 25
    customer nations: xP*x = Σ_k (a_k/A)·(a_k/t_k) — the probability
    that a randomly chosen co-national of a random urgent order is
    itself urgent, the exposure-family complement of Duncan's D
    (D asks "how unevenly spread", P* asks "how much same-group
    contact the spread produces"). Under perfect evenness xP*x
    equals the group share A/T exactly, so BOTH the index and that
    baseline ship, and the verdict flags clustering only past a 5%
    margin over evenness (literal 1.05 = 21/20 — on a near-even
    fixture the index sits AT the baseline, and a bare > would
    decide by noise; the margin makes the decision informative).
    The 25 per-nation ratio terms have heterogeneous denominators
    t_k, so the sum is an engine aggregate over 25 EXACT-INTEGER
    ratio terms — each term a correctly-rounded two-division chain;
    the 25-element sum is the one place aggregation order could
    bite, and the oracle shares the identical grouping so both
    engines reduce the same 25 doubles (the llm_split_divergence
    precedent for bounded-key double reduces).

    Scale shape: identical to orders_duncan_dissimilarity — 25
    cells, 1-row total, 25-row reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("a"),
            F.count_if(F.col("o_orderpriority") != "1-URGENT")
            .cast("long")
            .alias("b"),
        )
    )
    tot = cells.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    term = (F.col("a").cast("double") / F.col("ta")) * (
        F.col("a").cast("double") / (F.col("a") + F.col("b"))
    )
    base = F.max("ta").cast("double") / (F.max("ta") + F.max("tb"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.max("ta").alias("n_urgent"),
        F.round(F.sum(term), 6).alias("isolation_xpx"),
        F.round(base, 6).alias("evenness_baseline"),
        (F.sum(term) > 1.05 * base).alias("clustered"),
    )


@register(
    "agg_moors_kurtosis",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(((quantile_cont(o_totalprice, 0.875)
                   - quantile_cont(o_totalprice, 0.625))
                  + (quantile_cont(o_totalprice, 0.375)
                     - quantile_cont(o_totalprice, 0.125)))
                 / (quantile_cont(o_totalprice, 0.75)
                    - quantile_cont(o_totalprice, 0.25)), 6)
               AS moors_kurtosis,
           ((quantile_cont(o_totalprice, 0.875)
             - quantile_cont(o_totalprice, 0.625))
            + (quantile_cont(o_totalprice, 0.375)
               - quantile_cont(o_totalprice, 0.125)))
               > 1.233 * (quantile_cont(o_totalprice, 0.75)
                          - quantile_cont(o_totalprice, 0.25))
               AS heavier_than_normal
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregate", "stats"),
)
def agg_moors_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moors' octile kurtosis (1988) per order status: K =
    [(E₇−E₅) + (E₃−E₁)] / (E₆−E₂) with E_i the i/8 quantiles — the
    robust tail-weight measure that survives what destroys the 4th
    moment (one corrupt row can push classical kurtosis anywhere;
    octiles move only if an eighth of the data moves). Pairs with
    the shipped Bowley quartile skewness exactly as IQR pairs with
    SD — together they form the complete quantile-based shape panel.
    Octiles come from Spark's EXACT sort-based percentile (the
    agg_percentile / agg_tukey_trimean parity with DuckDB's
    quantile_cont); K combines six of them in one fixed textual
    order. The verdict compares against Moors' own normal reference
    value K_Φ = 1.233 (his Table 1), cleared of the division: the
    numerator sum > 1.233·(E₆−E₂) — same bit-identical quantile
    inputs and literal on both engines.

    Scale shape: one exact-percentile aggregate per group (sort-
    based exact path; at 100 TB swap percentile_approx and accept
    t-digest error bars — the agg_tukey_trimean stated knob)."""
    o = tbl(spark, sf_dir, "orders")
    e = {
        i: F.percentile("o_totalprice", i / 8.0) for i in (1, 2, 3, 5, 6, 7)
    }
    num = (e[7] - e[5]) + (e[3] - e[1])
    den = e[6] - e[2]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(num / den, 6).alias("moors_kurtosis"),
            (num > 1.233 * den).alias("heavier_than_normal"),
        )
        .orderBy("o_orderstatus")
    )
