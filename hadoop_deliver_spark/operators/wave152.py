"""§2 extensions, hundred-fifty-second wave — symmetry of mobility
and rank-free dependence.

- customers_bowker_symmetry: Bowker's (1948) test of SYMMETRY on the
  spend-tercile transition matrix — the third member of the
  transition-matrix triple: customers_shorrocks_mobility asks how
  much movement, customers_stuart_maxwell whether the marginals
  shifted, Bowker whether up-moves mirror down-moves cell by cell.
- ts_hoeffding_d: Hoeffding's (1948) D statistic between daily
  revenue and daily error count — the rank-based dependence measure
  that, unlike Spearman/Kendall (monotone-only), is consistent
  against ALL dependence alternatives, computed exactly on the
  tie-broken calendar-bounded day axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_CHI2_3_95 = "7.814728"


@register(
    "customers_bowker_symmetry",
    f"""
    WITH spend AS (
        SELECT o_custkey,
               CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
                    THEN 1 ELSE 2 END AS half,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    both_halves AS (
        SELECT o_custkey FROM spend GROUP BY o_custkey
        HAVING count(*) = 2
    ),
    rk AS (
        SELECT s.o_custkey, s.half,
               row_number() OVER (PARTITION BY s.half
                                  ORDER BY s.cents, s.o_custkey) AS r,
               count(*) OVER (PARTITION BY s.half) AS n
        FROM spend s JOIN both_halves USING (o_custkey)
    ),
    ter AS (
        SELECT o_custkey, half, 1 + (3 * (r - 1)) // n AS q
        FROM rk
    ),
    trans AS (
        SELECT a.q AS q1, b.q AS q2, CAST(count(*) AS BIGINT) AS c
        FROM ter a JOIN ter b
          ON a.o_custkey = b.o_custkey AND a.half = 1 AND b.half = 2
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN q1 = {i} AND q2 = {j}"
                f" THEN c END), 0) AS BIGINT) AS n{i}{j}"
                for i in range(1, 4)
                for j in range(1, 4)
                if i != j
            )},
            CAST(sum(c) AS BIGINT) AS nn
        FROM trans
    ),
    st AS (
        SELECT nn,
               n12 + n21 AS s12, n13 + n31 AS s13, n23 + n32 AS s23,
               CAST(n12 - n21 AS BIGINT) AS d12,
               CAST(n13 - n31 AS BIGINT) AS d13,
               CAST(n23 - n32 AS BIGINT) AS d23
        FROM piv
    )
    SELECT nn AS n_customers,
           s12 + s13 + s23 AS n_movers,
           round(CASE WHEN s12 > 0
                      THEN CAST(d12 * d12 AS DOUBLE) / s12 ELSE 0 END
                 + CASE WHEN s13 > 0
                        THEN CAST(d13 * d13 AS DOUBLE) / s13 ELSE 0 END
                 + CASE WHEN s23 > 0
                        THEN CAST(d23 * d23 AS DOUBLE) / s23 ELSE 0 END,
                 4) AS chi2_stat,
           round(CASE WHEN s12 > 0
                      THEN CAST(d12 * d12 AS DOUBLE) / s12 ELSE 0 END
                 + CASE WHEN s13 > 0
                        THEN CAST(d13 * d13 AS DOUBLE) / s13 ELSE 0 END
                 + CASE WHEN s23 > 0
                        THEN CAST(d23 * d23 AS DOUBLE) / s23 ELSE 0 END,
                 4) > {_CHI2_3_95} AS asymmetric_mobility
    FROM st
    """,
    tags=("analytics", "stats"),
)
def customers_bowker_symmetry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bowker's (1948) test of symmetry on the spend-tercile
    transition matrix (the exact customers_stuart_maxwell frame:
    1998-01-01 half boundary, balanced tercile cut 1 + 3(r−1)÷n on
    stratified block-ranked ranks): χ² = Σ_{{i<j}} (nᵢⱼ−nⱼᵢ)²/(nᵢⱼ+nⱼᵢ)
    with k(k−1)/2 = 3 df — the k-category generalization of McNemar
    asking whether up-mobility mirrors down-mobility CELL BY CELL
    (Stuart-Maxwell only compares marginals; symmetry is the
    stronger hypothesis, and rejecting it while S-M holds means
    off-diagonal churn is directionally structured). Empty
    off-diagonal pairs contribute 0 by the pinned CASE convention on
    both sides; every count is exact integer and the verdict reads
    the ROUNDED χ² against the shared χ²₃ literal.

    Scale shape: the stuart_maxwell plan — keyed spend reduce,
    stratified block-ranked ranks, 9-cell transition reduce, 1-row
    pivot and closed-form scalars."""
    o = tbl(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    both = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 2)
        .select("o_custkey")
    )
    joined = spend.join(both, "o_custkey")
    ranked = api.exact_stratified_rank(
        joined, "half", "cents", ["cents", "o_custkey"], "r"
    )
    cnt = ranked.groupBy("half").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ter = ranked.join(F.broadcast(cnt), "half").select(
        "o_custkey",
        "half",
        (1 + F.expr("(3 * (r - 1)) div n")).alias("q"),
    )
    t1 = ter.filter(F.col("half") == 1).select(
        "o_custkey", F.col("q").alias("q1")
    )
    t2 = ter.filter(F.col("half") == 2).select(
        "o_custkey", F.col("q").alias("q2")
    )
    trans = (
        t1.join(t2, "o_custkey")
        .groupBy("q1", "q2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    piv = trans.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("q1") == i) & (F.col("q2") == j), F.col("c")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n{i}{j}")
            for i in range(1, 4)
            for j in range(1, 4)
            if i != j
        ],
        F.sum("c").cast("long").alias("nn"),
    )
    st = piv.select(
        "nn",
        (F.col("n12") + F.col("n21")).alias("s12"),
        (F.col("n13") + F.col("n31")).alias("s13"),
        (F.col("n23") + F.col("n32")).alias("s23"),
        (F.col("n12") - F.col("n21")).alias("d12"),
        (F.col("n13") - F.col("n31")).alias("d13"),
        (F.col("n23") - F.col("n32")).alias("d23"),
    )

    def term(d, s):
        return F.when(
            F.col(s) > 0,
            (F.col(d) * F.col(d)).cast("double") / F.col(s),
        ).otherwise(F.lit(0.0))

    chi2 = F.round(
        term("d12", "s12") + term("d13", "s13") + term("d23", "s23"), 4
    )
    return st.select(
        F.col("nn").alias("n_customers"),
        (F.col("s12") + F.col("s13") + F.col("s23")).alias("n_movers"),
        chi2.alias("chi2_stat"),
        (chi2 > float(_CHI2_3_95)).alias("asymmetric_mobility"),
    )


@register(
    "ts_hoeffding_d",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                   AS errs
        FROM events GROUP BY 1
    ),
    rk AS (
        SELECT dn,
               row_number() OVER (ORDER BY cents, dn) AS r,
               row_number() OVER (ORDER BY errs, dn) AS s
        FROM daily
    ),
    ci AS (
        SELECT a.dn, a.r, a.s,
               CAST(coalesce(sum(CASE WHEN b.r < a.r AND b.s < a.s
                                      THEN 1 END), 0) AS BIGINT) AS c
        FROM rk a LEFT JOIN rk b ON b.dn <> a.dn
        GROUP BY 1, 2, 3
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c * (c - 1)) AS HUGEINT) AS d1,
               CAST(sum(CAST((r - 1) * (r - 2) AS HUGEINT)
                        * (s - 1) * (s - 2)) AS HUGEINT) AS d2,
               CAST(sum(CAST((r - 2) * (s - 2) AS HUGEINT) * c)
                    AS HUGEINT) AS d3
        FROM ci
    )
    SELECT n AS n_days,
           round(30.0 * (CAST((n - 2) AS DOUBLE) * (n - 3) * d1
                         + CAST(d2 AS DOUBLE)
                         - 2 * (n - 2) * CAST(d3 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)
                    * (n - 3) * (n - 4)), 6) AS hoeffding_d,
           round(30.0 * (CAST((n - 2) AS DOUBLE) * (n - 3) * d1
                         + CAST(d2 AS DOUBLE)
                         - 2 * (n - 2) * CAST(d3 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)
                    * (n - 3) * (n - 4)), 6) > 0 AS positive_dependence
    FROM s
    """,
    tags=("timeseries", "stats"),
)
def ts_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D (1948) between daily total revenue and daily
    error count: the rank statistic consistent against ALL forms of
    dependence — a U-shaped or checkerboard relation that leaves
    Spearman/Kendall (ts_cross_correlation's monotone family) at
    zero still moves D. With the day axis made tie-free by the
    engine's pinned (value, dn) total-order device, ranks Rᵢ, Sᵢ and
    bivariate dominance counts cᵢ = #{j: Rⱼ<Rᵢ ∧ Sⱼ<Sᵢ} give
    D = 30·((n−2)(n−3)·ΣD₁ + ΣD₂ − 2(n−2)·ΣD₃) / n⁽⁵⁾ with
    D₁ = c(c−1), D₂ = (R−1)(R−2)(S−1)(S−2), D₃ = (R−2)(S−2)c —
    every term an exact integer (HUGEINT/decimal38: D₂ ≤ n⁴ per row,
    Σ ≤ n⁵ ≤ 10¹⁷ even at the full ~2.4k-day calendar), so D is one
    division of bit-identical quantities; D ∈ [−0.5, 1] and the flag
    reads the ROUNDED sign (no significance table is computed —
    stated, not implied). The dominance counts come from a TRUE
    pairwise join of the calendar-bounded daily series (the
    ts_rqa_recurrence envelope).

    Scale shape: one daily reduce; two block-ranked scans; one
    bounded day-pair join + keyed count; one 1-row reduce."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("cents"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    r1 = api.exact_global_rank(daily, "cents", "dn", "r")
    rk = api.exact_global_rank(r1, "errs", "dn", "s").select("dn", "r", "s")
    a = rk.select(
        F.col("dn").alias("i"), F.col("r").alias("ra"), F.col("s").alias("sa")
    )
    b = rk.select(
        F.col("dn").alias("j"), F.col("r").alias("rb"), F.col("s").alias("sb")
    )
    ci = (
        a.join(b, F.col("j") != F.col("i"), "left")
        .groupBy("i", "ra", "sa")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("rb") < F.col("ra"))
                        & (F.col("sb") < F.col("sa")),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("c")
        )
    )
    rr = F.col("ra").cast("decimal(38,0)")
    ss = F.col("sa")
    s = ci.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("decimal(38,0)").alias("d1"),
        F.sum((rr - 1) * (F.col("ra") - 2) * (ss - 1) * (ss - 2)).alias("d2"),
        F.sum((rr - 2) * (ss - 2) * F.col("c")).alias("d3"),
    )
    n = F.col("n")
    d = (
        30.0
        * (
            (n - 2).cast("double") * (n - 3) * F.col("d1")
            + F.col("d2").cast("double")
            - 2 * (n - 2) * F.col("d3").cast("double")
        )
        / (n.cast("double") * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    return s.select(
        n.alias("n_days"),
        F.round(d, 6).alias("hoeffding_d"),
        (F.round(d, 6) > 0).alias("positive_dependence"),
    )
