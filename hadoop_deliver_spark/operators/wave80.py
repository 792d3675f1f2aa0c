"""§2 extensions, eightieth wave — forecast-comparison and EDF
two-sample classics.

- ts_diebold_mariano: the Diebold-Mariano test (1995) — is the naive
  random-walk forecast of daily revenue significantly worse than the
  trailing-week mean? THE standard "which forecaster wins" test,
  the inferential companion of ts_theil_u2's descriptive ratio.
- agg_cvm_2sample: the two-sample Cramér-von Mises criterion in
  Anderson's (1962) rank computing form — the UNWEIGHTED integral
  EDF distance, completing the distribution-comparison ladder with
  agg_ks_2sample (sup-norm), agg_ad_2sample (tail-weighted) and
  agg_bws_test (variance-weighted, rank form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# shared literals: χ²₁(0.95) = 1.959964², and the asymptotic 5% point
# of the limiting ω² distribution of the (two-sample) Cramér-von
# Mises criterion, 0.461, cleared to 2766 = 6·461 in the verdict
_CHI2_1_95 = "3.841459"


@register(
    "ts_diebold_mariano",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT day, y,
               lag(y, 1) OVER (ORDER BY day) AS y1,
               CAST(sum(y) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                   AS w,
               row_number() OVER (ORDER BY day) AS t
        FROM daily
    ),
    dd AS (
        SELECT CAST(49 * (CAST(y - y1 AS HUGEINT) * (y - y1))
                    - CAST(7 * y - w AS HUGEINT) * (7 * y - w)
               AS HUGEINT) AS d49
        FROM lagged WHERE t >= 8
    ),
    qd AS (
        SELECT CAST(power(10, GREATEST(0,
                   length(CAST(max(abs(d49)) AS VARCHAR)) - 12))
               AS HUGEINT) AS qd
        FROM dd
    ),
    qz AS (
        SELECT CASE WHEN d49 < 0 THEN -(abs(d49) // qd)
                    ELSE abs(d49) // qd END AS q
        FROM dd, qd
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS d,
               CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq
        FROM qz
    )
    SELECT m AS n_days,
           round(CAST(d AS DOUBLE)
                 * sqrt(m / (m * CAST(qq AS DOUBLE)
                             - CAST(d AS DOUBLE) * CAST(d AS DOUBLE))),
                 4) AS dm_stat,
           d > 0 AS naive_worse,
           m * CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
               > {_CHI2_1_95} * (m * CAST(qq AS DOUBLE)
                                 - CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
               AS significant
    FROM m
    """,
    tags=("timeseries", "stats"),
)
def ts_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano forecast-accuracy comparison (1995) on daily
    revenue: forecast A is the naive random walk f₁ₜ = y₍ₜ₋₁₎,
    forecast B the trailing-week mean f₂ₜ = (Σ_{{s=t−7..t−1}} y_s)/7;
    the loss differential dₜ = e₁ₜ² − e₂ₜ² is tested for zero mean —
    DM = d̄/√(V̂ar(d̄)/1) ~ N(0,1). One-step squared-error
    differentials use the lag-0 variance only (DM's own h−1
    truncation rule at horizon h = 1 — the stated knob; no HAC
    terms). Exactness: clearing the /7 forecast mean, 49·dₜ =
    49·(y−y₁)² − (7y−W)² is an EXACT integer per day — and the 49
    CANCELS COMPLETELY in the statistic (z² = m·D²/(m·Q−D²) is
    scale-invariant in d), as does the quantizer below. Because
    Q = Σ(49dₜ)² would burst DECIMAL(38) around sf10 (each term is a
    4th power of daily revenue), 49·dₜ is first quantized by the
    DATA-ADAPTIVE exact divisor qd = 10^max(0, digits(max|49d|)−12)
    (the ts_breusch_pagan digit-count device), keeping q ≤ 10¹² and
    Σq² DECIMAL(38)-safe at ANY corpus scale. dₜ is SIGNED, and
    integer division of negatives DIVERGES between the engines
    (Spark's div truncates toward zero, DuckDB's // floors), so both
    engines quantize |49d| and reapply the sign — truncation-
    toward-zero by explicit shared construction, never an implicit
    engine rule. The two-sided 5%
    verdict m·D² > χ²₁(0.95)·(m·Q − D²) takes one double cast per
    factor in fixed textual order (D² alone can reach 10³⁸); d > 0
    — the FULLY exact integer sign — reports which forecaster wins
    (positive means the naive walk loses).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, bounded-axis lag/rolling-sum windows, a 1-row scalar
    quantizer probe, a 1-row moment reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_ord = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.lag("y", 1).over(w_ord).alias("y1"),
        F.sum("y").over(w_ord.rowsBetween(-7, -1)).cast("long").alias("w"),
        F.row_number().over(w_ord).alias("t"),
    )
    e1 = (F.col("y") - F.col("y1")).cast("decimal(38,0)")
    e7 = (7 * F.col("y") - F.col("w")).cast("decimal(38,0)")
    dd = lagged.filter(F.col("t") >= 8).select(
        (
            49 * (e1 * (F.col("y") - F.col("y1")))
            - e7 * (7 * F.col("y") - F.col("w"))
        ).alias("d49")
    )
    qd = dd.agg(
        F.pow(
            F.lit(10.0),
            F.greatest(
                F.lit(0),
                F.length(F.max(F.abs(F.col("d49"))).cast("string"))
                - F.lit(12),
            ),
        )
        .cast("decimal(38,0)")
        .alias("qd"),
    )
    qz = dd.crossJoin(F.broadcast(qd)).select(
        F.when(
            F.col("d49") < 0, -F.expr("abs(d49) div qd")
        )
        .otherwise(F.expr("abs(d49) div qd"))
        .alias("q")
    )
    m = qz.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("d"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("qq"),
    )
    mm = F.col("m")
    zd, zq = F.col("d").cast("double"), F.col("qq").cast("double")
    return m.select(
        mm.alias("n_days"),
        F.round(
            zd * F.sqrt(mm / (mm * zq - zd * zd)), 4
        ).alias("dm_stat"),
        (F.col("d") > 0).alias("naive_worse"),
        (mm * zd * zd > float(_CHI2_1_95) * (mm * zq - zd * zd)).alias(
            "significant"
        ),
    )


@register(
    "agg_cvm_2sample",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderpriority = '1-URGENT' AS urg,
               o_orderkey
        FROM orders
    ),
    rk AS (
        SELECT urg,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS r,
               CAST(row_number() OVER (PARTITION BY urg
                                       ORDER BY cents, o_orderkey)
                    AS BIGINT) AS i
        FROM o
    ),
    s AS (
        SELECT CAST(count(*) FILTER (urg) AS BIGINT) AS n,
               CAST(count(*) FILTER (NOT urg) AS BIGINT) AS m,
               CAST(sum(CASE WHEN urg THEN
                   CAST(r - i AS HUGEINT) * (r - i) ELSE 0 END)
                   AS HUGEINT) AS su,
               CAST(sum(CASE WHEN NOT urg THEN
                   CAST(r - i AS HUGEINT) * (r - i) ELSE 0 END)
                   AS HUGEINT) AS sv
        FROM rk
    ),
    u AS (
        SELECT n, m, n + m AS nn,
               CAST(n AS HUGEINT) * su + CAST(m AS HUGEINT) * sv AS uu
        FROM s
    )
    SELECT n AS n_urgent, m AS n_rest,
           round((6 * CAST(uu AS DOUBLE)
                  - CAST(CAST(n AS HUGEINT) * m
                         * (4 * CAST(n AS HUGEINT) * m - 1) AS DOUBLE))
                 / (6 * CAST(n AS DOUBLE) * m * nn), 6) AS cvm_t,
           1000 * (6 * uu - CAST(n AS HUGEINT) * m
                            * (4 * CAST(n AS HUGEINT) * m - 1))
               > 2766 * CAST(n AS HUGEINT) * m * nn
               AS distributions_differ
    FROM u
    """,
    tags=("aggregate", "stats"),
)
def agg_cvm_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises criterion in Anderson's (1962)
    rank computing form: with the combined strict ranks r of the
    URGENT sample (sizes n, m, N = n+m) and within-sample indices i,
    T = U/(nmN) − (4mn−1)/(6N), U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)² — the
    UNWEIGHTED integral of the squared EDF gap, completing the
    two-sample distance ladder: agg_ks_2sample takes the sup, T
    integrates uniformly, agg_ad_2sample weights the tails,
    agg_bws_test weights by the null variance. Strict ranks use the
    (cents, o_orderkey) tiebreak — the BWS no-ties adaptation,
    identical on both engines — and on the Spark side BOTH rank
    columns are block-ranked (api.exact_global_rank: the combined
    rank over all orders, then one pass per sample for the
    within-sample index; three block-ranked passes, NO
    single-partition window ever touches the fact table — the
    oracle's plain row_number windows are the single-node twin).
    EVERYTHING is exact integer until the
    final division: U, nm(4mn−1), 6nmN in DECIMAL(38)/HUGEINT
    (U ≤ N⁴ stays inside DECIMAL(38) to ~sf200 / N ≈ 3·10⁸ orders —
    the agg_wilcoxon_signedrank-style stated envelope), and the 5%
    verdict clears T > 0.461 (the asymptotic point of the limiting
    ω² law, shared literal as the exact rational 461/1000) to the
    PURE-INTEGER comparison 1000·(6U − nm(4mn−1)) > 2766·nmN — no
    double anywhere in the decision. cvm_t displays as one division
    of exact integers.

    Scale shape: one block-rankable pass over orders (global +
    per-sample rank windows on the same key order), one 1-row
    moment reduce."""
    from hadoop_deliver_spark import api

    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "r")
    rk = (
        api.exact_global_rank(
            ranked.filter(F.col("urg")), "cents", "o_orderkey", "i"
        )
        .unionAll(
            api.exact_global_rank(
                ranked.filter(~F.col("urg")), "cents", "o_orderkey", "i"
            )
        )
        .select(
            "urg",
            F.col("r").cast("long").alias("r"),
            F.col("i").cast("long").alias("i"),
        )
    )
    gap = (F.col("r") - F.col("i")).cast("decimal(38,0)") * (
        F.col("r") - F.col("i")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    s = rk.agg(
        F.count_if(F.col("urg")).cast("long").alias("n"),
        F.count_if(~F.col("urg")).cast("long").alias("m"),
        F.sum(F.when(F.col("urg"), gap).otherwise(zero)).alias("su"),
        F.sum(F.when(~F.col("urg"), gap).otherwise(zero)).alias("sv"),
    )
    n, m = F.col("n"), F.col("m")
    u = s.select(
        "n",
        "m",
        (n + m).alias("nn"),
        (
            n.cast("decimal(38,0)") * F.col("su")
            + m.cast("decimal(38,0)") * F.col("sv")
        ).alias("uu"),
    )
    nn, uu = F.col("nn"), F.col("uu")
    n38 = n.cast("decimal(38,0)")
    corr = n38 * m * (4 * n38 * m - 1)
    return u.select(
        n.alias("n_urgent"),
        m.alias("n_rest"),
        F.round(
            (6 * uu.cast("double") - corr.cast("double"))
            / (6 * n.cast("double") * m * nn),
            6,
        ).alias("cvm_t"),
        (1000 * (6 * uu - corr) > 2766 * n38 * m * nn).alias(
            "distributions_differ"
        ),
    )
