"""§2 extensions, seventy-first wave — top-k list comparison and the
post-hoc completion of the rank-ANOVA family (round-7 verdict cadence
list, items 5-6 of 6).

- llm_rank_rbo: rank-biased overlap (Webber, Moffat & Zobel 2010)
  between the length-ranked and vocabulary-ranked top-20 document
  lists — the indefinite-list similarity measure built for comparing
  ranked retrieval outputs.
- agg_dunn_posthoc: Dunn's (1964) pairwise post-hoc z tests on the
  agg_kruskal_wallis setup with Holm step-down control — WHICH
  priority classes differ, after KW says that some do.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# RBO weights at p = 0.9, k = 20: a doc first covered by BOTH prefixes
# at depth m contributes S(m) = Σ_{d=m..k} (1−p)·p^(d−1)/d, so the
# whole truncated RBO is one SUM over the joined lists — the suffix
# sums ship as literals shared verbatim between the Spark plan and the
# oracle SQL (the transcendental-parity convention).
_RBO_P = 0.9
_RBO_K = 20
_RBO_COEF = [
    (1.0 - _RBO_P) * _RBO_P ** (d - 1) / d for d in range(1, _RBO_K + 1)
]
_RBO_SUFFIX = [
    sum(_RBO_COEF[m - 1 :]) for m in range(1, _RBO_K + 1)
]
_RBO_SUFFIX_SQL = "[" + ", ".join(repr(s) for s in _RBO_SUFFIX) + "]"

# Holm step-down two-sided z thresholds for m = 10 pairwise
# comparisons at family α = 0.05: position r (|z|-descending) tests at
# α/(m−r+1), i.e. Φ⁻¹(1 − 0.05/(2·(10−r+1))). Stdlib inverse normal,
# shipped as shared literals (engine and oracle read the SAME doubles).
_DUNN_M = 10
_DUNN_THR = [
    NormalDist().inv_cdf(1.0 - 0.05 / (2.0 * (_DUNN_M - r + 1)))
    for r in range(1, _DUNN_M + 1)
]
_DUNN_THR_SQL = "[" + ", ".join(repr(t) for t in _DUNN_THR) + "]"

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@register(
    "llm_rank_rbo",
    f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               CAST(len(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS n_vocab
        FROM documents
    ),
    la AS (
        SELECT doc_id, row_number() OVER (
                   ORDER BY n_chars DESC, doc_id) AS pa
        FROM scored QUALIFY pa <= {_RBO_K}
    ),
    lb AS (
        SELECT doc_id, row_number() OVER (
                   ORDER BY n_vocab DESC, doc_id) AS pb
        FROM scored QUALIFY pb <= {_RBO_K}
    ),
    joined AS (
        SELECT greatest(la.pa, lb.pb) AS dmin
        FROM la JOIN lb USING (doc_id)
    )
    SELECT CAST({_RBO_K} AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_both,
           round(coalesce(sum(({_RBO_SUFFIX_SQL}::DOUBLE[])[dmin]), 0.0),
                 6) AS rbo
    FROM joined
    """,
    tags=("llm", "ranking"),
)
def llm_rank_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two top-20 document rankings — by raw length (n_chars) and by
    vocabulary size (distinct whitespace tokens): RBO@k =
    Σ_{{d≤k}} (1−p)p^{{d−1}}·|A_d ∩ B_d|/d with p = 0.9, the standard
    measure for comparing ranked lists that agree more at the top.
    Rearranged doc-wise: a doc entering both prefixes at depth
    m = max(pos_A, pos_B) contributes the suffix weight
    S(m) = Σ_{{d≥m}} (1−p)p^{{d−1}}/d — so the statistic is ONE sum
    over the list join, no depth grid, with the 20 suffix weights
    shipped as literals shared between engine and oracle (identical
    doubles by construction; ≤ 20 summands, round-6).

    Scale shape: two global top-20 selections (TakeOrdered — no
    window over the corpus), one 20×20 equi-join, one scalar
    aggregate. The position row_numbers run over the 20-row truncated
    lists only (the allowlisted bounded-window shape)."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_vocab"),
    )
    la = (
        d.orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(_RBO_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
            .alias("pa"),
        )
    )
    lb = (
        d.orderBy(F.col("n_vocab").desc(), "doc_id")
        .limit(_RBO_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("n_vocab").desc(), "doc_id"))
            .alias("pb"),
        )
    )
    suffix = F.array(*[F.lit(s) for s in _RBO_SUFFIX])
    return (
        la.join(lb, "doc_id")
        .select(F.greatest("pa", "pb").alias("dmin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.round(
                F.coalesce(
                    F.sum(F.element_at(suffix, F.col("dmin"))), F.lit(0.0)
                ),
                6,
            ).alias("rbo"),
        )
        .select(F.lit(_RBO_K).cast("int").alias("k"), "n_both", "rbo")
    )


def _dunn_pair_sql() -> str:
    rows = ",\n            ".join(
        f"({i}, {j})"
        for i in range(1, 6)
        for j in range(i + 1, 6)
    )
    return rows


@register(
    "agg_dunn_posthoc",
    f"""
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               row_number() OVER (
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT), o_orderkey) AS rk
        FROM orders
    ),
    byval AS (
        SELECT cents, CAST(min(rk) AS BIGINT) AS mn,
               CAST(max(rk) AS BIGINT) AS mx, count(*) AS c
        FROM o GROUP BY cents
    ),
    perg AS (
        SELECT pg.g, CAST(sum(pg.cnt) AS BIGINT) AS ni,
               CAST(sum(pg.cnt * (v.mn + v.mx)) AS BIGINT) AS r2
        FROM (SELECT cents, g, count(*) AS cnt FROM o GROUP BY cents, g) pg
        JOIN byval v USING (cents)
        GROUP BY pg.g
    ),
    m AS (
        SELECT CAST(sum(ni) AS BIGINT) AS n,
               (SELECT CAST(sum(c * c * c - c) AS BIGINT) FROM byval) AS t3
        FROM perg
    ),
    pairs AS (
        SELECT a.g AS gi, b.g AS gj, a.ni, b.ni AS nj,
               (CAST(a.r2 AS DOUBLE) / (2 * a.ni)
                - CAST(b.r2 AS DOUBLE) / (2 * b.ni))
               / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12
                       - CAST(t3 AS DOUBLE) / (12.0 * (n - 1)))
                      * (1.0 / a.ni + 1.0 / b.ni)) AS z
        FROM (VALUES
            {_dunn_pair_sql()}) p(i, j)
        JOIN perg a ON a.g = p.i
        JOIN perg b ON b.g = p.j
        CROSS JOIN m
    ),
    ranked AS (
        SELECT gi, gj, ni, nj, z,
               row_number() OVER (ORDER BY abs(z) DESC, gi, gj) AS r
        FROM pairs
    )
    SELECT gi, gj, ni, nj, round(z, 4) AS z,
           CAST(min(CASE WHEN abs(z) >= ({_DUNN_THR_SQL}::DOUBLE[])[r]
                         THEN 1 ELSE 0 END)
                OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS BOOLEAN)
               AS reject
    FROM ranked ORDER BY gi, gj
    """,
    tags=("agg", "stats"),
)
def agg_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise test (Dunn 1964) with Holm (1979)
    step-down control on the agg_kruskal_wallis setup: after KW says
    the five priority classes differ in order value, WHICH pairs
    differ? z_ij = (R̄_i − R̄_j)/σ_ij on the tie-corrected null
    σ²_ij = (N(N+1)/12 − T/(12(N−1)))·(1/n_i + 1/n_j), T = Σ(t³−t).
    Mean ranks come from the same doubled-midrank device as KW
    (R̄ = r2/(2n) with r2 = Σ cnt·(minrank+maxrank) an exact int64
    from the block-ranked api.exact_global_rank core). Holm's
    step-down runs on the 10-row pair table: pairs ordered by |z|
    descending test against Φ⁻¹(1 − α/(2(m−r+1))) thresholds shipped
    as shared literals (stdlib inverse normal at module load — the
    engine and the oracle read the SAME doubles), and a prefix-min
    window enforces the all-previous-rejected chain. The decision
    compares |z| to a literal; z itself is a fixed textual formula of
    exact ints, round-4 display.

    Scale shape: one block-ranked pass over orders (windows partition
    by block), one ≤ (price-grid) aggregate, a 5-row per-group
    reduce; everything pairwise lives on the 10-row literal pair
    grid. SinglePartition covers the 1-row N/T reduce and the 10-row
    Holm windows (domain-bounded — the events_holm_correction
    argument)."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        "o_orderkey",
    )
    ranked = api.exact_global_rank(base, "cents", "o_orderkey", "rk")
    byval = ranked.groupBy("cents").agg(
        F.min("rk").cast("long").alias("mn"),
        F.max("rk").cast("long").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    perg = (
        ranked.groupBy("cents", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(byval), "cents")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("ni"),
            F.sum(F.col("cnt") * (F.col("mn") + F.col("mx")))
            .cast("long")
            .alias("r2"),
        )
    )
    m = perg.agg(F.sum("ni").cast("long").alias("n")).crossJoin(
        byval.agg(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
            .cast("long")
            .alias("t3")
        )
    )
    # NOTE: sequence(a, b) DESCENDS when a > b (it is not empty), so
    # the upper-triangle grid filters an explicit 1..5 explode instead
    grid = (
        spark.range(1, 6)
        .select(
            F.col("id").cast("int").alias("i"),
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("j"),
        )
        .filter(F.col("j") > F.col("i"))
    )
    a = perg.select(
        F.col("g").alias("i"), F.col("ni").alias("ni_a"),
        F.col("r2").alias("r2_a"),
    )
    b = perg.select(
        F.col("g").alias("j"), F.col("ni").alias("ni_b"),
        F.col("r2").alias("r2_b"),
    )
    mean_diff = F.col("r2_a").cast("double") / (2 * F.col("ni_a")) - F.col(
        "r2_b"
    ).cast("double") / (2 * F.col("ni_b"))
    sigma = F.sqrt(
        (
            F.col("n").cast("double") * (F.col("n") + 1) / 12
            - F.col("t3").cast("double") / (12.0 * (F.col("n") - 1))
        )
        * (1.0 / F.col("ni_a") + 1.0 / F.col("ni_b"))
    )
    pairs = (
        grid.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("i").alias("gi"),
            F.col("j").alias("gj"),
            F.col("ni_a").alias("ni"),
            F.col("ni_b").alias("nj"),
            (mean_diff / sigma).alias("z"),
        )
    )
    w_rank = Window.orderBy(F.abs("z").desc(), "gi", "gj")
    w_chain = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    thr = F.array(*[F.lit(t) for t in _DUNN_THR])
    return (
        pairs.withColumn("r", F.row_number().over(w_rank))
        .withColumn(
            "hit",
            F.when(
                F.abs("z") >= F.element_at(thr, F.col("r")), 1
            ).otherwise(0),
        )
        .select(
            "gi",
            "gj",
            "ni",
            "nj",
            F.round("z", 4).alias("z"),
            (F.min("hit").over(w_chain) == 1).alias("reject"),
        )
        .orderBy("gi", "gj")
    )
