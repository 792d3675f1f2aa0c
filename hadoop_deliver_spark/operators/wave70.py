"""§2 extensions, ninety-fourth wave — population estimation,
proportion intervals, and iterative outlier screening classics
(published-method cadence).

- customers_capture_recapture: the Lincoln-Petersen / Chapman
  two-sample capture-recapture population estimate (1930/1951) on
  year-over-year customer activity.
- agg_wilson_interval: Wilson's score interval (1927) for the
  URGENT-order share — the interval that behaves at the boundary
  where Wald fails.
- ts_generalized_esd: Rosner's generalized extreme studentized
  deviate (1983) — the ITERATIVE Grubbs: three unrolled
  remove-the-extreme rounds, entirely on scalar moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# z 2.5% two-sided (Wilson), shared textually
_Z975 = "1.959964"
_ESD_ROUNDS = 3


@register(
    "customers_capture_recapture",
    """
    WITH y1 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    ),
    y2 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    ),
    tot AS (
        SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS t
        FROM orders
    ),
    m AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM y1) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM y2) AS n2,
               (SELECT CAST(count(*) AS BIGINT)
                FROM y1 JOIN y2 USING (o_custkey)) AS mm,
               (SELECT t FROM tot) AS t
    )
    SELECT n1 AS n_1996, n2 AS n_1997, mm AS n_both,
           t AS n_observed_total,
           round(CAST(n1 AS DOUBLE) * n2 / mm, 2) AS lincoln_petersen,
           round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (mm + 1) - 1, 2)
               AS chapman,
           abs(5 * ((n1 + 1) * (n2 + 1) - (mm + 1))
               - 5 * t * (mm + 1)) <= t * (mm + 1)
               AS chapman_within_20pct
    FROM m
    """,
    tags=("analytics", "stats"),
)
def customers_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lincoln-Petersen capture-recapture (Lincoln 1930) with
    Chapman's bias correction (1951): treat 1996-active and
    1997-active customers as two independent "captures" and
    estimate the total active population N̂ = n1·n2/m from the
    overlap m — the mark-recapture identity that underlies
    everything from wildlife censuses to dedup-coverage and
    census-undercount estimation (llm_chao1_richness is its
    abundance-based sibling for species counts). Chapman:
    N̂_C = (n1+1)(n2+1)/(m+1) − 1, unbiased when n1+n2 ≥ N. All
    counts are exact distinct-key aggregates; each estimate is ONE
    double division of exact integers, and the headline check —
    does Chapman land within ±20% of the OBSERVED all-time distinct
    customer count (the fixture's ground truth) — is the FULLY
    exact integer predicate |5((n1+1)(n2+1) − (m+1)) − 5T(m+1)| ≤
    T(m+1). TPC-H customers order steadily, so the two captures
    are near-independent draws and Chapman recovers T closely —
    the op certifies the estimator, the fixture provides the truth.

    Scale shape: two filtered distinct reduces, one co-partitioned
    key join, a 1-row assembly — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    y1 = (
        o.filter(
            (d >= F.lit("1996-01-01").cast("date"))
            & (d < F.lit("1997-01-01").cast("date"))
        )
        .select("o_custkey")
        .distinct()
    )
    y2 = (
        o.filter(
            (d >= F.lit("1997-01-01").cast("date"))
            & (d < F.lit("1998-01-01").cast("date"))
        )
        .select("o_custkey")
        .distinct()
    )
    n1df = y1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2df = y2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    mmdf = y1.join(y2, "o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("mm")
    )
    tdf = o.agg(
        F.count_distinct(F.col("o_custkey")).cast("long").alias("t")
    )
    m = (
        n1df.crossJoin(F.broadcast(n2df))
        .crossJoin(F.broadcast(mmdf))
        .crossJoin(F.broadcast(tdf))
    )
    n1, n2, mm, t = F.col("n1"), F.col("n2"), F.col("mm"), F.col("t")
    return m.select(
        n1.alias("n_1996"),
        n2.alias("n_1997"),
        mm.alias("n_both"),
        t.alias("n_observed_total"),
        F.round(n1.cast("double") * n2 / mm, 2).alias(
            "lincoln_petersen"
        ),
        F.round(
            (n1 + 1).cast("double") * (n2 + 1) / (mm + 1) - 1, 2
        ).alias("chapman"),
        (
            F.abs(
                5 * ((n1 + 1) * (n2 + 1) - (mm + 1)) - 5 * t * (mm + 1)
            )
            <= t * (mm + 1)
        ).alias("chapman_within_20pct"),
    )


@register(
    "agg_wilson_interval",
    f"""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 END) AS BIGINT) AS k
        FROM orders
    ),
    w AS (
        SELECT n, k,
               CAST(k AS DOUBLE) / n AS p,
               {_Z975} * {_Z975} AS z2
        FROM m
    ),
    iv AS (
        SELECT n, k, p,
               (p + z2 / (2 * n)
                - {_Z975} * sqrt(p * (1 - p) / n
                                 + z2 / (4.0 * n * n)))
                   / (1 + z2 / n) AS lo,
               (p + z2 / (2 * n)
                + {_Z975} * sqrt(p * (1 - p) / n
                                 + z2 / (4.0 * n * n)))
                   / (1 + z2 / n) AS hi
        FROM w
    )
    SELECT n AS n_orders, k AS n_urgent,
           round(p, 6) AS p_hat,
           round(lo, 6) AS wilson_lo,
           round(hi, 6) AS wilson_hi,
           lo > 0.2 OR hi < 0.2 AS excludes_one_fifth
    FROM iv
    """,
    tags=("agg", "stats"),
)
def agg_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson's score interval (1927) for the URGENT share of
    orders: invert the score test instead of Wald's — (p̂ + z²/2n ±
    z·√(p̂(1−p̂)/n + z²/4n²))/(1 + z²/n) — the interval with honest
    coverage near 0/1 and small n, the recommended default
    (Brown-Cai-DasGupta 2001) over the ±z√(p̂q̂/n) everyone writes
    first. (k, n) are exact integer counts; the interval assembles
    in ONE fixed textual order of doubles with the shared literal
    z = 1.959964, so both bounds are bit-identical across engines
    and the verdict — does the interval exclude the nominal 1/5
    priority share? — compares the same doubles. TPC-H draws
    priorities uniformly, so the interval straddles 0.2 and the
    verdict documents THAT, at ~n⁻½ width.

    Scale shape: ONE map-side-combinable 2-counter reduce over the
    fact table; all else is a 1-row assembly."""
    o = tbl(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1)))
        .cast("long")
        .alias("k"),
    )
    z = float(_Z975)
    n, k = F.col("n"), F.col("k")
    w = m.select(
        "n", "k", (k.cast("double") / n).alias("p"), F.lit(z * z).alias("z2")
    )
    p, z2 = F.col("p"), F.col("z2")
    half = z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    center = p + z2 / (2 * n)
    denom = 1 + z2 / n
    iv = w.select(
        "n",
        "k",
        "p",
        ((center - half) / denom).alias("lo"),
        ((center + half) / denom).alias("hi"),
    )
    return iv.select(
        n.alias("n_orders"),
        k.alias("n_urgent"),
        F.round(p, 6).alias("p_hat"),
        F.round(F.col("lo"), 6).alias("wilson_lo"),
        F.round(F.col("hi"), 6).alias("wilson_hi"),
        ((F.col("lo") > 0.2) | (F.col("hi") < 0.2)).alias(
            "excludes_one_fifth"
        ),
    )


def _esd_round_sql(r: int) -> str:
    """One unrolled ESD round as a chained CTE: flag from the round's
    moments, then update (n, s, ss) and the live extremes by removing
    one instance of the more-deviant side (ties → the TOP side,
    stated convention). mx/mn track multiplicity through the top-3 /
    bottom-3 value ladders."""
    return f""",
    r{r} AS (
        SELECT *,
               greatest(n{r} * mx{r} - s{r}, s{r} - n{r} * mn{r})
                   AS dev{r},
               (n{r} * mx{r} - s{r} >= s{r} - n{r} * mn{r}) AS top{r}
        FROM st{r}
    ),
    f{r} AS (
        SELECT *,
               dev{r} * dev{r} * (n{r} - 1)
                   > 16 * n{r} * (n{r} * ss{r} - s{r} * s{r})
                   AS flag{r},
               CASE WHEN top{r} THEN mx{r} ELSE mn{r} END AS rem{r}
        FROM r{r}
    ),
    st{r + 1} AS (
        SELECT *,
               n{r} - 1 AS n{r + 1},
               s{r} - rem{r} AS s{r + 1},
               ss{r} - rem{r} * rem{r} AS ss{r + 1},
               CASE WHEN top{r}
                    THEN (CASE WHEN ta{r} > 1 THEN mx{r} ELSE tb{r} END)
                    ELSE mx{r} END AS mx{r + 1},
               CASE WHEN top{r} THEN ta{r} - 1 ELSE ta{r} END
                   AS ta{r + 1},
               CASE WHEN top{r} AND ta{r} = 1 THEN tc{r} ELSE tb{r} END
                   AS tb{r + 1},
               CASE WHEN NOT top{r}
                    THEN (CASE WHEN ba{r} > 1 THEN mn{r} ELSE bb{r} END)
                    ELSE mn{r} END AS mn{r + 1},
               CASE WHEN NOT top{r} THEN ba{r} - 1 ELSE ba{r} END
                   AS ba{r + 1},
               CASE WHEN NOT top{r} AND ba{r} = 1 THEN bc{r} ELSE bb{r}
                   END AS bb{r + 1},
               tc{r} AS tc{r + 1},
               bc{r} AS bc{r + 1}
        FROM f{r}
    )"""


_ESD_PREFIX = """
    WITH base AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n0,
               CAST(sum(cents) AS HUGEINT) AS s0,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT)
                   AS ss0
        FROM base
    ),
    topv AS (
        SELECT cents, CAST(count(*) AS HUGEINT) AS c,
               row_number() OVER (ORDER BY cents DESC) AS rn
        FROM (SELECT cents FROM base)
        GROUP BY cents ORDER BY cents DESC LIMIT 3
    ),
    botv AS (
        SELECT cents, CAST(count(*) AS HUGEINT) AS c,
               row_number() OVER (ORDER BY cents ASC) AS rn
        FROM (SELECT cents FROM base)
        GROUP BY cents ORDER BY cents ASC LIMIT 3
    ),
    st0 AS (
        SELECT m.n0, m.s0, m.ss0,
               CAST((SELECT cents FROM topv WHERE rn = 1) AS HUGEINT)
                   AS mx0,
               (SELECT c FROM topv WHERE rn = 1) AS ta0,
               CAST((SELECT cents FROM topv WHERE rn = 2) AS HUGEINT)
                   AS tb0,
               CAST((SELECT cents FROM topv WHERE rn = 3) AS HUGEINT)
                   AS tc0,
               CAST((SELECT cents FROM botv WHERE rn = 1) AS HUGEINT)
                   AS mn0,
               (SELECT c FROM botv WHERE rn = 1) AS ba0,
               CAST((SELECT cents FROM botv WHERE rn = 2) AS HUGEINT)
                   AS bb0,
               CAST((SELECT cents FROM botv WHERE rn = 3) AS HUGEINT)
                   AS bc0
        FROM m
    )"""


@register(
    "ts_generalized_esd",
    _ESD_PREFIX
    + "".join(_esd_round_sql(r) for r in range(_ESD_ROUNDS))
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round,"
        f" CAST(n{r} AS BIGINT) AS n_remaining,"
        f" round(sqrt(CAST(dev{r} AS DOUBLE) * CAST(dev{r} AS DOUBLE)"
        f" * (CAST(n{r} AS DOUBLE) - 1)"
        f" / (CAST(n{r} AS DOUBLE)"
        f" * CAST(n{r} * ss{r} - s{r} * s{r} AS DOUBLE))), 4)"
        f" AS g_stat,"
        f" flag{r} AS flagged FROM st{_ESD_ROUNDS}"
        for r in range(_ESD_ROUNDS)
    )
    + "\n    ORDER BY round",
    tags=("timeseries", "stats"),
)
def ts_generalized_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rosner's generalized ESD (1983) on order values — the
    ITERATIVE agg_grubbs_extreme, which fixes Grubbs' masking
    problem (two outliers hide each other): three unrolled rounds,
    each computing the extreme studentized deviate on the CURRENT
    set and then deleting one instance of the more-deviant extreme
    (ties break to the TOP side, stated convention). The key
    distributed insight: the deleted point is always the min or the
    max, so NO per-round rescan is needed — ONE moment pass plus
    the top-3/bottom-3 value ladders (bounded TakeOrdered) drive
    all three rounds as pure scalar updates n→n−1, S→S−x*,
    SS→SS−x*², with multiplicity walked down the ladder. Every
    round's verdict is the EXACT DECIMAL(38)/HUGEINT Grubbs
    predicate dev²(n−1) > 16·n·(n·SS − S²) (the fixed 4σ screen
    literal, same knob as agg_grubbs_extreme; Rosner's
    t-quantile λ_r is N-dependent); g_stat displays in fixed-order
    doubles. Both engines unroll the SAME three rounds (the
    graph_kcore_peel bounded-unrolling device).

    Scale shape: one map-side-combinable moment reduce + two
    3-row TakeOrdered extremes over the fact table; the three
    rounds are 1-row scalar algebra — no second scan, no
    window over data."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (dec2("o_totalprice") * 100).cast("long").alias("cents")
    )
    d38 = "decimal(38,0)"
    m = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n0"),
        F.sum("cents").cast(d38).alias("s0"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("ss0"),
    )
    byval = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast(d38).alias("c")
    )
    topv = (
        byval.orderBy(F.desc("cents"))
        .limit(3)
        .select(
            "cents",
            "c",
            F.row_number()
            .over(Window.orderBy(F.desc("cents")))
            .alias("rn"),
        )
    )
    botv = (
        byval.orderBy(F.asc("cents"))
        .limit(3)
        .select(
            "cents",
            "c",
            F.row_number()
            .over(Window.orderBy(F.asc("cents")))
            .alias("rn"),
        )
    )

    def _ladder(df, vpfx, cname):
        return df.groupBy().agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents")))
            .cast(d38)
            .alias(f"{vpfx}1"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias(cname),
            F.max(F.when(F.col("rn") == 2, F.col("cents")))
            .cast(d38)
            .alias(f"{vpfx}2"),
            F.max(F.when(F.col("rn") == 3, F.col("cents")))
            .cast(d38)
            .alias(f"{vpfx}3"),
        )

    tl = _ladder(topv, "tv", "ta0").withColumnsRenamed(
        {"tv1": "mx0", "tv2": "tb0", "tv3": "tc0"}
    )
    bl = _ladder(botv, "bv", "ba0").withColumnsRenamed(
        {"bv1": "mn0", "bv2": "bb0", "bv3": "bc0"}
    )
    st = m.crossJoin(F.broadcast(tl)).crossJoin(F.broadcast(bl))
    for r in range(_ESD_ROUNDS):
        n_r, s_r, ss_r = (
            F.col(f"n{r}"),
            F.col(f"s{r}"),
            F.col(f"ss{r}"),
        )
        mx_r, mn_r = F.col(f"mx{r}"), F.col(f"mn{r}")
        ta_r, tb_r, tc_r = (
            F.col(f"ta{r}"),
            F.col(f"tb{r}"),
            F.col(f"tc{r}"),
        )
        ba_r, bb_r, bc_r = (
            F.col(f"ba{r}"),
            F.col(f"bb{r}"),
            F.col(f"bc{r}"),
        )
        st = st.select(
            "*",
            F.greatest(n_r * mx_r - s_r, s_r - n_r * mn_r).alias(
                f"dev{r}"
            ),
            (n_r * mx_r - s_r >= s_r - n_r * mn_r).alias(f"top{r}"),
        )
        dev_r, top_r = F.col(f"dev{r}"), F.col(f"top{r}")
        st = st.select(
            "*",
            (
                dev_r * dev_r * (n_r - 1)
                > 16 * n_r * (n_r * ss_r - s_r * s_r)
            ).alias(f"flag{r}"),
            F.when(top_r, mx_r).otherwise(mn_r).alias(f"rem{r}"),
        )
        rem_r = F.col(f"rem{r}")
        st = st.select(
            "*",
            (n_r - 1).alias(f"n{r + 1}"),
            (s_r - rem_r).alias(f"s{r + 1}"),
            (ss_r - rem_r * rem_r).alias(f"ss{r + 1}"),
            F.when(
                top_r,
                F.when(ta_r > 1, mx_r).otherwise(tb_r),
            )
            .otherwise(mx_r)
            .alias(f"mx{r + 1}"),
            F.when(top_r, ta_r - 1).otherwise(ta_r).alias(f"ta{r + 1}"),
            F.when(top_r & (ta_r == 1), tc_r)
            .otherwise(tb_r)
            .alias(f"tb{r + 1}"),
            F.when(
                ~top_r,
                F.when(ba_r > 1, mn_r).otherwise(bb_r),
            )
            .otherwise(mn_r)
            .alias(f"mn{r + 1}"),
            F.when(~top_r, ba_r - 1).otherwise(ba_r).alias(f"ba{r + 1}"),
            F.when(~top_r & (ba_r == 1), bc_r)
            .otherwise(bb_r)
            .alias(f"bb{r + 1}"),
            tc_r.alias(f"tc{r + 1}"),
            bc_r.alias(f"bc{r + 1}"),
        )
    out = None
    for r in range(_ESD_ROUNDS):
        n_r, s_r, ss_r = (
            F.col(f"n{r}"),
            F.col(f"s{r}"),
            F.col(f"ss{r}"),
        )
        dev_r = F.col(f"dev{r}")
        row = st.select(
            F.lit(r + 1).cast("long").alias("round"),
            n_r.cast("long").alias("n_remaining"),
            F.round(
                F.sqrt(
                    dev_r.cast("double")
                    * dev_r.cast("double")
                    * (n_r.cast("double") - 1)
                    / (
                        n_r.cast("double")
                        * (n_r * ss_r - s_r * s_r).cast("double")
                    )
                ),
                4,
            ).alias("g_stat"),
            F.col(f"flag{r}").alias("flagged"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("round")
