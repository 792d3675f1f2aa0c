"""§2 extensions, seventy-eighth wave — structural breaks, robust
rank-order, voting-theoretic rank aggregation, and cascade-model
retrieval evaluation (published-method cadence).

- ts_chow_test: the Chow test (1960) for a structural break in the
  daily-revenue trend at a fixed boundary date.
- agg_fligner_policello: the Fligner-Policello robust rank-order
  test (1981) — the placement-based two-sample test that drops BOTH
  the equal-variance and equal-shape assumptions.
- agg_borda_copeland: Borda (1781) and Copeland (1951) rank
  aggregation of the five regions' brand-revenue rankings — the
  social-choice consensus ranking.
- llm_err: Expected Reciprocal Rank at 10 (Chapelle et al. 2009) —
  the cascade-model retrieval metric, computed in exact scaled
  integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₂ upper-5% critical value (Chow verdict via 2F ~ χ²₂ at large
# within-segment df), shared textually with the oracle SQL
_CHI2_2_95 = "5.991465"

_ERR_TERMS = ("table", "scan", "merge", "sort", "key")


@register(
    "ts_chow_test",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS x,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1, 2
    ),
    seg AS (
        SELECT CASE WHEN day < DATE '1998-04-15' THEN 1 ELSE 2 END AS s,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(x AS BIGINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM daily GROUP BY 1
    ),
    piv AS (
        SELECT max(CASE WHEN s = 1 THEN n END) AS n1,
               max(CASE WHEN s = 1 THEN sx END) AS sx1,
               max(CASE WHEN s = 1 THEN sy END) AS sy1,
               max(CASE WHEN s = 1 THEN sxx END) AS sxx1,
               max(CASE WHEN s = 1 THEN sxy END) AS sxy1,
               max(CASE WHEN s = 1 THEN syy END) AS syy1,
               max(CASE WHEN s = 2 THEN n END) AS n2,
               max(CASE WHEN s = 2 THEN sx END) AS sx2,
               max(CASE WHEN s = 2 THEN sy END) AS sy2,
               max(CASE WHEN s = 2 THEN sxx END) AS sxx2,
               max(CASE WHEN s = 2 THEN sxy END) AS sxy2,
               max(CASE WHEN s = 2 THEN syy END) AS syy2
        FROM seg
    ),
    rss AS (
        SELECT n1, n2,
               (CAST(CAST(n1 AS HUGEINT) * syy1
                     - CAST(sy1 AS HUGEINT) * sy1 AS DOUBLE)
                * CAST(CAST(n1 AS HUGEINT) * sxx1
                       - CAST(sx1 AS HUGEINT) * sx1 AS DOUBLE)
                - CAST(CAST(n1 AS HUGEINT) * sxy1
                       - CAST(sx1 AS HUGEINT) * sy1 AS DOUBLE)
                  * CAST(CAST(n1 AS HUGEINT) * sxy1
                         - CAST(sx1 AS HUGEINT) * sy1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE)
                  * CAST(CAST(n1 AS HUGEINT) * sxx1
                         - CAST(sx1 AS HUGEINT) * sx1 AS DOUBLE)) AS r1,
               (CAST(CAST(n2 AS HUGEINT) * syy2
                     - CAST(sy2 AS HUGEINT) * sy2 AS DOUBLE)
                * CAST(CAST(n2 AS HUGEINT) * sxx2
                       - CAST(sx2 AS HUGEINT) * sx2 AS DOUBLE)
                - CAST(CAST(n2 AS HUGEINT) * sxy2
                       - CAST(sx2 AS HUGEINT) * sy2 AS DOUBLE)
                  * CAST(CAST(n2 AS HUGEINT) * sxy2
                         - CAST(sx2 AS HUGEINT) * sy2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE)
                  * CAST(CAST(n2 AS HUGEINT) * sxx2
                         - CAST(sx2 AS HUGEINT) * sx2 AS DOUBLE)) AS r2,
               (CAST(CAST(n1 + n2 AS HUGEINT) * (syy1 + syy2)
                     - CAST(sy1 + sy2 AS HUGEINT) * (sy1 + sy2)
                     AS DOUBLE)
                * CAST(CAST(n1 + n2 AS HUGEINT) * (sxx1 + sxx2)
                       - CAST(sx1 + sx2 AS HUGEINT) * (sx1 + sx2)
                       AS DOUBLE)
                - CAST(CAST(n1 + n2 AS HUGEINT) * (sxy1 + sxy2)
                       - CAST(sx1 + sx2 AS HUGEINT) * (sy1 + sy2)
                       AS DOUBLE)
                  * CAST(CAST(n1 + n2 AS HUGEINT) * (sxy1 + sxy2)
                         - CAST(sx1 + sx2 AS HUGEINT) * (sy1 + sy2)
                         AS DOUBLE))
               / (CAST(n1 + n2 AS DOUBLE)
                  * CAST(CAST(n1 + n2 AS HUGEINT) * (sxx1 + sxx2)
                         - CAST(sx1 + sx2 AS HUGEINT) * (sx1 + sx2)
                         AS DOUBLE)) AS rp
        FROM piv
    )
    SELECT CAST(n1 + n2 AS BIGINT) AS n_days,
           '1998-04-15' AS break_date,
           round((rp - r1 - r2) / 2 / ((r1 + r2) / (n1 + n2 - 4)), 4)
               AS f_stat,
           (rp - r1 - r2) * (n1 + n2 - 4)
               > {_CHI2_2_95} * (r1 + r2) AS structural_break
    FROM rss
    """,
    tags=("timeseries", "stats"),
)
def ts_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test (1960) for a structural break in the daily-revenue
    trend: fit y = a + b·x by OLS on each side of the fixed boundary
    1998-04-15 (a deliberately LATE break literal, shared textually:
    the orders calendar spans 1992-01-01..1998-08-02, so segment 2
    holds only the last ~110 daily observations vs ~2290 in segment
    1 — the test is still well-defined, and an end-of-series break
    is the realistic monitoring shape) and on the pooled series,
    then F = ((RSS_p − RSS₁ − RSS₂)/2)/((RSS₁+RSS₂)/(n−4)). Per segment the moment sums (n, Σx, Σy, Σx², Σxy, Σy²)
    are exact integers (x = days since 1995-01-01, y = daily revenue
    dollars; Σy² promotes to DECIMAL(38)/HUGEINT) and each
    RSS = (S_yy·S_xx − S_xy²)/(n·S_xx) with the n-scaled centered
    moments S_ab = n·Σab − Σa·Σb assembles in ONE fixed textual
    order on both engines (the agg_oneway_anova device: identical
    exact inputs + identical op order ⇒ bit-identical doubles, so
    the double-compared verdict 2F > χ²₂(0.95) never diverges; the
    finite-df F vs χ²₂/2 correction is below the literal's
    resolution at thousands of days). Envelope: S_xy² ≲ 10³⁶ at
    sf0.1 daily dollars — past ~100× that revenue density,
    re-quantize y to thousands (the ts_kpss convention).

    Scale shape: one keyed reduce of the fact table to the
    calendar-bounded daily series, one 2-row segment reduce, a 1-row
    pivot — map-side-combinable all the way, no windows."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("x"),
    ).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    seg = daily.groupBy(
        F.when(
            F.col("day") < F.lit("1998-04-15").cast("date"), 1
        )
        .otherwise(2)
        .alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x").cast("long") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    piv = seg.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(c))).alias(f"{c}{i}")
            for i in (1, 2)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )

    def rss(n, sx, sy, sxx, sxy, syy):
        d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        s_yy = (d38(n) * syy - d38(sy) * sy).cast("double")
        s_xx = (d38(n) * sxx - d38(sx) * sx).cast("double")
        s_xy = (d38(n) * sxy - d38(sx) * sy).cast("double")
        return (s_yy * s_xx - s_xy * s_xy) / (n.cast("double") * s_xx)

    n1, n2 = F.col("n1"), F.col("n2")
    r1 = rss(
        n1, F.col("sx1"), F.col("sy1"), F.col("sxx1"), F.col("sxy1"),
        F.col("syy1"),
    )
    r2 = rss(
        n2, F.col("sx2"), F.col("sy2"), F.col("sxx2"), F.col("sxy2"),
        F.col("syy2"),
    )
    rp = rss(
        n1 + n2,
        F.col("sx1") + F.col("sx2"),
        F.col("sy1") + F.col("sy2"),
        F.col("sxx1") + F.col("sxx2"),
        F.col("sxy1") + F.col("sxy2"),
        F.col("syy1") + F.col("syy2"),
    )
    return piv.select(
        (n1 + n2).cast("long").alias("n_days"),
        F.lit("1998-04-15").alias("break_date"),
        F.round(
            (rp - r1 - r2) / 2 / ((r1 + r2) / (n1 + n2 - 4)), 4
        ).alias("f_stat"),
        (
            (rp - r1 - r2) * (n1 + n2 - 4)
            > float(_CHI2_2_95) * (r1 + r2)
        ).alias("structural_break"),
    )


@register(
    "agg_fligner_policello",
    """
    WITH daily AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT smp, cents,
               row_number() OVER (ORDER BY cents, smp, day) AS rn_c,
               row_number() OVER (PARTITION BY smp
                                  ORDER BY cents, day) AS rn_w
        FROM daily
    ),
    mid AS (
        SELECT rc.smp,
               (bc.mn + bc.mx) - (bw.mnw + bw.mxw) AS a
        FROM rc
        JOIN (SELECT cents, CAST(min(rn_c) AS BIGINT) AS mn,
                     CAST(max(rn_c) AS BIGINT) AS mx
              FROM rc GROUP BY cents) bc ON bc.cents = rc.cents
        JOIN (SELECT smp, cents, CAST(min(rn_w) AS BIGINT) AS mnw,
                     CAST(max(rn_w) AS BIGINT) AS mxw
              FROM rc GROUP BY smp, cents) bw
          ON bw.smp = rc.smp AND bw.cents = rc.cents
    ),
    st AS (
        SELECT smp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a) AS BIGINT) AS sa
        FROM mid GROUP BY smp
    ),
    v AS (
        SELECT mid.smp,
               CAST(sum(CAST(st.n * mid.a - st.sa AS HUGEINT)
                        * (st.n * mid.a - st.sa)) AS HUGEINT) AS v
        FROM mid JOIN st ON st.smp = mid.smp
        GROUP BY mid.smp
    ),
    piv AS (
        SELECT max(CASE WHEN st.smp = 1 THEN st.n END) AS n1,
               max(CASE WHEN st.smp = 1 THEN st.sa END) AS sa1,
               max(CASE WHEN st.smp = 1 THEN v.v END) AS v1,
               max(CASE WHEN st.smp = 2 THEN st.n END) AS n2,
               max(CASE WHEN st.smp = 2 THEN st.sa END) AS sa2,
               max(CASE WHEN st.smp = 2 THEN v.v END) AS v2
        FROM st JOIN v ON v.smp = st.smp
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round((CAST(sa1 AS DOUBLE) - sa2) * n1 * n2
                 / (2.0 * sqrt(CAST(v1 AS DOUBLE) * n2 * n2
                               + CAST(v2 AS DOUBLE) * n1 * n1
                               + CAST(sa1 AS DOUBLE) * sa2 * n1 * n2)),
                 4) AS u_stat,
           CAST(625 AS HUGEINT)
               * (CAST(sa1 AS HUGEINT) - sa2)
               * (CAST(sa1 AS HUGEINT) - sa2)
               * (CAST(n1 AS HUGEINT) * n1)
               * (CAST(n2 AS HUGEINT) * n2)
               > CAST(9604 AS HUGEINT)
                 * (CAST(v1 AS HUGEINT) * n2 * n2
                    + CAST(v2 AS HUGEINT) * n1 * n1
                    + CAST(sa1 AS HUGEINT) * sa2 * n1 * n2)
               AS significant
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_fligner_policello(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Policello robust rank-order test (1981): the
    placement-based two-sample location test that drops BOTH the
    equal-variance and equal-shape assumptions Mann-Whitney carries.
    The placement of x among the other sample, #{y<x} + ½#{y=x}, is
    EXACTLY half the gap between x's combined and within-sample
    doubled midranks, so the agg_brunner_munzel rank machinery
    yields the doubled placements a = r2c − r2w as exact integers;
    per sample Σa and the n-scaled deviation sums
    Ṽ = Σ(n·a − Σa)² = 4n²·Σ(P−P̄)² stay integral. The statistic
    U = (ΣP_x − ΣP_y)/(2√(V_x + V_y + P̄_xP̄_y)) =
    (Σa₁ − Σa₂)·n1·n2/(2√(Ṽ1·n2² + Ṽ2·n1² + Σa₁Σa₂·n1·n2)) is a
    display-only double divided once; the two-sided 5% verdict
    clears the root exactly:
    |U| > 49/25 ⇔ 625·(Σa₁−Σa₂)²·n1²·n2² > 9604·(Ṽ1n2² + Ṽ2n1² +
    Σa₁Σa₂n1n2) — DECIMAL(38)/HUGEINT cross-products bounded by the
    calendar (≈10³⁰ at the 7-year span), not the corpus.

    Scale shape: identical to agg_brunner_munzel — one keyed reduce
    to ≤2·days rows, bounded-axis rank windows, 2-row reduces."""
    o = tbl(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("smp"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    rc = daily.select(
        "smp",
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "smp", "day"))
        .alias("rn_c"),
        F.row_number()
        .over(Window.partitionBy("smp").orderBy("cents", "day"))
        .alias("rn_w"),
    )
    bc = rc.groupBy("cents").agg(
        F.min("rn_c").cast("long").alias("mn"),
        F.max("rn_c").cast("long").alias("mx"),
    )
    bw = rc.groupBy("smp", "cents").agg(
        F.min("rn_w").cast("long").alias("mnw"),
        F.max("rn_w").cast("long").alias("mxw"),
    )
    mid = (
        rc.join(F.broadcast(bc), "cents")
        .join(F.broadcast(bw), ["smp", "cents"])
        .select(
            "smp",
            (
                F.col("mn") + F.col("mx") - F.col("mnw") - F.col("mxw")
            ).alias("a"),
        )
    )
    st = mid.groupBy("smp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
    )
    dev = (F.col("n") * F.col("a") - F.col("sa")).cast("decimal(38,0)")
    v = (
        mid.join(F.broadcast(st), "smp")
        .groupBy("smp")
        .agg(F.sum(dev * dev).alias("v"))
    )
    piv = (
        st.join(v, "smp")
        .agg(
            *[
                F.max(F.when(F.col("smp") == i, F.col(c))).alias(f"{c}{i}")
                for i in (1, 2)
                for c in ("n", "sa", "v")
            ]
        )
    )
    n1, sa1, v1 = F.col("n1"), F.col("sa1"), F.col("v1")
    n2, sa2, v2 = F.col("n2"), F.col("sa2"), F.col("v2")
    diff38 = sa1.cast("decimal(38,0)") - sa2
    den38 = (
        v1 * (n2.cast("decimal(38,0)") * n2)
        + v2 * (n1.cast("decimal(38,0)") * n1)
        + sa1.cast("decimal(38,0)") * sa2 * n1 * n2
    )
    return piv.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(
            (sa1.cast("double") - sa2)
            * n1
            * n2
            / (
                2.0
                * F.sqrt(
                    v1.cast("double") * n2 * n2
                    + v2.cast("double") * n1 * n1
                    + sa1.cast("double") * sa2 * n1 * n2
                )
            ),
            4,
        ).alias("u_stat"),
        (625 * diff38 * diff38 * (n1.cast("decimal(38,0)") * n1)
         * (n2.cast("decimal(38,0)") * n2) > 9604 * den38).alias(
            "significant"
        ),
    )


@register(
    "agg_borda_copeland",
    """
    WITH rev AS (
        SELECT r.r_name AS region, p.p_brand AS brand,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                             * 10000 AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT region, brand,
               row_number() OVER (PARTITION BY region
                                  ORDER BY rev DESC, brand) AS rnk,
               count(*) OVER (PARTITION BY region) AS nb
        FROM rev
    ),
    borda AS (
        SELECT brand, CAST(sum(nb - rnk) AS BIGINT) AS borda_score
        FROM rk GROUP BY brand
    ),
    pair AS (
        SELECT a.brand AS ba, b.brand AS bb,
               CAST(sum(CASE WHEN a.rnk < b.rnk THEN 1 ELSE 0 END)
                    AS BIGINT) AS wins,
               CAST(count(*) AS BIGINT) AS races
        FROM rk a JOIN rk b
          ON a.region = b.region AND a.brand <> b.brand
        GROUP BY 1, 2
    ),
    copeland AS (
        SELECT ba AS brand,
               CAST(sum(CASE WHEN 2 * wins > races THEN 1
                             WHEN 2 * wins < races THEN -1
                             ELSE 0 END) AS BIGINT) AS copeland_score
        FROM pair GROUP BY 1
    )
    SELECT borda.brand, borda.borda_score, copeland.copeland_score
    FROM borda JOIN copeland USING (brand)
    ORDER BY borda.borda_score DESC, borda.brand
    """,
    tags=("agg", "analytics"),
)
def agg_borda_copeland(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Social-choice rank aggregation: each of the five regions
    "votes" by ranking the part brands on exact discounted revenue
    (centi-cents), and the consensus is scored two classic ways —
    the Borda count (1781; points = brands-below in each regional
    ranking, summed) and the Copeland rule (1951; +1/−1 per pairwise
    majority across regions, an odd voter count so no pairwise
    ties). Rankings are strict (revenue desc, brand asc tiebreak),
    every score is an exact integer, and the pairwise stage is a
    (region × brand)² grid join — bounded by the brand-domain
    (25²·5 rows), never the corpus.

    Scale shape: one five-table keyed reduce of the fact table to
    the |regions|×|brands| grid, rank windows over that 125-row
    aggregate, a 3k-row grid self-join, two grid reduces."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    p = tbl(spark, sf_dir, "part")
    cents4 = (
        dec2("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))
        * 10000
    ).cast("long")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              li["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.col("r_name").alias("region"),
                 F.col("p_brand").alias("brand"))
        .agg(F.sum(cents4).cast("long").alias("rev"))
    )
    w_rk = Window.partitionBy("region").orderBy(
        F.col("rev").desc(), "brand"
    )
    w_nb = Window.partitionBy("region")
    rk = rev.select(
        "region",
        "brand",
        F.row_number().over(w_rk).alias("rnk"),
        F.count(F.lit(1)).over(w_nb).alias("nb"),
    )
    borda = rk.groupBy("brand").agg(
        F.sum(F.col("nb") - F.col("rnk")).cast("long").alias("borda_score")
    )
    a = rk.alias("a")
    b = rk.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.region") == F.col("b.region"))
            & (F.col("a.brand") != F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("ba"), F.col("b.brand").alias("bb")
        )
        .agg(
            F.sum(
                F.when(F.col("a.rnk") < F.col("b.rnk"), 1).otherwise(0)
            )
            .cast("long")
            .alias("wins"),
            F.count(F.lit(1)).cast("long").alias("races"),
        )
    )
    copeland = pair.groupBy(F.col("ba").alias("brand")).agg(
        F.sum(
            F.when(2 * F.col("wins") > F.col("races"), 1)
            .when(2 * F.col("wins") < F.col("races"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("copeland_score")
    )
    return (
        borda.join(copeland, "brand")
        .select("brand", "borda_score", "copeland_score")
        .orderBy(F.col("borda_score").desc(), "brand")
    )


@register(
    "llm_err",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
        WHERE term IN {_ERR_TERMS!r}
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    cand AS (
        SELECT tf.term, tf.doc_id,
               CAST(pow(2, least(tf.tf, 5)) - 1 AS BIGINT) AS rho,
               dl.dl
        FROM tf JOIN dl USING (doc_id)
    ),
    ranked AS (
        SELECT term, rho,
               row_number() OVER (PARTITION BY term
                                  ORDER BY dl DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY term) AS n_cand
        FROM cand
    ),
    pfx AS (
        SELECT term, rho, rk, n_cand,
               CAST(coalesce(product(32 - rho) OVER (
                   PARTITION BY term ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   1) AS BIGINT) AS stop_prefix
        FROM ranked WHERE rk <= 10
    ),
    s AS (
        SELECT term, CAST(max(n_cand) AS BIGINT) AS n_cand,
               CAST(sum((2520 // rk) * rho * stop_prefix
                        * CAST(pow(32, 10 - rk) AS BIGINT)) AS BIGINT)
                   AS err_scaled
        FROM pfx GROUP BY term
    )
    SELECT term, n_cand, err_scaled,
           round(CAST(err_scaled AS DOUBLE)
                 / (2520.0 * pow(32, 10)), 6) AS err10
    FROM s ORDER BY term
    """,
    tags=("llm", "retrieval"),
)
def llm_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Reciprocal Rank at 10 (Chapelle, Metzler, Zhang &
    Grinspan 2009) — the cascade-model retrieval metric: a reader
    scans down the list, stops at rank r with probability
    R_r·Π_(i<r)(1−R_i), R = (2^g − 1)/2^gmax; ERR = Σ 1/r times that
    stop mass. Evaluated per single-term query over a deliberately
    naive ranker (document length desc — the llm_retrieval_metrics
    graded-tf relevance, a DIFFERENT published metric over the same
    eval-set shape: NDCG rewards total discounted gain, ERR punishes
    a bad first hit). With gmax = 5 every R_r = ρ_r/32 (ρ = 2^g − 1)
    is a 32-denominator rational, so scaling by 2520·32¹⁰ (lcm(1..10)
    times the depth-10 denominator) turns the whole metric into the
    exact integer Σ (2520/r)·ρ_r·Π(32−ρ_i)·32^(10−r) ≤ 2520·32¹⁰ ≈
    2.8·10¹⁸ — inside int64 ALWAYS (bounded by the metric, not the
    corpus). The stop-prefix Π(32−ρ_i) runs through the engines'
    float product aggregate, exact here because every intermediate
    is an integer < 32⁹ « 2⁵³. err10 is a display-only single
    division (denominator has factor 3² ⇒ never a terminating
    decimal ⇒ no round-tie risk).

    Scale shape: two keyed token reduces (the llm_bm25 shape), a
    per-query top-10 window, then per-query reduces — candidate
    lists shrink to ≤10 rows before any product/sum."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = (
        toks.where(F.col("term").isin(*_ERR_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    cand = tf.join(dl, "doc_id").select(
        "term",
        "doc_id",
        (
            F.pow(F.lit(2.0), F.least("tf", F.lit(5)).cast("double"))
            - 1
        )
        .cast("long")
        .alias("rho"),
        "dl",
    )
    w_rk = Window.partitionBy("term").orderBy(
        F.col("dl").desc(), "doc_id"
    )
    w_n = Window.partitionBy("term")
    ranked = cand.select(
        "term",
        "rho",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n_cand"),
    ).filter(F.col("rk") <= 10)
    w_pfx = (
        Window.partitionBy("term")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pfx = ranked.withColumn(
        "stop_prefix",
        F.coalesce(F.product(32 - F.col("rho")).over(w_pfx), F.lit(1.0))
        .cast("long"),
    )
    s = pfx.groupBy("term").agg(
        F.max("n_cand").cast("long").alias("n_cand"),
        F.sum(
            (2520 / F.col("rk")).cast("long")
            * F.col("rho")
            * F.col("stop_prefix")
            * F.pow(F.lit(32.0), (10 - F.col("rk")).cast("double"))
            .cast("long")
        )
        .cast("long")
        .alias("err_scaled"),
    )
    return s.select(
        "term",
        "n_cand",
        "err_scaled",
        F.round(
            F.col("err_scaled").cast("double")
            / (2520.0 * float(32**10)),
            6,
        ).alias("err10"),
    ).orderBy("term")
