"""§2 extensions, ninety-fifth wave — covariate adjustment, partial
association, and ordinal chance-corrected agreement classics
(published-method cadence).

- agg_ancova_priority: one-way ANCOVA (Fisher 1932) — do priority
  mean order values differ AFTER adjusting for the calendar-time
  covariate?
- agg_partial_correlation: first-order partial correlation (Yule
  1907) — quantity↔price association controlling for discount,
  with the Fisher-z significance verdict.
- customers_kappa_weighted: Cohen's WEIGHTED kappa (1968) with
  quadratic weights on the 3×3 spend-tercile transition matrix —
  the ordinal upgrade of the existing unweighted
  llm_label_agreement_kappa, fully exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₄ 5% (ANCOVA group effect), z 2.5% (Fisher-z partial-r verdict)
_CHI2_4_95 = "9.487729"
_Z975 = "1.959964"

# quadratic disagreement weights for the 3×3 weighted kappa:
# v_ij = (i−j)² ∈ {0, 1, 4}
_KW = {(i, j): (i - j) ** 2 for i in range(1, 4) for j in range(1, 4)}


@register(
    "agg_ancova_priority",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
                    AS BIGINT) AS x,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
        FROM orders
    ),
    g AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM base GROUP BY s
    ),
    piv AS (
        SELECT
            {", ".join(
                f"max(CASE WHEN s = {i} THEN {m} END) AS {m}{i}"
                for i in range(1, 6)
                for m in ("n", "sx", "sy", "sxx", "sxy", "syy")
            )}
        FROM g
    ),
    e AS (
        SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS nn,
               CAST(sx1 + sx2 + sx3 + sx4 + sx5 AS BIGINT) AS tsx,
               CAST(sy1 + sy2 + sy3 + sy4 + sy5 AS BIGINT) AS tsy,
               CAST(sxx1 + sxx2 + sxx3 + sxx4 + sxx5 AS HUGEINT) AS tsxx,
               CAST(sxy1 + sxy2 + sxy3 + sxy4 + sxy5 AS HUGEINT) AS tsxy,
               CAST(syy1 + syy2 + syy3 + syy4 + syy5 AS HUGEINT) AS tsyy,
               {" + ".join(
                   f"(CAST(sxx{i} AS DOUBLE)"
                   f" - CAST(sx{i} AS DOUBLE) * sx{i} / n{i})"
                   for i in range(1, 6)
               )} AS exx,
               {" + ".join(
                   f"(CAST(sxy{i} AS DOUBLE)"
                   f" - CAST(sx{i} AS DOUBLE) * sy{i} / n{i})"
                   for i in range(1, 6)
               )} AS exy,
               {" + ".join(
                   f"(CAST(syy{i} AS DOUBLE)"
                   f" - CAST(sy{i} AS DOUBLE) * sy{i} / n{i})"
                   for i in range(1, 6)
               )} AS eyy
        FROM piv
    ),
    t AS (
        SELECT nn, exx, exy, eyy,
               CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx / nn
                   AS txx,
               CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / nn
                   AS txy,
               CAST(tsyy AS DOUBLE) - CAST(tsy AS DOUBLE) * tsy / nn
                   AS tyy
        FROM e
    ),
    f AS (
        SELECT nn,
               exy / exx AS b_within,
               eyy - exy * exy / exx AS sse_w,
               tyy - txy * txy / txx AS sse_t
        FROM t
    )
    SELECT nn AS n_orders,
           round(b_within, 6) AS slope_cents_per_day,
           round((sse_t - sse_w) / 4 / (sse_w / (nn - 6)), 4) AS f_stat,
           (sse_t - sse_w) * (nn - 6) > {_CHI2_4_95} * sse_w
               AS group_effect
    FROM f
    """,
    tags=("agg", "stats"),
)
def agg_ancova_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANCOVA (Fisher 1932): do the five priorities' mean
    order values differ AFTER adjusting for the calendar-time
    covariate x = epoch day? The covariance-adjusted F compares the
    regression SSE pooling groups (total line) against the SSE with
    per-group intercepts and a COMMON within slope: SSE_w = E_yy −
    E_xy²/E_xx with E_ab = Σ_g(S_ab − S_aS_b/n_g), SSE_t = T_yy −
    T_xy²/T_xx, F = ((SSE_t − SSE_w)/(k−1))/(SSE_w/(N−k−1)) — the
    textbook bridge between the ANOVA battery and regression. All
    eleven moment sums per group are exact DECIMAL(38)/HUGEINT;
    E/T/SSE/F assemble in ONE fixed textual order of doubles (the
    agg_oneway_anova device) and the verdict (k−1)F → χ²₄ uses the
    shared literal: (SSE_t − SSE_w)(N−6) > 9.487729·SSE_w. The
    common-slope assumption is ANCOVA's own (stated knob; the
    interaction test is a further op).

    Scale shape: ONE keyed reduce over the fact table to five
    6-tuples, a 1-row pivot — map-side-combinable, no window."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("x"),
        (dec2("o_totalprice") * 100).cast("long").alias("y"),
    )
    x38 = F.col("x").cast("decimal(38,0)")
    y38 = F.col("y").cast("decimal(38,0)")
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(x38 * F.col("x")).alias("sxx"),
        F.sum(x38 * F.col("y")).alias("sxy"),
        F.sum(y38 * F.col("y")).alias("syy"),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(m))).alias(f"{m}{i}")
            for i in range(1, 6)
            for m in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )

    def _tot(m):
        t = F.col(f"{m}1")
        for i in range(2, 6):
            t = t + F.col(f"{m}{i}")
        return t

    exx = exy = eyy = None
    for i in range(1, 6):
        ex = F.col(f"sxx{i}").cast("double") - F.col(
            f"sx{i}"
        ).cast("double") * F.col(f"sx{i}") / F.col(f"n{i}")
        ey = F.col(f"sxy{i}").cast("double") - F.col(
            f"sx{i}"
        ).cast("double") * F.col(f"sy{i}") / F.col(f"n{i}")
        ez = F.col(f"syy{i}").cast("double") - F.col(
            f"sy{i}"
        ).cast("double") * F.col(f"sy{i}") / F.col(f"n{i}")
        exx = ex if exx is None else exx + ex
        exy = ey if exy is None else exy + ey
        eyy = ez if eyy is None else eyy + ez
    e = piv.select(
        _tot("n").cast("long").alias("nn"),
        _tot("sx").cast("long").alias("tsx"),
        _tot("sy").cast("long").alias("tsy"),
        _tot("sxx").alias("tsxx"),
        _tot("sxy").alias("tsxy"),
        _tot("syy").alias("tsyy"),
        exx.alias("exx"),
        exy.alias("exy"),
        eyy.alias("eyy"),
    )
    nn = F.col("nn")
    t = e.select(
        "nn",
        "exx",
        "exy",
        "eyy",
        (
            F.col("tsxx").cast("double")
            - F.col("tsx").cast("double") * F.col("tsx") / nn
        ).alias("txx"),
        (
            F.col("tsxy").cast("double")
            - F.col("tsx").cast("double") * F.col("tsy") / nn
        ).alias("txy"),
        (
            F.col("tsyy").cast("double")
            - F.col("tsy").cast("double") * F.col("tsy") / nn
        ).alias("tyy"),
    )
    f = t.select(
        "nn",
        (F.col("exy") / F.col("exx")).alias("b_within"),
        (F.col("eyy") - F.col("exy") * F.col("exy") / F.col("exx")).alias(
            "sse_w"
        ),
        (F.col("tyy") - F.col("txy") * F.col("txy") / F.col("txx")).alias(
            "sse_t"
        ),
    )
    sse_w, sse_t = F.col("sse_w"), F.col("sse_t")
    return f.select(
        nn.alias("n_orders"),
        F.round(F.col("b_within"), 6).alias("slope_cents_per_day"),
        F.round((sse_t - sse_w) / 4 / (sse_w / (nn - 6)), 4).alias(
            "f_stat"
        ),
        ((sse_t - sse_w) * (nn - 6) > float(_CHI2_4_95) * sse_w).alias(
            "group_effect"
        ),
    )


@register(
    "agg_partial_correlation",
    f"""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS z
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(z) AS HUGEINT) AS sz,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
               CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
        FROM base
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx
                               AS DOUBLE)
                          * CAST(CAST(n AS HUGEINT) * syy - sy * sy
                                 AS DOUBLE)) AS rxy,
               CAST(CAST(n AS HUGEINT) * sxz - sx * sz AS DOUBLE)
                   / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx
                               AS DOUBLE)
                          * CAST(CAST(n AS HUGEINT) * szz - sz * sz
                                 AS DOUBLE)) AS rxz,
               CAST(CAST(n AS HUGEINT) * syz - sy * sz AS DOUBLE)
                   / sqrt(CAST(CAST(n AS HUGEINT) * syy - sy * sy
                               AS DOUBLE)
                          * CAST(CAST(n AS HUGEINT) * szz - sz * sz
                                 AS DOUBLE)) AS ryz
        FROM m
    ),
    p AS (
        SELECT n, rxy, rxz, ryz,
               (rxy - rxz * ryz)
                   / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) AS rp
        FROM c
    )
    SELECT n AS n_rows,
           round(rxy, 6) AS r_qty_price,
           round(rp, 6) AS r_partial,
           0.5 * ln((1 + rp) / (1 - rp)) * sqrt(CAST(n AS DOUBLE) - 4)
               > {_Z975} AS partial_significant
    FROM p
    """,
    tags=("agg", "stats"),
)
def agg_partial_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order partial correlation (Yule 1907): the
    quantity↔price association with the discount PARTIALLED OUT —
    r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), the
    closed-form answer to "is the correlation just the third
    variable?" that agg_corr_regr's raw Pearson can't give. All
    nine moment sums are exact DECIMAL(38)/HUGEINT on integer cents
    (discount as exact percent-cents); each pairwise r is one
    fixed-order double assembly of exact centered moments, the
    partial r follows in the same textual order, and the verdict is
    Fisher's z: ½ln((1+r)/(1−r))·√(n−4) > 1.959964 (df n−3−1 for
    one partialled variable; ln carries the wave-64 ~1-ulp library
    envelope, the statistic sits ~10³ away from the literal).
    TPC-H's extendedprice IS quantity × retail price, so r and
    r_partial are both near 1 — the op certifies the partialling
    algebra, the fixture makes the truth legible.

    Scale shape: ONE map-side-combinable 10-sum reduce over the
    BIGGEST fact table to a single row; no join, no window."""
    li = tbl(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        (dec2("l_extendedprice") * 100).cast("long").alias("y"),
        (dec2("l_discount") * 100).cast("long").alias("z"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d38("x")).alias("sx"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("z")).alias("sz"),
        F.sum(d38("x") * F.col("x")).alias("sxx"),
        F.sum(d38("y") * F.col("y")).alias("syy"),
        F.sum(d38("z") * F.col("z")).alias("szz"),
        F.sum(d38("x") * F.col("y")).alias("sxy"),
        F.sum(d38("x") * F.col("z")).alias("sxz"),
        F.sum(d38("y") * F.col("z")).alias("syz"),
    )
    n38 = F.col("n").cast("decimal(38,0)")

    def _r(sab, sa, sb, saa, sbb):
        num = (n38 * F.col(sab) - F.col(sa) * F.col(sb)).cast("double")
        da = (n38 * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
        db = (n38 * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
        return num / F.sqrt(da * db)

    c = m.select(
        "n",
        _r("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        _r("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        _r("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    rxy, rxz, ryz = F.col("rxy"), F.col("rxz"), F.col("ryz")
    p = c.select(
        "n",
        "rxy",
        "rxz",
        "ryz",
        (
            (rxy - rxz * ryz)
            / F.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
        ).alias("rp"),
    )
    n, rp = F.col("n"), F.col("rp")
    return p.select(
        n.alias("n_rows"),
        F.round(rxy, 6).alias("r_qty_price"),
        F.round(rp, 6).alias("r_partial"),
        (
            0.5
            * F.log((1 + rp) / (1 - rp))
            * F.sqrt(n.cast("double") - 4)
            > float(_Z975)
        ).alias("partial_significant"),
    )


_KW_A = " + ".join(
    f"{_KW[(i, j)]} * CAST(n{i}{j} AS HUGEINT)"
    for i in range(1, 4)
    for j in range(1, 4)
    if _KW[(i, j)]
)
_KW_B = " + ".join(
    f"{_KW[(i, j)]} * CAST(n{i}1 + n{i}2 + n{i}3 AS HUGEINT)"
    f" * (n1{j} + n2{j} + n3{j})"
    for i in range(1, 4)
    for j in range(1, 4)
    if _KW[(i, j)]
)


@register(
    "customers_kappa_weighted",
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
            )},
            CAST(sum(c) AS BIGINT) AS nn
        FROM trans
    ),
    ab AS (
        SELECT nn,
               {_KW_A} AS a,
               {_KW_B} AS b
        FROM piv
    )
    SELECT nn AS n_customers,
           round(1 - CAST(nn AS DOUBLE) * a / CAST(b AS DOUBLE), 6)
               AS kappa_w,
           4 * b > 5 * CAST(nn AS HUGEINT) * a AS beyond_chance
    FROM ab
    """,
    tags=("analytics", "stats"),
)
def customers_kappa_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's WEIGHTED kappa (1968) with quadratic weights on the
    3×3 half-to-half spend-tercile transition matrix (the
    customers_stuart_maxwell frame): κ_w = 1 − N·Σv_ij n_ij /
    Σv_ij r_i k_j with disagreement weights v_ij = (i−j)² ∈
    {{0,1,4}} — the ordinal upgrade of the existing unweighted
    Cohen's κ (llm_label_agreement_kappa): a tercile-1→3 jump
    counts 4× a 1→2 slip, which is what "agreement" means on an
    ORDERED scale (quadratically-weighted κ equals the ICC
    asymptotically). Transition counts, both weighted sums, AND the
    κ_w > 0.2 beyond-chance verdict (4B > 5NA) are fully EXACT
    DECIMAL(38)/HUGEINT integers — no float anywhere near the
    decision; κ_w displays as one exact-input double expression.
    Terciles: the balanced exact cut 1 + 3(r−1)÷n on stratified
    block-ranked ranks (the customers_stuart_maxwell device).

    Scale shape: one keyed reduce to per-(customer, half) spend,
    stratified block-ranked ranks, a 9-cell transition reduce, a
    1-row pivot."""
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
                        (F.col("q1") == i) & (F.col("q2") == j),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n{i}{j}")
            for i in range(1, 4)
            for j in range(1, 4)
        ],
        F.sum("c").cast("long").alias("nn"),
    )
    a = None
    for i in range(1, 4):
        for j in range(1, 4):
            if not _KW[(i, j)]:
                continue
            t = _KW[(i, j)] * F.col(f"n{i}{j}").cast("decimal(38,0)")
            a = t if a is None else a + t
    b = None
    for i in range(1, 4):
        for j in range(1, 4):
            if not _KW[(i, j)]:
                continue
            r_i = F.col(f"n{i}1") + F.col(f"n{i}2") + F.col(f"n{i}3")
            k_j = F.col(f"n1{j}") + F.col(f"n2{j}") + F.col(f"n3{j}")
            t = _KW[(i, j)] * r_i.cast("decimal(38,0)") * k_j
            b = t if b is None else b + t
    ab = piv.select("nn", a.alias("a"), b.alias("b"))
    nn = F.col("nn")
    return ab.select(
        nn.alias("n_customers"),
        F.round(
            1
            - nn.cast("double")
            * F.col("a").cast("double")
            / F.col("b").cast("double"),
            6,
        ).alias("kappa_w"),
        (
            4 * F.col("b") > 5 * nn.cast("decimal(38,0)") * F.col("a")
        ).alias("beyond_chance"),
    )
