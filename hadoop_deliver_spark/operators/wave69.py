"""§2 extensions, ninety-third wave — community detection and the
ordinal/nominal association battery (published-method cadence).

- graph_label_propagation: synchronous label propagation community
  detection (Raghavan-Albert-Kumara 2007) with deterministic
  modal-label tie-breaks, four unrolled rounds on the Brand#23
  co-purchase projection.
- agg_somers_d: Somers' d (1962) — the ASYMMETRIC member of the
  ordinal-association trio (Kendall τ-b and GK gamma exist), fully
  exact.
- orders_ridit_analysis: Bross's ridit analysis (1958) — mean ridit
  of URGENT order values against the LOW reference distribution,
  fully exact.
- agg_gk_lambda: Goodman-Kruskal lambda (1954) — proportional-
  reduction-in-error prediction of nominal region↔segment, fully
  exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_LPA_ROUNDS = 4
# composite modal-label key: cnt·10¹² − lbl picks (max count, min
# label) in one exact integer arg_max — 10¹² clears any partkey
_LPA_KEY = 1_000_000_000_000

# the shared order-value cent-bucket ladder (the agg_hellinger ladder)
_BUCKET_EDGES = (5_000_000, 10_000_000, 20_000_000, 30_000_000)

_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
_SEGMENTS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)

_LPA_PREFIX = """
    WITH ce AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part pt ON pt.p_partkey = l.l_partkey
        WHERE pt.p_brand = 'Brand#23'
    ),
    ed AS MATERIALIZED (
        SELECT u, v FROM (
            SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS w
            FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p
            GROUP BY 1, 2
        ) WHERE w >= 2
    ),
    sym AS MATERIALIZED (
        SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT u AS node, CAST(u AS BIGINT) AS lbl FROM sym
    )"""

_LPA_STAGE = """,
    g{i} AS MATERIALIZED (
        SELECT s.u AS node, l.lbl, CAST(count(*) AS BIGINT) AS cnt
        FROM sym s JOIN l{prev} l ON l.node = s.v
        GROUP BY 1, 2
    ),
    l{i} AS MATERIALIZED (
        SELECT node,
               CAST(arg_max(lbl, cnt * {key} - lbl) AS BIGINT) AS lbl
        FROM g{i} GROUP BY node
    )"""


def lpa_sym_and_labels(spark: SparkSession, sf_dir: str):
    """Shared synchronous-LPA core (see graph_label_propagation's
    docstring for every pinned convention): returns the symmetrized
    sparsified Brand#23 co-purchase edge list and the final label
    frame after the four unrolled rounds. Factored out so
    graph_conductance (wave162) measures the SAME communities the
    detector reports — the definition cannot drift between them."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    ce = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = ce.select("c", F.col("p").alias("u"))
    b = ce.select(F.col("c").alias("c_b"), F.col("p").alias("v"))
    ed = (
        a.join(b, (F.col("c") == F.col("c_b")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    sym = ed.unionAll(
        ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    lbl = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").cast("long").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(_LPA_ROUNDS):
        g = (
            sym.join(lbl, sym["v"] == lbl["node"])
            .select(F.col("u").alias("gnode"), "lbl")
            .groupBy("gnode", "lbl")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        lbl = (
            g.groupBy(F.col("gnode").alias("node"))
            .agg(
                F.max_by(
                    "lbl", F.col("cnt") * F.lit(_LPA_KEY) - F.col("lbl")
                )
                .cast("long")
                .alias("lbl")
            )
            .localCheckpoint()
        )
    return sym, lbl


@register(
    "graph_label_propagation",
    _LPA_PREFIX
    + "".join(
        _LPA_STAGE.format(i=i, prev=i - 1, key=_LPA_KEY)
        for i in range(1, _LPA_ROUNDS + 1)
    )
    + f"""
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
    FROM l{_LPA_ROUNDS} GROUP BY lbl
    ORDER BY size DESC, community
    """,
    tags=("graph",),
)
def graph_label_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Label propagation community detection (Raghavan, Albert &
    Kumara 2007) on the Brand#23 co-purchase projection (the
    graph_kcore_peel edge frame SPARSIFIED to co-purchase support
    ≥ 2 — the standard co-occurrence noise floor; the unweighted
    projection is so dense LPA correctly collapses it to one
    community): init label(v) = v, then each
    round every node adopts the MODAL label among its neighbors —
    near-linear-time community detection, the scalable baseline
    under Louvain. LPA is notoriously order/tie nondeterministic;
    this op pins it down: SYNCHRONOUS updates (all nodes from the
    previous round's labels, own label excluded — stated
    convention) and the tie-break "max count, then MIN label" as
    the single exact-integer arg_max key cnt·10¹² − lbl (10¹²
    clears any partkey; both engines pick identical labels). FOUR
    unrolled rounds (the graph_kcore_peel bounded-unrolling device
    — the round count is part of the operator contract; synchronous
    LPA need not converge, four rounds is the documented cut).
    Output: community sizes, descending.

    Scale shape: each round is one co-partitioned edge-label join +
    a (node, label) count reduce + an exact arg_max reduce — the
    same shuffles a billion-edge LPA takes; localCheckpoint at
    round boundaries keeps lineage flat (cluster scale: checkpoint
    to storage)."""
    sym, lbl = lpa_sym_and_labels(spark, sf_dir)
    return (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .orderBy(F.desc("size"), "community")
    )


def _bucket_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} <= {_BUCKET_EDGES[0]} THEN 1 "
        f"WHEN {col} <= {_BUCKET_EDGES[1]} THEN 2 "
        f"WHEN {col} <= {_BUCKET_EDGES[2]} THEN 3 "
        f"WHEN {col} <= {_BUCKET_EDGES[3]} THEN 4 ELSE 5 END"
    )


def _somers_block(i: int, j: int, concordant: bool) -> str:
    """The lower-right (concordant) or lower-left (discordant) block
    sum paired with cell (i, j)."""
    jj_range = range(j + 1, 6) if concordant else range(1, j)
    cells = " + ".join(
        f"n{ii}{jj}" for ii in range(i + 1, 6) for jj in jj_range
    )
    return f"CAST(n{i}{j} AS HUGEINT) * ({cells})"


_SOMERS_C = " + ".join(
    _somers_block(i, j, True)
    for i in range(1, 5)
    for j in range(1, 5)
)
_SOMERS_D = " + ".join(
    _somers_block(i, j, False)
    for i in range(1, 5)
    for j in range(2, 6)
)
_SOMERS_SR2 = " + ".join(
    "CAST("
    + " + ".join(f"n{i}{j}" for j in range(1, 6))
    + " AS HUGEINT) * ("
    + " + ".join(f"n{i}{j}" for j in range(1, 6))
    + ")"
    for i in range(1, 6)
)
_SOMERS_SK2 = " + ".join(
    "CAST("
    + " + ".join(f"n{i}{j}" for i in range(1, 6))
    + " AS HUGEINT) * ("
    + " + ".join(f"n{i}{j}" for i in range(1, 6))
    + ")"
    for j in range(1, 6)
)


@register(
    "agg_somers_d",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS i,
               {_bucket_sql(
                   "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                   " AS BIGINT)"
               )} AS j
        FROM orders
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN i = {i} AND j = {j} THEN 1 END)"
                f" AS BIGINT) AS n{i}{j}"
                for i in range(1, 6)
                for j in range(1, 6)
            )},
            CAST(count(*) AS BIGINT) AS nn
        FROM base
    ),
    cd AS (
        SELECT nn,
               {_SOMERS_C} AS c,
               {_SOMERS_D} AS d,
               {_SOMERS_SR2} AS sr2,
               {_SOMERS_SK2} AS sk2
        FROM piv
    )
    SELECT nn AS n_orders,
           round(CAST(2 * (c - d) AS DOUBLE)
                 / CAST(CAST(nn AS HUGEINT) * nn - sr2 AS DOUBLE), 6)
               AS d_yx,
           round(CAST(2 * (c - d) AS DOUBLE)
                 / CAST(CAST(nn AS HUGEINT) * nn - sk2 AS DOUBLE), 6)
               AS d_xy,
           c > d AS positive_association
    FROM cd
    """,
    tags=("agg", "stats"),
)
def agg_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' d (1962) between order PRIORITY (ordinal X, 1..5) and
    the order-value cent-bucket ladder (ordinal Y, the
    agg_hellinger_distance edges) — the ASYMMETRIC member that
    completes the ordinal-association trio (agg_kendall_tau is the
    symmetric pair version, agg_gk_gamma drops ties entirely;
    Somers' d_yx keeps X-ties in the denominator, the right measure
    when Y depends on X): d_yx = 2(C−D)/(n² − Σr_i²), d_xy =
    2(C−D)/(n² − Σk_j²). Concordant/discordant pair counts assemble
    from the 25-cell literal pivot as Σn_ij·(lower-right block sum)
    — every ingredient an exact DECIMAL(38)/HUGEINT integer, each
    displayed d one exact-input double division, and the direction
    verdict C > D FULLY exact. No window, no sort.

    Scale shape: ONE map-side-combinable reduce over the fact table
    to a 1-row 25-cell pivot."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    bk = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("i"),
        bk.alias("j"),
    )
    piv = base.agg(
        *[
            F.count(
                F.when((F.col("i") == i) & (F.col("j") == j), F.lit(1))
            )
            .cast("long")
            .alias(f"n{i}{j}")
            for i in range(1, 6)
            for j in range(1, 6)
        ],
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    c_sum = d_sum = None
    for i in range(1, 5):
        for j in range(1, 6):
            if j < 5:
                blk = None
                for ii in range(i + 1, 6):
                    for jj in range(j + 1, 6):
                        t = F.col(f"n{ii}{jj}")
                        blk = t if blk is None else blk + t
                term = d38(f"n{i}{j}") * blk
                c_sum = term if c_sum is None else c_sum + term
            if j > 1:
                blk = None
                for ii in range(i + 1, 6):
                    for jj in range(1, j):
                        t = F.col(f"n{ii}{jj}")
                        blk = t if blk is None else blk + t
                term = d38(f"n{i}{j}") * blk
                d_sum = term if d_sum is None else d_sum + term
    sr2 = sk2 = None
    for i in range(1, 6):
        r = None
        for j in range(1, 6):
            t = F.col(f"n{i}{j}")
            r = t if r is None else r + t
        term = r.cast("decimal(38,0)") * r
        sr2 = term if sr2 is None else sr2 + term
    for j in range(1, 6):
        k = None
        for i in range(1, 6):
            t = F.col(f"n{i}{j}")
            k = t if k is None else k + t
        term = k.cast("decimal(38,0)") * k
        sk2 = term if sk2 is None else sk2 + term
    cd = piv.select(
        "nn",
        c_sum.alias("c"),
        d_sum.alias("d"),
        sr2.alias("sr2"),
        sk2.alias("sk2"),
    )
    nn38 = F.col("nn").cast("decimal(38,0)")
    num = 2 * (F.col("c") - F.col("d"))
    return cd.select(
        F.col("nn").alias("n_orders"),
        F.round(
            num.cast("double")
            / (nn38 * F.col("nn") - F.col("sr2")).cast("double"),
            6,
        ).alias("d_yx"),
        F.round(
            num.cast("double")
            / (nn38 * F.col("nn") - F.col("sk2")).cast("double"),
            6,
        ).alias("d_xy"),
        (F.col("c") > F.col("d")).alias("positive_association"),
    )


# A = Σ_k u_k·(2·Σ_(m<k) l_m + l_k) — the doubled mean-ridit
# numerator, expanded to a fixed literal sum
_RIDIT_A = " + ".join(
    f"CAST(u{k} AS HUGEINT) * ("
    + " + ".join(["0"] + [f"2 * l{m}" for m in range(1, k)])
    + f" + l{k})"
    for k in range(1, 6)
)


@register(
    "orders_ridit_analysis",
    f"""
    WITH base AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
               {_bucket_sql(
                   "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                   " AS BIGINT)"
               )} AS bk
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN smp = 2 AND bk = {k} THEN 1 END)"
                f" AS BIGINT) AS l{k},"
                f" CAST(count(CASE WHEN smp = 1 AND bk = {k} THEN 1 END)"
                f" AS BIGINT) AS u{k}"
                for k in range(1, 6)
            )}
        FROM base
    ),
    ab AS (
        SELECT CAST(l1 + l2 + l3 + l4 + l5 AS HUGEINT) AS lt,
               CAST(u1 + u2 + u3 + u4 + u5 AS HUGEINT) AS ut,
               {_RIDIT_A} AS a
        FROM piv
    )
    SELECT CAST(ut AS BIGINT) AS n_urgent,
           CAST(lt AS BIGINT) AS n_low,
           round(CAST(a AS DOUBLE) / CAST(2 * lt * ut AS DOUBLE), 6)
               AS mean_ridit,
           a > lt * ut AS urgent_stochastically_higher
    FROM ab
    """,
    tags=("orders", "stats"),
)
def orders_ridit_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bross's ridit analysis (1958): score each URGENT order by the
    ridit of its value bucket RELATIVE TO the LOW reference
    distribution — ridit(k) = F_LOW(k−1) + f_LOW(k)/2 — and report
    the mean ridit r̄ ∈ [0,1]: r̄ = 0.5 means URGENT values sit
    exactly where LOW's do; r̄ > 0.5 means stochastically higher
    (r̄ is P(U > L) + ½P(U = L) on the bucket ladder — the bucketed
    Mann-Whitney θ, but referenced to a NAMED baseline group, which
    is ridit's point). Buckets are the shared agg_hellinger ladder
    (stated knob: category ridits, not raw values). Everything is
    exact: A = Σ_k u_k·(2·Σ_(m<k)l_m + l_k) gives r̄ = A/(2·L·U) as
    one exact-input double division, and the verdict r̄ > ½ is the
    FULLY exact integer predicate A > L·U.

    Scale shape: ONE map-side-combinable reduce over the fact table
    to a 1-row 10-cell pivot."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    bk = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    base = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(2)
        .alias("smp"),
        bk.alias("bk"),
    )
    piv = base.agg(
        *[
            agg
            for k in range(1, 6)
            for agg in (
                F.count(
                    F.when(
                        (F.col("smp") == 2) & (F.col("bk") == k),
                        F.lit(1),
                    )
                )
                .cast("long")
                .alias(f"l{k}"),
                F.count(
                    F.when(
                        (F.col("smp") == 1) & (F.col("bk") == k),
                        F.lit(1),
                    )
                )
                .cast("long")
                .alias(f"u{k}"),
            )
        ]
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    lt = sum(F.col(f"l{k}") for k in range(2, 6)) + F.col("l1")
    ut = sum(F.col(f"u{k}") for k in range(2, 6)) + F.col("u1")
    a = None
    for k in range(1, 6):
        inner = F.lit(0)
        for m in range(1, k):
            inner = inner + 2 * F.col(f"l{m}")
        term = d38(f"u{k}") * (inner + F.col(f"l{k}"))
        a = term if a is None else a + term
    ab = piv.select(
        lt.cast("decimal(38,0)").alias("lt"),
        ut.cast("decimal(38,0)").alias("ut"),
        a.alias("a"),
    )
    return ab.select(
        F.col("ut").cast("long").alias("n_urgent"),
        F.col("lt").cast("long").alias("n_low"),
        F.round(
            F.col("a").cast("double")
            / (2 * F.col("lt") * F.col("ut")).cast("double"),
            6,
        ).alias("mean_ridit"),
        (F.col("a") > F.col("lt") * F.col("ut")).alias(
            "urgent_stochastically_higher"
        ),
    )


@register(
    "agg_gk_lambda",
    f"""
    WITH base AS (
        SELECT r.r_name AS rg, c.c_mktsegment AS sg
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN rg = '{r}' AND sg = '{s}'"
                f" THEN 1 END) AS BIGINT) AS c_{i}_{j}"
                for i, r in enumerate(_REGIONS)
                for j, s in enumerate(_SEGMENTS)
            )},
            CAST(count(*) AS BIGINT) AS nn
        FROM base
    ),
    mx AS (
        SELECT nn,
               {" + ".join(
                   f"greatest({', '.join(f'c_{i}_{j}' for j in range(5))})"
                   for i in range(5)
               )} AS sum_rowmax,
               {" + ".join(
                   f"greatest({', '.join(f'c_{i}_{j}' for i in range(5))})"
                   for j in range(5)
               )} AS sum_colmax,
               greatest({", ".join(
                   " + ".join(f"c_{i}_{j}" for i in range(5))
                   for j in range(5)
               )}) AS max_coltot,
               greatest({", ".join(
                   " + ".join(f"c_{i}_{j}" for j in range(5))
                   for i in range(5)
               )}) AS max_rowtot
        FROM piv
    )
    SELECT nn AS n_customers,
           round(CAST(sum_rowmax - max_coltot AS DOUBLE)
                 / (nn - max_coltot), 6) AS lambda_seg_given_region,
           round(CAST(sum_colmax - max_rowtot AS DOUBLE)
                 / (nn - max_rowtot), 6) AS lambda_region_given_seg,
           sum_rowmax > max_coltot AS region_predicts_segment
    FROM mx
    """,
    tags=("agg", "stats"),
)
def agg_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda (1954) on the region × market-segment
    table (the agg_g_test/agg_chi2_independence frame) — the
    proportional-reduction-in-error measure for NOMINAL association
    the χ²/G/Cramér's-V family can't give: λ_seg|region = (Σ_i
    max_j n_ij − max_j n_·j)/(N − max_j n_·j) is the fraction of
    prediction errors avoided by knowing the region (λ = 0: knowing
    the region never helps guess the segment; λ = 1: determines
    it). Both asymmetric lambdas ship; every max/sum is an exact
    integer over the 25-cell literal pivot (greatest() of literal
    columns — no sort), each λ one exact-input double division, and
    the verdict Σrow-max > max-col-total FULLY exact.

    Scale shape: the fact side reduces through two broadcast
    dimension joins to a 1-row 25-cell pivot — map-side-combinable,
    no window, no sort."""
    cst = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    base = (
        cst.join(
            F.broadcast(nat), cst["c_nationkey"] == nat["n_nationkey"]
        )
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select(
            F.col("r_name").alias("rg"),
            F.col("c_mktsegment").alias("sg"),
        )
    )
    piv = base.agg(
        *[
            F.count(
                F.when((F.col("rg") == r) & (F.col("sg") == s), F.lit(1))
            )
            .cast("long")
            .alias(f"c_{i}_{j}")
            for i, r in enumerate(_REGIONS)
            for j, s in enumerate(_SEGMENTS)
        ],
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    sum_rowmax = None
    for i in range(5):
        t = F.greatest(*[F.col(f"c_{i}_{j}") for j in range(5)])
        sum_rowmax = t if sum_rowmax is None else sum_rowmax + t
    sum_colmax = None
    for j in range(5):
        t = F.greatest(*[F.col(f"c_{i}_{j}") for i in range(5)])
        sum_colmax = t if sum_colmax is None else sum_colmax + t
    coltots = []
    for j in range(5):
        t = F.col(f"c_0_{j}")
        for i in range(1, 5):
            t = t + F.col(f"c_{i}_{j}")
        coltots.append(t)
    rowtots = []
    for i in range(5):
        t = F.col(f"c_{i}_0")
        for j in range(1, 5):
            t = t + F.col(f"c_{i}_{j}")
        rowtots.append(t)
    mx = piv.select(
        "nn",
        sum_rowmax.alias("sum_rowmax"),
        sum_colmax.alias("sum_colmax"),
        F.greatest(*coltots).alias("max_coltot"),
        F.greatest(*rowtots).alias("max_rowtot"),
    )
    nn = F.col("nn")
    return mx.select(
        nn.alias("n_customers"),
        F.round(
            (F.col("sum_rowmax") - F.col("max_coltot")).cast("double")
            / (nn - F.col("max_coltot")),
            6,
        ).alias("lambda_seg_given_region"),
        F.round(
            (F.col("sum_colmax") - F.col("max_rowtot")).cast("double")
            / (nn - F.col("max_rowtot")),
            6,
        ).alias("lambda_region_given_seg"),
        (F.col("sum_rowmax") > F.col("max_coltot")).alias(
            "region_predicts_segment"
        ),
    )
