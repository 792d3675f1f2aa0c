"""§2 extensions, ninety-first wave — likelihood-ratio independence,
post-hoc multiple comparison, and circular concentration classics
(published-method cadence).

- agg_g_test: Wilks' likelihood-ratio G-test of independence (1938)
  on the region × market-segment table — the LR twin of the
  Pearson agg_chi2_independence.
- agg_tukey_hsd: the Tukey(-Kramer) honestly-significant-difference
  post-hoc (1949/1956) — all 10 pairwise priority mean comparisons
  against the studentized-range yardstick.
- events_rayleigh_hours: the Rayleigh test (1919) of circular
  uniformity for event hour-of-day — the mean-resultant-length
  concentration test.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# χ²₁₆ 5% (G-test, 5×5 table); q(5, ∞, 0.05) = 3.858 enters as
# q²/2 = 7.442082 (Tukey-Kramer); −ln(0.05) (Rayleigh exp tail)
_CHI2_16_95 = "26.296228"
_Q5_SQ_HALF = "7.442082"
_RAYLEIGH_95 = "2.995732"

_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
_SEGMENTS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)
_PAIRS = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]

# cos/sin(2πh/24), h = 0..23, 15-decimal literals shared textually by
# both engines (the ts_schuster_weekly device — never a library cos)
_COS24 = [f"{math.cos(2 * math.pi * h / 24):.15f}" for h in range(24)]
_SIN24 = [f"{math.sin(2 * math.pi * h / 24):.15f}" for h in range(24)]


@register(
    "agg_g_test",
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
    marg AS (
        SELECT nn,
            {", ".join(
                f"CAST({' + '.join(f'c_{i}_{j}' for j in range(5))}"
                f" AS BIGINT) AS r{i}"
                for i in range(5)
            )},
            {", ".join(
                f"CAST({' + '.join(f'c_{i}_{j}' for i in range(5))}"
                f" AS BIGINT) AS k{j}"
                for j in range(5)
            )},
            {", ".join(
                f"c_{i}_{j}" for i in range(5) for j in range(5)
            )}
        FROM piv
    ),
    g AS (
        SELECT nn,
               2 * ({" + ".join(
                   f"CASE WHEN c_{i}_{j} > 0 THEN CAST(c_{i}_{j} AS DOUBLE)"
                   f" * ln(CAST(c_{i}_{j} AS DOUBLE) * nn"
                   f" / (CAST(r{i} AS DOUBLE) * k{j})) ELSE 0 END"
                   for i in range(5)
                   for j in range(5)
               )}) AS g_stat
        FROM marg
    )
    SELECT nn AS n_customers,
           round(g_stat, 4) AS g_stat,
           CAST(16 AS BIGINT) AS dof,
           g_stat > {_CHI2_16_95} AS dependent
    FROM g
    """,
    tags=("agg", "stats"),
)
def agg_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilks' likelihood-ratio G-test of independence (1938) on the
    region × market-segment contingency table — the LR twin of the
    Pearson agg_chi2_independence on the same frame (G = 2ΣO·ln(O/E)
    vs Σ(O−E)²/E; they agree asymptotically, diverge on sparse
    cells, and G is the one that adds across nested models —
    shipping both is the textbook pair). The 5×5 table PIVOTS to
    one row over the ten literal region/segment names, marginals
    assemble as exact integer sums, and G's 25 terms run in ONE
    fixed textual order of doubles with O·ln(O·N/(r·c)) per cell
    (empty cells contribute exactly 0 via the O > 0 guard — the
    0·ln0 → 0 convention). ln carries the wave-64 ~1-ulp library
    envelope; the χ²₁₆ verdict literal 26.296228 is shared
    textually.

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
    marg_cols = [F.col("nn")]
    for i in range(5):
        s = F.col(f"c_{i}_0")
        for j in range(1, 5):
            s = s + F.col(f"c_{i}_{j}")
        marg_cols.append(s.cast("long").alias(f"r{i}"))
    for j in range(5):
        s = F.col(f"c_0_{j}")
        for i in range(1, 5):
            s = s + F.col(f"c_{i}_{j}")
        marg_cols.append(s.cast("long").alias(f"k{j}"))
    marg_cols += [
        F.col(f"c_{i}_{j}") for i in range(5) for j in range(5)
    ]
    marg = piv.select(*marg_cols)
    nn = F.col("nn")
    gsum = None
    for i in range(5):
        for j in range(5):
            cij = F.col(f"c_{i}_{j}")
            term = F.when(
                cij > 0,
                cij.cast("double")
                * F.log(
                    cij.cast("double")
                    * nn
                    / (F.col(f"r{i}").cast("double") * F.col(f"k{j}"))
                ),
            ).otherwise(F.lit(0.0))
            gsum = term if gsum is None else gsum + term
    g = marg.select("nn", (2 * gsum).alias("g_stat"))
    return g.select(
        nn.alias("n_customers"),
        F.round(F.col("g_stat"), 4).alias("g_stat"),
        F.lit(16).cast("long").alias("dof"),
        (F.col("g_stat") > float(_CHI2_16_95)).alias("dependent"),
    )


def _hsd_pair_sql(i: int, j: int) -> str:
    """One Tukey-Kramer pair's (diff, sig) SQL expressions — textual
    twins of the Spark assembly below."""
    xb_i = f"CAST(sm{i} AS DOUBLE) / n{i}"
    xb_j = f"CAST(sm{j} AS DOUBLE) / n{j}"
    diff = f"{xb_i} - {xb_j}"
    yard = (
        f"{_Q5_SQ_HALF} * msw * (1.0 / n{i} + 1.0 / n{j})"
    )
    return (
        f"SELECT CAST({i} AS BIGINT) AS g1, CAST({j} AS BIGINT) AS g2, "
        f"round({diff}, 4) AS mean_diff_cents, "
        f"({diff}) * ({diff}) > {yard} AS significant FROM msw_t"
    )


@register(
    "agg_tukey_hsd",
    f"""
    WITH base AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    g AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sm,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
        FROM base GROUP BY s
    ),
    piv AS (
        SELECT
            {", ".join(
                f"max(CASE WHEN s = {i} THEN {m} END) AS {m}{i}"
                for i in range(1, 6)
                for m in ("n", "sm", "q")
            )}
        FROM g
    ),
    msw_t AS (
        SELECT *,
               ({" + ".join(
                   f"CAST(CAST(n{i} AS HUGEINT) * q{i}"
                   f" - CAST(sm{i} AS HUGEINT) * sm{i} AS DOUBLE) / n{i}"
                   for i in range(1, 6)
               )})
               / (n1 + n2 + n3 + n4 + n5 - 5) AS msw
        FROM piv
    )
    {" UNION ALL ".join(_hsd_pair_sql(i, j) for i, j in _PAIRS)}
    ORDER BY g1, g2
    """,
    tags=("agg", "stats"),
)
def agg_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's HSD post-hoc (1949), Kramer's unequal-n form (1956):
    after an omnibus ANOVA says the five priority means differ,
    WHICH pairs differ? All 10 pairwise |x̄_i − x̄_j| test against
    the studentized-range yardstick q(5,∞,.05)·√(MSW/2·(1/n_i +
    1/n_j)) — the whole-family error-rate answer that 10 naive
    t-tests get wrong (the rank-scale sibling of the existing
    agg_dunn_posthoc). From the exact five (n, S, Q)
    DECIMAL(38)/HUGEINT triples: MSW = Σ(n_iQ_i − S_i²)/n_i /
    (N−5) in ONE fixed textual order, and each pair's verdict
    (x̄_i − x̄_j)² > (q²/2)·MSW·(1/n_i + 1/n_j) evaluates the same
    double expression textually on both engines (q² /2 = 7.442082
    shared literal; ∞-df q — n_i ≈ N/5 ≫ 120, stated knob). The 10
    result rows unstack from the single pivot row (stack/UNION ALL
    of 10 literal pairs — bounded, no explode of data).

    Scale shape: ONE keyed reduce over the fact table to five
    triples, a 1-row pivot, a 10-row literal unstack."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("s"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sm"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("s") == i, F.col(m))).alias(f"{m}{i}")
            for i in range(1, 6)
            for m in ("n", "sm", "q")
        ]
    )
    ssw = None
    for i in range(1, 6):
        t = (
            F.col(f"n{i}").cast("decimal(38,0)") * F.col(f"q{i}")
            - F.col(f"sm{i}").cast("decimal(38,0)") * F.col(f"sm{i}")
        ).cast("double") / F.col(f"n{i}")
        ssw = t if ssw is None else ssw + t
    nn = sum(F.col(f"n{i}") for i in range(2, 6)) + F.col("n1")
    msw_t = piv.select("*", (ssw / (nn - 5)).alias("msw"))
    stack_args = []
    for i, j in _PAIRS:
        xb_i = f"CAST(sm{i} AS DOUBLE) / n{i}"
        xb_j = f"CAST(sm{j} AS DOUBLE) / n{j}"
        diff = f"{xb_i} - {xb_j}"
        yard = f"{_Q5_SQ_HALF} * msw * (1.0 / n{i} + 1.0 / n{j})"
        stack_args.append(
            f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), "
            f"round({diff}, 4), (({diff}) * ({diff}) > {yard})"
        )
    stacked = msw_t.selectExpr(
        f"stack({len(_PAIRS)}, {', '.join(stack_args)}) AS "
        "(g1, g2, mean_diff_cents, significant)"
    )
    return stacked.orderBy("g1", "g2")


@register(
    "events_rayleigh_hours",
    f"""
    WITH base AS (
        SELECT hour(ts) AS h FROM events
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN h = {h} THEN 1 END) AS BIGINT)"
                f" AS n{h}"
                for h in range(24)
            )},
            CAST(count(*) AS BIGINT) AS n
        FROM base
    ),
    cs AS (
        SELECT n,
               {" + ".join(
                   f"({_COS24[h]}) * n{h}" for h in range(24)
               )} AS c,
               {" + ".join(
                   f"({_SIN24[h]}) * n{h}" for h in range(24)
               )} AS s
        FROM piv
    )
    SELECT n AS n_events,
           round(sqrt(c * c + s * s) / n, 6) AS mean_resultant,
           round((c * c + s * s) / n, 4) AS z_stat,
           (c * c + s * s) > {_RAYLEIGH_95} * n AS hours_concentrated
    FROM cs
    """,
    tags=("events", "stats"),
)
def events_rayleigh_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh TEST (1919) of circular uniformity for event
    hour-of-day: z = n·R̄² with R̄ the mean resultant length of the
    24 hourly directions θ_h = 2πh/24 — where events_circular_mean
    reports the per-type mean direction and R̄ as ESTIMATES, this op
    supplies the pooled SIGNIFICANCE decision (is there a diurnal
    peak at all?), complementing the weekday EDF pair
    (Kuiper/Watson catch any departure; Rayleigh is most powerful
    against a single von Mises peak). The 24-cell
    hourly pivot gives exact integer counts; C = Σcos_h·n_h and
    S = Σsin_h·n_h are fixed-order 24-term dot products against
    15-decimal cos/sin LITERALS shared textually by both engines
    (the ts_schuster_weekly device — hour-bin left edges, stated
    knob), and the verdict z > −ln(0.05) = 2.995732 (the asymptotic
    exp(−z) tail) compares C² + S² > literal·n in the same-ordered
    doubles. hour(ts) agrees between engines on the µs-timestamp
    fixture.

    Scale shape: ONE map-side-combinable reduce over the event
    stream to a 1-row 24-cell pivot."""
    e = tbl(spark, sf_dir, "events")
    base = e.select(F.hour("ts").alias("h"))
    piv = base.agg(
        *[
            F.count(F.when(F.col("h") == h, F.lit(1)))
            .cast("long")
            .alias(f"n{h}")
            for h in range(24)
        ],
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    c = s = None
    for h in range(24):
        ct = float(_COS24[h]) * F.col(f"n{h}")
        st = float(_SIN24[h]) * F.col(f"n{h}")
        c = ct if c is None else c + ct
        s = st if s is None else s + st
    cs = piv.select("n", c.alias("c"), s.alias("s"))
    n, cc, ss = F.col("n"), F.col("c"), F.col("s")
    pwr = cc * cc + ss * ss
    return cs.select(
        n.alias("n_events"),
        F.round(F.sqrt(pwr) / n, 6).alias("mean_resultant"),
        F.round(pwr / n, 4).alias("z_stat"),
        (pwr > float(_RAYLEIGH_95) * n).alias("hours_concentrated"),
    )
