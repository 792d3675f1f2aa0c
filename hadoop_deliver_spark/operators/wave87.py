"""§2 extensions, eighty-seventh wave — dominance orderings and the
wage-gap decomposition.

- agg_stochastic_dominance: first-order stochastic dominance of the
  URGENT vs non-urgent order-value distributions on the shared cent
  bucket ladder — the welfare-economics ordering (Hadar & Russell
  1969) that ranks distributions when means alone cannot, FULLY
  exact by cross-multiplication.
- agg_lorenz_dominance: Lorenz-curve dominance on the same frame —
  Atkinson's (1970) theorem makes L_A ≥ L_B pointwise equivalent to
  "A is more equal under EVERY symmetric concave welfare function";
  FULLY exact with cent-value cumulants cross-multiplied.
- agg_oaxaca_blinder: the Oaxaca-Blinder (1973) twofold
  decomposition of the urgent-vs-rest mean price gap into the part
  EXPLAINED by order size (line-item count) and the unexplained
  coefficient part — the canonical group-gap accounting device,
  from exact per-group OLS moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

from hadoop_deliver_spark.operators.wave61 import _BUCKET_EDGES

_BUCKET_CELLS_SQL = f"""
    b AS (
        SELECT o_orderpriority = '1-URGENT' AS urg,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CASE
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[0]} THEN 1
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[1]} THEN 2
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[2]} THEN 3
                   WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) <= {_BUCKET_EDGES[3]} THEN 4
                   ELSE 5
               END AS bk
        FROM orders
    ),
    cells AS (
        SELECT bk,
               CAST(count(*) FILTER (urg) AS BIGINT) AS ca,
               CAST(count(*) FILTER (NOT urg) AS BIGINT) AS cb,
               CAST(sum(CASE WHEN urg THEN cents ELSE 0 END) AS BIGINT)
                   AS va,
               CAST(sum(CASE WHEN NOT urg THEN cents ELSE 0 END)
                    AS BIGINT) AS vb
        FROM b GROUP BY bk
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(coalesce(sum(CASE WHEN bk <= {k} THEN {m} END), 0)"
                f" AS BIGINT) AS {m}{k}"
                for k in range(1, 6)
                for m in ("ca", "cb", "va", "vb")
            )}
        FROM cells
    )
"""


@register(
    "agg_stochastic_dominance",
    f"""
    WITH {_BUCKET_CELLS_SQL}
    SELECT ca5 AS n_urgent, cb5 AS n_rest,
           {", ".join(
               f"round(CAST(ca{k} AS DOUBLE) / ca5, 6) AS f_urgent_{k}, "
               f"round(CAST(cb{k} AS DOUBLE) / cb5, 6) AS f_rest_{k}"
               for k in range(1, 5)
           )},
           {" AND ".join(
               f"CAST(ca{k} AS HUGEINT) * cb5 <= CAST(cb{k} AS HUGEINT)"
               f" * ca5"
               for k in range(1, 5)
           )} AND ({" OR ".join(
               f"CAST(ca{k} AS HUGEINT) * cb5 < CAST(cb{k} AS HUGEINT)"
               f" * ca5"
               for k in range(1, 5)
           )}) AS urgent_fosd_rest,
           {" AND ".join(
               f"CAST(cb{k} AS HUGEINT) * ca5 <= CAST(ca{k} AS HUGEINT)"
               f" * cb5"
               for k in range(1, 5)
           )} AND ({" OR ".join(
               f"CAST(cb{k} AS HUGEINT) * ca5 < CAST(ca{k} AS HUGEINT)"
               f" * cb5"
               for k in range(1, 5)
           )}) AS rest_fosd_urgent
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_stochastic_dominance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order stochastic dominance (Hadar & Russell 1969) of
    URGENT over non-urgent order values on the shared 5-bucket cent
    ladder (the agg_hellinger_distance / agg_gk_gamma grid): URGENT
    FOSD rest ⇔ F_urgent(k) ≤ F_rest(k) at every interior grid point
    with at least one strict — every expected utility ranks URGENT
    higher, the ordering that means/medians alone cannot certify.
    Both CDFs are exact integer cumulants, so the ENTIRE dominance
    decision is cross-multiplied into pure-integer comparisons
    cum_a·n_b ≤ cum_b·n_a (DECIMAL(38)/HUGEINT; ties excluded by
    the ∃-strict clause) — no double anywhere in either verdict;
    the four interior CDF pairs display as single divisions.

    Scale shape: one keyed reduce to 5×4 cells, a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    bk = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    b = o.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        cents.alias("cents"),
        bk.alias("bk"),
    )
    cells = b.groupBy("bk").agg(
        F.count_if(F.col("urg")).cast("long").alias("ca"),
        F.count_if(~F.col("urg")).cast("long").alias("cb"),
        F.sum(F.when(F.col("urg"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("va"),
        F.sum(F.when(~F.col("urg"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("vb"),
    )
    piv = cells.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bk") <= k, F.col(m))), F.lit(0)
            )
            .cast("long")
            .alias(f"{m}{k}")
            for k in range(1, 6)
            for m in ("ca", "cb", "va", "vb")
        ]
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a_le = [
        d38(f"ca{k}") * F.col("cb5") <= d38(f"cb{k}") * F.col("ca5")
        for k in range(1, 5)
    ]
    a_lt = [
        d38(f"ca{k}") * F.col("cb5") < d38(f"cb{k}") * F.col("ca5")
        for k in range(1, 5)
    ]
    b_le = [
        d38(f"cb{k}") * F.col("ca5") <= d38(f"ca{k}") * F.col("cb5")
        for k in range(1, 5)
    ]
    b_lt = [
        d38(f"cb{k}") * F.col("ca5") < d38(f"ca{k}") * F.col("cb5")
        for k in range(1, 5)
    ]

    def _all(xs):
        out = xs[0]
        for x in xs[1:]:
            out = out & x
        return out

    def _any(xs):
        out = xs[0]
        for x in xs[1:]:
            out = out | x
        return out

    cols = [
        F.col("ca5").alias("n_urgent"),
        F.col("cb5").alias("n_rest"),
    ]
    for k in range(1, 5):
        cols.append(
            F.round(F.col(f"ca{k}").cast("double") / F.col("ca5"), 6).alias(
                f"f_urgent_{k}"
            )
        )
        cols.append(
            F.round(F.col(f"cb{k}").cast("double") / F.col("cb5"), 6).alias(
                f"f_rest_{k}"
            )
        )
    cols.append((_all(a_le) & _any(a_lt)).alias("urgent_fosd_rest"))
    cols.append((_all(b_le) & _any(b_lt)).alias("rest_fosd_urgent"))
    return piv.select(*cols)


@register(
    "agg_lorenz_dominance",
    f"""
    WITH {_BUCKET_CELLS_SQL}
    SELECT ca5 AS n_urgent, cb5 AS n_rest,
           {", ".join(
               f"round(CAST(va{k} AS DOUBLE) / va5, 6) AS l_urgent_{k}, "
               f"round(CAST(vb{k} AS DOUBLE) / vb5, 6) AS l_rest_{k}"
               for k in range(1, 5)
           )},
           {" AND ".join(
               f"CAST(va{k} AS HUGEINT) * vb5 >= CAST(vb{k} AS HUGEINT)"
               f" * va5"
               for k in range(1, 5)
           )} AND ({" OR ".join(
               f"CAST(va{k} AS HUGEINT) * vb5 > CAST(vb{k} AS HUGEINT)"
               f" * va5"
               for k in range(1, 5)
           )}) AS urgent_lorenz_dominates,
           {" AND ".join(
               f"CAST(vb{k} AS HUGEINT) * va5 >= CAST(va{k} AS HUGEINT)"
               f" * vb5"
               for k in range(1, 5)
           )} AND ({" OR ".join(
               f"CAST(vb{k} AS HUGEINT) * va5 > CAST(va{k} AS HUGEINT)"
               f" * vb5"
               for k in range(1, 5)
           )}) AS rest_lorenz_dominates
    FROM piv
    """,
    tags=("agg", "stats"),
)
def agg_lorenz_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve dominance between the URGENT and non-urgent
    order-value distributions at the shared bucket grid: by
    Atkinson's (1970) theorem, L_A(k) ≥ L_B(k) at every grid point
    means EVERY symmetric concave social-welfare function calls A
    the more equal distribution — the inequality ordering that a
    single Gini number flattens away (two crossing Lorenz curves can
    share a Gini; dominance is the honest partial order, and both
    verdicts here false = curves cross). Value cumulants are exact
    cent integers, so both dominance verdicts cross-multiply into
    pure-integer comparisons cumval_a·tot_b ≥ cumval_b·tot_a
    (DECIMAL(38)/HUGEINT — cents·cents ~ 10²⁶ at sf100, safe); the
    four interior Lorenz ordinates per group display as single
    divisions. Value-share (not population-share) abscissae would
    need the generalized curve — this is the classical same-grid
    form, stated knob.

    Scale shape: identical to agg_stochastic_dominance — one keyed
    reduce to 5×4 cells, a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    bk = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    b = o.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        cents.alias("cents"),
        bk.alias("bk"),
    )
    cells = b.groupBy("bk").agg(
        F.count_if(F.col("urg")).cast("long").alias("ca"),
        F.count_if(~F.col("urg")).cast("long").alias("cb"),
        F.sum(F.when(F.col("urg"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("va"),
        F.sum(F.when(~F.col("urg"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("vb"),
    )
    piv = cells.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bk") <= k, F.col(m))), F.lit(0)
            )
            .cast("long")
            .alias(f"{m}{k}")
            for k in range(1, 6)
            for m in ("ca", "cb", "va", "vb")
        ]
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a_ge = [
        d38(f"va{k}") * F.col("vb5") >= d38(f"vb{k}") * F.col("va5")
        for k in range(1, 5)
    ]
    a_gt = [
        d38(f"va{k}") * F.col("vb5") > d38(f"vb{k}") * F.col("va5")
        for k in range(1, 5)
    ]
    b_ge = [
        d38(f"vb{k}") * F.col("va5") >= d38(f"va{k}") * F.col("vb5")
        for k in range(1, 5)
    ]
    b_gt = [
        d38(f"vb{k}") * F.col("va5") > d38(f"va{k}") * F.col("vb5")
        for k in range(1, 5)
    ]

    def _all(xs):
        out = xs[0]
        for x in xs[1:]:
            out = out & x
        return out

    def _any(xs):
        out = xs[0]
        for x in xs[1:]:
            out = out | x
        return out

    cols = [
        F.col("ca5").alias("n_urgent"),
        F.col("cb5").alias("n_rest"),
    ]
    for k in range(1, 5):
        cols.append(
            F.round(F.col(f"va{k}").cast("double") / F.col("va5"), 6).alias(
                f"l_urgent_{k}"
            )
        )
        cols.append(
            F.round(F.col(f"vb{k}").cast("double") / F.col("vb5"), 6).alias(
                f"l_rest_{k}"
            )
        )
    cols.append((_all(a_ge) & _any(a_gt)).alias("urgent_lorenz_dominates"))
    cols.append((_all(b_ge) & _any(b_gt)).alias("rest_lorenz_dominates"))
    return piv.select(*cols)


@register(
    "agg_oaxaca_blinder",
    """
    WITH lc AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ),
    base AS (
        SELECT o.o_orderpriority = '1-URGENT' AS urg,
               lc.x,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
        FROM orders o JOIN lc ON lc.l_orderkey = o.o_orderkey
    ),
    g AS (
        SELECT urg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM base GROUP BY urg
    ),
    piv AS (
        SELECT
            max(CASE WHEN urg THEN n END) AS na,
            max(CASE WHEN urg THEN sx END) AS sxa,
            max(CASE WHEN urg THEN sy END) AS sya,
            max(CASE WHEN urg THEN sxx END) AS sxxa,
            max(CASE WHEN urg THEN sxy END) AS sxya,
            max(CASE WHEN NOT urg THEN n END) AS nb,
            max(CASE WHEN NOT urg THEN sx END) AS sxb,
            max(CASE WHEN NOT urg THEN sy END) AS syb,
            max(CASE WHEN NOT urg THEN sxx END) AS sxxb,
            max(CASE WHEN NOT urg THEN sxy END) AS sxyb
        FROM g
    ),
    coef AS (
        SELECT na, nb,
               CAST(sya AS DOUBLE) / na AS ybara,
               CAST(syb AS DOUBLE) / nb AS ybarb,
               CAST(sxa AS DOUBLE) / na AS xbara,
               CAST(sxb AS DOUBLE) / nb AS xbarb,
               CAST(CAST(na AS HUGEINT) * sxya
                    - CAST(sxa AS HUGEINT) * sya AS DOUBLE)
                   / CAST(CAST(na AS HUGEINT) * sxxa
                          - CAST(sxa AS HUGEINT) * sxa AS DOUBLE) AS ba,
               CAST(CAST(nb AS HUGEINT) * sxyb
                    - CAST(sxb AS HUGEINT) * syb AS DOUBLE)
                   / CAST(CAST(nb AS HUGEINT) * sxxb
                          - CAST(sxb AS HUGEINT) * sxb AS DOUBLE) AS bb
        FROM piv
    )
    SELECT na AS n_urgent, nb AS n_rest,
           round(ybara - ybarb, 4) AS gap_cents,
           round(bb * (xbara - xbarb), 4) AS explained_cents,
           round((ybara - ybarb) - bb * (xbara - xbarb), 4)
               AS unexplained_cents,
           round(bb * (xbara - xbarb) / (ybara - ybarb), 6)
               AS explained_share,
           abs(bb * (xbara - xbarb))
               > abs((ybara - ybarb) - bb * (xbara - xbarb))
               AS mostly_explained
    FROM coef
    """,
    tags=("agg", "stats"),
)
def agg_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder twofold decomposition (1973) of the
    urgent-vs-rest mean order-price gap, with line-item count as the
    endowment: fit y = a + b·x by OLS within each group from EXACT
    integer moments (n, Σx, Σy, Σx², Σxy — the n-scaled centered
    slope b = S_xy/S_xx assembles in ONE fixed textual order, the
    agg_oneway_anova device), then split the raw gap ȳ_A − ȳ_B into
    the part EXPLAINED by composition, b_B·(x̄_A − x̄_B) (urgent
    orders carry different basket sizes priced at the baseline
    group's rate — the reference-group convention, stated knob), and
    the unexplained coefficient residual — the canonical group-gap
    accounting of labor economics, here answering "does urgency
    carry a price premium beyond basket size?". All displays and the
    mostly_explained verdict compare fixed-order doubles built from
    exact integers — bit-identical on both engines.

    Scale shape: one keyed reduce per order (line counts), one fact
    join, one 2-group moment reduce, a 1-row pivot."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    lc = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    base = o.join(lc, o.o_orderkey == lc.l_orderkey).select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        "x",
        (dec2("o_totalprice") * 100).cast("long").alias("y"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = base.groupBy("urg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38("x") * F.col("x")).alias("sxx"),
        F.sum(d38("x") * F.col("y")).alias("sxy"),
    )
    piv = g.agg(
        *[
            F.max(
                F.when(F.col("urg") == flag, F.col(m))
            ).alias(f"{m}{suf}")
            for flag, suf in ((True, "a"), (False, "b"))
            for m in ("n", "sx", "sy", "sxx", "sxy")
        ]
    )

    def slope(suf: str):
        n, sx, sy = F.col(f"n{suf}"), F.col(f"sx{suf}"), F.col(f"sy{suf}")
        sxx, sxy = F.col(f"sxx{suf}"), F.col(f"sxy{suf}")
        return (
            (n.cast("decimal(38,0)") * sxy - sx.cast("decimal(38,0)") * sy)
            .cast("double")
            / (
                n.cast("decimal(38,0)") * sxx
                - sx.cast("decimal(38,0)") * sx
            ).cast("double")
        )

    coef = piv.select(
        F.col("na"),
        F.col("nb"),
        (F.col("sya").cast("double") / F.col("na")).alias("ybara"),
        (F.col("syb").cast("double") / F.col("nb")).alias("ybarb"),
        (F.col("sxa").cast("double") / F.col("na")).alias("xbara"),
        (F.col("sxb").cast("double") / F.col("nb")).alias("xbarb"),
        slope("a").alias("ba"),
        slope("b").alias("bb"),
    )
    gap = F.col("ybara") - F.col("ybarb")
    expl = F.col("bb") * (F.col("xbara") - F.col("xbarb"))
    return coef.select(
        F.col("na").alias("n_urgent"),
        F.col("nb").alias("n_rest"),
        F.round(gap, 4).alias("gap_cents"),
        F.round(expl, 4).alias("explained_cents"),
        F.round(gap - expl, 4).alias("unexplained_cents"),
        F.round(expl / gap, 6).alias("explained_share"),
        (F.abs(expl) > F.abs(gap - expl)).alias("mostly_explained"),
    )
