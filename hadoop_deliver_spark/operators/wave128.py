"""§2 extensions, hundred-twenty-eighth wave — panel econometrics
and multivariate dynamics.

- orders_twoway_fe: two-way fixed-effects (within) estimator on the
  nation × month revenue panel — the workhorse panel regression
  (unit + time effects swept out by double demeaning); completes
  the causal family (events_did is its 2×2 special case).
- ts_var1_fit: first-order vector autoregression of the click and
  purchase daily series — the 2×2 coefficient matrix by per-equation
  OLS, cross-series spillovers, and the closed-form spectral radius
  stability verdict; the ESTIMATION twin of ts_granger_1lag's test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "orders_twoway_fe",
    """
    WITH cell AS (
        SELECT c.c_nationkey AS nation,
               CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
                   + CAST(strftime(o.o_orderdate, '%m') AS BIGINT) AS mo,
               CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS DOUBLE) / count(*) AS y,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                    ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    mn AS (
        SELECT nation, avg(y) AS yn, avg(x) AS xn FROM cell GROUP BY 1
    ),
    mm AS (SELECT mo, avg(y) AS ym, avg(x) AS xm FROM cell GROUP BY 1),
    mg AS (
        SELECT avg(y) AS yg, avg(x) AS xg,
               CAST(count(*) AS BIGINT) AS n_cells FROM cell
    ),
    w AS (
        SELECT c.y - n.yn - m.ym + g.yg AS yt,
               c.x - n.xn - m.xm + g.xg AS xt,
               g.n_cells
        FROM cell c
        JOIN mn n ON c.nation = n.nation
        JOIN mm m ON c.mo = m.mo
        CROSS JOIN mg g
    ),
    fit AS (
        SELECT max(n_cells) AS n_cells,
               sum(xt * yt) / sum(xt * xt) AS beta,
               sum(xt * xt) AS sxx,
               sum(yt * yt) AS syy
        FROM w
    )
    SELECT n_cells,
           round(beta / 100, 6) AS beta_fe,
           round(sqrt((syy - beta * beta * sxx)
                      / (n_cells - 1) / sxx) / 100, 6) AS se_fe,
           round(beta / sqrt((syy - beta * beta * sxx)
                             / (n_cells - 1) / sxx), 4) AS t_fe,
           round(beta * beta * sxx / syy, 6) AS within_r2
    FROM fit
    """,
    tags=("orders", "stats"),
)
def orders_twoway_fe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects (within) estimator on the nation × month
    panel: does a cell's high-priority order share move its mean
    order value once nation effects and month effects are swept out?
    Double demeaning ỹ = y − ȳ_nation − ȳ_month + ȳ (the standard
    within transform; events_did is the 2×2 special case), then
    β̂ = Σx̃ỹ/Σx̃² with the homoskedastic SE on n_cells − 1 df (the
    swept-effect df correction is deliberately simplified and pinned
    identically on both sides). Cell means are exact-integer-sum /
    count divisions; the demeaning chain is the identical float
    algebra on both engines.

    Scale shape: one join + keyed reduce to ≤25·months cells, three
    mean reduces broadcast back, one 4-sum reduce."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("long").alias("mo"),
        )
        .agg(
            (
                F.sum((dec2("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("y"),
            (
                F.sum(
                    F.when(
                        F.col("o_orderpriority").isin(
                            "1-URGENT", "2-HIGH"
                        ),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("x"),
        )
    )
    mn = cell.groupBy("nation").agg(
        F.avg("y").alias("yn"), F.avg("x").alias("xn")
    )
    mm = cell.groupBy("mo").agg(
        F.avg("y").alias("ym"), F.avg("x").alias("xm")
    )
    mg = cell.agg(
        F.avg("y").alias("yg"),
        F.avg("x").alias("xg"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    w = (
        cell.join(F.broadcast(mn), "nation")
        .join(F.broadcast(mm), "mo")
        .crossJoin(F.broadcast(mg))
        .select(
            (
                F.col("y") - F.col("yn") - F.col("ym") + F.col("yg")
            ).alias("yt"),
            (
                F.col("x") - F.col("xn") - F.col("xm") + F.col("xg")
            ).alias("xt"),
            "n_cells",
        )
    )
    fit = w.agg(
        F.max("n_cells").alias("n_cells"),
        (
            F.sum(F.col("xt") * F.col("yt"))
            / F.sum(F.col("xt") * F.col("xt"))
        ).alias("beta"),
        F.sum(F.col("xt") * F.col("xt")).alias("sxx"),
        F.sum(F.col("yt") * F.col("yt")).alias("syy"),
    )
    se = F.sqrt(
        (F.col("syy") - F.col("beta") * F.col("beta") * F.col("sxx"))
        / (F.col("n_cells") - 1)
        / F.col("sxx")
    )
    return fit.select(
        "n_cells",
        F.round(F.col("beta") / 100, 6).alias("beta_fe"),
        F.round(se / 100, 6).alias("se_fe"),
        F.round(F.col("beta") / se, 4).alias("t_fe"),
        F.round(
            F.col("beta") * F.col("beta") * F.col("sxx") / F.col("syy"), 6
        ).alias("within_r2"),
    )


_VAR_DAILY_SQL = """
    dx AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS xc
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    dy AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS yc
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    jd AS (
        SELECT datediff('day', DATE '1990-01-01', dx.day) AS dn,
               CAST(dx.xc AS DOUBLE) / 100 AS x,
               CAST(dy.yc AS DOUBLE) / 100 AS y
        FROM dx JOIN dy ON dx.day = dy.day
    ),
    pairs AS (
        SELECT t.x AS xt, t.y AS yt, p.x AS xp, p.y AS yp
        FROM jd t JOIN jd p ON t.dn = p.dn + 1
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               avg(xp) AS mxp, avg(yp) AS myp,
               avg(xt) AS mxt, avg(yt) AS myt,
               sum(xp * xp) AS sxx, sum(yp * yp) AS syy,
               sum(xp * yp) AS sxy,
               sum(xp * xt) AS sx_xt, sum(yp * xt) AS sy_xt,
               sum(xp * yt) AS sx_yt, sum(yp * yt) AS sy_yt
        FROM pairs
    ),
    cent AS (
        SELECT m,
               sxx - m * mxp * mxp AS cxx,
               syy - m * myp * myp AS cyy,
               sxy - m * mxp * myp AS cxy,
               sx_xt - m * mxp * mxt AS cx_xt,
               sy_xt - m * myp * mxt AS cy_xt,
               sx_yt - m * mxp * myt AS cx_yt,
               sy_yt - m * myp * myt AS cy_yt
        FROM mom
    ),
    coef AS (
        SELECT m,
               (cx_xt * cyy - cy_xt * cxy) / (cxx * cyy - cxy * cxy) AS a11,
               (cy_xt * cxx - cx_xt * cxy) / (cxx * cyy - cxy * cxy) AS a12,
               (cx_yt * cyy - cy_yt * cxy) / (cxx * cyy - cxy * cxy) AS a21,
               (cy_yt * cxx - cx_yt * cxy) / (cxx * cyy - cxy * cxy) AS a22
        FROM cent
    )
    """


@register(
    "ts_var1_fit",
    f"""
    WITH {_VAR_DAILY_SQL}
    SELECT m AS n_pairs,
           round(a11, 6) AS a_click_click,
           round(a12, 6) AS a_purchase_click,
           round(a21, 6) AS a_click_purchase,
           round(a22, 6) AS a_purchase_purchase,
           round(sqrt(greatest(
               pow(abs((a11 + a22) / 2), 2)
                   + abs(pow((a11 - a22) / 2, 2) + a12 * a21),
               0.0)), 6) AS spectral_radius_bound,
           round(CASE WHEN pow(a11 - a22, 2) + 4 * a12 * a21 >= 0
                 THEN greatest(
                     abs((a11 + a22
                          + sqrt(pow(a11 - a22, 2) + 4 * a12 * a21)) / 2),
                     abs((a11 + a22
                          - sqrt(pow(a11 - a22, 2) + 4 * a12 * a21)) / 2))
                 ELSE sqrt(a11 * a22 - a12 * a21) END, 6)
               AS spectral_radius,
           round(CASE WHEN pow(a11 - a22, 2) + 4 * a12 * a21 >= 0
                 THEN greatest(
                     abs((a11 + a22
                          + sqrt(pow(a11 - a22, 2) + 4 * a12 * a21)) / 2),
                     abs((a11 + a22
                          - sqrt(pow(a11 - a22, 2) + 4 * a12 * a21)) / 2))
                 ELSE sqrt(a11 * a22 - a12 * a21) END, 6) < 1.0 AS stable
    FROM coef
    """,
    tags=("timeseries", "stats"),
)
def ts_var1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAR(1) fit of the (click, purchase) daily dollar series:
    [x_t, y_t]' = A·[x_{t−1}, y_{t−1}]' + c + ε, estimated by
    per-equation OLS on centered moments (each equation is a
    2-predictor regression solved by the 2×2 adjugate — the
    agg_ridge_closed_form device at λ = 0). Off-diagonal a₁₂/a₂₁
    are the cross-series spillovers ts_granger_1lag tests for; the
    stability verdict is the closed-form spectral radius of A —
    real-eigenvalue branch max|((a₁₁+a₂₂) ± √Δ)/2|, complex branch
    √det — compared to 1 on the ROUNDED value. Day pairs come from
    the dn ↔ dn+1 equi-join (consecutive calendar days on both
    series, no global lag window); the per-day dollar values are
    exact-integer-cents divisions.

    Scale shape: two daily reduces, one day equi-join + one lag
    equi-join, one 11-sum reduce, closed-form scalars."""
    e = tbl(spark, sf_dir, "events")

    def daily(et: str, col: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.sum((dec2("value") * 100).cast("long"))
                .cast("long")
                .alias(col)
            )
        )

    jd = (
        daily("click", "xc")
        .join(daily("purchase", "yc"), "day")
        .select(
            F.datediff("day", F.lit("1990-01-01")).alias("dn"),
            (F.col("xc").cast("double") / 100).alias("x"),
            (F.col("yc").cast("double") / 100).alias("y"),
        )
    )
    prev = jd.select(
        (F.col("dn") + 1).alias("dn"),
        F.col("x").alias("xp"),
        F.col("y").alias("yp"),
    )
    pairs = jd.join(prev, "dn").select(
        F.col("x").alias("xt"), F.col("y").alias("yt"), "xp", "yp"
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg("xp").alias("mxp"),
        F.avg("yp").alias("myp"),
        F.avg("xt").alias("mxt"),
        F.avg("yt").alias("myt"),
        F.sum(F.col("xp") * F.col("xp")).alias("sxx"),
        F.sum(F.col("yp") * F.col("yp")).alias("syy"),
        F.sum(F.col("xp") * F.col("yp")).alias("sxy"),
        F.sum(F.col("xp") * F.col("xt")).alias("sx_xt"),
        F.sum(F.col("yp") * F.col("xt")).alias("sy_xt"),
        F.sum(F.col("xp") * F.col("yt")).alias("sx_yt"),
        F.sum(F.col("yp") * F.col("yt")).alias("sy_yt"),
    )
    m = F.col("m")
    cxx = F.col("sxx") - m * F.col("mxp") * F.col("mxp")
    cyy = F.col("syy") - m * F.col("myp") * F.col("myp")
    cxy = F.col("sxy") - m * F.col("mxp") * F.col("myp")
    cx_xt = F.col("sx_xt") - m * F.col("mxp") * F.col("mxt")
    cy_xt = F.col("sy_xt") - m * F.col("myp") * F.col("mxt")
    cx_yt = F.col("sx_yt") - m * F.col("mxp") * F.col("myt")
    cy_yt = F.col("sy_yt") - m * F.col("myp") * F.col("myt")
    det = cxx * cyy - cxy * cxy
    a11 = (cx_xt * cyy - cy_xt * cxy) / det
    a12 = (cy_xt * cxx - cx_xt * cxy) / det
    a21 = (cx_yt * cyy - cy_yt * cxy) / det
    a22 = (cy_yt * cxx - cx_yt * cxy) / det
    coef = mom.select(
        m.alias("n_pairs"),
        a11.alias("a11"),
        a12.alias("a12"),
        a21.alias("a21"),
        a22.alias("a22"),
    )
    disc = (
        F.pow(F.col("a11") - F.col("a22"), F.lit(2))
        + 4 * F.col("a12") * F.col("a21")
    )
    tr2 = (F.col("a11") + F.col("a22")) / 2
    real_rho = F.greatest(
        F.abs(tr2 + F.sqrt(disc) / 2), F.abs(tr2 - F.sqrt(disc) / 2)
    )
    cplx_rho = F.sqrt(
        F.col("a11") * F.col("a22") - F.col("a12") * F.col("a21")
    )
    rho = F.round(F.when(disc >= 0, real_rho).otherwise(cplx_rho), 6)
    bound = F.round(
        F.sqrt(
            F.greatest(
                F.pow(F.abs(tr2), F.lit(2))
                + F.abs(
                    F.pow((F.col("a11") - F.col("a22")) / 2, F.lit(2))
                    + F.col("a12") * F.col("a21")
                ),
                F.lit(0.0),
            )
        ),
        6,
    )
    return coef.select(
        "n_pairs",
        F.round(F.col("a11"), 6).alias("a_click_click"),
        F.round(F.col("a12"), 6).alias("a_purchase_click"),
        F.round(F.col("a21"), 6).alias("a_click_purchase"),
        F.round(F.col("a22"), 6).alias("a_purchase_purchase"),
        bound.alias("spectral_radius_bound"),
        rho.alias("spectral_radius"),
        (rho < 1.0).alias("stable"),
    )
