"""§2 extensions, hundred-sixty-second wave — method-comparison
regression and community quality.

- ts_passing_bablok: Passing–Bablok (1983) robust method-comparison
  regression between the order-header daily revenue and the
  line-recomputed daily revenue — the clinical-chemistry standard
  that assumes error in BOTH variables and resists outliers, the
  nonparametric sibling of agg_deming_regression and the
  regression-flavored complement of agg_bland_altman.
- graph_conductance: per-community conductance φ = cut/min(vol,
  2m−vol) of the SAME communities graph_label_propagation reports
  (shared lpa_sym_and_labels core) — the quality number that says
  whether a detected community is actually separated from the rest
  of the graph (graph_modularity scores the partition globally;
  conductance localizes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.operators.wave69 import (
    _LPA_KEY,
    _LPA_PREFIX,
    _LPA_ROUNDS,
    _LPA_STAGE,
    lpa_sym_and_labels,
)
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl




def _pb_slope_distributed(spark: SparkSession, d: DataFrame) -> DataFrame:
    """Past-gate distributed Passing–Bablok slope: the spread pairwise
    NLJ + block-ranked offset-rank selection (the pre-r12 in-cluster
    formulation, kept verbatim as the fallback for histories past the
    bounded-driver gate)."""
    from hadoop_deliver_spark import api

    a = api.spread_bounded(

        d.select(
            F.col("dn").alias("i"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
        )
    )
    b2 = d.select(
        F.col("dn").alias("j"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    sexpr = (F.col("yb") - F.col("ya")).cast("double") / (
        F.col("xb") - F.col("xa")
    )
    sl = (
        a.join(F.broadcast(b2), F.col("i") < F.col("j"))
        .filter(F.col("xa") != F.col("xb"))
        .select(
            sexpr.alias("s"),
            (F.col("i") * 100000 + F.col("j")).alias("key"),
        )
        .filter(F.col("s") != -1.0)
        # evaluate the O(days²) pair table ONCE: the count reduce, the
        # block-ranked splits, and the three rank probes all reuse this
        # materialization (the ts_qn_scale checkpoint device) instead
        # of re-running the pairwise join per consumer
        .localCheckpoint()
    )
    cnt = sl.agg(
        F.count(F.lit(1)).cast("long").alias("nsl"),
        F.sum(F.when(F.col("s") < -1.0, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    rk = api.exact_global_rank(sl, "s", "key", "r")
    j = rk.crossJoin(F.broadcast(cnt))
    lo_r = F.expr("nsl div 2") + F.col("k")
    hi_r = F.expr("nsl div 2") + 1 + F.col("k")
    odd_r = F.expr("(nsl + 1) div 2") + F.col("k")
    s_at = lambda r: F.max(F.when(F.col("r") == r, F.col("s")))  # noqa: E731
    b = j.groupBy("nsl", "k").agg(
        F.when(F.col("nsl") % 2 == 1, s_at(odd_r))
        .otherwise(
            F.when(
                s_at(lo_r) * s_at(hi_r) > 0,
                F.signum(s_at(lo_r)) * F.sqrt(s_at(lo_r) * s_at(hi_r)),
            ).otherwise((s_at(lo_r) + s_at(hi_r)) / 2)
        )
        .alias("slope")
    )
    # 1-row slope frame: checkpoint so the intercept stage's rank scan
    # and final reduce do not re-run the 2.9M-row slope ranking
    b = b.localCheckpoint()
    return b


@register(
    "ts_passing_bablok",
    """
    WITH ox AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    oy AS (
        SELECT CAST(o.o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ),
    d AS (
        SELECT datediff('day', DATE '1990-01-01', ox.day) AS dn,
               ox.x, oy.y
        FROM ox JOIN oy ON oy.day = ox.day
    ),
    sl AS (
        SELECT (CAST(b.y - a.y AS DOUBLE)) / (b.x - a.x) AS s,
               a.dn * 100000 + b.dn AS key
        FROM d a JOIN d b ON a.dn < b.dn
        WHERE a.x <> b.x
          AND (CAST(b.y - a.y AS DOUBLE)) / (b.x - a.x) <> -1.0
    ),
    cnt AS (
        SELECT CAST(count(*) AS BIGINT) AS nsl,
               CAST(count(*) FILTER (s < -1.0) AS BIGINT) AS k
        FROM sl
    ),
    rk AS (
        SELECT s, row_number() OVER (ORDER BY s, key) AS r FROM sl
    ),
    b AS (
        SELECT cnt.nsl, cnt.k,
               CASE WHEN cnt.nsl % 2 = 1
                    THEN max(CASE WHEN rk.r = (cnt.nsl + 1) // 2 + cnt.k
                                  THEN rk.s END)
                    ELSE
                      CASE WHEN max(CASE WHEN rk.r = cnt.nsl // 2 + cnt.k
                                         THEN rk.s END)
                             * max(CASE WHEN rk.r = cnt.nsl // 2 + 1 + cnt.k
                                        THEN rk.s END) > 0
                           THEN sign(max(CASE WHEN rk.r = cnt.nsl // 2
                                              + cnt.k THEN rk.s END))
                                * sqrt(max(CASE WHEN rk.r = cnt.nsl // 2
                                                + cnt.k THEN rk.s END)
                                       * max(CASE WHEN rk.r = cnt.nsl // 2
                                             + 1 + cnt.k THEN rk.s END))
                           ELSE (max(CASE WHEN rk.r = cnt.nsl // 2 + cnt.k
                                          THEN rk.s END)
                                 + max(CASE WHEN rk.r = cnt.nsl // 2 + 1
                                            + cnt.k THEN rk.s END)) / 2
                      END
               END AS slope
        FROM rk CROSS JOIN cnt
        GROUP BY cnt.nsl, cnt.k
    ),
    ik AS (
        SELECT d.dn, d.y - b.slope * d.x AS resid, b.slope, b.nsl, b.k
        FROM d CROSS JOIN b
    ),
    irk AS (
        SELECT resid, slope, nsl, k,
               row_number() OVER (ORDER BY resid, dn) AS r,
               count(*) OVER () AS n
        FROM ik
    )
    SELECT max(n) AS n_days, max(nsl) AS n_slopes, max(k) AS k_shift,
           round(max(slope), 6) AS pb_slope,
           round(max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                          THEN resid END) / 100.0, 4)
               AS pb_intercept_dollars,
           abs(round(max(slope), 6) - 1) > 0.05 AS proportional_bias
    FROM irk
    """,
    tags=("timeseries", "stats"),
)
def ts_passing_bablok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passing–Bablok regression (1983) comparing two 'measurements'
    of daily revenue: X = the order-header totals, Y = the same days'
    line-recomputed extended-price sums. The PB slope is the
    K-shifted median of all pairwise slopes Sᵢⱼ = Δy/Δx (vertical
    pairs dropped, slopes exactly −1 dropped, K = #{{S < −1}} — the
    sign-correction that makes the estimator consistent when both
    variables carry error, which plain OLS and even Theil–Sen are
    not in the method-comparison setting); even-N middle pairs take
    the geometric mean when their product is positive, else the
    arithmetic mean (pinned — the original geometric mean is
    undefined across signs). Intercept = type-1 median of
    y − b·x (dn tiebreak). Unlike agg_deming_regression (needs an
    error-variance ratio) PB is assumption-free; agg_bland_altman is
    its agreement-plot companion. The ±5% proportional-bias flag on
    the ROUNDED slope is a screening convention (full PB rank CIs
    are the natural extension), stated as such. Slopes divide exact
    integer cent differences, so both engines rank bit-identical
    doubles.

    Scale shape: two daily reduces and one day equi-join; a TRUE
    pairwise join of the calendar-bounded daily series (the
    ts_qn_scale envelope); ranked scans of the bounded slope and
    residual tables."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    cx = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    cy = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    ox = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cx).cast("long").alias("x")
    )
    oy = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cy).cast("long").alias("y"))
    )
    d = ox.join(oy, "day").select(
        F.datediff("day", F.lit("1990-01-01")).alias("dn"), "x", "y"
    )
    # r12 (second pass): the joined daily series is CALENDAR-BOUNDED
    # (one row per day at any corpus scale), so the O(days²) slope
    # fan-out and the three offset-rank probes are a bounded DRIVER
    # computation (the agg_hl_shift_2sample device): collect the
    # series once, replicate the EXACT slope/filter/offset-median
    # arithmetic in NumPy (same IEEE doubles: (yb−ya)/(xb−xa) in
    # float64, s = −1 excluded, k = #{s < −1}, rank picks on the
    # ascending sort, signed-geometric-mean even-case), and feed the
    # 1-row slope frame to the unchanged intercept stage. The
    # distributed pair join below stays as the past-gate fallback and
    # the formulation of record.
    _drows = d.collect()
    b = None
    if 0 < len(_drows) <= 4096:
        import math

        import numpy as np

        _x = np.asarray([r["x"] for r in _drows], dtype=np.int64)
        _y = np.asarray([r["y"] for r in _drows], dtype=np.int64)
        _i, _j = np.triu_indices(len(_drows), 1)
        _m = _x[_i] != _x[_j]
        _s = (_y[_j][_m] - _y[_i][_m]).astype(np.float64) / (
            _x[_j][_m] - _x[_i][_m]
        ).astype(np.float64)
        _s = _s[_s != -1.0]
        _nsl = int(_s.size)
        _k = int((_s < -1.0).sum())
        _s.sort()
        _slope = None
        if _nsl % 2 == 1:
            _r = (_nsl + 1) // 2 + _k
            if 1 <= _r <= _nsl:
                _slope = float(_s[_r - 1])
        else:
            _rl, _rh = _nsl // 2 + _k, _nsl // 2 + 1 + _k
            if 1 <= _rl and _rh <= _nsl:
                _lo, _hi = float(_s[_rl - 1]), float(_s[_rh - 1])
                if _lo * _hi > 0:
                    _slope = math.copysign(1.0, _lo) * math.sqrt(
                        _lo * _hi
                    )
                else:
                    _slope = (_lo + _hi) / 2
        if _slope is not None:
            b = spark.createDataFrame(
                [(_nsl, _k, _slope)], "nsl long, k long, slope double"
            )
    if b is None:
        b = _pb_slope_distributed(spark, d)
    ik = d.crossJoin(F.broadcast(b)).select(
        "dn",
        (F.col("y") - F.col("slope") * F.col("x")).alias("resid"),
        "slope",
        "nsl",
        "k",
    )
    irk = api.exact_global_rank(ik, "resid", "dn", "r")
    n1 = irk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = irk.crossJoin(F.broadcast(n1)).agg(
        F.max("n").alias("n_days"),
        F.max("nsl").alias("n_slopes"),
        F.max("k").alias("k_shift"),
        F.round(F.max("slope"), 6).alias("pb_slope"),
        F.round(
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("resid"),
                )
            )
            / 100.0,
            4,
        ).alias("pb_intercept_dollars"),
        (F.abs(F.round(F.max("slope"), 6) - 1) > 0.05).alias(
            "proportional_bias"
        ),
    )
    return out


@register(
    "graph_conductance",
    _LPA_PREFIX
    + "".join(
        _LPA_STAGE.format(i=i, prev=i - 1, key=_LPA_KEY)
        for i in range(1, _LPA_ROUNDS + 1)
    )
    + f""",
    lab AS (SELECT node, lbl FROM l{_LPA_ROUNDS}),
    ej AS (
        SELECT lu.lbl AS cu, lv.lbl AS cv
        FROM sym s
        JOIN lab lu ON lu.node = s.u
        JOIN lab lv ON lv.node = s.v
    ),
    m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM ej),
    per AS (
        SELECT cu AS community,
               CAST(count(*) AS BIGINT) AS vol,
               CAST(count(*) FILTER (cu <> cv) AS BIGINT) AS cut
        FROM ej GROUP BY 1
    ),
    sz AS (
        SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes
        FROM lab GROUP BY 1
    )
    SELECT p.community, sz.n_nodes, p.vol, p.cut,
           round(CASE WHEN least(p.vol, m2.m2 - p.vol) > 0
                      THEN CAST(p.cut AS DOUBLE)
                           / least(p.vol, m2.m2 - p.vol)
                 END, 6) AS conductance
    FROM per p JOIN sz ON sz.community = p.community
    CROSS JOIN m2
    ORDER BY sz.n_nodes DESC, p.community
    """,
    tags=("graph", "stats"),
)
def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance φ(C) = cut(C)/min(vol(C), 2m−vol(C))
    of the EXACT communities graph_label_propagation detects (the
    shared lpa_sym_and_labels core — detector and metric cannot
    drift apart): vol counts each community's directed edge
    endpoints, cut the edges leaving it, and φ ∈ [0,1] is the
    bottleneck ratio — low φ means a genuinely separated community,
    φ near 1 a label-propagation artifact. graph_modularity grades
    the partition as a whole; conductance is the per-community
    audit (and the objective the theory says spectral methods
    approximate — Cheeger's inequality). All counts are exact
    integers; the single division rounds at 6 with the min-volume
    guard NULL for empty sides pinned on both engines.

    Scale shape: the LPA core's joins, then one edge-label double
    equi-join, a community-keyed reduce, and a ≤communities-row
    join."""
    sym, lbl = lpa_sym_and_labels(spark, sf_dir)
    lu = lbl.select(F.col("node").alias("u"), F.col("lbl").alias("cu"))
    lv = lbl.select(F.col("node").alias("v"), F.col("lbl").alias("cv"))
    ej = sym.join(lu, "u").join(lv, "v").select("cu", "cv")
    m2 = ej.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    per = ej.groupBy(F.col("cu").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("vol"),
        F.sum(F.when(F.col("cu") != F.col("cv"), 1).otherwise(0))
        .cast("long")
        .alias("cut"),
    )
    sz = lbl.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    side = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return (
        per.join(sz, "community")
        .crossJoin(F.broadcast(m2))
        .select(
            "community",
            "n_nodes",
            "vol",
            "cut",
            F.round(
                F.when(
                    side > 0, F.col("cut").cast("double") / side
                ),
                6,
            ).alias("conductance"),
        )
        .orderBy(F.desc("n_nodes"), "community")
    )
