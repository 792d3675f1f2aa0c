"""§2 extensions, hundred-seventieth wave — the matrix profile.

ts_matrix_profile: the UCR matrix profile (Yeh et al. 2016) of the
daily revenue series at subsequence length m = 7 — for every
one-week window, the z-normalized Euclidean distance to its nearest
non-trivial neighbor. The profile's minima are MOTIFS (the two most
similar weeks anywhere in the history) and its maxima DISCORDS (the
week least like any other — the strongest anomaly claim a
distance-based method can make). Computed exactly through the
correlation identity d²(i,j) = 2m·(1 − ρᵢⱼ) for population-z
windows, so only the cross-products Σ zᵢzⱼ are ever summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

_M = 7  # subsequence length (one week of daily rows)
_EXCL = 4  # trivial-match exclusion zone ⌈m/2⌉


@register(
    "ts_matrix_profile",
    f"""
    WITH daily AS (
        SELECT datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS dn,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT dn, x, row_number() OVER (ORDER BY dn) AS idx,
               count(*) OVER () AS n
        FROM daily
    ),
    mu AS (
        SELECT w, start_dn, m, s FROM (
            SELECT idx AS w, dn AS start_dn, n,
                   avg(CAST(x AS DOUBLE)) OVER (ORDER BY idx
                       ROWS BETWEEN CURRENT ROW
                       AND {_M - 1} FOLLOWING) AS m,
                   stddev_pop(CAST(x AS DOUBLE)) OVER (ORDER BY idx
                       ROWS BETWEEN CURRENT ROW
                       AND {_M - 1} FOLLOWING) AS s
            FROM r
        ) WHERE w <= n - {_M - 1}
    ),
    wz AS (
        SELECT mu.w, mu.start_dn, r.idx - mu.w AS k,
               (CAST(r.x AS DOUBLE) - mu.m) / mu.s AS z
        FROM mu JOIN r ON r.idx BETWEEN mu.w AND mu.w + {_M - 1}
        WHERE mu.s > 0
    ),
    cross_t AS (
        SELECT a.w AS i, b.w AS j,
               CAST(sum(a.z * b.z) AS DOUBLE) AS szz,
               max(a.start_dn) AS di, max(b.start_dn) AS dj
        FROM wz a JOIN wz b ON b.k = a.k AND abs(b.w - a.w) >= {_EXCL}
        GROUP BY a.w, b.w
    ),
    mp AS (
        SELECT i, di AS window_dn,
               min(sqrt(greatest(2 * {_M} * (1 - szz / {_M}), 0.0)))
                   AS mp_dist,
               arg_min(dj, sqrt(greatest(2 * {_M} * (1 - szz / {_M}), 0.0))
                           * 1000000 + j) AS nn_dn
        FROM cross_t GROUP BY i, di
    ),
    ranked AS (
        SELECT window_dn, nn_dn, mp_dist,
               row_number() OVER (ORDER BY mp_dist, window_dn) AS rm,
               row_number() OVER (ORDER BY mp_dist DESC, window_dn) AS rd
        FROM mp
    )
    SELECT kind, rank, window_dn, nn_dn,
           round(mp_dist, 6) AS mp_dist
    FROM (
        SELECT 'motif' AS kind, rm AS rank, window_dn, nn_dn, mp_dist
        FROM ranked WHERE rm <= 3
        UNION ALL
        SELECT 'discord' AS kind, rd AS rank, window_dn, nn_dn, mp_dist
        FROM ranked WHERE rd <= 3
    )
    ORDER BY kind, rank
    """,
    tags=("timeseries", "stats"),
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCR matrix profile (Yeh et al. 2016) of the daily revenue
    series at m = 7: every window's z-normalized Euclidean distance
    to its nearest neighbor outside the ⌈m/2⌉ = 4 exclusion zone,
    reported as the top-3 MOTIFS (profile minima — the most
    repeated weekly shapes) and top-3 DISCORDS (maxima — the week
    least like any other, the classic distance-based anomaly).
    Windows are ROW-based on the ranked day axis (gap-agnostic,
    pinned); population-z normalization makes Σz² = m exactly, so
    d²(i,j) = 2m(1 − Σzᵢzⱼ/m) and only cross-products are summed —
    the algebra STOMP exploits, applied here as one relational
    reduce per pair (the greatest(·,0) guard absorbs −1e−16 under
    perfect correlation identically on both engines). Zero-variance
    windows are excluded (pinned); the nearest-neighbor argmin
    tiebreaks on neighbor index via the exact composite key.

    Scale shape: one daily reduce; rolling μ/σ windows over the
    calendar-bounded ranked axis; the window-pair cross-product
    reduce is ≤windows²·m rows with BOTH sides calendar-bounded
    (the ts_qn_scale envelope — ~40M transient rows at a full
    decade, partitioned on the join key); two ranked scans of the
    ≤windows-row profile."""
    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01")).alias("dn")
    ).agg(
        F.sum((dec2("value") * 100).cast("long")).cast("long").alias("x")
    )
    r = api.exact_global_rank(daily, "dn", "dn", "idx")
    n1 = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r2 = r.crossJoin(F.broadcast(n1))
    wroll = Window.orderBy("idx").rowsBetween(0, _M - 1)
    # the rolling window must see the FULL row axis to reach idx+m-1,
    # so the tail filter applies AFTER the window (the oracle mirrors
    # this with a subquery — SQL WHERE runs before window functions)
    mu = (
        r2.select(
            F.col("idx").alias("w"),
            F.col("dn").alias("start_dn"),
            F.col("n"),
            F.avg(F.col("x").cast("double")).over(wroll).alias("m"),
            F.stddev_pop(F.col("x").cast("double"))
            .over(wroll)
            .alias("s"),
        )
        .filter(F.col("w") <= F.col("n") - (_M - 1))
        .drop("n")
    )
    wz = (
        mu.filter(F.col("s") > 0)
        .join(
            r.select(F.col("idx"), F.col("x")),
            (F.col("idx") >= F.col("w"))
            & (F.col("idx") <= F.col("w") + (_M - 1)),
        )
        .select(
            "w",
            "start_dn",
            (F.col("idx") - F.col("w")).alias("k"),
            ((F.col("x").cast("double") - F.col("m")) / F.col("s")).alias(
                "z"
            ),
        )
    )
    a = wz.select(
        F.col("w").alias("i"),
        F.col("start_dn").alias("di"),
        F.col("k"),
        F.col("z").alias("za"),
    )
    b = wz.select(
        F.col("w").alias("j"),
        F.col("start_dn").alias("dj"),
        F.col("k").alias("kb"),
        F.col("z").alias("zb"),
    )
    cross_t = (
        a.join(
            b,
            (F.col("kb") == F.col("k"))
            & (F.abs(F.col("j") - F.col("i")) >= _EXCL),
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("za") * F.col("zb")).cast("double").alias("szz"),
            F.max("di").alias("di"),
            F.max("dj").alias("dj"),
        )
    )
    dist = F.sqrt(
        F.greatest(2 * _M * (1 - F.col("szz") / _M), F.lit(0.0))
    )
    mp = cross_t.groupBy("i", F.col("di").alias("window_dn")).agg(
        F.min(dist).alias("mp_dist"),
        F.min_by("dj", dist * 1000000 + F.col("j")).alias("nn_dn"),
    )
    wm = Window.orderBy("mp_dist", "window_dn")
    wd = Window.orderBy(F.col("mp_dist").desc(), "window_dn")
    ranked = mp.select(
        "window_dn",
        "nn_dn",
        "mp_dist",
        F.row_number().over(wm).alias("rm"),
        F.row_number().over(wd).alias("rd"),
    )
    motifs = ranked.filter(F.col("rm") <= 3).select(
        F.lit("motif").alias("kind"),
        F.col("rm").alias("rank"),
        "window_dn",
        "nn_dn",
        "mp_dist",
    )
    discords = ranked.filter(F.col("rd") <= 3).select(
        F.lit("discord").alias("kind"),
        F.col("rd").alias("rank"),
        "window_dn",
        "nn_dn",
        "mp_dist",
    )
    return (
        motifs.unionAll(discords)
        .select(
            "kind",
            "rank",
            "window_dn",
            "nn_dn",
            F.round("mp_dist", 6).alias("mp_dist"),
        )
        .orderBy("kind", "rank")
    )
