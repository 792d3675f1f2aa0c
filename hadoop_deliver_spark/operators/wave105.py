"""§2 extensions, hundred-fifth wave — nonlinear-dynamics entropy and
Markov steady state.

- ts_sample_entropy: Sample Entropy (Richman & Moorman 2000) of the
  daily series — the regularity measure ECG/telemetry pipelines run
  (low SampEn = repetitive/templated dynamics); joins the entropy
  family next to ts_permutation_entropy / ts_spectral_entropy with a
  different notion of order (template matching, not symbol ranks or
  spectra).
- events_markov_stationary: the stationary distribution of the
  user-journey transition chain by K unrolled integer power steps —
  the long-run visit share of each event type, the quantity
  events_transitions' one-step matrix only hints at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_SCALE = 1_000_000_000
_K_POWER = 8


@register(
    "ts_sample_entropy",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
        FROM daily
    ),
    tol AS (
        SELECT 0.2 * sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS r
        FROM mom
    ),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    seq AS (
        SELECT a.i, a.x AS x0, b.x AS x1, c.x AS x2
        FROM idx a
        JOIN idx b ON b.i = a.i + 1
        JOIN idx c ON c.i = a.i + 2
    ),
    pairs AS (
        SELECT CAST(count(*) FILTER (
                   greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1))
                       < (SELECT r FROM tol)) AS BIGINT) AS b_cnt,
               CAST(count(*) FILTER (
                   greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1),
                            abs(a.x2 - b.x2))
                       < (SELECT r FROM tol)) AS BIGINT) AS a_cnt
        FROM seq a JOIN seq b ON a.i < b.i
    )
    SELECT (SELECT n FROM mom) AS n_days,
           round((SELECT r FROM tol), 4) AS tolerance,
           b_cnt AS n_match_m, a_cnt AS n_match_m1,
           CASE WHEN a_cnt = 0 OR b_cnt = 0 THEN NULL
                ELSE round(-ln(CAST(a_cnt AS DOUBLE) / b_cnt), 6)
           END AS sampen,
           2 * a_cnt < b_cnt AS irregular
    FROM pairs
    """,
    tags=("timeseries", "stats"),
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Entropy (Richman-Moorman 2000; m = 2, r = 0.2·SD) of
    the daily event count: SampEn = −ln(A/B) where B counts template
    pairs of length m within tolerance r (Chebyshev distance) and A
    the pairs still matching at length m+1 — self-exclusive and
    bias-corrected relative to the older ApEn (no self-matches). A
    and B are EXACT INTEGERS (the tolerance compare pits an integer
    difference against one deterministically-derived double), so the
    only float output is one log of their ratio, rounded to 6; the
    ``irregular`` verdict 2A < B (SampEn > ln 2) is pure integer.
    Template sequences come from two index equi-joins (i+1, i+2) on
    the block-ranked day index — no lag window — and the pair stage
    is the calendar-bounded ts_theil_sen frame (≤ days²/2 at any
    corpus scale).

    Scale shape: one keyed reduce to the bounded day axis,
    block-ranked index, two shifted equi-joins, one bounded pair
    join, a 1-row reduce."""
    from hadoop_deliver_spark.api import exact_global_rank

    e = tbl(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("q"),
    )
    tol = mom.select(
        "n",
        (
            0.2
            * F.sqrt(
                (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / (F.col("n") - 1)
            )
        ).alias("r"),
    )
    idx = exact_global_rank(
        daily.withColumn(
            "di", F.datediff("day", F.lit("1970-01-01").cast("date"))
        ),
        "di",
        "di",
        "i",
    ).select("x", "i")
    a0 = idx.select(F.col("i"), F.col("x").alias("x0"))
    a1 = idx.select((F.col("i") - 1).alias("i"), F.col("x").alias("x1"))
    a2 = idx.select((F.col("i") - 2).alias("i"), F.col("x").alias("x2"))
    seq = a0.join(a1, "i").join(a2, "i")
    sa = seq.select(
        F.col("i").alias("ia"),
        F.col("x0").alias("a0"),
        F.col("x1").alias("a1"),
        F.col("x2").alias("a2"),
    )
    sb = seq.select(
        F.col("i").alias("ib"),
        F.col("x0").alias("b0"),
        F.col("x1").alias("b1"),
        F.col("x2").alias("b2"),
    )
    pr = (
        sa.join(sb, F.col("ia") < F.col("ib"))
        .crossJoin(F.broadcast(tol.select("r")))
        .agg(
            F.count_if(
                F.greatest(
                    F.abs(F.col("a0") - F.col("b0")),
                    F.abs(F.col("a1") - F.col("b1")),
                )
                < F.col("r")
            )
            .cast("long")
            .alias("b_cnt"),
            F.count_if(
                F.greatest(
                    F.abs(F.col("a0") - F.col("b0")),
                    F.abs(F.col("a1") - F.col("b1")),
                    F.abs(F.col("a2") - F.col("b2")),
                )
                < F.col("r")
            )
            .cast("long")
            .alias("a_cnt"),
        )
    )
    return pr.crossJoin(F.broadcast(tol)).select(
        F.col("n").alias("n_days"),
        F.round("r", 4).alias("tolerance"),
        F.col("b_cnt").alias("n_match_m"),
        F.col("a_cnt").alias("n_match_m1"),
        F.when(
            (F.col("a_cnt") == 0) | (F.col("b_cnt") == 0), F.lit(None)
        )
        .otherwise(
            F.round(
                -F.log(F.col("a_cnt").cast("double") / F.col("b_cnt")),
                6,
            )
        )
        .alias("sampen"),
        (2 * F.col("a_cnt") < F.col("b_cnt")).alias("irregular"),
    )


_EDGES_SQL = """
    SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS w
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ) WHERE prev IS NOT NULL
    GROUP BY prev, event_type
"""


def _stationary_oracle() -> str:
    """Unrolled K-step integer power iteration as chained CTEs (the
    graph_pagerank device: aggregates are not allowed in a recursive
    CTE term, so unrolling IS the portable fixed-K form)."""
    parts = [
        f"WITH edges AS ({_EDGES_SQL}),",
        "outdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wtot"
        " FROM edges GROUP BY src),",
        "nodes AS (SELECT DISTINCT event_type AS node FROM events),",
        "nn AS (SELECT count(*) AS n FROM nodes),",
        f"pi0 AS (SELECT node, {_SCALE} // (SELECT n FROM nn) AS mass"
        " FROM nodes),",
    ]
    for k in range(1, _K_POWER + 1):
        parts.append(
            f"pi{k} AS (SELECT e.dst AS node, CAST(sum("
            f"(pi{k - 1}.mass * e.w) // o.wtot) AS BIGINT) AS mass"
            f" FROM pi{k - 1}"
            " JOIN edges e ON e.src = pi" + str(k - 1) + ".node"
            " JOIN outdeg o ON o.src = e.src"
            " GROUP BY e.dst),"
        )
    parts.append(
        f"""
    final AS (
        SELECT n.node, coalesce(p.mass, 0) AS mass
        FROM nodes n LEFT JOIN pi{_K_POWER} p ON p.node = n.node
    )
    SELECT node AS event_type, CAST(mass AS BIGINT) AS pi_micro,
           round(CAST(mass AS DOUBLE) / {_SCALE}, 6) AS pi,
           mass = (SELECT max(mass) FROM final) AS is_top
    FROM final ORDER BY event_type
    """
    )
    return "\n".join(parts)


@register(
    "events_markov_stationary",
    _stationary_oracle(),
    tags=("events", "graph"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain — the
    long-run share of time the journey spends in each event type,
    i.e. what the one-step transition matrix (events_transitions)
    converges to. Computed as K = 8 unrolled power steps
    π' = π·P from the uniform start, in BIGINT micro-units with
    floor division (the graph_pagerank integer device: every update
    is exact commutative integer arithmetic, so the result is
    bit-identical across engines, partition orders, and summation
    orders; the small floored mass leak is part of the stated
    fixed-K semantics, identical on both sides). The oracle unrolls
    the same 8 steps as chained CTEs. ``is_top`` flags the argmax
    state by pure integer compare.

    Scale shape: per-user lag to build edges (keyed window), one
    keyed reduce to the ≤|event_type|² transition cells, then the
    K power steps run driver-side over that DOMAIN-bounded table in
    exact integers (r12 — the events_markov_reach 25-cell device);
    for a state domain that grows with the data, use the
    broadcast/partitioned-join loop (graph_pagerank_users)."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    outdeg = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("wtot")
    )
    # r12: the transition table is DOMAIN-bounded (≤ |event_type|² ≤ 25
    # cells after the keyed reduce — the events_markov_reach device),
    # so the K=8 power steps run driver-side in exact Python integers
    # (identical floor-div arithmetic, identical per-dst integer sums);
    # only the per-user lag/edge reduce touches the event stream. The
    # pre-r12 broadcast-join loop shape remains the right form the
    # moment the state domain grows with the data — see
    # graph_pagerank_users for that contract.
    _ed = edges.join(outdeg, "src").collect()
    nodes = e.select(F.col("event_type").alias("node")).distinct()
    _nodes = [r["node"] for r in nodes.collect()]
    n_nodes = len(_nodes)
    _mass = {nd: _SCALE // n_nodes for nd in _nodes}
    for _ in range(_K_POWER):
        _nxt = {}
        for r in _ed:
            part = (_mass.get(r["src"], 0) * r["w"]) // r["wtot"]
            _nxt[r["dst"]] = _nxt.get(r["dst"], 0) + part
        _mass = _nxt
    final = spark.createDataFrame(
        [(nd, _mass.get(nd, 0)) for nd in sorted(_nodes)],
        "node string, mass long",
    )
    top = final.agg(F.max("mass").alias("mx"))
    return (
        final.crossJoin(F.broadcast(top))
        .select(
            F.col("node").alias("event_type"),
            F.col("mass").alias("pi_micro"),
            F.round(F.col("mass").cast("double") / _SCALE, 6).alias("pi"),
            (F.col("mass") == F.col("mx")).alias("is_top"),
        )
        .orderBy("event_type")
    )
