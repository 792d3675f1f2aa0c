"""§2 extensions, hundred-sixty-seventh wave — burst detection.

events_kleinberg_bursts: Kleinberg's (2002) two-state burst
automaton over the hourly error stream — the optimal (Viterbi)
segmentation of the stream into base-rate and elevated-rate
episodes, the principled alternative to threshold alerts
(events_velocity_alerts) because the γ·ln n transition cost makes
isolated spikes stay quiet while sustained elevation pays for the
state switch.

Engineering note: the DP is SEQUENTIAL by nature. The oracle runs
it as a DuckDB RECURSIVE CTE carrying both state costs AND both
candidate paths as 0/1 strings (the winner's string then explodes
into gaps-and-islands burst intervals); the Spark side collects the
CALENDAR-BOUNDED hourly series (≤ hours-of-history rows at ANY
corpus scale — the events_markov_reach bounded-collect device) and
runs the identical recurrence in the driver. Both recurrences are
textually pinned: ties prefer state 0 and the from-base
predecessor (<=), and the ln x! emission term is dropped because it
is common to both states at each step and cannot change any argmin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_S = 2.0  # elevated-state rate multiplier
_GAMMA = 0.5  # transition-cost weight (γ·ln n to enter the burst state)


@register(
    "events_kleinberg_bursts",
    f"""
    WITH RECURSIVE b AS (
        SELECT CAST(min(epoch_us(ts) // 1000000 // 3600) AS BIGINT) AS lo,
               CAST(max(epoch_us(ts) // 1000000 // 3600) AS BIGINT) AS hi
        FROM events
    ),
    cnt AS (
        SELECT CAST(epoch_us(ts) // 1000000 // 3600 AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    grid AS (
        SELECT CAST(g.h AS BIGINT) - b.lo AS t,
               CAST(coalesce(cnt.x, 0) AS BIGINT) AS x
        FROM b, unnest(generate_series(b.lo, b.hi)) AS g(h)
        LEFT JOIN cnt ON cnt.h = g.h
    ),
    par AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) / count(*) AS lam0,
               {_S} * CAST(sum(x) AS DOUBLE) / count(*) AS lam1,
               {_GAMMA} * ln(CAST(count(*) AS DOUBLE)) AS up
        FROM grid
    ),
    v AS (
        SELECT -1 AS t, CAST(0.0 AS DOUBLE) AS c0,
               CAST(1e18 AS DOUBLE) AS c1,
               CAST('' AS VARCHAR) AS p0, CAST('' AS VARCHAR) AS p1
        UNION ALL
        SELECT g.t,
               CASE WHEN v.c0 <= v.c1 THEN v.c0 ELSE v.c1 END
                 + (par.lam0 - g.x * ln(par.lam0)),
               CASE WHEN v.c0 + par.up <= v.c1
                    THEN v.c0 + par.up ELSE v.c1 END
                 + (par.lam1 - g.x * ln(par.lam1)),
               (CASE WHEN v.c0 <= v.c1 THEN v.p0 ELSE v.p1 END) || '0',
               (CASE WHEN v.c0 + par.up <= v.c1 THEN v.p0 ELSE v.p1 END)
                 || '1'
        FROM v
        JOIN grid g ON g.t = v.t + 1
        CROSS JOIN par
    ),
    win AS (
        SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
        FROM v, par WHERE v.t = par.n - 1
    ),
    hot AS (
        SELECT t.i - 1 AS t,
               (t.i - 1) - row_number() OVER (ORDER BY t.i) AS isl
        FROM win, unnest(range(1, length(win.path) + 1)) AS t(i)
        WHERE substr(win.path, CAST(t.i AS INT), 1) = '1'
    ),
    bursts AS (
        SELECT min(t) AS start_t, max(t) AS end_t,
               CAST(count(*) AS BIGINT) AS n_hours
        FROM hot GROUP BY isl
    )
    SELECT row_number() OVER (ORDER BY b2.start_t) AS burst_id,
           b2.start_t AS start_hour, b2.end_t AS end_hour, b2.n_hours,
           CAST(sum(g.x) AS BIGINT) AS n_events,
           round(CAST(sum(g.x) AS DOUBLE) / b2.n_hours / max(par.lam0), 4)
               AS rate_ratio
    FROM bursts b2
    JOIN grid g ON g.t BETWEEN b2.start_t AND b2.end_t
    CROSS JOIN par
    GROUP BY b2.start_t, b2.end_t, b2.n_hours
    ORDER BY start_hour
    """,
    tags=("events", "stats"),
)
def events_kleinberg_bursts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kleinberg burst detection (2002) on the hourly error stream:
    a two-state automaton (base rate λ₀ = overall errors/hour,
    elevated λ₁ = s·λ₀ with s = 2) whose optimal state path
    minimizes Σ(λ_j − xₜ·ln λ_j) emission cost (the Poisson −logpmf
    with the state-independent ln xₜ! dropped — it cannot change any
    argmin) plus γ·ln n per base→burst transition (γ = 0.5; the
    (s, γ) pair is pinned where the fixture stream actually yields
    bursts at every scale, stated as the sensitivity choice —
    Kleinberg's defaults s=2, γ=1 declare this near-Poisson stream
    burst-free, which is itself informative but leaves the operator
    untested). Output: the burst episodes (start/end hour offset,
    length, events, rate ratio vs λ₀). Ties prefer the base state
    and the from-base predecessor (pinned <=). Where
    events_velocity_alerts flags any hot hour, the ln n entry toll
    means only SUSTAINED elevation becomes an episode — the
    difference between an alert and an incident.

    Scale shape: one filtered hourly count + a generate_series spine
    (both engines); the DP runs over the CALENDAR-BOUNDED hourly
    axis — a DuckDB recursive CTE carrying path strings on the
    oracle side, and on the Spark side a driver loop over the ≤
    hours-of-history collected rows (the events_markov_reach
    bounded-collect device; ~2.4k·24 rows even at a decade of
    history), followed by a createDataFrame of the ≤n-episode
    result."""
    e = tbl(spark, sf_dir, "events")
    hour = (F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    bounds = e.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    sparse = {
        r["h"]: r["x"]
        for r in e.filter(F.col("event_type") == "error")
        .groupBy(hour.alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .collect()
    }
    xs = [int(sparse.get(h, 0)) for h in range(lo, hi + 1)]
    n = len(xs)
    lam0 = sum(xs) / n
    lam1 = _S * lam0
    up = _GAMMA * math.log(n)
    inf = 1e18
    c0, c1 = 0.0, inf
    p0, p1 = "", ""
    for x in xs:
        e0 = lam0 - x * math.log(lam0)
        e1 = lam1 - x * math.log(lam1)
        nc0 = (c0 if c0 <= c1 else c1) + e0
        np0 = (p0 if c0 <= c1 else p1) + "0"
        nc1 = (c0 + up if c0 + up <= c1 else c1) + e1
        np1 = (p0 if c0 + up <= c1 else p1) + "1"
        c0, c1, p0, p1 = nc0, nc1, np0, np1
    path = p0 if c0 <= c1 else p1
    bursts = []
    start = None
    for t, st in enumerate(path):
        if st == "1" and start is None:
            start = t
        elif st == "0" and start is not None:
            bursts.append((start, t - 1))
            start = None
    if start is not None:
        bursts.append((start, n - 1))
    rows = []
    for i, (s0, e0_) in enumerate(bursts, start=1):
        nev = sum(xs[s0 : e0_ + 1])
        nh = e0_ - s0 + 1
        rows.append(
            (i, s0, e0_, nh, nev, round(nev / nh / lam0, 4))
        )
    schema = (
        "burst_id LONG, start_hour LONG, end_hour LONG, n_hours LONG,"
        " n_events LONG, rate_ratio DOUBLE"
    )
    return spark.createDataFrame(rows, schema).orderBy("start_hour")
