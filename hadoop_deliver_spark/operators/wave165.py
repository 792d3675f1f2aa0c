"""§2 extensions, hundred-sixty-fifth wave — exact absorbing-chain
analysis.

events_markov_absorption: the closed-form fundamental-matrix
solution (I−Q)⁻¹ of the empirical user-journey chain with TWO
absorbing states — purchase (conversion) and error (failure): from
each transient state, the probability the journey converts BEFORE it
errors, and the expected number of steps until either. This is the
infinite-horizon limit that events_markov_reach truncates at k=5,
and the first reuse of the wave155 textual-cofactor device for a
full matrix inverse: the 3×3 adjugate is GENERATED as one shared
polynomial string, so both engines evaluate the same expansion and
the generator inherits wave155's random-matrix property test
pattern (tests/test_hypothesis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.operators.wave155 import _det3
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_TRANSIENT = ("click", "signup", "view")
_ABS_WIN = "purchase"
_ABS_LOSE = "error"


def _det2(m: list[list[str]]) -> str:
    a, b = m[0]
    c, d = m[1]
    return f"({a})*({d})-({b})*({c})"


def _minor2(m: list[list[str]], r: int, c: int) -> list[list[str]]:
    return [
        [m[i][j] for j in range(3) if j != c] for i in range(3) if i != r
    ]


def _adj3(m: list[list[str]]) -> list[list[str]]:
    """adj(M)[i][j] = (−1)^(i+j) · det(minor(j, i)) — textual."""
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            sign = "" if (i + j) % 2 == 0 else "-"
            row.append(f"({sign}({_det2(_minor2(m, j, i))}))")
        out.append(row)
    return out


# M = I − Q over the transient states, entries from the p_{i}{j}
# probability columns (exact count ratios).
_M = [
    [
        f"(1 - p_{i}{j})" if i == j else f"(0 - p_{i}{j})"
        for j in range(3)
    ]
    for i in range(3)
]
_DET = _det3(_M)
_ADJ = _adj3(_M)
# b_i = Σ_j adj_ij·r_j / det (probability of absorbing in WIN),
# e_i likewise for LOSE, t_i = Σ_j adj_ij / det (expected steps).
_B = [
    "(" + " + ".join(f"{_ADJ[i][j]}*(rw_{j})" for j in range(3)) + ")"
    for i in range(3)
]
_E = [
    "(" + " + ".join(f"{_ADJ[i][j]}*(re_{j})" for j in range(3)) + ")"
    for i in range(3)
]
_T = [
    "(" + " + ".join(_ADJ[i][j] for j in range(3)) + ")"
    for i in range(3)
]


def _absorption_oracle() -> str:
    piv = ", ".join(
        f"coalesce(max(CASE WHEN s = '{si}' AND t = '{sj}' THEN p END),"
        f" 0.0) AS p_{i}{j}"
        for i, si in enumerate(_TRANSIENT)
        for j, sj in enumerate(_TRANSIENT)
    )
    rw = ", ".join(
        f"coalesce(max(CASE WHEN s = '{si}' AND t = '{_ABS_WIN}'"
        f" THEN p END), 0.0) AS rw_{i}"
        for i, si in enumerate(_TRANSIENT)
    )
    re = ", ".join(
        f"coalesce(max(CASE WHEN s = '{si}' AND t = '{_ABS_LOSE}'"
        f" THEN p END), 0.0) AS re_{i}"
        for i, si in enumerate(_TRANSIENT)
    )
    rows = " UNION ALL ".join(
        f"SELECT '{si}' AS state, rw_{i} AS p_win_next,"
        f" ({_B[i]}) / ({_DET}) AS p_convert,"
        f" ({_E[i]}) / ({_DET}) AS p_error,"
        f" ({_T[i]}) / ({_DET}) AS exp_steps"
        f" FROM piv"
        for i, si in enumerate(_TRANSIENT)
    )
    return f"""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    tm AS (
        SELECT event_type AS s, nxt AS t,
               CAST(count(*) AS DOUBLE)
                   / sum(count(*)) OVER (PARTITION BY event_type) AS p
        FROM ordered WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ),
    piv AS (
        SELECT {piv}, {rw}, {re}
        FROM tm
    ),
    u AS ({rows})
    SELECT state,
           round(p_win_next, 6) AS p_purchase_next,
           round(p_convert, 6) AS p_convert_first,
           round(p_error, 6) AS p_error_first,
           round(p_convert + p_error, 6) AS mass_check,
           round(exp_steps, 4) AS expected_steps
    FROM u ORDER BY state
    """


@register(
    "events_markov_absorption",
    _absorption_oracle(),
    tags=("events", "graph", "stats"),
)
def events_markov_absorption(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact absorbing-chain analysis (Kemeny & Snell 1960, ch. III)
    of the empirical user-journey chain with purchase AND error both
    absorbing: with Q the 3×3 transient block (click/signup/view)
    and r_win/r_lose the one-step absorption columns, the
    fundamental matrix N = (I−Q)⁻¹ gives P(convert before error) =
    N·r_win, its complement N·r_lose (their sum is the mass check —
    ≈1 exactly when both absorbers are reachable, reported rather
    than assumed), and E[steps to absorption] = N·1. This is the
    infinite-horizon closed form whose k=5 truncation is
    events_markov_reach; the race framing ('does the journey convert
    before it breaks?') is what the per-state expected-steps and
    split probabilities quantify. The transition frame is textually
    markov_reach's ((ts, event_id) total order per user; exact count
    ratios). The 3×3 inverse is the wave155 textual-cofactor device
    one size down: _det3/_adj3 GENERATE a single polynomial string
    shared verbatim by both engines (and property-tested against
    numpy.linalg on random matrices), so the linear algebra cannot
    diverge between them.

    Scale shape: the ONLY fact-sized work is the per-user lead
    window and one transition reduce; everything after lives on the
    ≤25-cell matrix pivoted to one row."""
    e = tbl(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = ordered.groupBy(
        F.col("event_type").alias("s"), F.col("nxt").alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").cast("long").alias("cs"))
    tm = cnt.join(tot, "s").select(
        "s", "t", (F.col("c").cast("double") / F.col("cs")).alias("p")
    )
    piv_cols = []
    for i, si in enumerate(_TRANSIENT):
        for j, sj in enumerate(_TRANSIENT):
            piv_cols.append(
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("s") == si) & (F.col("t") == sj),
                            F.col("p"),
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"p_{i}{j}")
            )
        piv_cols.append(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("s") == si) & (F.col("t") == _ABS_WIN),
                        F.col("p"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"rw_{i}")
        )
        piv_cols.append(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("s") == si) & (F.col("t") == _ABS_LOSE),
                        F.col("p"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"re_{i}")
        )
    piv = tm.agg(*piv_cols)
    rows = piv.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(si).alias("state"),
                        F.col(f"rw_{i}").alias("p_win_next"),
                        (F.expr(_B[i]) / F.expr(_DET)).alias("p_convert"),
                        (F.expr(_E[i]) / F.expr(_DET)).alias("p_error"),
                        (F.expr(_T[i]) / F.expr(_DET)).alias("exp_steps"),
                    )
                    for i, si in enumerate(_TRANSIENT)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "state",
        F.round("p_win_next", 6).alias("p_purchase_next"),
        F.round("p_convert", 6).alias("p_convert_first"),
        F.round("p_error", 6).alias("p_error_first"),
        F.round(F.col("p_convert") + F.col("p_error"), 6).alias(
            "mass_check"
        ),
        F.round("exp_steps", 4).alias("expected_steps"),
    ).orderBy("state")
