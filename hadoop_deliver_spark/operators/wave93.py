"""§2 extensions, ninety-third wave — equivalence and non-inferiority
testing: the INVERSE question of every difference test in the tree
(failing to reject "no difference" is not evidence of sameness; these
are the procedures that actually certify it).

- agg_tost_equivalence: Schuirmann's two-one-sided-tests procedure
  (1987) for mean equivalence of URGENT vs non-urgent order values
  within a ±1% margin — the regulatory-statistics standard
  (bioequivalence, A/B "no harm" checks).
- events_noninferiority: the one-sided non-inferiority z-test for the
  odd-arm purchase rate against the even arm with a 2-percentage-
  point margin — the launch-gate form of the same idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl

# z_{0.95}² = 1.6448536² — both one-sided tests run at 5%, the TOST
# convention that makes the overall equivalence level 5% too
_Z90_SQ = "2.705543"


@register(
    "agg_tost_equivalence",
    f"""
    WITH base AS (
        SELECT o_orderpriority = '1-URGENT' AS urg,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    g AS (
        SELECT urg, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
        FROM base GROUP BY urg
    ),
    piv AS (
        SELECT max(CASE WHEN urg THEN n END) AS na,
               max(CASE WHEN urg THEN s END) AS sa,
               max(CASE WHEN urg THEN q END) AS qa,
               max(CASE WHEN NOT urg THEN n END) AS nb,
               max(CASE WHEN NOT urg THEN s END) AS sb,
               max(CASE WHEN NOT urg THEN q END) AS qb
        FROM g
    ),
    c AS (
        SELECT na, nb,
               CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS diff,
               (CAST(sa AS DOUBLE) / na + CAST(sb AS DOUBLE) / nb) / 200
                   AS delta,
               CAST(CAST(na AS HUGEINT) * qa
                    - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                   / (CAST(na AS DOUBLE) * na * (na - 1))
               + CAST(CAST(nb AS HUGEINT) * qb
                      - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                   / (CAST(nb AS DOUBLE) * nb * (nb - 1)) AS se2
        FROM piv
    )
    SELECT na AS n_urgent, nb AS n_rest,
           round(diff, 4) AS mean_diff_cents,
           round(delta, 4) AS margin_cents,
           round((delta - diff) / sqrt(se2), 4) AS z_upper,
           round((diff + delta) / sqrt(se2), 4) AS z_lower,
           delta - diff > 0 AND diff + delta > 0
               AND (delta - diff) * (delta - diff) > {_Z90_SQ} * se2
               AND (diff + delta) * (diff + delta) > {_Z90_SQ} * se2
               AS equivalent
    FROM c
    """,
    tags=("agg", "stats"),
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuirmann's TOST equivalence procedure (1987) on mean order
    value, URGENT vs the rest, with the margin δ = 1% of the
    mid-mean ((x̄_A + x̄_B)/200 in cents): equivalence is declared
    only when BOTH one-sided 5% z-tests reject — H₀₁: diff ≥ δ and
    H₀₂: diff ≤ −δ — i.e. (δ−diff)/se > 1.6449 AND (diff+δ)/se >
    1.6449. This is the INVERSE of agg_mann_whitney /
    events_abtest_proportions: a non-significant difference test is
    NOT evidence of sameness (it may just be underpowered); TOST is
    the procedure that certifies "the difference, whatever it is,
    is inside the margin" — the regulatory bioequivalence standard
    and the honest A/B "no harm" gate. Moments are exact
    DECIMAL(38)/HUGEINT (n, S, Q) per group; diff, δ, and the Welch
    unpooled se² assemble in ONE fixed textual order; the verdict
    squares both one-sided comparisons against the shared χ²₁(0.90)
    = 1.6448536² literal with sign guards, all on bit-identical
    doubles.

    Scale shape: ONE keyed reduce to two (n, S, Q) triples, a 1-row
    pivot — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urg"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("urg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("urg") == flag, F.col(m))).alias(
                f"{m}{suf}"
            )
            for flag, suf in ((True, "a"), (False, "b"))
            for m in ("n", "s", "q")
        ]
    )
    na, nb = F.col("na"), F.col("nb")
    xa = F.col("sa").cast("double") / na
    xb = F.col("sb").cast("double") / nb
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    va = (na.cast("decimal(38,0)") * F.col("qa") - d38("sa") * F.col("sa")).cast(
        "double"
    ) / (na.cast("double") * na * (na - 1))
    vb = (nb.cast("decimal(38,0)") * F.col("qb") - d38("sb") * F.col("sb")).cast(
        "double"
    ) / (nb.cast("double") * nb * (nb - 1))
    c = piv.select(
        "na",
        "nb",
        (xa - xb).alias("diff"),
        ((xa + xb) / 200).alias("delta"),
        (va + vb).alias("se2"),
    )
    diff, delta, se2 = F.col("diff"), F.col("delta"), F.col("se2")
    return c.select(
        na.alias("n_urgent"),
        nb.alias("n_rest"),
        F.round(diff, 4).alias("mean_diff_cents"),
        F.round(delta, 4).alias("margin_cents"),
        F.round((delta - diff) / F.sqrt(se2), 4).alias("z_upper"),
        F.round((diff + delta) / F.sqrt(se2), 4).alias("z_lower"),
        (
            (delta - diff > 0)
            & (diff + delta > 0)
            & ((delta - diff) * (delta - diff) > float(_Z90_SQ) * se2)
            & ((diff + delta) * (diff + delta) > float(_Z90_SQ) * se2)
        ).alias("equivalent"),
    )


@register(
    "events_noninferiority",
    f"""
    WITH arms AS (
        SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (user_id % 2 = 0
                                     AND event_type = 'purchase')
                    AS BIGINT) AS x_a,
               CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b,
               CAST(count(*) FILTER (user_id % 2 = 1
                                     AND event_type = 'purchase')
                    AS BIGINT) AS x_b
        FROM events
    ),
    c AS (
        SELECT n_a, x_a, n_b, x_b,
               CAST(x_b AS DOUBLE) / n_b - CAST(x_a AS DOUBLE) / n_a
                   AS diff,
               CAST(x_a AS DOUBLE) / n_a * (1 - CAST(x_a AS DOUBLE) / n_a)
                   / n_a
               + CAST(x_b AS DOUBLE) / n_b
                 * (1 - CAST(x_b AS DOUBLE) / n_b) / n_b AS se2
        FROM arms
    )
    SELECT n_a AS n_even, n_b AS n_odd,
           round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_even,
           round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_odd,
           round((diff + 0.02) / sqrt(se2), 4) AS z_noninf,
           diff + 0.02 > 0
               AND (diff + 0.02) * (diff + 0.02) > {_Z90_SQ} * se2
               AS odd_noninferior
    FROM c
    """,
    tags=("events", "stats"),
)
def events_noninferiority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided non-inferiority z-test for purchase rates (the
    events_abtest_proportions arms: even vs odd user ids), margin
    M = 2 percentage points: conclude the odd arm is NOT worse than
    the even arm by more than M when (p_odd − p_even + 0.02)/se >
    1.6449 — the launch-gate form of equivalence testing (a new
    variant ships if it provably loses less than the margin, not
    merely if the difference test fails to fire). Per-arm counts are
    exact integers; rates, diff, and the unpooled Wald se² assemble
    in ONE fixed textual order (the margin 0.02 = 1/50 and the
    χ²₁(0.90) literal are shared textually); the verdict squares the
    one-sided comparison with a sign guard on bit-identical doubles.
    Complements events_abtest_proportions (two-sided difference)
    and agg_tost_equivalence (two-sided equivalence) — the three
    decision frameworks an experimentation platform needs.

    Scale shape: a 1-row 4-cell reduce over the event stream —
    map-side-combinable."""
    e = tbl(spark, sf_dir, "events")
    even = F.col("user_id") % 2 == 0
    purch = F.col("event_type") == "purchase"
    arms = e.agg(
        F.count_if(even).cast("long").alias("n_a"),
        F.count_if(even & purch).cast("long").alias("x_a"),
        F.count_if(~even).cast("long").alias("n_b"),
        F.count_if(~even & purch).cast("long").alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    c = arms.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        (pb - pa).alias("diff"),
        (
            pa * (1 - pa) / F.col("n_a") + pb * (1 - pb) / F.col("n_b")
        ).alias("se2"),
    )
    diff, se2 = F.col("diff"), F.col("se2")
    return c.select(
        F.col("n_a").alias("n_even"),
        F.col("n_b").alias("n_odd"),
        F.round(F.col("x_a").cast("double") / F.col("n_a"), 6).alias(
            "rate_even"
        ),
        F.round(F.col("x_b").cast("double") / F.col("n_b"), 6).alias(
            "rate_odd"
        ),
        F.round((diff + 0.02) / F.sqrt(se2), 4).alias("z_noninf"),
        (
            (diff + 0.02 > 0)
            & ((diff + 0.02) * (diff + 0.02) > float(_Z90_SQ) * se2)
        ).alias("odd_noninferior"),
    )
