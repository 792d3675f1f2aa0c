"""§2 extensions, seventy-ninth wave — first-principles frequency
sketches and inequality-of-spend measures (published-method cadence).

- agg_countmin_firstprin: Count-Min sketch (Cormode & Muthukrishnan
  2005) of per-user event frequencies on oracle-shared md5 bits —
  depth 4 × width 256, point estimates for the true top-20 users.
- agg_ams_f2: the Alon-Matias-Szegedy F₂ (second frequency moment)
  tug-of-war sketch (1996) — 16 ±1 estimators, median of four
  4-means, all in exact integers.
- agg_palma_ratio: the Palma inequality ratio (Palma 2011) of
  customer spend — top-10% share over bottom-40% share on exact
  block-ranked cents.
- agg_concentration_index: the wealth-ordered concentration index
  (Kakwani 1977 / Wagstaff-van Doorslaer) of spend against account
  balance — the Gini twin where the x-axis ranks by a DIFFERENT
  variable than the one accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "agg_countmin_firstprin",
    """
    WITH freq AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS f
        FROM events GROUP BY user_id
    ),
    hashed AS (
        SELECT user_id, f, md5(CAST(user_id AS VARCHAR)) AS hx
        FROM freq
    ),
    rows4 AS (
        SELECT user_id, f, j,
               CAST(CASE WHEN v < 0 THEN v + 4294967296 ELSE v END % 256
                    AS BIGINT) AS bucket
        FROM (
            SELECT user_id, f, j,
                   from_hex(substr(hx, 1 + 8 * (j - 1), 8))::BIT::INT AS v
            FROM hashed, (VALUES (1), (2), (3), (4)) js(j)
        )
    ),
    sketch AS (
        SELECT j, bucket, CAST(sum(f) AS BIGINT) AS counter
        FROM rows4 GROUP BY j, bucket
    ),
    top20 AS (
        SELECT user_id, f FROM freq
        ORDER BY f DESC, user_id LIMIT 20
    ),
    est AS (
        SELECT t.user_id, t.f,
               CAST(min(s.counter) AS BIGINT) AS cm_estimate
        FROM top20 t
        JOIN rows4 r ON r.user_id = t.user_id
        JOIN sketch s ON s.j = r.j AND s.bucket = r.bucket
        GROUP BY t.user_id, t.f
    )
    SELECT user_id, f AS true_count, cm_estimate,
           cm_estimate - f AS overcount
    FROM est ORDER BY true_count DESC, user_id
    """,
    tags=("aggregate", "sketch"),
)
def agg_countmin_firstprin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch from first principles (Cormode &
    Muthukrishnan 2005), on md5 bits SHARED with the oracle so the
    whole sketch is hash-exact (the agg_hll_firstprin device): depth
    d=4 rows of width w=256 counters; hash_j(u) = 32-bit chunk j of
    md5(u) mod 256 (the hex→int parse normalizes DuckDB's signed-32
    BIT cast against Spark's unsigned conv(,16,10)); counter[j][b] =
    Σ f_u over colliding users; the point estimate for u is
    min_j counter[j][hash_j(u)] — an OVERcount by construction
    (reported as the exact non-negative `overcount`), within εN with
    probability 1−δ for ε = e/w, δ = e^−d. Estimates are evaluated
    at the true top-20 heavy hitters. Every number is an exact
    integer — sketch, estimates, overcounts.

    Scale shape: one keyed frequency reduce, a 4×-fanout map to the
    4·256-cell sketch (map-side-combinable — the mergeability that
    makes CM the distributed frequency workhorse), a global top-20
    (TakeOrdered), and a broadcast probe of the 1024-cell sketch.
    The exact per-user frequency table prices the sketch; at 100 TB
    keep the sketch and drop the exact side."""
    e = tbl(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    hx = F.md5(F.col("user_id").cast("string"))
    hashed = freq.select("user_id", "f", hx.alias("hx"))
    rows4 = (
        hashed.select(
            "user_id",
            "f",
            F.explode(F.array(*[F.lit(j) for j in (1, 2, 3, 4)])).alias(
                "j"
            ),
            "hx",
        )
        .select(
            "user_id",
            "f",
            "j",
            (
                F.conv(
                    F.substring(
                        "hx", (F.col("j") - 1) * 8 + 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 256
            ).alias("bucket"),
        )
    )
    sketch = rows4.groupBy("j", "bucket").agg(
        F.sum("f").cast("long").alias("counter")
    )
    top20 = freq.orderBy(F.col("f").desc(), "user_id").limit(20)
    est = (
        top20.join(rows4.select("user_id", "j", "bucket"), "user_id")
        .join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "f")
        .agg(F.min("counter").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "user_id",
        F.col("f").alias("true_count"),
        "cm_estimate",
        (F.col("cm_estimate") - F.col("f")).alias("overcount"),
    ).orderBy(F.col("true_count").desc(), "user_id")


@register(
    "agg_ams_f2",
    """
    WITH freq AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS f
        FROM events GROUP BY user_id
    ),
    hashed AS (
        SELECT f,
               CAST(CASE WHEN v < 0 THEN v + 4294967296 ELSE v END
                    AS BIGINT) AS w
        FROM (
            SELECT f,
                   from_hex(substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIT::INT AS v
            FROM freq
        )
    ),
    z AS (
        SELECT k,
               CAST(sum(CASE WHEN (w // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                             THEN f ELSE -f END) AS BIGINT) AS zk
        FROM hashed, (SELECT unnest(range(16)) AS k)
        GROUP BY k
    ),
    grp AS (
        SELECT k // 4 AS g,
               CAST(sum(CAST(zk AS HUGEINT) * zk) AS HUGEINT) AS m4
        FROM z GROUP BY 1
    ),
    med AS (
        SELECT CAST(sum(m4) - max(m4) - min(m4) AS HUGEINT) AS med8
        FROM grp
    ),
    ex AS (
        SELECT CAST(sum(CAST(f AS HUGEINT) * f) AS HUGEINT) AS f2
        FROM freq
    )
    SELECT CAST(f2 AS BIGINT) AS true_f2,
           round(CAST(med8 AS DOUBLE) / 8.0, 4) AS ams_estimate,
           round((CAST(med8 AS DOUBLE) / 8.0 - CAST(f2 AS DOUBLE))
                 / CAST(f2 AS DOUBLE), 4) AS rel_err,
           2 * abs(med8 - 8 * f2) <= 8 * f2 AS within_50pct
    FROM med CROSS JOIN ex
    """,
    tags=("aggregate", "sketch"),
)
def agg_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" F₂ sketch (Alon, Matias & Szegedy 1996): 16
    estimators z_k = Σ_u σ_k(u)·f_u with signs σ_k(u) = ±1 from bit
    k of the first md5 chunk (oracle-shared bits — the textbook
    4-wise-independence is approximated by the hash's bit mixing,
    stated honestly; the MACHINERY is the point), each z_k² an
    unbiased F₂ estimate; variance drops by averaging groups of 4
    and the median of the four group means gives the
    (ε,δ)-guarantee. Everything stays integral: z_k exact int64,
    z_k² and the group sums m4_g = Σz² (= 4·mean) in
    DECIMAL(38)/HUGEINT, and the median of FOUR values is half the
    sum of the middle two — med8 = Σm4 − max(m4) − min(m4) =
    8·median-of-means, an exact integer. The estimate and rel_err
    are display-only single divisions; the sanity flag
    2·|med8 − 8·F₂| ≤ 8·F₂ (rel err ≤ 50%) is an exact integer
    comparison, the agg_hll_firstprin within-3σ convention.

    Scale shape: one keyed frequency reduce, a 16×-fanout map to 16
    sign-sums (map-side-combinable — AMS sketches merge by adding
    z-vectors), a 16-row → 4-row → 1-row reduce chain. The exact F₂
    column prices the sketch; drop it at 100 TB."""
    e = tbl(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    w = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    hashed = freq.select("f", w.alias("w"))
    z = (
        hashed.select(
            "f",
            "w",
            F.explode(
                F.array(*[F.lit(k) for k in range(16)])
            ).alias("k"),
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.floor(
                        F.col("w") / F.pow(F.lit(2.0), F.col("k"))
                    ).cast("bigint")
                    % 2
                    == 1,
                    F.col("f"),
                ).otherwise(-F.col("f"))
            )
            .cast("long")
            .alias("zk")
        )
    )
    grp = z.groupBy((F.col("k") / 4).cast("int").alias("g")).agg(
        F.sum(F.col("zk").cast("decimal(38,0)") * F.col("zk")).alias("m4")
    )
    med = grp.agg(
        (F.sum("m4") - F.max("m4") - F.min("m4")).alias("med8")
    )
    ex = freq.agg(
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f")).alias("f2")
    )
    med8, f2 = F.col("med8"), F.col("f2")
    return med.crossJoin(F.broadcast(ex)).select(
        f2.cast("long").alias("true_f2"),
        F.round(med8.cast("double") / 8.0, 4).alias("ams_estimate"),
        F.round(
            (med8.cast("double") / 8.0 - f2.cast("double"))
            / f2.cast("double"),
            4,
        ).alias("rel_err"),
        (2 * F.abs(med8 - 8 * f2) <= 8 * f2).alias("within_50pct"),
    )


@register(
    "agg_palma_ratio",
    """
    WITH spend AS (
        SELECT c.c_custkey,
               CAST(coalesce(sum(CAST(CAST(o.o_totalprice
                        AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    rk AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, c_custkey) AS r,
               count(*) OVER () AS n
        FROM spend
    ),
    s AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(sum(CASE WHEN r > n - n // 10 THEN cents
                             ELSE 0 END) AS BIGINT) AS top10,
               CAST(sum(CASE WHEN r <= (2 * n) // 5 THEN cents
                             ELSE 0 END) AS BIGINT) AS bot40
        FROM rk
    )
    SELECT n AS n_customers, top10 AS top10_cents, bot40 AS bot40_cents,
           round(CAST(top10 AS DOUBLE) / bot40, 4) AS palma,
           top10 > bot40 AS top_dominates
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Palma inequality ratio (Palma 2011; Cobham-Sumner 2013):
    total spend of the top 10% of customers over the bottom 40% —
    the inequality measure that tracks where distributions actually
    move (the middle 50% share is famously stable). Customers with
    no orders enter at zero spend (left join). Decile membership is
    by exact block-ranked position (strict rank, custkey tiebreak;
    cutoffs n − n÷10 and 2n÷5 in floor arithmetic shared textually),
    band sums are exact cents, and the headline flag top10 > bot40
    (Palma > 1) is an exact integer comparison; the ratio itself is
    a display-only single division.

    Scale shape: one keyed reduce to per-customer spend, the
    block-ranked exact global rank (api core — rank windows
    partition by block), a broadcast 1-row count, one reduce."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum((dec2("o_totalprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("cents")
        )
    )
    ranked = api.exact_global_rank(spend, "cents", "c_custkey", "r")
    nrow = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = (
        ranked.crossJoin(F.broadcast(nrow))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("r") > F.col("n") - F.expr("n div 10"),
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("top10"),
            F.sum(
                F.when(
                    F.col("r") <= F.expr("(2 * n) div 5"),
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("bot40"),
        )
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("top10").alias("top10_cents"),
        F.col("bot40").alias("bot40_cents"),
        F.round(F.col("top10").cast("double") / F.col("bot40"), 4).alias(
            "palma"
        ),
        (F.col("top10") > F.col("bot40")).alias("top_dominates"),
    )


@register(
    "agg_concentration_index",
    """
    WITH spend AS (
        SELECT c.c_custkey, c.c_acctbal,
               CAST(coalesce(sum(CAST(CAST(o.o_totalprice
                        AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT cents,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) AS r,
               count(*) OVER () AS n
        FROM spend
    ),
    s AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(sum(CAST(r AS HUGEINT) * cents) AS HUGEINT) AS sry,
               CAST(sum(cents) AS BIGINT) AS t
        FROM rk
    )
    SELECT n AS n_customers,
           round((2.0 * CAST(sry AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1) * t)
                 / (CAST(n AS DOUBLE) * t), 4) AS conc_index,
           2 * sry > (CAST(n AS HUGEINT) + 1) * t AS pro_rich
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_concentration_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The concentration index (Kakwani 1977; Wagstaff, Paci & van
    Doorslaer 1991): the Gini twin where customers are ranked by a
    DIFFERENT variable (account balance — the wealth proxy) than the
    one accumulated (spend): CI = 2Σr_i·y_i/(n·Σy) − (n+1)/n ∈
    [−1, 1], positive when spend concentrates among the high-balance
    customers ("pro-rich"). Ranks are strict integers by (acctbal,
    custkey) — ties in the 2-decimal balance are broken
    deterministically, the convention both engines share.
    Σr·y promotes to DECIMAL(38)/HUGEINT (rank is corpus-sized);
    the headline pro_rich flag 2Σry > (n+1)·Σy is an exact integer
    cross-product and CI itself a display-only fixed-order double.
    Customers with no orders enter at zero spend.

    Scale shape: one keyed reduce to per-customer spend, the
    block-ranked exact global rank over acctbal (api core), one
    1-row reduce."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum((dec2("o_totalprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("cents")
        )
    )
    ranked = api.exact_global_rank(spend, "c_acctbal", "c_custkey", "r")
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("cents")).alias(
            "sry"
        ),
        F.sum("cents").cast("long").alias("t"),
    )
    n, sry, t = F.col("n"), F.col("sry"), F.col("t")
    return s.select(
        n.alias("n_customers"),
        F.round(
            (2.0 * sry.cast("double") - (n.cast("double") + 1) * t)
            / (n.cast("double") * t),
            4,
        ).alias("conc_index"),
        (2 * sry > (n.cast("decimal(38,0)") + 1) * t).alias("pro_rich"),
    )
