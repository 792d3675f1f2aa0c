"""§2 extensions, eighty-fifth wave — unit roots, volatility
clustering, distributional distance, and sketch-quality contracts
(published-method cadence).

- ts_dickey_fuller: the Dickey-Fuller unit-root test (1979) on the
  daily-revenue series (Δy on y lag, intercept, τ_μ 5% = −2.86).
- ts_arch_lm: Engle's ARCH-LM test (1982) for volatility
  clustering — n·R² of squared residuals on their own lag.
- agg_hellinger_distance: the Hellinger/Bhattacharyya distance
  (1909/1943) between the two priorities' order-value bucket
  distributions — five literal buckets, fixed-order assembly.
- llm_minhash_estimate_quality: MinHash Jaccard-estimation accuracy
  (Broder 1997) on oracle-shared md5 permutations — the sketch-vs-
  exact quality contract (the llm_sim_ivf_recall precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

# τ_μ 5% Dickey-Fuller critical value (intercept, large n) and its
# square; χ²₁ 5% for the ARCH-LM — all shared textually
_DF_TAU_SQ = "8.1796"
_CHI2_1_95 = "3.841459"
_BUCKET_EDGES = (5_000_000, 10_000_000, 20_000_000, 30_000_000)
_MH_PERMS = 32


@register(
    "ts_dickey_fuller",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT y - lag(y) OVER (ORDER BY day) AS dy,
               lag(y) OVER (ORDER BY day) AS yl
        FROM daily
    ),
    obs AS (SELECT dy, yl FROM lagged WHERE yl IS NOT NULL),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yl) AS BIGINT) AS sx,
               CAST(sum(dy) AS BIGINT) AS sy,
               CAST(sum(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS sxx,
               CAST(sum(CAST(yl AS HUGEINT) * dy) AS HUGEINT) AS sxy,
               CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy
        FROM obs
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
               CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy
        FROM m
    )
    SELECT n AS n_obs,
           round(cxy / cxx, 6) AS rho_hat,
           round(CASE WHEN cxy < 0 THEN -1 ELSE 1 END
                 * sqrt(cxy * cxy * (n - 2)
                        / (cyy * cxx - cxy * cxy)), 4) AS t_stat,
           cxy < 0 AND cxy * cxy * (n - 2)
               > {_DF_TAU_SQ} * (cyy * cxx - cxy * cxy)
               AS stationary
    FROM c
    """,
    tags=("timeseries", "stats"),
)
def ts_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (1979), no augmentation, with
    intercept: regress Δy_t on y_(t−1) over the daily-revenue
    series; ρ̂ significantly below zero rejects the unit root
    (stationary/mean-reverting revenue). The τ_μ 5% critical value
    −2.86 enters as its square 8.1796 = (−2.86)², with the sign
    checked separately — t² = C_xy²·(n−2)/(C_yy·C_xx − C_xy²)
    follows from the closed-form one-regressor OLS, every C_ab =
    n·Σab − Σa·Σb assembled from exact DECIMAL(38)/HUGEINT moment
    sums and cast once to double in ONE fixed textual order (the
    agg_oneway_anova device). Lags run on the day-ordered series.

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one lag window over that bounded axis, a 1-row moment
    reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_ord = Window.orderBy("day")
    obs = (
        daily.select(
            (F.col("y") - F.lag("y").over(w_ord)).alias("dy"),
            F.lag("y").over(w_ord).alias("yl"),
        )
        .where(F.col("yl").isNotNull())
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yl").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(d38("yl") * F.col("yl")).alias("sxx"),
        F.sum(d38("yl") * F.col("dy")).alias("sxy"),
        F.sum(d38("dy") * F.col("dy")).alias("syy"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    c = m.select(
        "n",
        (n38 * F.col("sxx") - d38("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("sxy") - d38("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (n38 * F.col("syy") - d38("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
    )
    cxx, cxy, cyy = F.col("cxx"), F.col("cxy"), F.col("cyy")
    t2 = cxy * cxy * (n - 2) / (cyy * cxx - cxy * cxy)
    return c.select(
        n.alias("n_obs"),
        F.round(cxy / cxx, 6).alias("rho_hat"),
        F.round(
            F.when(cxy < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.sqrt(t2),
            4,
        ).alias("t_stat"),
        (
            (cxy < 0)
            & (
                cxy * cxy * (n - 2)
                > float(_DF_TAU_SQ) * (cyy * cxx - cxy * cxy)
            )
        ).alias("stationary"),
    )


@register(
    "ts_arch_lm",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, y,
               count(*) OVER () AS n,
               sum(y) OVER () AS tot
        FROM daily
    ),
    z AS (
        SELECT day,
               CAST(((CAST(n AS BIGINT) * y - tot) // 10000)
                    * ((CAST(n AS BIGINT) * y - tot) // 10000)
                    AS HUGEINT) AS z
        FROM seq
    ),
    lagged AS (
        SELECT z AS zt, lag(z) OVER (ORDER BY day) AS zl
        FROM z
    ),
    obs AS (SELECT zt, zl FROM lagged WHERE zl IS NOT NULL),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(zl) AS HUGEINT) AS sx,
               CAST(sum(zt) AS HUGEINT) AS sy,
               CAST(sum(zl * zl) AS HUGEINT) AS sxx,
               CAST(sum(zl * zt) AS HUGEINT) AS sxy,
               CAST(sum(zt * zt) AS HUGEINT) AS syy
        FROM obs
    ),
    c AS (
        SELECT n,
               CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS cxx,
               CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS cxy,
               CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy
        FROM m
    )
    SELECT n AS n_obs,
           round(CAST(n AS DOUBLE) * cxy * cxy / (cxx * cyy), 4)
               AS lm_stat,
           CAST(n AS DOUBLE) * cxy * cxy
               > {_CHI2_1_95} * cxx * cyy AS arch_effect
    FROM c
    """,
    tags=("timeseries", "stats"),
)
def ts_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH-LM test (1982) at lag 1: volatility clustering in
    daily revenue — regress the squared demeaned series on its own
    lag; LM = n·R² is asymptotically χ²₁ under homoskedasticity.
    The tested series is z_t = ((n·y_t − T) div 10⁴)² — the n-scaled
    integer residual QUANTIZED by the shared literal 10⁴ before
    squaring, which keeps the fourth-power moment sums inside
    DECIMAL(38)/HUGEINT at any plausible scale (raw ẽ⁴ would
    overflow at sf0.1) while leaving the ARCH signal intact (the
    quantization is ~10⁻⁵ of the residual scale). Centered moments
    C_ab = n·Σab − Σa·Σb are exact, cast once to double, and
    LM = n·C_xy²/(C_xx·C_yy) plus its verdict assemble in ONE fixed
    textual order (the agg_oneway_anova device).

    Scale shape: one keyed reduce to the calendar-bounded daily
    series, one lag window, a 1-row moment reduce."""
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor("o_totalprice").cast("long"))
        .cast("long")
        .alias("y")
    )
    w_all = Window.partitionBy()
    seq = daily.select(
        "day",
        "y",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("y").over(w_all).alias("tot"),
    )
    q = F.expr("(n * y - tot) div 10000")
    z = seq.select(
        "day", (q.cast("decimal(38,0)") * q).alias("z")
    )
    w_ord = Window.orderBy("day")
    obs = (
        z.select(
            F.col("z").alias("zt"), F.lag("z").over(w_ord).alias("zl")
        )
        .where(F.col("zl").isNotNull())
    )
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zl").alias("sx"),
        F.sum("zt").alias("sy"),
        F.sum(F.col("zl") * F.col("zl")).alias("sxx"),
        F.sum(F.col("zl") * F.col("zt")).alias("sxy"),
        F.sum(F.col("zt") * F.col("zt")).alias("syy"),
    )
    n = F.col("n")
    n38 = n.cast("decimal(38,0)")
    c = m.select(
        "n",
        (n38 * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("cxx"),
        (n38 * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("cxy"),
        (n38 * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
    )
    cxx, cxy, cyy = F.col("cxx"), F.col("cxy"), F.col("cyy")
    return c.select(
        n.alias("n_obs"),
        F.round(n.cast("double") * cxy * cxy / (cxx * cyy), 4).alias(
            "lm_stat"
        ),
        (
            n.cast("double") * cxy * cxy
            > float(_CHI2_1_95) * cxx * cyy
        ).alias("arch_effect"),
    )


@register(
    "agg_hellinger_distance",
    f"""
    WITH b AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
                   AS smp,
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
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    piv AS (
        SELECT
            {", ".join(
                f"CAST(count(CASE WHEN smp = {s} AND bk = {k} THEN 1 END) "
                f"AS BIGINT) AS c{s}_{k}"
                for s in (1, 2)
                for k in range(1, 6)
            )},
            CAST(count(CASE WHEN smp = 1 THEN 1 END) AS BIGINT) AS n1,
            CAST(count(CASE WHEN smp = 2 THEN 1 END) AS BIGINT) AS n2
        FROM b
    ),
    bc AS (
        SELECT n1, n2,
               {" + ".join(
                   f"sqrt(CAST(c1_{k} AS DOUBLE) * c2_{k} "
                   f"/ (CAST(n1 AS DOUBLE) * n2))"
                   for k in range(1, 6)
               )} AS bcoef
        FROM piv
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           round(bcoef, 6) AS bhattacharyya_coef,
           round(sqrt(1 - bcoef), 6) AS hellinger,
           bcoef < 0.9975 AS distributions_differ
    FROM bc
    """,
    tags=("agg", "stats"),
)
def agg_hellinger_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance (1909) via the Bhattacharyya coefficient
    (1943) between the URGENT and LOW order-value distributions over
    the five shared literal cent buckets (the agg_gk_gamma ladder):
    BC = Σ√(p_k·q_k), H = √(1 − BC) ∈ [0, 1] — the proper
    f-divergence metric (unlike KL it is symmetric, bounded, and
    tolerates empty buckets). The ten bucket counts PIVOT to one row
    so BC assembles as FIVE sqrt terms in ONE fixed textual order
    (the agg_oneway_anova device — no aggregation-order float risk);
    √(p·q) = √(c1·c2/(n1·n2)) keeps each term a single correctly-
    rounded op chain on exact integers. The verdict BC < 0.9975
    (H > 0.05) compares the same bit-identical double against a
    shared literal.

    Scale shape: one keyed reduce of the fact table to ten cells,
    a 1-row pivot — map-side-combinable all the way."""
    o = tbl(spark, sf_dir, "orders")
    from hadoop_deliver_spark.tables import dec2

    cents = (dec2("o_totalprice") * 100).cast("long")
    bk = (
        F.when(cents <= _BUCKET_EDGES[0], 1)
        .when(cents <= _BUCKET_EDGES[1], 2)
        .when(cents <= _BUCKET_EDGES[2], 3)
        .when(cents <= _BUCKET_EDGES[3], 4)
        .otherwise(5)
    )
    b = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(2)
        .alias("smp"),
        bk.alias("bk"),
    )
    piv = b.agg(
        *[
            F.count(
                F.when((F.col("smp") == s) & (F.col("bk") == k), F.lit(1))
            )
            .cast("long")
            .alias(f"c{s}_{k}")
            for s in (1, 2)
            for k in range(1, 6)
        ],
        F.count(F.when(F.col("smp") == 1, F.lit(1)))
        .cast("long")
        .alias("n1"),
        F.count(F.when(F.col("smp") == 2, F.lit(1)))
        .cast("long")
        .alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    bcoef = None
    for k in range(1, 6):
        term = F.sqrt(
            F.col(f"c1_{k}").cast("double")
            * F.col(f"c2_{k}")
            / (n1.cast("double") * n2)
        )
        bcoef = term if bcoef is None else bcoef + term
    bc = piv.select("n1", "n2", bcoef.alias("bcoef"))
    return bc.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(F.col("bcoef"), 6).alias("bhattacharyya_coef"),
        F.round(F.sqrt(1 - F.col("bcoef")), 6).alias("hellinger"),
        (F.col("bcoef") < 0.9975).alias("distributions_differ"),
    )


@register(
    "llm_minhash_estimate_quality",
    f"""
    WITH sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' ')
               )) AS sh
        FROM documents
    ),
    sig AS (
        SELECT doc_id, p,
               CAST(min(CASE WHEN v < 0 THEN v + 4294967296 ELSE v END)
                    AS BIGINT) AS mh
        FROM (
            SELECT s.doc_id, ps.p,
                   from_hex(substr(md5(ps.p || '|' || g.g), 1, 8))
                       ::BIT::INT AS v
            FROM sets s,
                 unnest(s.sh) AS g(g),
                 (SELECT unnest(range({_MH_PERMS})) AS p) ps
        )
        GROUP BY doc_id, p
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i,
               CAST(len(a.sh) + len(b.sh)
                    - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS u
        FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
    ),
    agree AS (
        SELECT sa.doc_id AS da,
               CAST(count(CASE WHEN sa.mh = sb.mh THEN 1 END) AS BIGINT)
                   AS ag
        FROM sig sa JOIN sig sb
          ON sb.doc_id = sa.doc_id + 1 AND sb.p = sa.p
        GROUP BY sa.doc_id
    ),
    j AS (
        SELECT p.da, p.i, p.u, a.ag
        FROM pairs p JOIN agree a ON a.da = p.da
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN abs({_MH_PERMS} * i - ag * u)
                              <= 8 * u THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_025,
           CAST(avg(abs(CAST(ag AS DOUBLE) / {_MH_PERMS}
                        - CAST(i AS DOUBLE) / u)) AS REAL)
               AS mean_abs_err
    FROM j
    """,
    tags=("llm", "sketch"),
)
def llm_minhash_estimate_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash Jaccard-estimation accuracy (Broder 1997), the
    sketch-vs-exact quality contract a dedup pipeline gates its
    threshold on (the llm_sim_ivf_recall precedent): 32 md5-derived
    permutations shared with the oracle (hash_p(g) = chunk of
    md5(p||'|'||g), signed-normalized — the agg_hll_firstprin
    device), signatures compared on adjacent-doc_id pairs against
    the EXACT 3-shingle Jaccard. The estimate is agreement/32, so
    the per-pair "within ±0.25" check is the exact integer
    |32·i − ag·u| ≤ 8·u (no float decides membership); mean
    absolute error ships as FLOAT32 (aggregation-order drift
    absorbed — the agg_bws_test device). Adjacent-id pairs sample
    the whole Jaccard spectrum deterministically without a
    candidate stage.

    Scale shape: a 32×-fanout shingle map reduced per (doc, perm) —
    map-side-combinable min — one id-shifted self-join (co-
    partitioned equi-join), one reduce. The exact-Jaccard column is
    the expensive side and exists to price the sketch."""
    d = tbl(spark, sf_dir, "documents")
    sh = F.array_distinct(
        F.expr(
            "CASE WHEN size(split(text, ' ')) >= 3 THEN "
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
            "ELSE array() END"
        )
    )
    sets = d.select("doc_id", sh.alias("sh")).localCheckpoint()
    inv = sets.select("doc_id", F.explode("sh").alias("g"))
    # r12 (guide §2.3/§4): hash each DISTINCT shingle once per
    # permutation instead of per (doc, perm, instance) — the fixture
    # carries ~10× more shingle instances than distinct shingles, so
    # the 32 md5 towers ran 10× too often; the hash table (vocab × 32
    # int64) broadcasts and the per-doc signature becomes 32 parallel
    # min-aggregates over ONE pass of the inverted index. Hash values
    # are byte-identical to the per-instance form (same md5 input), so
    # the oracle and the result are unchanged.
    gh = (
        inv.select("g")
        .distinct()
        .select(
            "g",
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{p}|"), F.col("g"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    for p in range(_MH_PERMS)
                ]
            ).alias("hs"),
        )
    )
    sigw = (
        inv.join(F.broadcast(gh), "g")
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.element_at("hs", p + 1)).alias(f"m{p}")
                for p in range(_MH_PERMS)
            ]
        )
    )
    sig = sigw.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"m{p}") for p in range(_MH_PERMS)])
        ).alias("p", "mh"),
    )
    sa = sets.toDF("da", "sh_a").filter(F.size("sh_a") > 0)
    sb = sets.toDF("db", "sh_b").filter(F.size("sh_b") > 0)
    pairs = (
        sa.join(sb, F.col("db") == F.col("da") + 1)
        .select(
            "da",
            F.size(F.array_intersect("sh_a", "sh_b"))
            .cast("long")
            .alias("i"),
            (
                F.size("sh_a")
                + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            )
            .cast("long")
            .alias("u"),
        )
    )
    s1 = sig.toDF("da", "p", "mh_a")
    s2 = sig.toDF("db", "p", "mh_b")
    agree = (
        s1.join(
            s2,
            (F.col("db") == F.col("da") + 1) & (s1["p"] == s2["p"]),
        )
        .groupBy("da")
        .agg(
            F.count(F.when(F.col("mh_a") == F.col("mh_b"), F.lit(1)))
            .cast("long")
            .alias("ag")
        )
    )
    j = pairs.join(agree, "da")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(
                F.abs(_MH_PERMS * F.col("i") - F.col("ag") * F.col("u"))
                <= 8 * F.col("u"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within_025"),
        F.avg(
            F.abs(
                F.col("ag").cast("double") / _MH_PERMS
                - F.col("i").cast("double") / F.col("u")
            )
        )
        .cast("float")
        .alias("mean_abs_err"),
    )
