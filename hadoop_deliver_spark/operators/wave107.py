"""§2 extensions, hundred-seventh wave — closed-form multivariate
analytics: 2-D PCA and the two-sample Hotelling T².

Both use the same engine move: the 2×2 covariance algebra has CLOSED
FORMS (eigenvalues via the quadratic formula, inverse via the
adjugate), so what is normally "call LAPACK" becomes exact integer
moments + one fixed-order double expression per output — fully
hash-matchable, no linear-algebra library on either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

#: F(2, ∞) upper 5% point — the large-sample Hotelling cut
#: (literal shared with the oracle)
_F2_INF_95 = 2.9957


@register(
    "agg_pca2_closed_form",
    """
    WITH v AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM v
    ),
    c AS (
        SELECT n,
               sxx - CAST(sx AS DOUBLE) * sx / n AS a,
               syy - CAST(sy AS DOUBLE) * sy / n AS ccc,
               sxy - CAST(sx AS DOUBLE) * sy / n AS b
        FROM m
    )
    SELECT n AS n_rows,
           round((a + ccc + sqrt((a - ccc) * (a - ccc) + 4 * b * b))
                 / (2 * (a + ccc)), 6) AS explained_ratio,
           round(degrees(atan2(2 * b, a - ccc) / 2), 4) AS angle_deg,
           round((a + ccc + sqrt((a - ccc) * (a - ccc) + 4 * b * b))
                 / (2 * (a + ccc)), 6) > 0.8 AS elongated
    FROM c
    """,
    tags=("aggregate", "stats"),
)
def agg_pca2_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D principal component analysis in CLOSED FORM over
    (quantity, extended price): the 2×2 scatter matrix's eigenvalues
    are λ = ((a+c) ± √((a−c)² + 4b²))/2 (quadratic formula — no
    LAPACK, no iteration), so the explained-variance ratio
    λ₁/(λ₁+λ₂) = λ₁/(a+c) and the principal-axis angle
    ½·atan2(2b, a−c) are one fixed-order double expression each over
    exact integer moments (centered sums a, c, b built from
    HUGEINT/DECIMAL raw moments with a single division per term).
    This is the hash-matched counterpoint to the rows-only
    llm_embedding_spectrum: where 64-D spectra need an iterative
    trainer, 2-D needs only algebra. ``elongated`` (λ₁ > 4λ₂ ⇔
    ratio > 0.8) verdicts on the rounded ratio.

    Scale shape: one 6-moment map-side-combined reduce, 1-row math."""
    li = tbl(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor("l_extendedprice").cast("long").alias("y"),
    )
    d38 = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    m = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(d38("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(d38("x") * F.col("y")).cast("double").alias("sxy"),
    )
    c = m.select(
        "n",
        (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias("a"),
        (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")).alias("ccc"),
        (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")).alias("b"),
    )
    ratio = (
        F.col("a")
        + F.col("ccc")
        + F.sqrt(
            (F.col("a") - F.col("ccc")) * (F.col("a") - F.col("ccc"))
            + 4 * F.col("b") * F.col("b")
        )
    ) / (2 * (F.col("a") + F.col("ccc")))
    return c.select(
        F.col("n").alias("n_rows"),
        F.round(ratio, 6).alias("explained_ratio"),
        F.round(
            F.degrees(F.atan2(2 * F.col("b"), F.col("a") - F.col("ccc")) / 2),
            4,
        ).alias("angle_deg"),
        (F.round(ratio, 6) > 0.8).alias("elongated"),
    )


@register(
    "agg_hotelling_t2",
    f"""
    WITH v AS (
        SELECT l_returnflag = 'R' AS grp,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM v GROUP BY grp
    ),
    p AS (
        SELECT
            max(CASE WHEN grp THEN n END) AS n1,
            max(CASE WHEN grp THEN sx END) AS sx1,
            max(CASE WHEN grp THEN sy END) AS sy1,
            max(CASE WHEN grp THEN sxx END) AS sxx1,
            max(CASE WHEN grp THEN syy END) AS syy1,
            max(CASE WHEN grp THEN sxy END) AS sxy1,
            max(CASE WHEN NOT grp THEN n END) AS n2,
            max(CASE WHEN NOT grp THEN sx END) AS sx2,
            max(CASE WHEN NOT grp THEN sy END) AS sy2,
            max(CASE WHEN NOT grp THEN sxx END) AS sxx2,
            max(CASE WHEN NOT grp THEN syy END) AS syy2,
            max(CASE WHEN NOT grp THEN sxy END) AS sxy2
        FROM m
    ),
    s AS (
        SELECT n1, n2,
               CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2 AS dx,
               CAST(sy1 AS DOUBLE) / n1 - CAST(sy2 AS DOUBLE) / n2 AS dy,
               ((sxx1 - CAST(sx1 AS DOUBLE) * sx1 / n1)
                + (sxx2 - CAST(sx2 AS DOUBLE) * sx2 / n2))
                   / (n1 + n2 - 2) AS a,
               ((syy1 - CAST(sy1 AS DOUBLE) * sy1 / n1)
                + (syy2 - CAST(sy2 AS DOUBLE) * sy2 / n2))
                   / (n1 + n2 - 2) AS d,
               ((sxy1 - CAST(sx1 AS DOUBLE) * sy1 / n1)
                + (sxy2 - CAST(sx2 AS DOUBLE) * sy2 / n2))
                   / (n1 + n2 - 2) AS b
        FROM p
    ),
    t AS (
        SELECT n1, n2,
               (CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
               * (dx * (d * dx - b * dy) + dy * (a * dy - b * dx))
               / (a * d - b * b) AS t2
        FROM s
    )
    SELECT n1 AS n_returned, n2 AS n_rest,
           round(t2, 4) AS t2,
           round(t2 * (n1 + n2 - 3)
                 / (2.0 * (n1 + n2 - 2)), 4) AS f_stat,
           round(t2 * (n1 + n2 - 3) / (2.0 * (n1 + n2 - 2)), 4)
               > {_F2_INF_95!r} AS means_differ
    FROM t
    """,
    tags=("aggregate", "stats"),
)
def agg_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hotelling T² (1931) on the (quantity, price)
    mean VECTOR, returned vs kept lineitems — the multivariate
    generalization of the t-test that respects correlation between
    the coordinates (two marginal t-tests can both miss a shift
    along the minor axis of the ellipse; T² cannot). The pooled 2×2
    covariance is inverted by the ADJUGATE closed form
    (S⁻¹ = [[d,−b],[−b,a]]/(ad−b²)), so the whole statistic is exact
    integer moments + one fixed-order double expression; the F
    transform T²·(n−3)/(2(n−2)) is compared (rounded) against the
    F(2, ∞) 5% literal shared with the oracle.

    Scale shape: one 2-group 6-moment reduce, a 12-cell pivot,
    1-row algebra."""
    li = tbl(spark, sf_dir, "lineitem")
    v = li.select(
        (F.col("l_returnflag") == "R").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor("l_extendedprice").cast("long").alias("y"),
    )
    d38 = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    m = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(d38("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(d38("x") * F.col("y")).cast("double").alias("sxy"),
    )
    p = m.agg(
        *[
            F.max(F.when(F.col("grp") == flag, F.col(col))).alias(
                f"{col}{i}"
            )
            for i, flag in ((1, True), (2, False))
            for col in ("n", "sx", "sy", "sxx", "syy", "sxy")
        ]
    )
    dd = lambda c_: F.col(c_).cast("double")  # noqa: E731
    nn = F.col("n1") + F.col("n2") - 2
    s = p.select(
        "n1",
        "n2",
        (dd("sx1") / F.col("n1") - dd("sx2") / F.col("n2")).alias("dx"),
        (dd("sy1") / F.col("n1") - dd("sy2") / F.col("n2")).alias("dy"),
        (
            (
                (F.col("sxx1") - dd("sx1") * F.col("sx1") / F.col("n1"))
                + (F.col("sxx2") - dd("sx2") * F.col("sx2") / F.col("n2"))
            )
            / nn
        ).alias("a"),
        (
            (
                (F.col("syy1") - dd("sy1") * F.col("sy1") / F.col("n1"))
                + (F.col("syy2") - dd("sy2") * F.col("sy2") / F.col("n2"))
            )
            / nn
        ).alias("d"),
        (
            (
                (F.col("sxy1") - dd("sx1") * F.col("sy1") / F.col("n1"))
                + (F.col("sxy2") - dd("sx2") * F.col("sy2") / F.col("n2"))
            )
            / nn
        ).alias("b"),
    )
    t2 = (
        (F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2")))
        * (
            F.col("dx") * (F.col("d") * F.col("dx") - F.col("b") * F.col("dy"))
            + F.col("dy") * (F.col("a") * F.col("dy") - F.col("b") * F.col("dx"))
        )
        / (F.col("a") * F.col("d") - F.col("b") * F.col("b"))
    )
    fstat = F.round(
        t2 * (F.col("n1") + F.col("n2") - 3)
        / (2.0 * (F.col("n1") + F.col("n2") - 2)),
        4,
    )
    return s.select(
        F.col("n1").alias("n_returned"),
        F.col("n2").alias("n_rest"),
        F.round(t2, 4).alias("t2"),
        fstat.alias("f_stat"),
        (fstat > _F2_INF_95).alias("means_differ"),
    )
