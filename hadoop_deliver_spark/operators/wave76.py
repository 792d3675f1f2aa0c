"""§2 extensions, hundredth wave — index-number theory and trade
specialization classics (published-method cadence).

- orders_fisher_price_index: Laspeyres (1871), Paasche (1874), and
  Fisher's ideal (1922) price indices, 1997 over the 1996 base, on
  the per-part basket — with per-part floor-cent quantization so
  every basket sum is an exact integer.
- supplier_balassa_rca: Balassa's revealed comparative advantage
  (1965) of supplier nations across the five manufacturer
  families — fully exact-integer specialization flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "orders_fisher_price_index",
    """
    WITH li AS (
        SELECT l.l_partkey AS pk,
               CASE WHEN CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
                    THEN 1 ELSE 0 END AS yr,
               CAST(l.l_quantity AS BIGINT) AS q,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
    ),
    per AS (
        SELECT pk, yr, CAST(sum(q) AS BIGINT) AS qty,
               CAST(sum(v) AS BIGINT) AS rev
        FROM li GROUP BY pk, yr
    ),
    basket AS (
        SELECT b.pk,
               b.qty AS q0, b.rev AS v0,
               c.qty AS q1, c.rev AS v1,
               (CAST(c.rev AS HUGEINT) * b.qty) // c.qty AS lterm,
               (CAST(b.rev AS HUGEINT) * c.qty) // b.qty AS pterm
        FROM (SELECT * FROM per WHERE yr = 0) b
        JOIN (SELECT * FROM per WHERE yr = 1) c USING (pk)
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(v0) AS HUGEINT) AS sv0,
               CAST(sum(v1) AS HUGEINT) AS sv1,
               CAST(sum(lterm) AS HUGEINT) AS slt,
               CAST(sum(pterm) AS HUGEINT) AS spt
        FROM basket
    )
    SELECT n_parts,
           round(CAST(slt AS DOUBLE) / CAST(sv0 AS DOUBLE), 6)
               AS laspeyres,
           round(CAST(sv1 AS DOUBLE) / CAST(spt AS DOUBLE), 6)
               AS paasche,
           round(sqrt((CAST(slt AS DOUBLE) / CAST(sv0 AS DOUBLE))
                      * (CAST(sv1 AS DOUBLE) / CAST(spt AS DOUBLE))), 6)
               AS fisher_ideal,
           slt > sv0 AS laspeyres_inflation
    FROM s
    """,
    tags=("orders", "stats"),
)
def orders_fisher_price_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The index-number trio — Laspeyres (1871, base-period basket),
    Paasche (1874, current basket), and Fisher's ideal index (1922,
    their geometric mean, the one that passes the time-reversal
    test) — for 1997 over the 1996 base on the per-PART basket
    (part prices = period unit values rev/qty; the fixed-WEIGHT
    design is what distinguishes this from orders_unit_value_index,
    which lets the basket drift). Per-part basket terms p₁q₀ =
    rev₁·qty₀/qty₁ are floor-cent QUANTIZED to exact integers
    ((rev₁·qty₀) div qty₁ — a ≤1-cent-per-part stated knob, ~1e-9
    of the basket), so every Σ is an exact DECIMAL(38)/HUGEINT sum,
    each index is one or two exact-input double divisions, and the
    Laspeyres inflation verdict Σ(p₁q₀) > Σ(p₀q₀) is FULLY exact.
    Parts absent in either year drop (matched-basket convention).

    Scale shape: one keyed header-lines join reduce to per-(part,
    year) cells, one co-partitioned self-join on part, a 1-row
    basket reduce — map-side-combinable."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    d = F.to_date("o_orderdate")
    lif = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(
            (d >= F.lit("1996-01-01").cast("date"))
            & (d < F.lit("1998-01-01").cast("date"))
        )
        .select(
            F.col("l_partkey").alias("pk"),
            F.when(d >= F.lit("1997-01-01").cast("date"), 1)
            .otherwise(0)
            .alias("yr"),
            F.col("l_quantity").cast("long").alias("q"),
            (dec2("l_extendedprice") * 100).cast("long").alias("v"),
        )
    )
    per = lif.groupBy("pk", "yr").agg(
        F.sum("q").cast("long").alias("qty"),
        F.sum("v").cast("long").alias("rev"),
    )
    b = per.where(F.col("yr") == 0).select(
        "pk", F.col("qty").alias("q0"), F.col("rev").alias("v0")
    )
    c = per.where(F.col("yr") == 1).select(
        "pk", F.col("qty").alias("q1"), F.col("rev").alias("v1")
    )
    basket = b.join(c, "pk").select(
        "pk",
        "q0",
        "v0",
        "q1",
        "v1",
        F.expr(
            "(CAST(v1 AS DECIMAL(38,0)) * q0) div q1"
        ).alias("lterm"),
        F.expr(
            "(CAST(v0 AS DECIMAL(38,0)) * q1) div q0"
        ).alias("pterm"),
    )
    s = basket.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("v0").cast("decimal(38,0)")).alias("sv0"),
        F.sum(F.col("v1").cast("decimal(38,0)")).alias("sv1"),
        F.sum("lterm").alias("slt"),
        F.sum("pterm").alias("spt"),
    )
    lasp = F.col("slt").cast("double") / F.col("sv0").cast("double")
    paas = F.col("sv1").cast("double") / F.col("spt").cast("double")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher_ideal"),
        (F.col("slt") > F.col("sv0")).alias("laspeyres_inflation"),
    )


@register(
    "supplier_balassa_rca",
    """
    WITH x AS (
        SELECT n.n_name AS nation,
               CAST(substr(p.p_brand, 7, 1) AS INT) AS fam,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(sum(v) AS HUGEINT) AS xt FROM x
    ),
    rows_ AS (
        SELECT nation, CAST(sum(v) AS HUGEINT) AS xi
        FROM x GROUP BY nation
    ),
    cols_ AS (
        SELECT fam, CAST(sum(v) AS HUGEINT) AS xj
        FROM x GROUP BY fam
    ),
    rca AS (
        SELECT x.nation, x.fam,
               round(CAST(CAST(x.v AS HUGEINT) * t.xt AS DOUBLE)
                     / CAST(r.xi * c.xj AS DOUBLE), 4) AS rca,
               CAST(x.v AS HUGEINT) * t.xt > r.xi * c.xj
                   AS specialized
        FROM x
        JOIN rows_ r USING (nation)
        JOIN cols_ c USING (fam)
        CROSS JOIN tot t
    )
    SELECT nation, fam, rca, specialized
    FROM rca
    ORDER BY rca DESC, nation, fam
    LIMIT 20
    """,
    tags=("supplier", "stats"),
)
def supplier_balassa_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa's revealed comparative advantage (1965): RCA_ij =
    (x_ij/x_i·)/(x_·j/x_··) over supplier-NATION i × manufacturer
    FAMILY j export revenue (brand leading digit, the
    graph_modularity families) — the trade-economics
    specialization index that normalizes a nation's family share by
    the family's world share; RCA > 1 reveals specialization. The
    whole 25-nation × 5-family matrix reduces to exact integer cell
    sums, each displayed RCA is ONE exact-input double division of
    the cross products x_ij·x_·· and x_i·x_·j, and the specialized
    flag x_ij·x_·· > x_i··x_·j is FULLY exact DECIMAL(38)/HUGEINT.
    Top-20 by (rca DESC, nation, fam) — a deterministic total
    order on exact-input doubles plus unique keys.

    Scale shape: the fact table reduces through broadcast dimension
    joins to ≤125 cells; marginals/total are bounded reduces
    broadcast back — map-side-combinable, no window."""
    li = tbl(spark, sf_dir, "lineitem")
    sup = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    prt = tbl(spark, sf_dir, "part")
    x = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(prt, li["l_partkey"] == prt["p_partkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.substring("p_brand", 7, 1).cast("int").alias("fam"),
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("v")
        )
    ).localCheckpoint()
    tot = x.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("xt")
    )
    rows_ = x.groupBy("nation").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("xi")
    )
    cols_ = x.groupBy("fam").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("xj")
    )
    rca = (
        x.join(F.broadcast(rows_), "nation")
        .join(F.broadcast(cols_), "fam")
        .crossJoin(F.broadcast(tot))
    )
    num = F.col("v").cast("decimal(38,0)") * F.col("xt")
    den = F.col("xi") * F.col("xj")
    return (
        rca.select(
            "nation",
            "fam",
            F.round(num.cast("double") / den.cast("double"), 4).alias(
                "rca"
            ),
            (num > den).alias("specialized"),
        )
        .orderBy(F.desc("rca"), "nation", "fam")
        .limit(20)
    )
