"""§2 extensions, hundred-sixty-sixth wave — micro-level
concentration and hedonic price gradients.

- customers_wallet_hhi: the distribution of per-customer brand-HHI
  ("share of wallet" concentration) — agg_hhi asks how concentrated
  the MARKET is; this asks how concentrated each CUSTOMER's spending
  is across brands, then summarizes the distribution at exact
  quartiles — the loyalty/diversification micro-read.
- parts_size_elasticity: the log-log price~size gradient across the
  part catalog per manufacturer family — the hedonic-regression
  reading of the catalog (is price ∝ size^β?), with R² and the
  constant-returns verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark import api
from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "customers_wallet_hhi",
    """
    WITH spend AS (
        SELECT o.o_custkey AS ck, p.p_brand AS brand,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT ck, CAST(sum(cents) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_brands,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        FROM spend GROUP BY ck
    ),
    h AS (
        SELECT ck, n_brands,
               CAST(s2 AS DOUBLE) / (CAST(t AS DOUBLE) * t) AS hhi
        FROM tot WHERE t > 0
    ),
    rk AS (
        SELECT hhi, n_brands,
               row_number() OVER (ORDER BY hhi, ck) AS r,
               count(*) OVER () AS n
        FROM h
    )
    SELECT max(n) AS n_customers,
           round(avg(n_brands), 4) AS mean_brands,
           round(avg(hhi), 6) AS mean_hhi,
           round(max(CASE WHEN r = CAST(ceil(0.25 * n) AS BIGINT)
                          THEN hhi END), 6) AS hhi_q1,
           round(max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                          THEN hhi END), 6) AS hhi_median,
           round(max(CASE WHEN r = CAST(ceil(0.75 * n) AS BIGINT)
                          THEN hhi END), 6) AS hhi_q3,
           CAST(count(*) FILTER (hhi > 0.25) AS BIGINT)
               AS n_concentrated
    FROM rk
    """,
    tags=("analytics", "stats"),
)
def customers_wallet_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-wallet concentration: each customer's Herfindahl
    index over their OWN brand-spend shares (HHI = Σ cents²/T² —
    exact integer numerator and denominator, one division per
    customer), summarized as the mean brand count, mean HHI, exact
    type-1 quartiles of the customer-HHI distribution (block-ranked
    rank selection, ck tiebreak) and the count above the 0.25
    'concentrated' line (the DOJ threshold reused as a loyalty
    screen, stated). agg_hhi and agg_rosenbluth_index read the
    MARKET's concentration; this is the micro dual — a market can be
    unconcentrated while every customer is single-brand loyal, and
    that distinction is exactly what the distribution here shows.

    Scale shape: one 3-way fact equi-join, a (customer, brand)
    keyed reduce, a customer-keyed reduce, one block-ranked scan of
    the customer frame, one scalar reduce."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    p = tbl(spark, sf_dir, "part")
    spend = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("o_custkey").alias("ck"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    cd = F.col("cents").cast("decimal(38,0)")
    tot = spend.groupBy("ck").agg(
        F.sum("cents").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum(cd * F.col("cents")).alias("s2"),
    )
    h = tot.filter(F.col("t") > 0).select(
        "ck",
        "n_brands",
        (
            F.col("s2").cast("double")
            / (F.col("t").cast("double") * F.col("t"))
        ).alias("hhi"),
    )
    rk = api.exact_global_rank(h, "hhi", "ck", "r")
    n1 = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sel = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("r") == F.ceil(q * F.col("n")).cast("long"), F.col("hhi")
        )
    )
    return (
        rk.crossJoin(F.broadcast(n1))
        .agg(
            F.max("n").alias("n_customers"),
            F.round(F.avg("n_brands"), 4).alias("mean_brands"),
            F.round(F.avg("hhi"), 6).alias("mean_hhi"),
            F.round(sel(0.25), 6).alias("hhi_q1"),
            F.round(sel(0.5), 6).alias("hhi_median"),
            F.round(sel(0.75), 6).alias("hhi_q3"),
            F.sum(F.when(F.col("hhi") > 0.25, 1).otherwise(0))
            .cast("long")
            .alias("n_concentrated"),
        )
    )


@register(
    "parts_size_elasticity",
    """
    WITH x AS (
        SELECT substr(p_brand, 1, 7) AS mfr,
               ln(CAST(p_size AS DOUBLE)) AS lx,
               ln(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE))
                   AS ly
        FROM part WHERE p_size > 0 AND p_retailprice > 0
    ),
    m AS (
        SELECT mfr, CAST(count(*) AS BIGINT) AS n,
               avg(lx) AS mx, avg(ly) AS my,
               sum(lx * ly) AS sxy, sum(lx * lx) AS sxx,
               sum(ly * ly) AS syy
        FROM x GROUP BY 1
    )
    SELECT mfr AS manufacturer, n AS n_parts,
           round((sxy - n * mx * my) / (sxx - n * mx * mx), 6)
               AS size_elasticity,
           round(my - (sxy - n * mx * my) / (sxx - n * mx * mx) * mx, 4)
               AS log_intercept,
           round(pow(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 6)
               AS r_squared,
           abs(round((sxy - n * mx * my) / (sxx - n * mx * mx), 6) - 1)
               < 0.1 AS near_linear_pricing
    FROM m ORDER BY mfr
    """,
    tags=("parts", "stats"),
)
def parts_size_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hedonic price–size gradient per manufacturer family (the
    brand prefix 'Brand#N'): OLS of ln(retailprice) on ln(size)
    across the catalog — β is the size elasticity of price (β = 1 ⇒
    price ∝ size, linear pricing; β < 1 ⇒ bulk discount built into
    the catalog; β > 1 ⇒ premium scaling), with R² saying how much
    of catalog price variation size alone explains. The ±0.1
    near-linear verdict reads the ROUNDED β (screening convention).
    parts_margin_analysis reads the catalog's margins; this reads
    its pricing FORM. Log moments are one fixed textual chain over
    exact (size, cent) integers; per-family sums wobble only in the
    last ulp under the round-4/6 display.

    Scale shape: ONE keyed reduce of the part table to ≤5 family
    rows, closed-form scalars — map-side combine."""
    p = tbl(spark, sf_dir, "part")
    x = p.filter((F.col("p_size") > 0) & (F.col("p_retailprice") > 0)).select(
        F.substring("p_brand", 1, 7).alias("mfr"),
        F.log(F.col("p_size").cast("double")).alias("lx"),
        F.log(dec2("p_retailprice").cast("double")).alias("ly"),
    )
    m = x.groupBy("mfr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("lx").alias("mx"),
        F.avg("ly").alias("my"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    n, mx, my = F.col("n"), F.col("mx"), F.col("my")
    beta = (F.col("sxy") - n * mx * my) / (F.col("sxx") - n * mx * mx)
    r2 = F.pow(F.col("sxy") - n * mx * my, 2) / (
        (F.col("sxx") - n * mx * mx) * (F.col("syy") - n * my * my)
    )
    return m.select(
        F.col("mfr").alias("manufacturer"),
        n.alias("n_parts"),
        F.round(beta, 6).alias("size_elasticity"),
        F.round(my - beta * mx, 4).alias("log_intercept"),
        F.round(r2, 6).alias("r_squared"),
        (F.abs(F.round(beta, 6) - 1) < 0.1).alias("near_linear_pricing"),
    ).orderBy("manufacturer")
