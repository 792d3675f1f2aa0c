"""§2 extensions, hundred-sixty-first wave — inventory-control
classics on top of the fulfilment data.

- orders_safety_stock: the z·σ_d·√LT safety-stock formula per
  priority class, with demand variance from exact daily counts and
  the lead-time term from the ACTUAL order→ship lag distribution —
  the reorder-point engine behind every replenishment policy, the
  continuous-review complement of orders_newsvendor's single-period
  quantile rule.
- orders_eoq: Wilson's economic order quantity √(2DK/h) per
  priority class — the lot-size formula that, with
  orders_safety_stock's reorder point, completes the classic (Q, r)
  inventory policy; order/holding cost literals are pinned and
  stated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import tbl

_Z_95 = "1.644854"  # one-sided 95% service level
_EOQ_K = 50.0  # order (setup) cost, pinned literal dollars
_EOQ_H = 2.0  # holding cost per unit-year, pinned literal dollars


@register(
    "orders_safety_stock",
    f"""
    WITH demand AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS d
        FROM orders GROUP BY 1, 2
    ),
    dm AS (
        SELECT priority,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(d) AS BIGINT) AS s1,
               CAST(sum(d * d) AS BIGINT) AS s2
        FROM demand GROUP BY 1
    ),
    lt AS (
        SELECT o.o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(datediff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE))) AS BIGINT)
                   AS lt1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ),
    j AS (
        SELECT dm.priority, dm.n_days,
               CAST(dm.s1 AS DOUBLE) / dm.n_days AS mean_d,
               (CAST(dm.s2 AS DOUBLE)
                - CAST(dm.s1 AS DOUBLE) * dm.s1 / dm.n_days)
                   / (dm.n_days - 1) AS var_d,
               CAST(lt.lt1 AS DOUBLE) / lt.n_lines AS mean_lt
        FROM dm JOIN lt ON lt.priority = dm.priority
    )
    SELECT priority, n_days,
           round(mean_d, 4) AS mean_daily_demand,
           round(sqrt(var_d), 4) AS sd_daily_demand,
           round(mean_lt, 4) AS mean_lead_days,
           round({_Z_95} * sqrt(var_d) * sqrt(mean_lt), 4)
               AS safety_stock_units,
           round(mean_d * mean_lt
                 + {_Z_95} * sqrt(var_d) * sqrt(mean_lt), 4)
               AS reorder_point_units
    FROM j ORDER BY priority
    """,
    tags=("orders", "stats"),
)
def orders_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-review safety stock per priority class:
    SS = z·σ_d·√L̄ with z = 1.6449 (one-sided 95% cycle-service
    literal, pinned), σ_d the sample SD of exact daily order counts,
    and L̄ the mean order→ship lag in days measured from the ACTUAL
    lineitem fulfilment lags — plus the reorder point
    R = d̄·L̄ + SS. This is the σ_d√L form of the classical formula
    (demand uncertainty over an average lead time; the σ_LT term
    drops because lag variance enters the engine through
    orders_shipping_lag's full distribution instead — stated). Where
    orders_newsvendor sets a single-period stocking QUANTILE, this
    sets the continuous-review trigger — together with orders_eoq's
    lot size they pin the classic (Q, r) policy. Daily counts,
    Σd, Σd², and lag-day sums are exact integers; the assembly is
    one fixed textual float chain rounded at 4.

    Scale shape: one daily-demand keyed reduce, one orders⋈lineitem
    equi-join reduced per priority, one 5-row join — no windows."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    demand = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("d"))
    dm = demand.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
    )
    lt = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("lt1"),
        )
    )
    mean_d = F.col("s1").cast("double") / F.col("n_days")
    var_d = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    mean_lt = F.col("lt1").cast("double") / F.col("n_lines")
    j = dm.join(lt, "priority").select(
        "priority",
        "n_days",
        mean_d.alias("mean_d"),
        var_d.alias("var_d"),
        mean_lt.alias("mean_lt"),
    )
    z = float(_Z_95)
    ss = z * F.sqrt(F.col("var_d")) * F.sqrt(F.col("mean_lt"))
    return j.select(
        "priority",
        "n_days",
        F.round("mean_d", 4).alias("mean_daily_demand"),
        F.round(F.sqrt("var_d"), 4).alias("sd_daily_demand"),
        F.round("mean_lt", 4).alias("mean_lead_days"),
        F.round(ss, 4).alias("safety_stock_units"),
        F.round(F.col("mean_d") * F.col("mean_lt") + ss, 4).alias(
            "reorder_point_units"
        ),
    ).orderBy("priority")


@register(
    "orders_eoq",
    f"""
    WITH d AS (
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(max(CAST(o_orderdate AS DATE))
                    - min(CAST(o_orderdate AS DATE)) + 1 AS BIGINT)
                   AS span_days
        FROM orders GROUP BY 1
    )
    SELECT priority, n_orders,
           round(CAST(n_orders AS DOUBLE) * 365.25 / span_days, 4)
               AS annual_demand,
           round(sqrt(2 * (CAST(n_orders AS DOUBLE) * 365.25 / span_days)
                      * {_EOQ_K} / {_EOQ_H}), 4) AS eoq_units,
           round((CAST(n_orders AS DOUBLE) * 365.25 / span_days)
                 / sqrt(2 * (CAST(n_orders AS DOUBLE) * 365.25 / span_days)
                        * {_EOQ_K} / {_EOQ_H}), 4) AS orders_per_year,
           round(sqrt(2 * (CAST(n_orders AS DOUBLE) * 365.25 / span_days)
                      * {_EOQ_K} * {_EOQ_H}), 4) AS annual_policy_cost
    FROM d ORDER BY priority
    """,
    tags=("orders", "stats"),
)
def orders_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson economic order quantity (Harris 1913) per priority
    class: Q* = √(2DK/h) with annualized demand D from the exact
    order count over the priority's observed span and pinned cost
    literals K = $50/order, h = $2/unit-year (stated — the formula's
    STRUCTURE is the operator; real costs slot in). Also the implied
    replenishment frequency D/Q* and the optimal total policy cost
    √(2DKh) (at Q* the setup and holding halves are equal — the
    classic square-root economy). With orders_safety_stock's reorder
    point r this completes the (Q, r) inventory policy pair. Counts
    and day spans are exact integers; the annualization and
    square-root chain is one fixed textual expression.

    Scale shape: ONE keyed reduce of orders to 5 priority rows,
    closed-form scalars — map-side combine throughout."""
    o = tbl(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.datediff(
                F.max(F.to_date("o_orderdate")),
                F.min(F.to_date("o_orderdate")),
            )
            + 1
        )
        .cast("long")
        .alias("span_days"),
    )
    dd = F.col("n_orders").cast("double") * 365.25 / F.col("span_days")
    k, h = _EOQ_K, _EOQ_H
    eoq = F.sqrt(2 * dd * k / h)
    return d.select(
        "priority",
        "n_orders",
        F.round(dd, 4).alias("annual_demand"),
        F.round(eoq, 4).alias("eoq_units"),
        F.round(dd / eoq, 4).alias("orders_per_year"),
        F.round(F.sqrt(2 * dd * k * h), 4).alias("annual_policy_cost"),
    ).orderBy("priority")
