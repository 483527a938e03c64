"""Classic relational analytics (bench headliners).

These exercise the engine's join/aggregate/window breadth the way the
reference's report builders exercise pandas groupby/merge — expressed
declaratively so Catalyst does pushdown, pruning, join selection and
AQE does runtime re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import money, ratio


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 pricing summary.

    Pure scan→partial-agg→final-agg: at 100 TB this is the ideal shape
    (map-side combine on 6 groups, filter pushed to parquet).
    """
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            money(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            ratio(F.avg("l_extendedprice")).alias("avg_price"),
            ratio(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
) -> DataFrame:
    """TPC-H Q3 adapted to the testdata columns.

    Filters are applied before the joins so they push into the scans;
    orders⋈lineitem shuffles on orderkey (AQE coalesces), customer side
    is filtered before joining.
    """
    d = F.lit(date).cast("timestamp")
    return (
        customer.where(F.col("c_mktsegment") == segment)
        .join(orders.where(F.col("o_orderdate") < d), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            lineitem.where(F.col("l_shipdate") > d),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_region_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 adapted: revenue by customer nation within a region,
    where the supplier is in the same nation as the customer.

    Six-way join: region+nation broadcast; customer⋈orders⋈lineitem⋈
    supplier shuffle on their keys with AQE join re-selection.
    """
    dims = F.broadcast(
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        customer.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    limit: int = 20,
) -> DataFrame:
    """Top customers by lifetime order value with per-nation rank.

    Window ranks run AFTER the aggregation (one row per customer), and
    the window partitions by nation — no global single-partition sort
    of raw data at scale.
    """
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(money(F.sum("o_totalprice")).alias("lifetime_value"), F.count("*").alias("n_orders"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "lifetime_value", "n_orders")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("lifetime_value"), "c_custkey")
    return (
        per_cust.withColumn("rank_in_nation", F.row_number().over(w))
        .orderBy(F.desc("lifetime_value"), "c_custkey")
        .limit(limit)
    )
