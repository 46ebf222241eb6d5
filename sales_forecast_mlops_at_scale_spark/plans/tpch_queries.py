"""Headline analytical queries (TPC-H-shaped) over the star fixtures.

The reference never joins tables (its schema is a single fact table —
SURVEY.md §2.3), so these go beyond it deliberately: they are the bench
workload that exercises multi-way joins, broadcast planning, partial
aggregation and top-k at scale.  Join strategy notes per query; dimension
sides are explicitly ``broadcast()`` — at 100 TB the fact side never
shuffles for a dimension join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QueryDef


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Pure scan→partial-agg→final-agg: one shuffle of ~6 grouped rows.
    The shipdate predicate pushes to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (adapted: fixtures have o_orderpriority, not shippriority).

    customer is broadcast into orders, the result broadcast into lineitem
    when small enough — AQE demotes to shuffle join if the filtered orders
    side exceeds the threshold.  Top-10 via TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
    ).alias("revenue")
    building_orders = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    return (
        li.join(F.broadcast(building_orders), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (adapted: all regions, grouped by region+nation).

    Six-way join; nation/region/supplier/customer are broadcast dims, so
    the only shuffles are the orders⨝lineitem co-partition and the final
    25-row aggregation.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: fully-pushed-down filter + single scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


QUERIES: dict[str, QueryDef] = {
    "q1_pricing_summary": QueryDef(
        q1_pricing_summary,
        "SELECT l_returnflag, l_linestatus,"
        " round(sum(l_quantity), 4) AS sum_qty,"
        " round(sum(l_extendedprice), 4) AS sum_base_price,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,"
        " round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,"
        " round(avg(l_quantity), 4) AS avg_qty,"
        " round(avg(l_extendedprice), 4) AS avg_price,"
        " round(avg(l_discount), 4) AS avg_disc,"
        " count(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'"
        " GROUP BY l_returnflag, l_linestatus",
    ),
    "q3_shipping_priority": QueryDef(
        q3_shipping_priority,
        "SELECT l_orderkey, o_orderdate, o_orderpriority,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM customer, orders, lineitem"
        " WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey"
        "   AND l_orderkey = o_orderkey"
        "   AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'"
        "   AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'"
        " GROUP BY l_orderkey, o_orderdate, o_orderpriority"
        " ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10",
    ),
    "q5_local_supplier_volume": QueryDef(
        q5_local_supplier_volume,
        "SELECT r_name, n_name,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM customer, orders, lineitem, supplier, nation, region"
        " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
        "   AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        "   AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey"
        "   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "   AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"
        " GROUP BY r_name, n_name",
    ),
    "q6_forecast_revenue": QueryDef(
        q6_forecast_revenue,
        "SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        "   AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
    ),
}
