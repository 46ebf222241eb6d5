"""Headline analytical queries (TPC-H-shaped) over the star fixtures.

The reference never joins tables (its schema is a single fact table —
SURVEY.md §2.3), so these go beyond it deliberately: they are the bench
workload that exercises multi-way joins, broadcast planning, partial
aggregation and top-k at scale.  Join strategy notes per query; dimension
sides are explicitly ``broadcast()`` — at 100 TB the fact side never
shuffles for a dimension join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (fixtures lack commitdate → "shipped after order
    date" stands in for "committed late"): EXISTS becomes a left-semi
    join, so lineitem is never duplicated into the aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in one
    quarter.  nation and customer broadcast; the orders⨝lineitem join is
    the only shuffle; top-k via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (fixtures lack shipmode → grouped by linestatus):
    conditional aggregation over a co-partitioned fact join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month; part is broadcast so
    the month of lineitem never shuffles."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 200.  The HAVING
    subquery is a pre-aggregated semi side; joining the 874-key set back
    to orders/lineitem broadcasts it (AQE keeps it broadcast at any SF
    because the key set shrinks with the threshold, not the data)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q19_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity bands.  The
    equi key (partkey) carries the broadcast-hash join; the OR predicate
    is a post-join filter, not a nested-loop condition."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(20, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(25, 50))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(bands)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (fixtures lack phone → segment stands in for the
    country prefix): above-average-balance customers with no order since
    2001.  The scalar average broadcasts; NOT EXISTS is a left-anti join
    against the pre-filtered, pre-deduplicated buyer key set."""
    cust = load_table(spark, sf_dir, "customer")
    recent_buyers = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("__avg")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(F.broadcast(recent_buyers), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between nation pairs by ship year.
    Both nation maps broadcast; supplier/customer broadcast; the only
    shuffle is orders⨝lineitem plus the small final aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer, including
    zero-order customers via a LEFT OUTER join (counts of a nullable
    key).  Two aggregations, each a few thousand rows after the first."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue — the view +
    scalar-max-subquery becomes an agg joined against its own broadcast
    max (ties preserved, as the spec requires)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems below 20% of their part's average
    quantity.  The correlated per-part AVG subquery decorrelates into one
    aggregate joined back to lineitem (broadcast — one row per part)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("__pk"))
        .agg((0.2 * F.avg("l_quantity")).alias("__limit"))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(avg_qty), li["l_partkey"] == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__limit"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# -- derived part-supplier relation (fixtures ship no partsupp table) --------
#
# q2/q9/q11/q16/q20 need the part↔supplier relation; the fixtures derive it
# from lineitem: supplycost per (part, supplier) = the best observed unit
# price.  One groupBy — co-partitioned with the later (partkey, suppkey)
# joins, so at 100 TB it reuses the same shuffle.


def _part_supp(
    spark: SparkSession, sf_dir: str, part_keys: DataFrame | None = None
) -> DataFrame:
    # supplycost stays a RAW double: min() over identical IEEE doubles is
    # engine-independent, while round(x, 4) at a .00005 boundary is NOT
    # (Spark's BigDecimal HALF_UP vs DuckDB's scaled std::round disagree
    # on boundary representations — measured 1e-4 drifts that a ×quantity
    # term amplifies).  Consumers round only final aggregates.
    #
    # ``part_keys`` (a 1-column ``p_partkey`` frame, optimization r13):
    # callers that INNER-join the relation against a filtered part set
    # afterwards pass the same keys here so the semi-join lands BELOW the
    # groupBy — the derivation exchange then carries only matching rows
    # (guide §2.3; measured at sf0.1 the unfiltered exchange was ~591k
    # rows — the partial aggregate barely combines because (partkey,
    # suppkey) pairs are near-unique — vs ~75k for q9's widget filter).
    # Result-identical: every row of a (partkey, suppkey) group shares
    # the partkey, so pre-filtering keeps exactly the groups the
    # downstream inner join would keep, with identical min() inputs.
    li = load_table(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys),
            li["l_partkey"] == part_keys["p_partkey"],
            "left_semi",
        )
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )


_PS_SQL = (
    "SELECT l_partkey, l_suppkey,"
    " min(l_extendedprice / l_quantity) AS supplycost"
    " FROM lineitem GROUP BY 1, 2"
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted to the derived part-supplier relation): for each
    STANDARD size-15 part, the EUROPE supplier(s) offering the minimum
    supply cost.

    The correlated MIN subquery is decorrelated into a per-part aggregate
    joined back on (part, cost) — the canonical Spark rewrite; all
    dimension sides broadcast, the only fact shuffle is the _part_supp
    groupBy — pre-filtered to the STANDARD/size-15 part keys, so the
    derivation exchange carries only matching rows (see _part_supp)."""
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    ps = _part_supp(spark, sf_dir, part_keys=part.select("p_partkey"))
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eps = (
        ps.join(F.broadcast(eu_supp), ps.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(part.select("p_partkey")),
            ps.l_partkey == F.col("p_partkey"),
        )
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "supplycost")
    )
    # decorrelated MIN as a window over the same partitioning — one
    # shuffle on p_partkey instead of aggregate + sort-merge self-join
    # (measured: drops 2 exchanges + an SMJ from the plan)
    w_min = Window.partitionBy("p_partkey")
    return (
        eps.withColumn("min_cost", F.min("supplycost").over(w_min))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7 suppliers' revenue share among AMERICA-region
    customers, by order year.

    Conditional aggregation over one joined pass — numerator and
    denominator share the scan and shuffle; every dimension is broadcast,
    the only co-partition shuffle is lineitem⨝orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    ns = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            F.col("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("rev")).otherwise(0.0))
            / F.sum("rev"),
            6,
        ).alias("mkt_share")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on widget parts by supplier nation and year,
    profit = revenue − supplycost·quantity (supplycost from the derived
    part-supplier relation).

    The ps join keys on (partkey, suppkey) — the same keys as the
    _part_supp groupBy, so the two stages share one hash partitioning
    (no second fact shuffle); part/supplier/nation broadcast.  The ps
    derivation is pre-filtered to the widget part keys (see _part_supp:
    the downstream inner join keeps only those groups anyway, so the
    derivation exchange shrinks ~8× at sf0.1 with identical output)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    ps = _part_supp(spark, sf_dir, part_keys=part.select("p_partkey")).select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        "supplycost",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("supplycost") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            ps,
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose NATION_3-supplied revenue exceeds 0.1% of
    the national total — HAVING against a scalar subquery, realized as a
    broadcast of the 1-row total (no driver collect)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum(rev), 4).alias("part_value"))
    )
    total = per_part.agg(F.round(F.sum("part_value"), 4).alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
        .limit(100)
    )


def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size) for
    non-MEDIUM, non-Brand#45 parts of selected sizes, excluding
    negative-balance suppliers via NOT IN → left-anti join (the fixtures
    ship no supplier comments, so the exclusion predicate is acctbal)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad_supp), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): NATION_5 suppliers who shipped more than half
    of a red part's 1998 volume — the nested IN(IN(...)) subquery chain as
    two aggregations + semi joins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    red98 = (
        li.filter(F.year("l_shipdate") == 1998)
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    # pair and part totals share the l_partkey partitioning: compute the
    # part total as a window over the pair aggregate — one shuffle, no
    # aggregate-to-aggregate join
    by_pair = red98.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    w_part = Window.partitionBy("l_partkey")
    dominant = (
        by_pair.withColumn("part_qty", F.sum("pair_qty").over(w_part))
        .filter(F.col("pair_qty") > F.col("part_qty") * 0.5)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_returns_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: fixtures carry no commit/receipt dates, so
    "late" becomes "returned"): NATION_1 suppliers whose line was the ONLY
    returned line in a multi-supplier order.

    The EXISTS → left-semi and NOT EXISTS → left-anti self-joins hash on
    l_orderkey with the supplier-inequality as a residual — no cartesian
    pair-up; top waiters via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_supp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    return (
        l1.join(
            others,
            (l1.l_orderkey == F.col("o2_orderkey"))
            & (l1.l_suppkey != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others_r,
            (l1.l_orderkey == F.col("o3_orderkey"))
            & (l1.l_suppkey != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
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
    "q4_priority_check": QueryDef(
        q4_priority_check,
        "SELECT o_orderpriority, count(*) AS order_count FROM orders"
        " WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "   AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'"
        "   AND EXISTS (SELECT 1 FROM lineitem"
        "               WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)"
        " GROUP BY o_orderpriority",
    ),
    "q10_returned_items": QueryDef(
        q10_returned_items,
        "SELECT c_custkey, c_name, c_acctbal, n_name,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM customer, orders, lineitem, nation"
        " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
        "   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "   AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'"
        "   AND l_returnflag = 'R' AND c_nationkey = n_nationkey"
        " GROUP BY c_custkey, c_name, c_acctbal, n_name"
        " ORDER BY revenue DESC, c_custkey ASC LIMIT 20",
    ),
    "q12_priority_classes": QueryDef(
        q12_priority_classes,
        "SELECT l_linestatus,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
        " FROM orders, lineitem WHERE o_orderkey = l_orderkey"
        "   AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
        "   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
        " GROUP BY l_linestatus",
    ),
    "q14_promo_share": QueryDef(
        q14_promo_share,
        "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'"
        "                              THEN l_extendedprice * (1 - l_discount)"
        "                              ELSE 0.0 END)"
        "             / sum(l_extendedprice * (1 - l_discount)), 4)"
        "        AS promo_revenue_pct"
        " FROM lineitem, part WHERE l_partkey = p_partkey"
        "   AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'"
        "   AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'",
    ),
    "q18_big_orders": QueryDef(
        q18_big_orders,
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,"
        " round(sum(l_quantity), 4) AS total_qty"
        " FROM customer, orders, lineitem"
        " WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem"
        "                      GROUP BY l_orderkey HAVING sum(l_quantity) > 200)"
        "   AND c_custkey = o_custkey AND o_orderkey = l_orderkey"
        " GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice"
        " ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
    ),
    "q19_brand_revenue": QueryDef(
        q19_brand_revenue,
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
        " count(*) AS n_lines"
        " FROM lineitem, part WHERE l_partkey = p_partkey AND ("
        "   (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15"
        "    AND l_quantity BETWEEN 10 AND 30)"
        " OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30"
        "     AND l_quantity BETWEEN 20 AND 40)"
        " OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50"
        "     AND l_quantity BETWEEN 25 AND 50))",
    ),
    "q7_nation_trade": QueryDef(
        q7_nation_trade,
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,"
        " CAST(year(l_shipdate) AS INTEGER) AS l_year,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM lineitem, orders, customer, supplier, nation sn, nation cn"
        " WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey"
        "   AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey"
        "   AND c_nationkey = cn.n_nationkey AND sn.n_name <> cn.n_name"
        "   AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
        " GROUP BY sn.n_name, cn.n_name, year(l_shipdate)",
    ),
    "q13_order_distribution": QueryDef(
        q13_order_distribution,
        "SELECT c_count, count(*) AS custdist FROM ("
        "  SELECT c_custkey, count(o_orderkey) AS c_count"
        "  FROM customer LEFT OUTER JOIN orders"
        "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'"
        "  GROUP BY c_custkey)"
        " GROUP BY c_count",
    ),
    "q15_top_supplier": QueryDef(
        q15_top_supplier,
        "WITH revenue AS ("
        "  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4)"
        "         AS total_revenue"
        "  FROM lineitem"
        "  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        "    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
        "  GROUP BY l_suppkey)"
        " SELECT s_suppkey, s_name, total_revenue"
        " FROM revenue, supplier WHERE l_suppkey = s_suppkey"
        "   AND total_revenue = (SELECT max(total_revenue) FROM revenue)",
    ),
    "q17_small_quantity_revenue": QueryDef(
        q17_small_quantity_revenue,
        "SELECT round(sum(l1.l_extendedprice) / 7.0, 4) AS avg_yearly,"
        " count(*) AS n_lines"
        " FROM lineitem l1, part WHERE p_partkey = l1.l_partkey"
        "   AND p_brand = 'Brand#1'"
        "   AND l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2"
        "                        WHERE l2.l_partkey = l1.l_partkey)",
    ),
    "q2_min_cost_supplier": QueryDef(
        q2_min_cost_supplier,
        f"WITH ps AS ({_PS_SQL}),"
        " eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier"
        "        JOIN nation ON s_nationkey = n_nationkey"
        "        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),"
        " tp AS (SELECT p_partkey FROM part WHERE p_size = 15 AND p_type = 'STANDARD'),"
        " eps AS (SELECT tp.p_partkey, eu.s_name, eu.s_acctbal, eu.n_name, ps.supplycost"
        "         FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey"
        "         JOIN tp ON ps.l_partkey = tp.p_partkey),"
        " mc AS (SELECT p_partkey, min(supplycost) AS min_cost FROM eps GROUP BY 1)"
        " SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.supplycost"
        " FROM eps e JOIN mc ON e.p_partkey = mc.p_partkey"
        "  AND e.supplycost = mc.min_cost"
        " ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.p_partkey LIMIT 100",
    ),
    "q8_market_share": QueryDef(
        q8_market_share,
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,"
        " round(sum(CASE WHEN sn.n_name = 'NATION_7'"
        "           THEN l_extendedprice * (1 - l_discount) ELSE 0 END)"
        "       / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation nc ON c_nationkey = nc.n_nationkey"
        " JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation sn ON s_nationkey = sn.n_nationkey"
        " GROUP BY 1",
    ),
    "q9_product_type_profit": QueryDef(
        q9_product_type_profit,
        f"WITH ps AS ({_PS_SQL})"
        " SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,"
        " round(sum(l.l_extendedprice * (1 - l.l_discount)"
        "           - ps.supplycost * l.l_quantity), 4) AS sum_profit"
        " FROM lineitem l"
        " JOIN part ON l.l_partkey = p_partkey AND p_name LIKE '%widget%'"
        " JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey"
        " JOIN orders ON l.l_orderkey = o_orderkey"
        " JOIN supplier ON l.l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " GROUP BY 1, 2",
    ),
    "q11_important_stock": QueryDef(
        q11_important_stock,
        "WITH pp AS ("
        "  SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4)"
        "    AS part_value"
        "  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"
        "  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'"
        "  GROUP BY 1)"
        " SELECT l_partkey, part_value FROM pp"
        " WHERE part_value > (SELECT round(sum(part_value), 4) FROM pp) * 0.001"
        " ORDER BY part_value DESC, l_partkey LIMIT 100",
    ),
    "q16_parts_supplier_relationship": QueryDef(
        q16_parts_supplier_relationship,
        "SELECT p_brand, p_type, p_size,"
        " CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"
        " FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs"
        " JOIN part ON l_partkey = p_partkey"
        " WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'"
        "   AND p_size IN (1, 4, 7, 10, 13, 16, 19, 25)"
        "   AND l_suppkey NOT IN"
        "       (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
        " GROUP BY 1, 2, 3",
    ),
    "q20_promotion_candidates": QueryDef(
        q20_promotion_candidates,
        "WITH red98 AS ("
        "  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem"
        "  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'"
        "  WHERE year(l_shipdate) = 1998),"
        " by_pair AS (SELECT l_partkey, l_suppkey,"
        "   CAST(sum(l_quantity) AS BIGINT) AS pair_qty FROM red98 GROUP BY 1, 2),"
        " by_part AS (SELECT l_partkey,"
        "   CAST(sum(l_quantity) AS BIGINT) AS part_qty FROM red98 GROUP BY 1),"
        " dominant AS (SELECT DISTINCT by_pair.l_suppkey"
        "   FROM by_pair JOIN by_part ON by_pair.l_partkey = by_part.l_partkey"
        "   WHERE pair_qty > part_qty * 0.5)"
        " SELECT s_name, s_acctbal FROM supplier"
        " JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'"
        " WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)"
        " ORDER BY s_name",
    ),
    "q21_returns_blame": QueryDef(
        q21_returns_blame,
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait"
        " FROM lineitem l1"
        " JOIN supplier ON l1.l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'"
        " WHERE l1.l_returnflag = 'R'"
        "   AND EXISTS (SELECT 1 FROM lineitem l2"
        "               WHERE l2.l_orderkey = l1.l_orderkey"
        "                 AND l2.l_suppkey <> l1.l_suppkey)"
        "   AND NOT EXISTS (SELECT 1 FROM lineitem l3"
        "                   WHERE l3.l_orderkey = l1.l_orderkey"
        "                     AND l3.l_suppkey <> l1.l_suppkey"
        "                     AND l3.l_returnflag = 'R')"
        " GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100",
    ),
    "q22_dormant_customers": QueryDef(
        q22_dormant_customers,
        "SELECT c_mktsegment, count(*) AS numcust,"
        " round(sum(c_acctbal), 4) AS totacctbal"
        " FROM customer"
        " WHERE c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer"
        "                    WHERE c_acctbal > 0)"
        "   AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey"
        "                   AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')"
        " GROUP BY c_mktsegment",
    ),
}
