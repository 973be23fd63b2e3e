"""Relational checks over the TPC-H-ish star schema (SURVEY.md §2b X8).

These exercise the DataFrame layer the pipeline sits on: multi-way joins
with broadcast dims, grouped aggregation with map-side partials, window
ranking. Plans are Catalyst-clean: filters push to the Parquet scan,
small dims (nation/region/supplier) broadcast, fact-fact joins shuffle
on their keys once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict:
    from vamana_spark.sources import load_tables as _load

    names = names or (
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    )
    return _load(spark, sf_dir, *names)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary report."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue by customer nation (customer ⋈ orders ⋈ lineitem ⋈ nation).

    nation is tiny → explicit broadcast; the orders⋈lineitem join shuffles
    on orderkey (the natural co-partitioning key for a bucketed layout).
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"),
             F.count("*").cast("long").alias("n_items"))
    )


def top_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k customers by revenue — join + agg + window rank."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    totals = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )
    # top-k via TakeOrderedAndProject, then rank the k survivors
    top = totals.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(k)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late lineitem, by priority.
    Semi-join — no fact-fact row multiplication."""
    late = (
        lineitem.where(F.col("l_shipdate") > F.lit("1995-06-01"))
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


def part_supplier_volume(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Volume by part brand x supplier — two dim joins (part/supplier
    scale with SF, so the broadcast decision is left to AQE)."""
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-flavored: revenue per region through the full dim chain."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )
