"""Relational coverage queries over the driver's TPC-H-ish tables.

These exercise the classic operator set (multi-way broadcast joins,
grouped aggregation with HAVING, top-k windows, date filters) that the
geo/pipeline families don't already cover.  Money columns are doubles
in the parquet; all cross-engine-compared sums are quantized to
integer cents/micros first (the engine's exactness doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) integer-exact
    sums/averages over lineitem."""
    li = _t(spark, sf, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 10000).cast("long")
    disc_price_micro = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 1000000
    ).cast("long")
    g = (li.groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum(qty_c).alias("sum_qty_c"),
              F.sum(price_c).alias("sum_price_c"),
              F.sum(disc_price_micro).alias("sum_disc_price_micro"),
              F.sum(disc_c).alias("sum_disc_bp"),
              F.count(F.lit(1)).alias("count_order")))
    return g.select(
        "l_returnflag", "l_linestatus", "sum_qty_c", "sum_price_c",
        "sum_disc_price_micro",
        (F.col("sum_qty_c").cast("double")
         / (F.lit(100.0) * F.col("count_order"))).alias("avg_qty"),
        (F.col("sum_disc_bp").cast("double")
         / (F.lit(10000.0) * F.col("count_order"))).alias("avg_disc"),
        "count_order")


def top_customers_by_region(spark: SparkSession, sf: str,
                            k: int = 5) -> DataFrame:
    """Top-k customers by order revenue within each region: a 4-way
    join (two broadcast dims) + window rank."""
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region")
    orders = _t(spark, sf, "orders")
    price_c = F.round(F.col("o_totalprice") * 100).cast("long")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(price_c).alias("revenue_c"),
                F.count(F.lit(1)).alias("n_orders")))
    joined = (rev
              .join(cust, rev["o_custkey"] == cust["c_custkey"])
              .join(F.broadcast(nat),
                    cust["c_nationkey"] == nat["n_nationkey"])
              .join(F.broadcast(reg),
                    nat["n_regionkey"] == reg["r_regionkey"]))
    w = Window.partitionBy("r_name").orderBy(
        F.col("revenue_c").desc(), F.col("c_custkey").asc())
    return (joined.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("r_name").alias("region"), "rank",
                    F.col("c_custkey").alias("custkey"),
                    F.col("c_name").alias("cust_name"),
                    "revenue_c", "n_orders"))


def nation_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Orders per nation per priority with HAVING — join + filter
    pushdown showcase."""
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    orders = _t(spark, sf, "orders")
    j = (orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
         .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]))
    g = (j.groupBy(F.col("n_name").alias("nation"), "o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n_orders"),
              F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              .alias("total_c")))
    return g.where(F.col("n_orders") > 5)
