"""TPC-H-shaped relational queries over the driver's star schema.

The reference's type system has no decimal/timestamp and no optimizer
(SURVEY.md §1.2, §4); these queries exercise what our Spark-first engine gets
beyond it — date predicates pushed to the parquet scan, multi-way join
reordering, broadcast of small dimensions, partial aggregation — and serve as
the headline bench queries at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from . import register


@register(
    "tq1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base_price,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS sum_disc_price,
           CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE) AS sum_charge,
           CAST(avg(l_quantity) AS DOUBLE) AS avg_qty,
           CAST(avg(l_extendedprice) AS DOUBLE) AS avg_price,
           CAST(avg(l_discount) AS DOUBLE) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan-heavy partial+final aggregation",
)
def tq1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).cast("double").alias("sum_charge"),
            F.avg("l_quantity").cast("double").alias("avg_qty"),
            F.avg("l_extendedprice").cast("double").alias("avg_price"),
            F.avg("l_discount").cast("double").alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@register(
    "tq3_shipping_priority",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS okey,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    """,
    doc="TPC-H Q3 shape: selective dim filter -> join -> aggregate",
)
def tq3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    # customer is the small filtered side: broadcast it into orders, then join
    # the fact table on the shuffle key it already aggregates on.
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    ).select(
        F.col("o_orderkey").cast("bigint").alias("okey"), "revenue", "o_orderdate"
    )


@register(
    "tq5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: snowflake join with broadcast dimensions",
)
def tq5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dims = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).join(
            region, nation.n_regionkey == region.r_regionkey
        )
    )
    joined = (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )
