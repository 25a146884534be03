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


def _dsum(col, scale: int = 4):
    """Order-independent double sum: accumulate as decimal (exact, so the
    result is identical under ANY partial-sum grouping — bucketed reads, AQE
    re-partitioning, a different executor count, DuckDB's parallel
    aggregation), then cast back to double. The input expressions here are
    money/quantity values with <= `scale` true decimal digits, so the
    per-row decimal cast is lossless. The driver hash-compares floats
    EXACTLY — plain double sums differ from the oracle in the last ulp
    whenever the accumulation order differs.

    Input precision is 18 (Spark's max long-backed Decimal) rather than 38:
    the sum buffer promotes to decimal(28,scale) — headroom of 10 integer
    digits over the per-row cap of 14, enough for ~10^10 rows of max-size
    money values (a 100 TB lineitem is ~6·10^9 rows), while keeping most
    per-row work on compact longs instead of 16-byte BigDecimals (~10%
    faster on the tq1 scan; values bit-identical, measured r5). Oracles are
    unaffected: both engines compute the EXACT sum of the same per-row
    rounded values, so internal precision never shows in the result."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# Split-accumulator sum: the scan-dominated queries (tq1, tq6) pay ~1.3s in
# decimal aggregate buffers at sf0.1 where plain long sums cost 0.7s — and
# profiling showed the tax is the decimal SUM itself, not the per-row cast
# (decimal(18) ≈ decimal(38) ≈ bigint-input-decimal-buffer ≈ 1.3s; two long
# sums ≈ 0.76s, measured min-of-4 quiet-box, r6). So: round to scaled
# BIGINT per row, accumulate TWO plain long sums (high 44 bits, low 20
# bits), recombine in double. Exact and order-independent like the decimal
# form, and overflow-safe at 100 TB: per-group lo-sum < 2^20 · rows
# (6·10^11 rows → 6·10^17 < 2^63) and hi-sum < (maxval/2^20) · rows
# (~10^3 · 6·10^11 = 6·10^14). Recombination is IEEE-identical on both
# engines: hi·2^20 is a power-of-two scaling (exact), one rounded add, one
# rounded divide — the oracle spells the same three ops.
_SPLIT_BITS = 20
_SPLIT = 1 << _SPLIT_BITS


def _xsum(col, scale: int = 4):
    v = F.round(col * (10**scale)).cast("bigint")
    hi = F.sum(F.shiftright(v, _SPLIT_BITS))
    lo = F.sum(v.bitwiseAND(F.lit(_SPLIT - 1)))
    return (
        hi.cast("double") * F.lit(float(_SPLIT)) + lo.cast("double")
    ) / F.lit(float(10**scale))


def _oracle_xsum(expr: str, scale: int = 4) -> str:
    v = f"CAST(round(({expr}) * 1e{scale}) AS BIGINT)"
    return (
        f"(CAST(sum({v} >> {_SPLIT_BITS}) AS DOUBLE) * {float(_SPLIT)!r}"
        f" + CAST(sum({v} & {_SPLIT - 1}) AS DOUBLE)) / 1e{scale}"
    )


@register(
    "tq1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_oracle_xsum('l_quantity')} AS sum_qty,
           {_oracle_xsum('l_extendedprice')} AS sum_base_price,
           {_oracle_xsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_oracle_xsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           ({_oracle_xsum('l_quantity')}) / count(*) AS avg_qty,
           ({_oracle_xsum('l_extendedprice')}) / count(*) AS avg_price,
           ({_oracle_xsum('l_discount')}) / count(*) AS avg_disc,
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
            _xsum(F.col("l_quantity")).alias("sum_qty"),
            _xsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _xsum(disc_price).alias("sum_disc_price"),
            _xsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            (_xsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_xsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_xsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@register(
    "tq3_shipping_priority",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS okey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
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
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    ).select(
        F.col("o_orderkey").cast("bigint").alias("okey"), "revenue", "o_orderdate"
    )


@register(
    "tq5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
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
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Extended TPC-H-shaped suite (adapted to the driver's reduced star schema:
# no partsupp table; lineitem has no commitdate/receiptdate/shipmode). Each
# query keeps the canonical TPC-H plan shape (exists/anti/correlated
# subquery/decimal arithmetic) re-expressed over available columns.
# ---------------------------------------------------------------------------


@register(
    "tq4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join",
)
def tq4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@register(
    "tq6_forecast_revenue",
    f"""
    SELECT {_oracle_xsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan + pushed filters + single global aggregate",
)
def tq6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_xsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tq7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: nation-pair volume by year; broadcast dims, one fact shuffle",
)
def tq7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "tq8_market_share",
    """
    SELECT o_year,
           CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE)
           / CAST(sum(CAST(volume AS DECIMAL(38,4))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: conditional aggregation for market share by year",
)
def tq8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(
            nation.join(region, nation.n_regionkey == region.r_regionkey).select("n_nationkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                _dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / _dsum(F.col("volume"))
            )
            .alias("mkt_share")
        )
    )


@register(
    "tq9_product_profit",
    """
    SELECT nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(38,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_type = 'STANDARD'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (no partsupp): per-nation yearly profit for a part type",
)
def tq9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(load_table(spark, sf_dir, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        "nation", F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit")
    )


@register(
    "tq10_returned_items",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer",
)
def tq10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = li.join(
        orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey")
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    ).select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"), "c_name", "revenue",
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
    )


@register(
    "tq13_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13: left outer join + double aggregation (order-count histogram)",
)
def tq13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("bigint").alias("custdist"))


@register(
    "tq14_promo_effect",
    """
    SELECT 100.00 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE)
                  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14: broadcast dim join + conditional aggregate ratio",
)
def tq14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * _dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / _dsum(vol)
            )
            .alias("promo_revenue")
        )
    )


@register(
    "tq15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: view + scalar subquery max (top supplier by window revenue)",
)
def tq15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # keep the revenue DECIMAL through the max/equality join — exact compare,
    # no float-equality fragility; cast to double only at the output
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    top = revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.m).drop("m")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey")).select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
        "s_name",
        F.col("total_revenue").cast("double").alias("total_revenue"),
    )


@register(
    "tq16_supplier_cnt",
    """
    SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (lineitem for partsupp): distinct-suppliers per part group, NOT IN -> anti join",
)
def tq16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tq17_small_qty_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                                      / count(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17: correlated scalar avg per part -> pre-aggregated broadcast join",
)
def tq17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    # Per-part mean quantity is |part|-sized: aggregate once, broadcast back.
    # Decimal-sum/count avg: the threshold COMPARISON must be bit-identical
    # across engines or rows flip in and out of the filter.
    part_avg = li.groupBy("l_partkey").agg(
        (0.5 * (_dsum(F.col("l_quantity")) / F.count("*"))).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(part_avg.withColumnRenamed("l_partkey", "pk")),
              F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((_dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@register(
    "tq18_large_volume_customer",
    """
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18: IN-aggregate subquery -> semi join on HAVING groups",
)
def tq18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq")).filter(
        F.col("sq") > 300
    ).select(F.col("l_orderkey").alias("big_okey"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big_orders), li.l_orderkey == big_orders.big_okey, "left_semi")
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .select(
            "c_name", F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"), "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "sum_qty",
        )
    )


@register(
    "tq19_discounted_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
      OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))
    """,
    doc="TPC-H Q19: disjunctive join predicates (broadcast hash join + residual OR filter)",
)
def tq19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "tq20_promo_suppliers",
    """
    SELECT s_name, CAST(s_suppkey AS BIGINT) AS s_suppkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
    """,
    doc="TPC-H Q20 shape: semi join on aggregated-HAVING supplier set",
)
def tq20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", F.col("s_suppkey").cast("bigint").alias("s_suppkey"))


@register(
    "tq21_waiting_suppliers",
    """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey, o_orderstatus,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lo l1, nation
    WHERE s_suppkey = l1.l_suppkey AND l1.o_orderstatus = 'F' AND l1.late
      AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (late = shipped >60d after order): EXISTS/NOT EXISTS -> "
        "order-level distinct/late-supplier aggregate + join (no per-row subquery)",
)
def tq21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias("late"),
        # o_orderstatus is constant per order; fold the l1 predicate
        # (status = 'F' AND late) into a per-row count so the whole query
        # collapses into one pass over lineitem JOIN orders.
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("is_f"),
    )
    # Two stacked aggregations replace both correlated subqueries AND the
    # former l1-vs-order_stats self-join (which re-scanned lineitem+orders):
    # per (order, supplier) fold the supplier's late flag and its count of
    # waiting rows (late rows of 'F' orders); per order count suppliers,
    # late suppliers, and total waiting rows. No countDistinct, so no
    # Expand x2 over lineitem-scale rows — plain partial-aggregating
    # HashAggregates on narrower keys.
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("supp_late"),
        F.sum(F.when(F.col("late"), F.col("is_f")).otherwise(F.lit(0))).alias("n_wait"),
    )
    order_stats = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
        # with exactly one late supplier, every waiting row is that
        # supplier's, so max() picks the unique late suppkey
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey"))).alias("late_skey"),
        F.sum("n_wait").alias("n_wait"),
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    # EXISTS other supplier, NOT EXISTS other late supplier (l1 is itself
    # late, so "no other late supplier" = exactly one late supplier), and
    # at least one waiting row (status 'F' and late — n_wait > 0 implies
    # the order is 'F' because n_late_supp = 1 guarantees a late row).
    return (
        order_stats.filter(
            (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1) & (F.col("n_wait") > 0)
        )
        .join(F.broadcast(supp), F.col("late_skey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_wait").cast("bigint").alias("numwait"))
    )


@register(
    "tq22_sales_opportunity",
    """
    SELECT CAST(c_nationkey AS INTEGER) AS nk, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (nationkey for phone code): scalar-avg subquery + anti join",
)
def tq22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    )
    all_cust = load_table(spark, sf_dir, "customer")
    avg_bal = all_cust.filter(F.col("c_acctbal") > 0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("abal")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("abal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nk"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "tq_window_topn",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
    doc="top-3 orders per customer by price: ranking window, one shuffle on "
        "the partition key; rank filter prunes before any downstream join",
)
def tq_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("o_custkey").cast("bigint").alias("c_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "tq_running_totals",
    """
    SELECT CAST(o_custkey AS BIGINT) AS c_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="per-customer running spend: cumulative window frame over event order",
)
def tq_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").cast("bigint").alias("c_custkey"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        # decimal accumulation: DuckDB's segment-tree window sum associates
        # partials differently than a sequential running double sum
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "tq2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT o.l_partkey, o.l_suppkey, o.unit_cost, s_name, n_name,
             CAST(s_acctbal AS DOUBLE) AS s_acctbal
      FROM offers o
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY unit_cost, l_suppkey) AS rnk
      FROM eligible
    )
    SELECT CAST(r.l_partkey AS BIGINT) AS p_partkey, p_brand,
           s_name, n_name, s_acctbal,
           CAST(r.unit_cost AS DOUBLE) AS unit_cost
    FROM ranked r JOIN part ON r.l_partkey = p_partkey
    WHERE rnk = 1 AND p_size <= 15
    """,
    doc="TPC-H Q2 shape (no partsupp: supplier offers derived from lineitem "
        "unit prices): per-part minimum-cost supplier in a region — the "
        "correlated-min subquery decorrelated into one aggregate + "
        "deterministic rank-1 rejoin",
)
def tq2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # region-filtered supplier dim is tiny: broadcast it into the offers agg
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name",
                F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
    eligible = offers.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    # row_number, not a float-equality self-join against the per-part min:
    # deterministic under ties and avoids comparing doubles across engines
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = eligible.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return best.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        F.col("l_partkey").cast("bigint").alias("p_partkey"),
        "p_brand", "s_name", "n_name", "s_acctbal",
        F.col("unit_cost").cast("double").alias("unit_cost"),
    )


@register(
    "tq11_important_stock",
    """
    WITH value_by_part AS (
      SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'GERMANY'
      GROUP BY l_partkey
    )
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
           CAST(part_value AS BIGINT) AS part_value
    FROM value_by_part
    WHERE part_value * 10000 > (SELECT sum(part_value) FROM value_by_part)
    """,
    doc="TPC-H Q11 shape (no partsupp: stock value derived from shipped "
        "quantities): parts whose national inventory share exceeds a global "
        "threshold — scalar-aggregate subquery; integer arithmetic keeps the "
        "threshold comparison exact across engines",
)
def tq11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    german_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(
            load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "GERMANY")),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    value_by_part = (
        li.join(F.broadcast(german_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("part_value"))
    )
    # scalar global total: single-row aggregate, broadcast into the filter
    total = value_by_part.agg(F.sum("part_value").alias("total_value"))
    return (
        value_by_part.join(F.broadcast(total))
        .filter(F.col("part_value") * 10000 > F.col("total_value"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("part_value").cast("bigint").alias("part_value"),
        )
    )


@register(
    "tq12_shipping_priority_mix",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (no shipmode column: return flag stands in for "
        "ship mode): conditional two-way counts after a fact-to-fact join "
        "restricted by a pushed date range",
)
def tq12_shipping_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )
