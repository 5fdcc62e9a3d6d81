"""Relational categories the reference defers to its sink/consumers
(SURVEY.md §2.6) realized with Spark built-ins: hash/broadcast joins,
semi/anti joins, aggregations, ranking windows, sorts/limits.

Plan notes (scale): dimension tables (region/nation/customer/
supplier/part) are broadcast — no shuffle of the fact side; the Q1
style aggregation is partial+final hash agg; decimal sums keep the
oracle comparison exact (double sums are order-dependent).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- TPC-H Q1-style pricing summary (hash agg, partial+final) -----------
def rel_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- broadcast-join star query: revenue by nation ------------------------
def rel_revenue_by_nation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# --- top-k per group (ranking window) -------------------------------------
def rel_topk_per_brand(spark, sf_dir):
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


# --- anti join: customers without orders ------------------------------------
def rel_customers_without_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- semi join: suppliers in ASIA -------------------------------------------
def rel_suppliers_in_asia(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    return supp.join(
        F.broadcast(asia_nations),
        supp.s_nationkey == asia_nations.n_nationkey,
        "left_semi",
    ).select("s_suppkey", "s_name")


QUERIES = {
    "rel_pricing_summary": rel_pricing_summary,
    "rel_revenue_by_nation": rel_revenue_by_nation,
    "rel_topk_per_brand": rel_topk_per_brand,
    "rel_customers_without_orders": rel_customers_without_orders,
    "rel_suppliers_in_asia": rel_suppliers_in_asia,
}

ORACLES = {
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_revenue_by_nation": """
        SELECT n_name,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "rel_topk_per_brand": """
        SELECT p_brand, p_partkey, p_retailprice, rk FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rk
            FROM part
        ) WHERE rk <= 3
    """,
    "rel_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "rel_suppliers_in_asia": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA')
    """,
}
