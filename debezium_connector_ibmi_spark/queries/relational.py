"""Relational categories the reference defers to its sink/consumers
(SURVEY.md §2.6) realized with Spark built-ins: hash/broadcast joins,
semi/anti joins, aggregations, ranking windows, sorts/limits.

Plan notes (scale): only genuinely small dimension tables (nation=25
rows, region=5 rows) are broadcast; fact⋈fact joins (lineitem⋈orders,
⋈customer) shuffle on their keys and AQE picks the strategy at
runtime — broadcasting a fact-sized table OOMs executors at 100×.
Money aggregates are summed as integer units (cents, via
floor(x*scale+0.5) on the IEEE double) so the result is a BIGINT
that hashes identically across engines — decimal/double SUM results
carry engine-specific result-type widening (DuckDB → DECIMAL(38,x)/
HUGEINT vs Spark decimal(28,x)/bigint) that breaks byte-stable
comparison even when values agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _units(col, scale):
    """Integer units of a double money/qty column: floor(x*scale+0.5)
    as BIGINT. Pure IEEE-double arithmetic + exact floor, so Spark and
    any ANSI engine produce bit-identical integers."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


# --- TPC-H Q1-style pricing summary (hash agg, partial+final) -----------
def rel_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_units(F.col("l_quantity"), 100)).alias("sum_qty_c"),
            F.sum(_units(F.col("l_extendedprice"), 100)).alias(
                "sum_base_price_c"
            ),
            F.sum(
                _units(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    10000,
                )
            ).alias("sum_disc_price_c4"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- star-schema join query: revenue by nation ----------------------------
def rel_revenue_by_nation(spark, sf_dir):
    """lineitem⋈orders⋈customer⋈nation revenue rollup. Only `nation`
    (25 rows) is broadcast-hinted; the fact-side joins shuffle on
    their keys (AQE re-plans at runtime). Pinned by
    tests/test_plan_shape.py: no broadcast of orders/customer."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev_c4 = _units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev_c4).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_items"),
        )
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
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_base_price_c,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_disc_price_c4,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_revenue_by_nation": """
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c4,
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
