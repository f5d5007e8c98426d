"""TPC-H-style relational workload over the driver's star schema.

The reference never joins more than a dict lookup; these queries are
the generic-relational completion of the operator surface (multi-way
joins, grouped pricing aggregates, top-k per group) and double as the
bench workload at sf0.1 — the shapes Catalyst must get right at 100 TB
(broadcast dims, partial aggs, TakeOrderedAndProject).

Money math note: every aggregated double goes through FLOOR(x*10^4)
→ BIGINT ("fixed-point", compat.py) so sums are exact integers and
cross-engine reproducible; the final division back to a double is
deterministic. Mirrors the published TPC-H queries (public spec), not
any reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

SCALE = 10_000  # 4 fixed-point digits

REV_SQL = f"CAST(FLOOR(l_extendedprice * (1 - l_discount) * {SCALE}) AS BIGINT)"
CHARGE_SQL = (
    f"CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * {SCALE}) AS BIGINT)"
)


def _rev_col() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
    ).cast("long")


def _charge_col() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * SCALE
    ).cast("long")


Q1_CUTOFF = "1998-09-02"


@register(
    "q_tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity * {SCALE}) AS BIGINT)) AS BIGINT) AS sum_qty_fp,
       CAST(SUM(CAST(FLOOR(l_extendedprice * {SCALE}) AS BIGINT)) AS BIGINT) AS sum_base_fp,
       CAST(SUM({REV_SQL}) AS BIGINT) AS sum_disc_fp,
       CAST(SUM({CHARGE_SQL}) AS BIGINT) AS sum_charge_fp,
       CAST(SUM(CAST(FLOOR(l_quantity * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} / COUNT(*) AS avg_price,
       CAST(SUM(CAST(FLOOR(l_discount * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, 8 aggregates, partial+final
    hash agg; the filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_fp = F.floor(F.col("l_quantity") * SCALE).cast("long")
    base_fp = F.floor(F.col("l_extendedprice") * SCALE).cast("long")
    disc_fp = F.floor(F.col("l_discount") * SCALE).cast("long")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_fp).cast("long").alias("sum_qty_fp"),
            F.sum(base_fp).cast("long").alias("sum_base_fp"),
            F.sum(_rev_col()).cast("long").alias("sum_disc_fp"),
            F.sum(_charge_col()).cast("long").alias("sum_charge_fp"),
            (F.sum(qty_fp).cast("double") / SCALE / n).alias("avg_qty"),
            (F.sum(base_fp).cast("double") / SCALE / n).alias("avg_price"),
            (F.sum(disc_fp).cast("double") / SCALE / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-06-01"


@register(
    "q_tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({REV_SQL}) AS BIGINT) AS revenue_fp,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_fp DESC, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: filtered customer dim broadcasts
    into orders, lineitem joins on the (already shuffled) orderkey;
    top-10 plans as TakeOrderedAndProject. Tie-break on l_orderkey."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_col()).cast("long").alias("revenue_fp"))
        .select("l_orderkey", "revenue_fp", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_fp"), F.asc("l_orderkey"))
        .limit(10)
    )


Q5_REGION = "ASIA"


@register(
    "q_tpch_q5",
    oracle=f"""
SELECT n_name,
       CAST(SUM({REV_SQL}) AS BIGINT) AS revenue_fp
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
GROUP BY n_name
ORDER BY revenue_fp DESC, n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: five joins; nation/region/
    supplier are KB-sized → broadcast; only customer⨝orders⨝lineitem
    shuffles, and AQE coalesces the tail."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_col()).cast("long").alias("revenue_fp"))
        .orderBy(F.desc("revenue_fp"), F.asc("n_name"))
    )


TOP_PARTS_K = 3


@register(
    "q_top_parts_per_brand",
    oracle=f"""
SELECT p_brand, p_name, revenue_fp, CAST(rn AS BIGINT) AS brand_rank
FROM (
  SELECT p_brand, p_name, revenue_fp,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue_fp DESC, p_name) AS rn
  FROM (
    SELECT p_brand, p_name, CAST(SUM({REV_SQL}) AS BIGINT) AS revenue_fp
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_name
  )
)
WHERE rn <= {TOP_PARTS_K}
ORDER BY p_brand, brand_rank
""",
)
def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K revenue parts per brand: broadcast dim join + grouped agg
    + ranking window (the canonical top-k-per-group shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_name")
        .agg(F.sum(_rev_col()).cast("long").alias("revenue_fp"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue_fp"), F.asc("p_name"))
    return (
        rev.withColumn("brand_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("brand_rank") <= TOP_PARTS_K)
        .select("p_brand", "p_name", "revenue_fp", "brand_rank")
        .orderBy("p_brand", "brand_rank")
    )
