"""Relational surface over the TPC-H-ish testdata (SURVEY.md §7 Phase 3).

The reference has no relational operators beyond pattern selection
(SURVEY.md §2.4) — this layer is the "free from Spark SQL" surface the
driver's t2 oracle exercises: scans, filtered aggregation, multi-way
joins, grouped/rollup/cube aggregation, window functions, top-k with
deterministic ordering, set operations, semi/anti joins, and the scalar
function library.

Scale notes per query are inline: dimension joins are broadcast
(region/nation/customer/supplier are KBs→MBs even at 100 TB lineitem),
aggregations are partial (map-side combine is automatic for all
F.sum/count/avg), and every filter/projection is expressed declaratively
so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import davg, dround, dsum, sql_davg, sql_dround, sql_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: pure scan + partial agg; no shuffle besides the
    6-group exchange — the shape that matters at 100 TB is that sums
    combine map-side and the scan only reads 7 of 11 columns."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 4, out_dp=2).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), 6, out_dp=2).alias("sum_charge"),
            davg(F.col("l_quantity"), 2, 4).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
            davg(F.col("l_discount"), 2, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4, 2)} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, 2)} AS sum_charge,
       {sql_davg('l_quantity', 2, 4)} AS avg_qty,
       {sql_davg('l_extendedprice', 2, 4)} AS avg_price,
       {sql_davg('l_discount', 2, 4)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer⋈orders⋈lineitem, top-10 revenue. customer is
    broadcast; orders⋈lineitem shuffles on orderkey (co-partitioned at
    scale if both are bucketed by orderkey)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate::TIMESTAMP_NS AS o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------- q4
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join (adapted: late-shipped lineitems),
    grouped count. The semi join prunes orders before the aggregate."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join; all dims broadcast, the only shuffle is
    lineitem⋈orders on orderkey + the final 5-group agg."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name, CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------- q6
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+sum: the whole query folds into one scan with pushed
    predicates — verify with .explain that PushedFilters carries all
    three ranges."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4, out_dp=2).alias("revenue")
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# -------------------------------------------------------------------- q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------- windows
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function surface: rank customers by order volume within
    nation, keep top 3. One shuffle on custkey for the agg, one on
    nationkey for the window."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice"), 2).alias("total_spent"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("total_spent").desc(), F.col("c_custkey")
    )
    return (
        per_cust.withColumn("rank_in_nation", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_nation") <= 3)
        .select("c_nationkey", "c_custkey", "total_spent", "rank_in_nation")
        .orderBy("c_nationkey", "rank_in_nation")
    )


TOP_CUSTOMERS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT c_nationkey, c_custkey, total_spent,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY total_spent DESC, c_custkey) AS rank_in_nation
  FROM per_cust JOIN customer ON o_custkey = c_custkey
)
SELECT c_nationkey, c_custkey, total_spent, rank_in_nation
FROM ranked WHERE rank_in_nation <= 3
ORDER BY c_nationkey, rank_in_nation
"""


def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window (rows between unbounded preceding and current)
    over each customer's order history; limited to a key slice to keep
    the checked output small while the plan shape is the 100 TB one."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w).cast("double"),
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


RUNNING_TOTALS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate::TIMESTAMP_NS AS o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# ----------------------------------------------------- rollup / cube / sets
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS surface via ROLLUP(region, nation)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum(F.col("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


ROLLUP_SQL = """
SELECT r_name, n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (the insert-dedup primitive too)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def nations_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: nations having customers INTERSECT nations
    having suppliers, minus (EXCEPT) nations of big-balance customers."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    with_cust = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    with_supp = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    rich = (
        cust.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    return with_cust.intersect(with_supp).exceptAll(rich).orderBy("nationkey")


SET_OPS_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
EXCEPT
SELECT c_nationkey FROM customer WHERE c_acctbal > 9000
ORDER BY nationkey
"""


# ------------------------------------------------------------ scalar fns
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface, checked cross-engine."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        dround(F.col("p_retailprice") * 1.1, 2).alias("uplift_price"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("pk_mod"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
    ).orderBy("p_partkey")


SCALAR_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_pfx,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       FLOOR((p_retailprice * 1.1) * 100 + 0.5) / 100 AS uplift_price,
       ABS(p_size - 25) AS size_dev,
       p_partkey % 7 AS pk_mod,
       COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
FROM part WHERE p_partkey < 100
ORDER BY p_partkey
"""


def date_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("long").alias(
            "days_to_2002"
        ),
    ).orderBy("o_orderkey")


DATE_SQL = """
SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS order_year,
       EXTRACT(MONTH FROM o_orderdate) AS order_month,
       EXTRACT(DAY FROM o_orderdate) AS order_day,
       EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
       DATE_TRUNC('month', o_orderdate)::TIMESTAMP_NS AS month_start,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


QUERIES: dict[str, Query] = {
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": Query(q3_shipping_priority, Q3_SQL),
    "q4_order_priority": Query(q4_order_priority, Q4_SQL),
    "q5_local_supplier_volume": Query(q5_local_supplier_volume, Q5_SQL),
    "q6_revenue_change": Query(q6_revenue_change, Q6_SQL),
    "q10_returned_items": Query(q10_returned_items, Q10_SQL),
    "top_customers_per_nation": Query(top_customers_per_nation, TOP_CUSTOMERS_SQL),
    "running_order_totals": Query(running_order_totals, RUNNING_TOTALS_SQL),
    "rollup_revenue": Query(rollup_revenue, ROLLUP_SQL),
    "cube_lineitem_status": Query(cube_lineitem_status, CUBE_SQL),
    "customers_without_orders": Query(customers_without_orders, NO_ORDERS_SQL),
    "nations_set_ops": Query(nations_set_ops, SET_OPS_SQL),
    "scalar_function_gallery": Query(scalar_function_gallery, SCALAR_SQL),
    "date_function_gallery": Query(date_function_gallery, DATE_SQL),
}
