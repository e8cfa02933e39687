"""Further TPC-H adaptations (columns limited to the driver testdata
schema — no partsupp/shipmode/phone, so q2/q9/q11/q12/q16/q21-22 are
re-shaped onto what exists; the join/aggregation shapes are preserved).

All oracle-checked. Scale notes: every query keeps dims broadcast and
facts shuffling on their join keys only; q17's correlated-avg subquery
is the classic broadcast-the-aggregate rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- q7-like
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow between two nation pairs by ship year (q7 without
    the supplier-nation side of the original predicate tangle)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(
            ((F.col("c_nationkey") == 1) & (F.col("s_nationkey") == 2))
            | ((F.col("c_nationkey") == 2) & (F.col("s_nationkey") == 1))
        )
    )
    return (
        joined.groupBy(
            F.col("c_nationkey").alias("cust_nation"),
            F.col("s_nationkey").alias("supp_nation"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "revenue"
            )
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


Q7_SQL = """
SELECT c_nationkey AS cust_nation, s_nationkey AS supp_nation,
       EXTRACT(YEAR FROM l_shipdate) AS ship_year,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE (c_nationkey = 1 AND s_nationkey = 2) OR (c_nationkey = 2 AND s_nationkey = 1)
GROUP BY c_nationkey, s_nationkey, EXTRACT(YEAR FROM l_shipdate)
ORDER BY cust_nation, supp_nation, ship_year
"""


# ---------------------------------------------------------------- q8-like
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation 3's share of ASIA's order revenue per year — the
    conditional-share aggregation of q8."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_year = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        dsum(F.col("o_totalprice"), 2).alias("total_rev"),
        dsum(
            F.when(F.col("c_nationkey") == 3, F.col("o_totalprice")).otherwise(0.0), 2
        ).alias("nation3_rev"),
    )
    return per_year.select(
        "order_year",
        dround(F.col("nation3_rev") / F.col("total_rev"), 6).alias("mkt_share"),
    ).orderBy("order_year")


Q8_SQL = """
WITH per_year AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_rev,
         CAST(SUM(CAST((CASE WHEN c_nationkey = 3 THEN o_totalprice ELSE 0.0 END) AS DECIMAL(30,2))) AS DOUBLE) AS nation3_rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY EXTRACT(YEAR FROM o_orderdate)
)
SELECT order_year,
       FLOOR((nation3_rev / total_rev) * 1000000 + 0.5) / 1000000 AS mkt_share
FROM per_year ORDER BY order_year
"""


# --------------------------------------------------------------- q13-like
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of customers by order count (incl. zero) — q13's
    left-join + double aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------- q14-like
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMO-type revenue share in one month (q14's conditional ratio)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-02-01"))
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        dsum(
            F.when(
                F.col("p_type") == "PROMO",
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
            ).otherwise(0.0),
            4,
        ).alias("promo_rev"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_rev"),
    )
    return agg.select(
        dround(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 4).alias(
            "promo_revenue_pct"
        )
    )


Q14_SQL = """
WITH agg AS (
  SELECT
    CAST(SUM(CAST((CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) AS DECIMAL(30,4))) AS DOUBLE) AS promo_rev,
    CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
)
SELECT FLOOR((100.0 * promo_rev / total_rev) * 10000 + 0.5) / 10000 AS promo_revenue_pct
FROM agg
"""


# --------------------------------------------------------------- q17-like
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg yearly revenue loss from small orders: lineitems below 50% of
    their part's average quantity (q17's correlated scalar subquery as a
    broadcast-aggregate join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy("l_partkey").agg(
        (dsum(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, on="l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(dround(dsum(F.col("l_extendedprice"), 2) / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# --------------------------------------------------------------- q18-like
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders above a total-quantity threshold (q18's
    HAVING-subquery turned into semi-join on the aggregated key)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate::TIMESTAMP_NS AS o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) > 150
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------- q19-like
def q19_discount_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs bracket predicate (q19's shape, on brand/size/qty)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity").between(20, 40)))
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# --------------------------------------------------------------- q16-like
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers serving each (brand, type) — q16's
    COUNT(DISTINCT) shape via lineitem in lieu of partsupp."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"))
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 20
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# --------------------------------------------------------------- q22-like
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no high-value orders
    (> 450000), per nation — q22's scalar-subquery + anti-join shape.
    (Plain 'no orders' is empty at every SF: order counts scale with
    customers.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (dsum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
  FROM customer WHERE c_acctbal > 0
)
AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ---------------------------------------------------------------- q15
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: the supplier(s) with maximum revenue over one quarter — the
    revenue view + scalar-max subquery, as a broadcast 1-row aggregate
    joined back (no second scan of the view)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------------------------- q12 (re-shaped)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 re-shaped (no shipmode/commit/receipt columns): lineitems
    shipped >90 days after their order date, counted by order priority
    into the q12 high/low split."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        )
        .orderBy("priority")
    )


Q12_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_late,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY priority
"""


# ------------------------------------------------------- q21 (re-shaped)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 re-shaped (no commit/receipt dates): for multi-supplier
    orders, the supplier(s) whose shipment was the LAST one (the
    order-blocking supplier), counted per supplier — top 20. Preserves
    q21's exists/not-exists shape via in-plan window maxima, not
    correlated subqueries."""
    li = _t(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_sups"),
        F.max("l_shipdate").over(w).alias("last_ship"),
    )
    blockers = (
        flagged.filter((F.col("n_sups") >= 2) & (F.col("l_shipdate") == F.col("last_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        blockers.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_sups,
         MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS last_ship
  FROM lineitem
),
blockers AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM flagged
  WHERE n_sups >= 2 AND l_shipdate = last_ship
)
SELECT s_name, COUNT(*) AS numwait
FROM blockers JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# -------------------------------------------------- q2/q9/q11/q20 (re-shaped)
# The testdata has no partsupp table; lineitem IS the observed
# part↔supplier relation, so these four re-shapes derive the partsupp
# analogue from it (unit price / shipped quantity) and preserve the
# original correlated-subquery / profit / share shapes exactly.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 re-shaped: for each SMALL-type part, the EUROPE supplier with
    the minimum observed unit price (min-cost correlated subquery as a
    broadcast-aggregate join). Ordering: s_acctbal desc, supplier,
    part."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        dround(
            dsum(F.col("l_extendedprice"), 2) / dsum(F.col("l_quantity"), 2), 4
        ).alias("unit_cost")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(
        F.broadcast(eu_sup), ps.l_suppkey == eu_sup.s_suppkey
    ).join(F.broadcast(part), ps.l_partkey == part.p_partkey)
    min_cost = eu_ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("unit_cost").alias("_min_cost")
    )
    return (
        eu_ps.join(
            min_cost,
            (eu_ps.l_partkey == min_cost._pk)
            & (eu_ps.unit_cost == min_cost._min_cost),
        )
        .select("s_acctbal", "s_name", "n_name", F.col("l_partkey").alias("p_partkey"), "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(20)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
                / CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eu_ps AS (
  SELECT ps.*, e.s_name, e.s_acctbal, e.n_name
  FROM ps JOIN eu_sup e ON ps.l_suppkey = e.s_suppkey
  JOIN part p ON ps.l_partkey = p.p_partkey
  WHERE p.p_type = 'SMALL'
)
SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, unit_cost
FROM eu_ps
WHERE unit_cost = (SELECT MIN(unit_cost) FROM eu_ps e2 WHERE e2.l_partkey = eu_ps.l_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 20
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 re-shaped: profit per supplier nation per ship year for
    'red %' parts, with supply cost proxied by p_retailprice (the
    partsupp ps_supplycost analogue available in this schema)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    profit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .withColumn(
            "amount",
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity"),
        )
    )
    return (
        profit.groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(dsum(F.col("amount"), 4, out_dp=2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity) AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, EXTRACT(year FROM l_shipdate)
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 re-shaped: per-part shipped value from NATION_1 suppliers,
    keeping parts above 0.1% of the total (the scalar-threshold
    subquery as a broadcast 1-row aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_li = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    )
    per_part = nat_li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        dsum(F.col("l_extendedprice"), 2).alias("part_value")
    )
    thresh = per_part.agg((F.sum("part_value") * 0.001).alias("_th"))
    return (
        per_part.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_th"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(20)
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT p_partkey, part_value
FROM per_part
WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM per_part)
ORDER BY part_value DESC, p_partkey
LIMIT 20
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 re-shaped: suppliers who shipped more than 15% of some
    Brand#1 part's total quantity (the availqty>half-demand correlated
    shape, threshold adapted to this data's diffuse supplier shares, from the lineitem-derived supply relation)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    b_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_ps = b_li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_quantity"), 2).alias("sup_qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(F.sum("sup_qty").alias("part_qty"))
    dominant = per_ps.join(per_part, on="l_partkey").filter(
        F.col("sup_qty") > 0.15 * F.col("part_qty")
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        dominant.select("l_suppkey")
        .distinct()
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sup_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey, SUM(sup_qty) AS part_qty FROM per_ps GROUP BY l_partkey
)
SELECT DISTINCT s_name
FROM per_ps JOIN per_part USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE sup_qty > 0.15 * part_qty
ORDER BY s_name
"""


QUERIES: dict[str, Query] = {
    "q16_supplier_variety": Query(q16_supplier_variety, Q16_SQL),
    "q22_dormant_rich_customers": Query(q22_dormant_rich_customers, Q22_SQL),
    "q7_volume_shipping": Query(q7_volume_shipping, Q7_SQL),
    "q8_market_share": Query(q8_market_share, Q8_SQL),
    "q13_customer_distribution": Query(q13_customer_distribution, Q13_SQL),
    "q14_promo_revenue": Query(q14_promo_revenue, Q14_SQL),
    "q17_small_quantity_revenue": Query(q17_small_quantity_revenue, Q17_SQL),
    "q18_large_orders": Query(q18_large_orders, Q18_SQL),
    "q19_discount_brackets": Query(q19_discount_brackets, Q19_SQL),
    "q15_top_supplier": Query(q15_top_supplier, Q15_SQL),
    "q12_late_shipping": Query(q12_late_shipping, Q12_SQL),
    "q21_waiting_suppliers": Query(q21_waiting_suppliers, Q21_SQL),
    "q2_min_cost_supplier": Query(q2_min_cost_supplier, Q2_SQL),
    "q9_product_profit": Query(q9_product_profit, Q9_SQL),
    "q11_important_stock": Query(q11_important_stock, Q11_SQL),
    "q20_excess_suppliers": Query(q20_excess_suppliers, Q20_SQL),
}
