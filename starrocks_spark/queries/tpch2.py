"""TPC-H queries 2-22 (the ones not in tpch.py), adapted to the
driver's reduced star schema.

The driver's tables have no ``partsupp``, no commit/receipt dates and
no comment columns, so each query keeps the *plan shape* of its TPC-H
namesake — the operator composition the reference implements
(correlated scalar subqueries, EXISTS/NOT EXISTS → semi/anti joins,
conditional aggregation, outer-join histograms, HAVING over scalar
subqueries; be/src/exec/hash_join_node.h join types
PlanNodes.thrift:826-845) — with predicates rewritten onto the
available columns.

Scale notes: SF-invariant frames (nation 25 rows, region 5, single-row
scalar aggregates) carry an unconditional broadcast hint; every
SF-SCALING frame (customer/part/supplier and aggregates keyed by
part/supp/cust keys) goes through ``maybe_broadcast`` UNhinted, so AQE
broadcasts it at small scale and shuffles it at 100× — a forced hint
has no size escape hatch (r11 verdict). Fact-fact joins
(lineitem⋈orders, lineitem⋈lineitem) shuffle on the order key, which
is also how a 1000-executor cluster would co-partition them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.queries._util import (DEC, davg, dsum, fixed,
                                            maybe_broadcast, sql_dsum,
                                            sql_fixed)

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


def fixed_sum(col):
    """Exact fixed-point sum as DECIMAL(38,0) (scale 1e4)."""
    return F.sum(fixed(col))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery → join back on equality.
    (partsupp is absent; lineitem acts as the part↔supplier bridge with
    unit price = extendedprice / quantity.)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    offers = (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey", unit)
    )
    min_unit = offers.groupBy("p_partkey").agg(F.min("unit_price").alias("min_unit"))
    return (
        offers.join(maybe_broadcast(min_unit), "p_partkey")
        .filter(F.col("unit_price") == F.col("min_unit"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_partkey", "p_name", "s_name", "n_name")
        .agg(F.min("min_unit").alias("min_unit_price"))
        .orderBy("p_partkey", "s_name")
    )


_Q2_SQL = """
WITH offers AS (
  SELECT p_partkey, p_name, l_suppkey,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
)
SELECT p_partkey, p_name, s_name, n_name,
       MIN(unit_price) AS min_unit_price
FROM offers o
JOIN supplier ON o.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE unit_price = (SELECT MIN(unit_price) FROM offers o2
                    WHERE o2.p_partkey = o.p_partkey)
GROUP BY p_partkey, p_name, s_name, n_name
ORDER BY p_partkey, s_name
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS correlated subquery → left-semi join + agg.
    ('late shipment' stands in for commitdate < receiptdate.)"""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two nation dimensions joined to opposite sides of the
    fact chain (supplier nation ≠ customer nation), revenue per pair
    per year."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       {sql_dsum(_REV_SQL)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: conditional share-of-total aggregation per year
    (nation 5's share of revenue into the customer region of nation 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_region = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    target = F.when(F.col("s_nationkey") == 5, _rev()).otherwise(F.lit(0.0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(target) / dsum(_rev())).alias("mkt_share"))
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       ({sql_dsum(f"CASE WHEN s_nationkey = 5 THEN {_REV_SQL} ELSE 0.0 END")})
         / ({sql_dsum(_REV_SQL)}) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit per supplier-nation per year. Supply cost is
    modeled as 60% of p_retailprice (no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       {sql_dsum(f"{_REV_SQL} - 0.6 * p_retailprice * l_quantity")} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: HAVING against a scalar subquery over the whole table
    (per-part value > 0.1% of total value; suppliers of nation group).
    The 0.1%-of-total comparison is done on the fixed-point integers
    (fp * 1000 > total_fp), so it is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 8)
    offers = li.join(
        maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = offers.groupBy("l_partkey").agg(fixed_sum(_rev()).alias("_fp"))
    total = per_part.agg(F.sum("_fp").alias("_tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_fp") * 1000 > F.col("_tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("_fp").cast("double") / F.lit(10000.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


_Q11_SQL = f"""
WITH offers AS (
  SELECT l_partkey, l_extendedprice, l_discount FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 8)
), per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM({sql_fixed(_REV_SQL)}) AS fp
  FROM offers GROUP BY l_partkey
)
SELECT p_partkey, CAST(fp AS DOUBLE) / 10000.0 AS part_value
FROM per_part
WHERE fp * 1000 > (SELECT SUM(fp) FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: join + conditional counts (CASE inside SUM), grouped
    by line status ('late' replaces the ship-mode predicate)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
         AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join + count → histogram of counts
    (two stacked aggregations)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar MAX subquery → equality join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(maybe_broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(_REV_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: NOT IN subquery (null-aware anti join,
    PlanNodes.thrift NULL_AWARE_LEFT_ANTI) + count distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            maybe_broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated AVG subquery per part → broadcast join on
    the pre-aggregated averages."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.join(maybe_broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ap_key"))
        .agg(davg(F.col("l_quantity")).alias("avg_qty"))
    )
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_SQL = f"""
WITH avg_qty AS (
  SELECT l_partkey AS ap_key,
         {sql_dsum('l_quantity')} / COUNT(l_quantity) AS avg_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
  GROUP BY l_partkey
)
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = ap_key
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * avg_qty
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: nested IN subqueries → chained semi joins
    (suppliers who moved >300 units of any SMALL part in 1996)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    heavy = (
        li.join(maybe_broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(maybe_broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
ORDER BY s_name
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: EXISTS + NOT EXISTS on a self-joined fact →
    semi + anti join against per-order supplier sets ('late' =
    shipped >60 days after order date)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        lo.filter(F.col("late"))
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


_Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM lo GROUP BY l_orderkey
)
SELECT s_name, COUNT(DISTINCT lo.l_orderkey) AS numwait
FROM lo
JOIN per_order ON lo.l_orderkey = per_order.l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE late AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar AVG subquery + NOT EXISTS anti join, grouped
    by nation (stands in for the phone country code)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("_avg")
    )
    return (
        cust.filter(F.col("c_nationkey") < 10)
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = f"""
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       {sql_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (SELECT {sql_dsum('c_acctbal')} / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY cntrycode
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": q2_min_cost_supplier,
    "tpch_q4_order_priority": q4_order_priority,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q11_important_stock": q11_important_stock,
    "tpch_q12_shipmode_priority": q12_shipmode_priority,
    "tpch_q13_customer_distribution": q13_customer_distribution,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q16_parts_supplier": q16_parts_supplier,
    "tpch_q17_small_quantity": q17_small_quantity,
    "tpch_q20_potential_promotion": q20_potential_promotion,
    "tpch_q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "tpch_q22_global_sales": q22_global_sales,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpch_q4_order_priority": _Q4_SQL,
    "tpch_q7_volume_shipping": _Q7_SQL,
    "tpch_q8_market_share": _Q8_SQL,
    "tpch_q9_product_profit": _Q9_SQL,
    "tpch_q11_important_stock": _Q11_SQL,
    "tpch_q12_shipmode_priority": _Q12_SQL,
    "tpch_q13_customer_distribution": _Q13_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q16_parts_supplier": _Q16_SQL,
    "tpch_q17_small_quantity": _Q17_SQL,
    "tpch_q20_potential_promotion": _Q20_SQL,
    "tpch_q21_suppliers_kept_waiting": _Q21_SQL,
    "tpch_q22_global_sales": _Q22_SQL,
}
