"""Fill-in coverage: bag-semantics set ops, RANGE frames with value
offsets, nth_value window function.

Reference: ExceptNode/IntersectNode keep ALL variants
(be/src/exec/except_node.h:41, intersect_node.h:40); analytic frames
RANGE BETWEEN N PRECEDING AND N FOLLOWING
(be/src/exec/analytor.h:110,187-201); nth/first/last value
(be/src/exprs/agg/window.h:417).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference keeps surplus duplicates —
    (custkeys of urgent orders) EXCEPT ALL (custkeys of F orders)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b).groupBy("o_custkey").agg(
        F.count("*").alias("surplus")
    )


_EXCEPT_ALL_SQL = """
WITH diff AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_custkey, COUNT(*) AS surplus FROM diff GROUP BY o_custkey
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset intersection with multiplicities."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 100_000).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") != "F").select("o_custkey")
    return a.intersectAll(b).groupBy("o_custkey").agg(
        F.count("*").alias("multiplicity")
    )


_INTERSECT_ALL_SQL = """
WITH common_keys AS (
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F'
)
SELECT o_custkey, COUNT(*) AS multiplicity
FROM common_keys GROUP BY o_custkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING over a numeric
    ordering column: peers are chosen by *value* distance, not row
    position (analytor.h frame kinds)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey"))
        .rangeBetween(-5000, 5000)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("near_orders"),
        F.max("o_orderkey").over(w).alias("window_max_key"),
    )


_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER w AS near_orders,
       MAX(o_orderkey) OVER w AS window_max_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
"""


def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + first/last over a full-partition frame
    (window.h:417,476)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
    )


_NTH_VALUE_SQL = """
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 2) OVER w AS second_key,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER w AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


QUERIES = {
    "setop_except_all": setop_except_all,
    "setop_intersect_all": setop_intersect_all,
    "window_range_frame": window_range_frame,
    "window_nth_value": window_nth_value,
}

ORACLE = {
    "setop_except_all": _EXCEPT_ALL_SQL,
    "setop_intersect_all": _INTERSECT_ALL_SQL,
    "window_range_frame": _RANGE_FRAME_SQL,
    "window_nth_value": _NTH_VALUE_SQL,
}
