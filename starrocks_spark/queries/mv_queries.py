"""Materialized-view queries: full + partition-incremental (PCT)
refresh end-to-end (tables/materialized_view.py; reference
MaterializedView.java:140, mv/refresh/pct/).

The scenario: an MV of monthly revenue per order-priority over a
mutable copy of orders. After the initial full refresh, one month of
new rows lands; the PCT refresh must recompute only that month and
the final MV state must equal the from-scratch aggregate — which is
exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.queries._util import fixed, sql_dsum
from starrocks_spark.tables.materialized_view import MaterializedView


def _definition(source: DataFrame) -> DataFrame:
    return (
        source.withColumn(
            "month", F.date_format("o_orderdate", "yyyy-MM")
        )
        .groupBy("month", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(fixed(F.col("o_totalprice"))).alias("rev_f"),
        )
    )


def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full refresh → one-month append → PCT refresh (must touch only
    the appended month) → read. Returns the settled MV."""
    orders = load_table(spark, sf_dir, "orders")
    mv = MaterializedView(
        spark,
        _definition,
        partition_col="month",
        source_partition_expr="date_format(o_orderdate, 'yyyy-MM')",
    )
    base = orders.filter(F.year("o_orderdate") < 2001)
    n0 = mv.refresh(base)
    assert n0 == -1, "first refresh must be full"

    # late-arriving batch: all 2001 orders, shifted keys, landing in
    # their own months
    late = orders.filter(F.year("o_orderdate") >= 2001)
    source2 = base.unionByName(late)
    n1 = mv.refresh(source2)
    late_months = late.select(
        F.date_format("o_orderdate", "yyyy-MM")
    ).distinct().count()
    assert 0 < n1 <= late_months, (
        f"PCT refresh touched {n1} partitions, expected <= {late_months}"
    )
    # a no-op refresh rewrites nothing
    assert mv.refresh(source2) == 0

    return mv.read().select(
        "month", "o_orderpriority", "n_orders",
        (F.col("rev_f").cast("double") / 1e4).alias("revenue"),
    )


_MV_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY month, o_orderpriority
"""


QUERIES = {"mv_incremental_refresh": mv_incremental_refresh}
ORACLE = {"mv_incremental_refresh": _MV_SQL}
