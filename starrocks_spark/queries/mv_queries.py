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
from starrocks_spark.queries._util import fixed, sql_dsum, sql_fixed
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


def mv_transparent_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent MV rewrite (tables/mv_rewrite.py; reference
    rule/transformation/materialization/): a (month, priority) revenue
    MV is registered in the MVCatalog; a month-grain aggregate query is
    then answered FROM THE MV (narrower-grain re-aggregation) after a
    PCT freshness check — asserted via the recorded route. The oracle
    aggregates the base table directly."""
    from starrocks_spark.tables.materialized_view import MaterializedView
    from starrocks_spark.tables.mv_rewrite import MVCatalog

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderpriority",
        fixed(F.col("o_totalprice")).cast("long").alias("o_totalprice_f"),
    )

    def defn(s: DataFrame) -> DataFrame:
        return s.groupBy("month", "o_orderpriority").agg(
            F.sum("o_totalprice_f").alias("rev_f"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    mv = MaterializedView(spark, defn, partition_col="month",
                          source_partition_expr="month")
    cat = MVCatalog()
    cat.register(mv, "orders", ["month", "o_orderpriority"],
                 {"rev_f": ("sum", "o_totalprice_f"),
                  "n_orders": ("count", "*")})
    out = cat.serve_agg(
        spark, src, "orders", ["month"],
        {"revenue_f": ("sum", "o_totalprice_f"),
         "n_orders": ("count", "*")},
    )
    assert cat.last_route and cat.last_route.startswith("mv:"),         cat.last_route
    return out.orderBy("month")


_MV_REWRITE_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(SUM({sql_fixed('o_totalprice')}) AS BIGINT) AS revenue_f,
       COUNT(*) AS n_orders
FROM orders
GROUP BY month
ORDER BY month
"""

QUERIES["mv_transparent_rewrite"] = mv_transparent_rewrite
ORACLE["mv_transparent_rewrite"] = _MV_REWRITE_SQL
