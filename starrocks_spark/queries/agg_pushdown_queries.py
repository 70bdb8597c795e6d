"""Agg-pushdown-below-join query (operators/agg_pushdown.py;
reference PushDownAggregateRule.java): supplier revenue by nation
with the lineitem side collapsed to per-supplier partials *before*
any join touches it. The oracle is the naive join-then-aggregate —
identical results, different (and at scale far cheaper) plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.operators.agg_pushdown import rollup_join
from starrocks_spark.queries._util import fixed, sql_fixed


def agg_pushdown_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    out = rollup_join(
        li,
        fact_key="l_suppkey",
        measures={
            "rev_f": (F.sum(
                fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ), "sum"),
            "n_items": (F.count(F.lit(1)), "sum"),
            "max_qty_f": (F.max(fixed(F.col("l_quantity"))), "max"),
        },
        dims=[
            (supplier, F.col("l_suppkey") == F.col("s_suppkey")),
            (nation, F.col("s_nationkey") == F.col("n_nationkey")),
        ],
        group_by=["n_name"],
    )
    return out.select(
        "n_name",
        (F.col("rev_f").cast("double") / 1e4).alias("revenue"),
        "n_items",
        (F.col("max_qty_f").cast("double") / 1e4).alias("max_qty"),
    )


_SQL = f"""
SELECT n_name,
       CAST(SUM({sql_fixed('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_items,
       CAST(MAX({sql_fixed('l_quantity')}) AS DOUBLE) / 10000.0 AS max_qty
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {"agg_pushdown_nation_revenue": agg_pushdown_nation_revenue}
ORACLE = {"agg_pushdown_nation_revenue": _SQL}
