"""Multi-column unnest with LEFT JOIN semantics (SURVEY.md §2.9;
be/src/exprs/table_function/unnest.h:29, multi_unnest.h — StarRocks'
unnest(a, b) zips arrays positionally and keeps a NULL row for empty
inputs when used as LEFT JOIN unnest).

Spark: ``arrays_zip`` + ``explode_outer`` — one expression, positional
zip, empty/NULL arrays produce a single all-NULL row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table


def unnest_multi_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: zip (big parts, their quantities) arrays and unnest;
    orders with NO big lineitems keep one NULL row (LEFT semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("l_quantity") > 45,
                    F.struct("l_partkey", "l_linenumber"),
                )
            )
        ).alias("pairs")
    )
    unnested = per_order.select(
        "l_orderkey",
        F.explode_outer("pairs").alias("p"),
    )
    return unnested.select(
        "l_orderkey",
        F.col("p.l_partkey").alias("partkey"),
        F.col("p.l_linenumber").alias("linenumber"),
    )


_UNNEST_MULTI_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list((l_partkey, l_linenumber))
                   FILTER (WHERE l_quantity > 45)) AS pairs
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       p.l_partkey AS partkey,
       p.l_linenumber AS linenumber
FROM per_order,
     unnest(CASE WHEN pairs IS NULL OR len(pairs) = 0
                 THEN [NULL::ROW(l_partkey BIGINT, l_linenumber INTEGER)]
                 ELSE pairs END) AS t(p)
"""


QUERIES = {"unnest_multi_outer": unnest_multi_outer}
ORACLE = {"unnest_multi_outer": _UNNEST_MULTI_SQL}
