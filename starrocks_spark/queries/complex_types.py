"""Complex-type surface: MAP / STRUCT / ARRAY breadth and the VARIANT
type (SURVEY.md §1.3, §2.10 map/struct/array/variant families).

Reference files: map_functions.cpp (533), map_apply_expr.cpp,
struct_functions.cpp, subfield_expr.cpp, array_functions.cpp (2138),
variant_functions.cpp (327), types/variant_value.h.

Cross-engine comparison strategy: the Spark side exercises the real
complex-type operators (map_from_arrays, transform_keys, zip_with,
variant_get, ...), then projects *scalars* out; the DuckDB oracle
reproduces the same scalars via its own list/json primitives, so the
value-hash proves semantics without relying on identical complex-type
wire formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table


def func_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays / map_keys / map_values / element_at /
    transform_values / map_filter / map_zip_with / map_concat
    (map_functions.cpp, map_apply_expr.cpp)."""
    nation = load_table(spark, sf_dir, "nation")
    # per-region map: nation name → nationkey
    base = (
        nation.groupBy("n_regionkey")
        .agg(
            F.map_from_arrays(
                F.sort_array(F.collect_list(F.struct("n_name", "n_nationkey")))
                .getField("n_name"),
                F.sort_array(F.collect_list(F.struct("n_name", "n_nationkey")))
                .getField("n_nationkey"),
            ).alias("m")
        )
    )
    doubled = base.select(
        "n_regionkey",
        F.transform_values("m", lambda _, v: v * 2).alias("m2"),
        F.map_filter("m", lambda _, v: v % 2 == 0).alias("m_even"),
        "m",
    )
    return doubled.select(
        "n_regionkey",
        F.size("m").alias("n_nations"),
        F.size("m_even").alias("n_even"),
        F.aggregate(
            F.map_values("m2"), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sum_doubled"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("names"),
    )


_MAP_SQL = """
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       COUNT(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even,
       CAST(SUM(n_nationkey * 2) AS BIGINT) AS sum_doubled,
       string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation
GROUP BY n_regionkey
"""


def func_struct_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct construction, subfield access, struct ordering
    (struct_functions.cpp, subfield_expr.cpp): per nation, the
    max-by-struct-comparison (acctbal, custkey) customer."""
    customer = load_table(spark, sf_dir, "customer")
    packed = customer.select(
        "c_nationkey",
        F.struct(
            F.col("c_acctbal").alias("bal"), F.col("c_custkey").alias("key")
        ).alias("s"),
    )
    top = packed.groupBy("c_nationkey").agg(F.max("s").alias("best"))
    return top.select(
        "c_nationkey",
        F.col("best.key").alias("best_custkey"),
        F.floor(F.col("best.bal") * 100 + 0.5).cast("long").alias("best_bal_c"),
    )


_STRUCT_SQL = """
SELECT c_nationkey, c_custkey AS best_custkey,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS best_bal_c
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
  FROM customer
)
WHERE rn = 1
"""


def func_array_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array breadth: sort/distinct/union/intersect/except/position/
    slice/flatten/zip_with (array_functions.cpp:2138). Two per-order
    arrays (ship parts, big-qty parts) → set algebra → scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts"),
        F.array_sort(
            F.collect_set(F.when(F.col("l_quantity") > 25, F.col("l_partkey")))
        ).alias("big_parts"),
    )
    return per_order.select(
        "l_orderkey",
        F.size("parts").alias("n_parts"),
        F.size(F.array_intersect("parts", "big_parts")).alias("n_big"),
        F.size(F.array_except("parts", "big_parts")).alias("n_small"),
        F.element_at("parts", 1).alias("first_part"),
        F.size(F.slice("parts", 1, 2)).alias("n_sliced"),
        F.aggregate(
            F.zip_with("parts", "parts", lambda a, b: a + b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_self_zip"),
    )


_ARRAY2_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list_distinct(list(l_partkey))) AS parts,
         coalesce(list_sort(list_distinct(list(l_partkey)
                  FILTER (WHERE l_quantity > 25))), []) AS big_parts
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(parts) AS n_parts,
       len(list_intersect(parts, big_parts)) AS n_big,
       len(list_filter(parts, p -> NOT list_contains(big_parts, p)))
         AS n_small,
       parts[1] AS first_part,
       len(parts[1:2]) AS n_sliced,
       CAST(list_sum(list_transform(parts, p -> p * 2)) AS BIGINT)
         AS sum_self_zip
FROM per_order
"""


def func_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 VariantType ≙ types/variant_value.h,
    variant_functions.cpp): parse the events props JSON into a
    variant, typed-path extraction with variant_get."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_id",
        F.parse_json("props").alias("v"),
    )
    return (
        v.select(
            F.expr("variant_get(v, '$.k', 'long')").alias("k_val"),
        )
        .groupBy("k_val")
        .agg(F.count("*").alias("n"))
    )


_VARIANT_SQL = """
SELECT CAST(props ->> '$.k' AS BIGINT) AS k_val, COUNT(*) AS n
FROM events
GROUP BY k_val
"""


QUERIES = {
    "func_map_family": func_map_family,
    "func_struct_family": func_struct_family,
    "func_array_family2": func_array_family2,
    "func_variant_type": func_variant_type,
}

ORACLE = {
    "func_map_family": _MAP_SQL,
    "func_struct_family": _STRUCT_SQL,
    "func_array_family2": _ARRAY2_SQL,
    "func_variant_type": _VARIANT_SQL,
}
