"""Extended aggregate operators mirroring the reference's aggregate
function library (SURVEY.md §2.5; state machines in
be/src/exprs/agg/, registrations in
fe/fe-core/src/main/java/com/starrocks/catalog/FunctionSet.java).

Everything here is a composition of built-in Spark aggregates —
JVM-side, partial-aggregation-friendly, no Python UDFs — so each
operator keeps map-side combine and survives a 1000-executor shuffle.

Scale notes per operator are in the docstrings; the common theme:
aggregate state must stay bounded per group (counters, fixed-size
sketches, top-n heaps emulated by sorted slices), never proportional
to group row count, except where the reference itself collects
(group_concat / array_agg), which we bound the same way StarRocks
does (group_concat_max_len).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from starrocks_spark.queries._util import fixed


# --------------------------------------------------------------- mann-whitney

def mann_whitney_u(df: DataFrame, value_col: str, group_col: str,
                   group_a: str, group_b: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (reference:
    be/src/exprs/agg/mann_whitney.h, FunctionSet.java:385).

    Scale design: never ranks raw rows. Aggregates to one row per
    DISTINCT value first (bounded by the value domain, e.g. 50 for
    l_quantity), then computes mid-ranks from cumulative counts over
    that tiny table. The only full-data pass is a hash aggregate with
    map-side combine; the window runs over |distinct values| rows.

    avg-rank of value x = (# rows < x) + (count(x) + 1) / 2
    U1 = R1 - n1(n1+1)/2 ;  z via normal approximation (no tie
    correction, matching the reference's default).
    """
    per_value = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .groupBy(F.col(value_col).alias("x"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_if(F.col(group_col) == group_a).alias("cnt_a"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_value.select(
        "x", "cnt", "cnt_a",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cnt_less"),
    )
    agg = ranked.agg(
        F.sum("cnt_a").cast("double").alias("n1"),
        (F.sum("cnt") - F.sum("cnt_a")).cast("double").alias("n2"),
        F.sum(
            F.col("cnt_a") * (F.col("cnt_less") + (F.col("cnt") + F.lit(1)) / F.lit(2.0))
        ).alias("r1"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    return agg.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1.alias("u1"),
        (F.col("n1") * F.col("n2") - u1).alias("u2"),
        (
            (u1 - F.col("n1") * F.col("n2") / F.lit(2.0))
            / F.sqrt(F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1) / F.lit(12.0))
        ).alias("z"),
    )


# ---------------------------------------------------------------- mode

def deterministic_mode(df: DataFrame, group_cols: list[str],
                       value_col: str) -> DataFrame:
    """mode() with a deterministic tie-break (highest count, then
    smallest value) — the reference's mode is also tie-broken
    deterministically. Two hash aggregates + a tiny per-group top-1;
    the rank window partitions by the group key so it scales out.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("cnt"), F.col(value_col))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*group_cols, F.col(value_col).alias(f"{value_col}_mode"))
    )


# ---------------------------------------------------------------- sum_map

def sum_map(df: DataFrame, map_col: str, group_cols: list[str],
            scale: int = 2) -> DataFrame:
    """sum_map: element-wise sum of map values per key (reference:
    be/src/exprs/agg/sum_map.h). explode entries → hash agg on
    (group, key) → re-assemble sorted map. Sums use the fixed-point
    policy so results are order-independent; state per group is
    bounded by the key domain.
    Output: group_cols + `summed` = "k1=v1,k2=v2" (sorted by key,
    values as exact fixed-point integers)."""
    entries = df.select(
        *group_cols, F.explode(F.map_entries(F.col(map_col))).alias("e")
    ).select(*group_cols, F.col("e.key").alias("k"), F.col("e.value").alias("v"))
    summed = entries.groupBy(*group_cols, "k").agg(
        F.sum(fixed(F.col("v"), scale)).alias("sv")
    )
    return (
        summed.groupBy(*group_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "sv"))),
                    lambda e: F.concat(e["k"], F.lit("="), e["sv"].cast("string")),
                ),
                ",",
            ).alias("summed")
        )
    )


# ------------------------------------------------------- bitmap emulation

def bitmap_intersect_count(df: DataFrame, key_col: str,
                           dim_col: str, dims: list[str]) -> Column:
    """intersect_count(bitmap) emulation (reference:
    be/src/exprs/agg/intersect_count.h, bitmap_intersect.h): count of
    keys present under EVERY listed dimension value. Returns a
    one-row DataFrame aggregate via count-distinct-per-key — the
    Spark-native equivalent of intersecting per-dim roaring bitmaps:
    the per-key membership set is built by one hash aggregate instead
    of a bitmap OR, and the intersection test is `count(distinct dim)
    == |dims|`."""
    per_key = (
        df.filter(F.col(dim_col).isin(*dims))
        .groupBy(key_col)
        .agg(F.count_distinct(dim_col).alias("ndims"))
    )
    return per_key.filter(F.col("ndims") == len(dims)).agg(
        F.count(F.lit(1)).alias("intersect_count")
    )


# ------------------------------------------------------- two-phase combinator

def state_merge_agg(df: DataFrame, group_cols: list[str], shard_expr: Column,
                    measures: dict[str, tuple[Column, str]]) -> DataFrame:
    """_state / _merge agg-state combinator demo (reference:
    be/src/exprs/agg/combinator/, types/agg_state_desc.h): phase 1
    computes partial aggregate state per (group, shard); phase 2
    merges partial states into the final value. This is exactly
    Spark's partial→final hash aggregate made explicit, and shows the
    state algebra is associative — the property that lets the
    reference (and Spark) split aggregation across 1000 nodes.

    measures: name → (phase-1 column over raw rows, merge function
    name in {"sum", "min", "max"}).
    """
    partial = df.groupBy(*group_cols, shard_expr.alias("_shard")).agg(
        *[col.alias(f"_s_{name}") for name, (col, _) in measures.items()]
    )
    merges = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*group_cols).agg(
        *[merges[how](f"_s_{name}").alias(name) for name, (_, how) in measures.items()]
    )
