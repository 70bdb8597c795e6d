"""Mergeable sketch-state columns: HLL and percentile.

Reference analogs:
- HLL_UNION value columns on AGG_KEYS tables + hll_union_agg /
  hll_cardinality (be/src/exprs/agg/hll_union.h, be/src/types/hll.h,
  fe FunctionSet HLL_UNION_AGG) — the backbone of StarRocks rollup
  tables that keep a re-mergeable distinct-count per key.
- PERCENTILE_UNION value columns + percentile_approx
  (be/src/exprs/agg/percentile_union.h, be/src/util/tdigest.h).

Spark realization:
- HLL: Spark's built-in Apache DataSketches functions —
  ``hll_sketch_agg`` builds a BinaryType sketch, ``hll_union_agg``
  merges stored sketches, ``hll_sketch_estimate`` reads the
  cardinality. States are associative/commutative, so a 1000-node
  partial→final aggregation or an AGG_KEYS rowset merge is exact the
  same operation. Note (empirical): the *estimate* is only equal to
  the exact distinct count at small per-key cardinalities; like the
  reference's HLL it is approximate beyond that.
- Percentile: the reference's tdigest state is not reproducible
  cross-engine, so the mergeable state here is a fixed-width bucket
  histogram (array<long> of exact counts) — deterministic, exactly
  mergeable by element-wise sum, and the quantile read-out
  (lower bound of the first bucket reaching rank ceil(p*n)) is
  bit-identical in any engine. All pure built-in expressions: the
  state build is B conditional-sum aggregates (statically unrolled,
  stays in whole-stage codegen — same pattern as the simhash bit
  loop), the merge is B element sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from starrocks_spark.functions import text as T

# --------------------------------------------------------------------- HLL

def hll_state(col: str | Column) -> Column:
    """Build an HLL sketch state from raw values (aggregate).
    Reference: hll_hash + HLL_UNION ingest (hll_union.h)."""
    return F.hll_sketch_agg(col)


def hll_merge(col: str | Column) -> Column:
    """Merge stored HLL sketch states (aggregate).
    Reference: hll_union_agg (hll_union.h)."""
    return F.hll_union_agg(col)


def hll_estimate(col: str | Column) -> Column:
    """Read the cardinality estimate off a sketch state.
    Reference: hll_cardinality (hll_functions.cpp)."""
    return F.hll_sketch_estimate(col)


# -------------------------------------------------- percentile histogram

def pct_bucket(col: Column, width: float, buckets: int) -> Column:
    """Bucket index of a value: clamp(floor(x / width), 0, B-1)."""
    b = F.floor(col / F.lit(width)).cast("int")
    return F.least(F.greatest(b, F.lit(0)), F.lit(buckets - 1))


def pct_state(col: Column, width: float, buckets: int) -> Column:
    """Aggregate raw values into a mergeable percentile state:
    array<long> of exact bucket counts (percentile_union.h ingest)."""
    bkt = pct_bucket(col, width, buckets)
    return F.array(*[
        F.sum(F.when(bkt == i, 1).otherwise(0)).cast("long")
        for i in range(buckets)
    ])


def pct_merge(col: str | Column, buckets: int) -> Column:
    """Merge stored percentile states: element-wise sum (aggregate).
    Reference: percentile_union.h merge()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[
        F.sum(F.element_at(c, i + 1)).cast("long") for i in range(buckets)
    ])


def pct_quantile(state: Column, p: float, width: float) -> Column:
    """Quantile read-out: lower bound of the first bucket whose
    cumulative count reaches ceil(p * total). Deterministic — exact
    counts, integer rank — so any engine computes the same value."""
    total = F.aggregate(state, F.lit(0).cast("long"), lambda a, x: a + x)
    target = F.ceil(F.lit(p) * total)
    # fold: (cum, found_idx); first index where cum >= target wins
    found = F.aggregate(
        F.zip_with(
            state,
            F.sequence(F.lit(0), F.size(state) - 1),
            lambda cnt, i: F.struct(cnt.alias("c"), i.alias("i")),
        ),
        F.struct(
            F.lit(0).cast("long").alias("cum"), F.lit(-1).alias("idx")
        ),
        lambda acc, e: F.struct(
            (acc["cum"] + e["c"]).alias("cum"),
            F.when(
                (acc["idx"] < 0) & (acc["cum"] + e["c"] >= target), e["i"]
            ).otherwise(acc["idx"]).alias("idx"),
        ),
    )["idx"]
    return (found.cast("double") * F.lit(width)).alias("q")


def sql_pct_bucket(expr: str, width: float, buckets: int) -> str:
    """DuckDB twin of pct_bucket (oracle side)."""
    return (
        f"LEAST(GREATEST(CAST(FLOOR(({expr}) / {width!r}) AS INT), 0), "
        f"{buckets - 1})"
    )


# ------------------------------------------------------- theta (KMV) sketch
#
# Reference: ds_theta_count_distinct.h (Apache DataSketches theta) — a
# mergeable distinct-count state that also supports set algebra
# (union / intersect / difference estimates), which HLL cannot.
#
# Spark realization: a KMV ("K minimum values") theta sketch built from
# the portable 60-bit md5 hash (functions/text.py hash60) so the DuckDB
# oracle can replicate the state — and therefore the ESTIMATE —
# bit-identically. State = the K smallest distinct hashes, sorted
# ascending (array<long>, len ≤ K). Merge = dedup-union, keep K
# smallest: associative, commutative, idempotent — and lossless versus
# a from-scratch build (each of the global K smallest hashes is
# necessarily within its partial's K smallest), so partial→final is
# exact, the same contract the reference's theta union has.
#
# Estimator (standard KMV): with n = |state|,
#   n < K          → exact n      (sketch saw every distinct value)
#   n = K          → (K-1) * 2^60 / state[K-1]
# Every step is integer or single-IEEE-op math → cross-engine exact.

_HASH_SPACE = float(1 << 60)


def theta_state(df, group_cols: list[str], value: Column,
                k: int = 256):
    """Build per-group theta states. Two bounded shuffles, both
    scale-safe: (1) distinct on (groups, hash) — the classic
    count-distinct expansion, map-side combined; (2) per-group top-K
    via window row_number (sort key is the 8-byte hash). No
    collect_set of unbounded cardinality anywhere."""
    from pyspark.sql import Window

    h = T.hash60(value.cast("string"))
    distinct = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("theta_state"))
    )


def theta_merge(state: str | Column, k: int = 256) -> Column:
    """Merge stored theta states (aggregate): dedup-union, K smallest.
    Reference: theta union (ds_theta_count_distinct.h)."""
    c = F.col(state) if isinstance(state, str) else state
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))),
        1, k,
    )


def theta_estimate(state: Column, k: int = 256) -> Column:
    """Distinct-count estimate off a theta state. Exact below K."""
    n = F.size(state)
    kth = F.element_at(state, k).cast("double")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth
    )


def theta_intersect_estimate(a: Column, b: Column,
                             k: int = 256) -> Column:
    """|A ∩ B| estimate: θ = min over both sketches' thresholds (2^60
    when a sketch is exact); count common hashes < θ, scale by 2^60/θ.
    Reference: theta intersection (ds_theta_intersect)."""
    def thr(s: Column) -> Column:
        return F.when(
            F.size(s) < k, F.lit(_HASH_SPACE)
        ).otherwise(F.element_at(s, k).cast("double"))

    theta = F.least(thr(a), thr(b))
    common = F.size(
        F.filter(
            F.array_intersect(a, b),
            lambda h: h.cast("double") < theta,
        )
    )
    return common.cast("double") * F.lit(_HASH_SPACE) / theta


def sql_theta_state(value_expr: str, k: int = 256) -> str:
    """DuckDB twin of the per-group state (use inside a grouped
    subquery: returns the sorted K-smallest-distinct-hash list)."""
    h = T.sql_hash60(f"CAST({value_expr} AS VARCHAR)")
    return (
        f"list_sort(list_slice(list_sort(list_distinct("
        f"list({h}))), 1, {k}))"
    )


def sql_theta_estimate(state: str, k: int = 256) -> str:
    return (
        f"CASE WHEN len({state}) < {k} THEN CAST(len({state}) AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {_HASH_SPACE!r} / "
        f"CAST({state}[{k}] AS DOUBLE) END"
    )


# ------------------------------------------------------------ approx_top_k
#
# Reference: approx_top_k.h — a counter-budgeted frequent-items state
# (capacity = counter slots; exact whenever per-group distinct ≤
# capacity, approximate beyond — same contract as the reference, whose
# sketch is likewise exact until the counter budget is exceeded).
#
# State = array<struct<item, cnt>> of the `capacity` highest-count
# items, ordered (cnt desc, item asc) for determinism. Build and merge
# are plain groupBy-sum + windowed top-N — every step exact SQL, so
# the oracle replicates it verbatim; the *approximation* enters only
# through capping, deterministically (smallest counters dropped,
# ties broken by item).

def topk_state(df, group_cols: list[str], item: Column,
               capacity: int = 64):
    """Per-group frequent-items state: groupBy count (map-side
    combined) → deterministic top-`capacity` → packed struct array."""
    from pyspark.sql import Window

    counted = (
        df.select(*group_cols, item.alias("_item"))
        .groupBy(*group_cols, "_item")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_cnt").desc(), F.col("_item").asc()
    )
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= capacity)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(
                    (-F.col("_cnt")).alias("neg"),
                    F.col("_item").alias("item"),
                    F.col("_cnt").alias("cnt"),
                ))
            ).alias("_packed")
        )
        .withColumn(
            "topk_state",
            F.transform(
                F.col("_packed"),
                lambda s: F.struct(s["item"].alias("item"),
                                   s["cnt"].alias("cnt")),
            ),
        )
        .drop("_packed")
    )


def topk_merge_read(states, group_cols: list[str], k: int,
                    capacity: int = 64):
    """Merge stored states and read the top-k rows per group:
    explode → sum per item → deterministic rank ≤ k. (The merge to a
    new capped STATE is the same plan with `capacity` in place of
    `k`.) Exactness: when every contributing state was uncapped the
    merged counts are exact; capped inputs under-count by at most the
    dropped tail, exactly like the reference's counter merge."""
    from pyspark.sql import Window

    exploded = states.select(
        *group_cols, F.explode("topk_state").alias("e")
    ).select(*group_cols, F.col("e.item").alias("item"),
             F.col("e.cnt").alias("cnt"))
    summed = exploded.groupBy(*group_cols, "item").agg(
        F.sum("cnt").alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
