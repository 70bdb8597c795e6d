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
