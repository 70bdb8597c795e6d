"""Bitmap value type + algebra (reference: types/bitmap_value.h
(Roaring), be/src/exprs/bitmap_functions.cpp:844, table functions
unnest_bitmap.h / subdivide_bitmap.h).

Representation: a bitmap is a **sorted array<long> of distinct ids**.
Roaring's value is cache/CPU compression of exactly this set; Spark's
columnar arrays + Tungsten already store it compactly, and every
operation below is a built-in higher-order expression (codegen,
no UDF). At 100 TB the construction aggregates (collect_set) shuffle
only (key, id) pairs and each result bitmap stays bounded by its
group's distinct count — the same memory contract Roaring gives the
reference. For astronomic per-key cardinalities the engine's HLL
sketches (operators/aggregates.py) are the pressure valve, mirroring
the reference's bitmap→HLL guidance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bitmap_agg(id_col: Column) -> Column:
    """bitmap_agg / bitmap_union of raw ids (bitmap_agg.h)."""
    return F.array_sort(F.collect_set(id_col))


def bitmap_and(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_intersect(a, b))


def bitmap_or(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(a, b))


def bitmap_xor(a: Column, b: Column) -> Column:
    return F.array_sort(
        F.array_union(F.array_except(a, b), F.array_except(b, a))
    )


def bitmap_andnot(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_except(a, b))


def bitmap_count(a: Column) -> Column:
    return F.size(a).cast("long")


def bitmap_contains(a: Column, v: Column) -> Column:
    return F.array_contains(a, v)


def bitmap_to_array(a: Column) -> Column:
    """bitmap_to_array — identity under this representation."""
    return a


def subdivide_bitmap(a: Column, chunk: int) -> Column:
    """subdivide_bitmap(bitmap, n) → array of ≤n-element bitmaps
    (subdivide_bitmap.h — used to cap per-row bitmap size before
    shipping)."""
    n_chunks = F.ceil(F.size(a) / F.lit(chunk)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.slice(a, i * chunk + 1, chunk),
    )
