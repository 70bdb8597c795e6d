"""AS-OF join: for every left row, the temporally closest right row.

Reference: StarRocks ASOF_INNER / ASOF_LEFT_OUTER join types
(gensrc/thrift/PlanNodes.thrift:826-845) backed by a hash map with a
sorted temporal index per key (be/src/exec/join/join_hash_map_asof_inst.cpp,
join_hash_map_method.h:153-166).

Spark has no asof primitive. This implementation uses the
union + ordered-window trick, which is the scalable MPP formulation:

1. Tag left and right rows and UNION them (no join at all).
2. One shuffle: partition by the equi-key, sort by (ts, side) within
   each partition.
3. `last(payload, ignorenulls=True)` over the running frame carries the
   most recent right payload forward onto each left row.

Cost: a single sort-shuffle over (|L| + |R|) rows — the same cost
profile as the reference's per-key sorted build. No range-explosion,
no per-key driver loops; AQE handles partition sizing. Skewed keys
degrade to a large single-partition sort (same as any window); for
known-skewed workloads pre-split by coarse time bucket first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_L = "__asof_l"
_R = "__asof_r"
_M = "__asof_m"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    direction: str = "backward",
    suffix: str = "_right",
    how: str = "left",
    tolerance: Column | None = None,
) -> DataFrame:
    """Join each left row to the nearest right row at or before (backward)
    / at or after (forward) its `on` timestamp, matching on `by` keys.

    Right payload columns keep their names, suffixed only on collision
    with a left column. The right row's own timestamp is exposed as
    ``{on}{suffix}``. ``how='left'`` keeps unmatched left rows (ASOF
    LEFT OUTER); ``how='inner'`` drops them (ASOF INNER).
    ``tolerance`` (a Column interval or seconds expression applied as
    ``left.ts - right.ts <= tolerance``) voids too-distant matches.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = [by] if isinstance(by, str) else list(by)

    lcols = left.columns
    rpayload = [c for c in right.columns if c not in by]
    out_names = {
        c: (c + suffix if c in lcols else c) for c in rpayload
    }
    out_names[on] = on + suffix  # right ts always exposed with suffix

    r_struct = F.struct(*[F.col(c) for c in rpayload])
    l_struct = F.struct(*[F.col(c) for c in lcols])

    l2 = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_TS),
        F.lit(1).alias(_SIDE),
        l_struct.alias(_L),
        F.lit(None).alias(_R),
    )
    # align the null _R placeholder's type with the right struct
    r2 = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).alias(_L),
        r_struct.alias(_R),
    )
    l2 = l2.withColumn(_R, F.lit(None).cast(r2.schema[_R].dataType))
    r2 = r2.withColumn(_L, F.lit(None).cast(l2.schema[_L].dataType))
    u = l2.unionByName(r2)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn(_M, F.last(_R, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )

    if tolerance is not None:
        gap = (
            F.col(_TS) - F.col(f"{_M}.{on}")
            if direction == "backward"
            else F.col(f"{_M}.{on}") - F.col(_TS)
        )
        matched = matched.withColumn(
            _M, F.when(gap <= tolerance, F.col(_M))
        )
    if how == "inner":
        matched = matched.filter(F.col(_M).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how}")

    out = [F.col(f"{_L}.{c}").alias(c) for c in lcols]
    out += [F.col(f"{_M}.{c}").alias(out_names[c]) for c in rpayload]
    return matched.select(*out)
