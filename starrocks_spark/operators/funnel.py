"""window_funnel: ordered event-chain depth within a time window.

Reference: StarRocks `window_funnel(window, ts, mode, [cond1, ...])`
aggregate (be/src/exprs/agg/window_funnel.h, FunctionSet.java:377).

Semantics implemented (greedy first-match, the common analytics
variant): anchor at the entity's EARLIEST step-1 event; step k+1
matches the earliest event strictly after step k's match and within
`window` of the anchor. Returns the per-entity depth reached (0..N).

Formulation: N filtered aggregations chained by broadcast-friendly
equi-joins — every stage is a shuffle on the entity key only, so it
scales linearly and never materializes event pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# StarRocks mode bit flags (window_funnel.h MODE_FLAGS / INCREASE)
DEDUPLICATION = 1
FIXED = 2
INCREASE = 4


def window_funnel_modes(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    window_seconds: int = 86400,
    mode: int = 0,
) -> DataFrame:
    """window_funnel with the reference's mode flags, bit-exact to
    be/src/exprs/agg/window_funnel.h get_event_level():

    - mode & 1 (DEDUPLICATION): a repeat of an in-chain event kills the
      current chain (its level is banked in max_level).
    - mode & 2 (FIXED): once a chain has started, an event whose
      predecessor step is inactive ("leap event") kills the chain.
    - mode & 4 (INCREASE): promotion requires a strictly increasing
      timestamp vs the previously matched step (reference quirk kept:
      in dedup/fixed modes slot 0's last-timestamp is never set, so the
      first promotion's INCREASE check is vacuous for equal stamps).

    Formulation: one hash aggregate collects each entity's step events
    as a sorted array, then the reference's sequential DP runs as a
    row-local fold (F.aggregate) over that array — state is the N-slot
    (start, last) vector plus (max_level, curr_level, first_event).
    Everything stays in built-in expressions: one shuffle on the
    entity key, per-entity state is O(N events) exactly like the
    reference's per-group agg state, so the plan scales to any entity
    count."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    win_us = window_seconds * 1_000_000
    dedup = bool(mode & DEDUPLICATION)
    fixed = bool(mode & FIXED)
    increase = bool(mode & INCREASE)
    moded = dedup or fixed

    idx = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        idx = F.when(F.col(type_col) == s, F.lit(n - i)).otherwise(idx)

    evs = (
        events.filter(F.col(type_col).isin(*steps))
        .select(
            F.col(by),
            F.struct(
                F.unix_micros(F.col(ts)).alias("t"), idx.alias("i")
            ).alias("e"),
        )
        .groupBy(by)
        .agg(F.array_sort(F.collect_list("e")).alias("_evs"))
    )

    neg = F.array(*[F.lit(-1).cast("long") for _ in range(n)])
    init = F.struct(
        neg.alias("s"),            # chain-start ts per slot (-1 inactive)
        neg.alias("l"),            # last matched ts per slot
        F.lit(-1).alias("ml"),     # max_level (banked chains)
        F.lit(-1).alias("cl"),     # curr_event_level
        F.lit(False).alias("fe"),  # first_event (fixed modes)
        F.lit(False).alias("done"),
    )

    def set_at(arr, k, val):
        # k: 0-based slot as a runtime int column; arrays are 1-based
        return F.transform(
            arr, lambda v, j: F.when(j == k, val).otherwise(v)
        )

    def step_fn(acc, e):
        t, k = e["t"], (e["i"] - 1).cast("int")
        s, last = acc["s"], acc["l"]
        ml, cl, fe = acc["ml"], acc["cl"], acc["fe"]
        prev_start = F.element_at(s, k)       # s[k-1]
        prev_last = F.element_at(last, k)     # l[k-1]
        own_start = F.element_at(s, k + 1)    # s[k]

        is_first = k == 0
        dedup_hit = (
            F.lit(dedup) & ~is_first & (own_start >= 0)
        )
        leap = (
            F.lit(fixed) & ~is_first & ~dedup_hit & fe & (prev_start < 0)
        )
        time_ok = t <= prev_start + F.lit(win_us)
        if increase:
            time_ok = time_ok & (prev_last < t)
        promote = (
            ~is_first & ~dedup_hit & ~leap & (prev_start >= 0) & time_ok
        )
        kill = dedup_hit | leap

        new_s = (
            F.when(is_first, set_at(s, F.lit(0), t))
            .when(kill, neg)
            .when(promote, set_at(s, k, prev_start))
            .otherwise(s)
        )
        # reference: default branch tracks last for slot 0; dedup/fixed
        # branches only set last on promotion (quirk mirrored)
        new_l = (
            F.when(is_first & F.lit(not moded), set_at(last, F.lit(0), t))
            .when(promote, set_at(last, k, t))
            .otherwise(last)
        )
        new_cl = (
            F.when(is_first, F.greatest(cl, F.lit(0)))
            .when(kill, F.lit(-1))
            .when(promote, F.greatest(cl, k))
            .otherwise(cl)
        )
        new_ml = F.when(kill, F.greatest(ml, cl)).otherwise(ml)
        new_fe = fe | is_first if fixed else fe
        new_done = acc["done"] | (promote & (k == n - 1))
        keep = acc["done"]
        return F.struct(
            F.when(keep, s).otherwise(new_s).alias("s"),
            F.when(keep, last).otherwise(new_l).alias("l"),
            F.when(keep, ml).otherwise(new_ml).alias("ml"),
            F.when(keep, cl).otherwise(new_cl).alias("cl"),
            (fe if not fixed else F.when(keep, fe).otherwise(new_fe))
            .alias("fe"),
            new_done.alias("done"),
        )

    level = F.aggregate(
        F.col("_evs"), init, step_fn,
        lambda acc: F.greatest(acc["ml"], acc["cl"]) + 1,
    )
    return evs.select(F.col(by), level.alias("level"))


def window_funnel(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    window_seconds: int = 86400,
) -> DataFrame:
    """Per-entity funnel depth: columns (`by`, level)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    win_us = window_seconds * 1_000_000

    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(by)
        .agg(F.min(ts).alias("_t1"))
    )
    reached = cur.select(by, F.lit(1).alias("level"))
    prev_t, anchor = "_t1", "_t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur, by)
            .filter(
                (F.col(ts) > F.col(prev_t))
                & (F.unix_micros(F.col(ts)) - F.unix_micros(F.col(anchor)) <= win_us)
            )
            .groupBy(by)
            .agg(F.min(ts).alias(f"_t{i}"), F.first(anchor).alias(anchor))
        )
        # keep the anchor column for the window bound of later steps
        cur = nxt.select(by, anchor, F.col(f"_t{i}"))
        reached = reached.unionByName(cur.select(by, F.lit(i).alias("level")))
        prev_t = f"_t{i}"
    return reached.groupBy(by).agg(F.max("level").alias("level"))
