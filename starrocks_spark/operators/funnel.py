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
