"""Sessionization: assign a session number to each event.

Reference: StarRocks `session_number` window function
(be/src/exprs/agg/window.h:788, FunctionSet.java:548).

Formulation: lag + cumulative sum of gap breaks — one shuffle on the
entity key, linear work per partition. This is the canonical
distributed sessionizer; it holds at any scale because each entity's
events sort independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Append `session_col`: 1-based session index per `by` entity.
    A new session starts when the gap since the previous event is
    strictly greater than `gap_seconds`."""
    w = Window.partitionBy(by).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev_ts))
           > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    wsum = Window.partitionBy(by).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(session_col, F.sum(is_new).over(wsum))
