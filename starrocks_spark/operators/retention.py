"""retention: per-entity condition chain, then cohort counts.

Reference: StarRocks `retention([cond1, cond2, ...])` aggregate
(be/src/exprs/agg/retention.h, FunctionSet.java:350): r[0] = cond1,
r[i] = cond1 AND cond(i+1).

Formulation: one boolean `max` aggregation per entity (single shuffle
on the entity key), then a global roll-up — no joins, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention(
    events: DataFrame,
    conditions: list[Column],
    by: str = "user_id",
) -> DataFrame:
    """Returns one row per entity with boolean columns r1..rN following
    the reference semantics (rK = cond1 AND condK for K>1)."""
    per_user = events.groupBy(by).agg(
        *[F.max(c.cast("int")).alias(f"_c{i}") for i, c in enumerate(conditions, 1)]
    )
    cols = [F.col("_c1").alias("r1")]
    cols += [
        (F.col("_c1") * F.col(f"_c{i}")).alias(f"r{i}")
        for i in range(2, len(conditions) + 1)
    ]
    return per_user.select(by, *cols)
