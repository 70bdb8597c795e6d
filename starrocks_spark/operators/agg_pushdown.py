"""Partial-aggregation pushdown below join (SURVEY.md §4.1/§4.3 [R];
reference: fe/.../rule/tree/PushDownAggregateRule.java, pdagg/).

Catalyst does not push aggregation below joins. For the dominant OLAP
shape — huge fact table joined to small dimensions, then grouped by
dimension attributes — aggregating the fact side on its join key
*first* collapses the join input from |fact| rows to |distinct keys|
rows. At 100 TB that's the difference between joining 10^11 rows and
joining 10^7, and the dimension join becomes a broadcast over an
already-tiny stream.

Correct whenever the measures are decomposable (SUM/COUNT/MIN/MAX —
partial state merges associatively), which is the same condition the
reference's rule checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def rollup_join(
    fact: DataFrame,
    fact_key: str,
    measures: dict[str, Column],
    dims: list[tuple[DataFrame, Column]],
    group_by: list[str],
) -> DataFrame:
    """fact ⨝ dims grouped by dim attributes, with the fact side
    pre-aggregated on its join key.

    ``measures``: output name → decomposable aggregate over fact
    columns (evaluated in the pre-aggregation). ``dims``: (dimension
    DataFrame, join condition) pairs, joined in order, each broadcast.
    ``group_by``: final grouping columns (from the dimensions or the
    fact key).

    Plan shape: HashAggregate(fact) → BroadcastHashJoin* →
    HashAggregate(final merge) — two aggs, the big one before any
    join, verified by tests/test_plans.py.
    """
    partial = fact.groupBy(fact_key).agg(
        *[m.alias(f"__p_{name}") for name, m in measures.items()]
    )
    joined = partial
    for dim_df, cond in dims:
        joined = joined.join(broadcast(dim_df), cond)
    final_aggs = [
        _merge_fn(m)(f"__p_{name}").alias(name)
        for name, m in measures.items()
    ]
    return joined.groupBy(*group_by).agg(*final_aggs)


def _merge_fn(measure: Column):
    """How partial states merge: SUM/COUNT partials re-sum, MIN takes
    min, MAX takes max. The expression string is the only
    introspection PySpark offers; unsupported (non-decomposable)
    aggregates are rejected — same check as the reference's rule."""
    s = str(measure).lower()
    if "min(" in s:
        return F.min
    if "max(" in s:
        return F.max
    if "sum(" in s or "count(" in s:
        return F.sum
    raise ValueError(f"non-decomposable measure for rollup_join: {measure}")
