"""Partial-aggregation pushdown below join (SURVEY.md §4.1/§4.3 [R];
reference: fe/.../rule/tree/PushDownAggregateRule.java, pdagg/).

Catalyst does not push aggregation below joins. For the dominant OLAP
shape — huge fact table joined to small dimensions, then grouped by
dimension attributes — aggregating the fact side on its join key
*first* collapses the join input from |fact| rows to |distinct keys|
rows. At 100 TB that's the difference between joining 10^11 rows and
joining 10^7, and the dimension join becomes a broadcast over an
already-tiny stream.

Correct whenever the measures are decomposable (partial state merges
associatively) — and the caller declares HOW they merge explicitly,
the same information the reference's rule reads from its aggregate
registry. (An earlier version inferred the merge by substring-matching
the Column's string repr, which mis-fired on min_by/count_if.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# named merge strategies for partial aggregation states
_MERGES: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,    # SUM and COUNT partials re-sum
    "min": F.min,
    "max": F.max,
    "bool_or": F.bool_or,
    "bool_and": F.bool_and,
    "bit_or": F.bit_or,
    "bit_and": F.bit_and,
}


def rollup_join(
    fact: DataFrame,
    fact_key: str,
    measures: dict[str, tuple[Column, str | Callable[[str], Column]]],
    dims: list[tuple[DataFrame, Column]],
    group_by: list[str],
) -> DataFrame:
    """fact ⨝ dims grouped by dim attributes, with the fact side
    pre-aggregated on its join key.

    ``measures``: output name → (partial aggregate over fact columns,
    merge) where merge is a name from ``_MERGES`` ("sum"/"min"/"max"/
    "bool_or"/...) or a callable column-builder. Non-decomposable
    aggregates (min_by, count_if over post-join rows, percentile, ...)
    have no valid merge and must be rejected by the caller — exactly
    the reference rule's decomposability check.

    ``dims``: (dimension DataFrame, join condition) pairs, joined in
    order, each broadcast. ``group_by``: final grouping columns (from
    the dimensions or the fact key).

    Plan shape: HashAggregate(fact) → BroadcastHashJoin* →
    HashAggregate(final merge) — two aggs, the big one before any
    join, verified by tests/test_plans.py.
    """
    partials, merges = {}, {}
    for name, spec in measures.items():
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise ValueError(
                f"measure {name!r}: pass (aggregate, merge) — the merge "
                f"function cannot be inferred from a Column (min_by/"
                f"count_if would silently merge wrong)"
            )
        agg, merge = spec
        if isinstance(merge, str):
            if merge not in _MERGES:
                raise ValueError(
                    f"measure {name!r}: unknown merge {merge!r}; "
                    f"expected one of {sorted(_MERGES)} or a callable"
                )
            merge = _MERGES[merge]
        partials[name] = agg
        merges[name] = merge

    partial = fact.groupBy(fact_key).agg(
        *[m.alias(f"__p_{name}") for name, m in partials.items()]
    )
    joined = partial
    for dim_df, cond in dims:
        joined = joined.join(broadcast(dim_df), cond)
    final_aggs = [
        merges[name](f"__p_{name}").alias(name) for name in partials
    ]
    return joined.groupBy(*group_by).agg(*final_aggs)
