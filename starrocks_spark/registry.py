"""Central registry merging every query module's QUERIES/ORACLE dicts.

The driver contract (__spark_entry__.py) and pytest both consume this,
so adding a module here automatically widens both the correctness gate
and the test suite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from starrocks_spark.queries import (
    agg_functions,
    agg_pushdown_queries,
    analytics,
    bitmap_queries,
    complex_types,
    dialect_queries,
    events_analytics,
    joins_misc,
    llm_pipeline,
    misc2,
    mv_queries,
    scalar_funcs2,
    skew_queries,
    sources_queries,
    streaming_queries,
    table_funcs,
    table_model_queries,
    tpch,
    tpch2,
    unnest_multi,
)

_MODULES = [
    tpch,
    tpch2,
    analytics,
    table_funcs,
    events_analytics,
    llm_pipeline,
    agg_functions,
    streaming_queries,
    dialect_queries,
    table_model_queries,
    sources_queries,
    scalar_funcs2,
    mv_queries,
    joins_misc,
    complex_types,
    agg_pushdown_queries,
    misc2,
    skew_queries,
    unnest_multi,
    bitmap_queries,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(getattr(mod, "ORACLE", {}))
    return merged
