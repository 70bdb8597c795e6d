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
    connector_queries,
    curation_queries,
    dialect_queries,
    events_analytics,
    joins_misc,
    llm_pipeline,
    misc2,
    mv_queries,
    scalar_funcs2,
    sketch_queries,
    skew_queries,
    sources_queries,
    sqltester_queries,
    ssb,
    streaming_queries,
    table_funcs,
    table_model_queries,
    tpcds,
    tpcds2,
    tpcds3,
    tpcds4,
    tpcds5,
    tpcds6,
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
    sqltester_queries,
    unnest_multi,
    bitmap_queries,
    sketch_queries,
    connector_queries,
    curation_queries,
    ssb,
    tpcds,
    tpcds2,
    tpcds3,
    tpcds4,
    tpcds5,
    tpcds6,
]

# The driver's correctness gate checks the FIRST ~50 registered queries
# only (round-1 lesson: module order left ASOF/funnel/LLM/streaming/
# table-model families outside the window). This list pins the window
# and ROTATES each round (round-2 verdict ask #4): slots proven green in
# a prior driver round and unchanged since are swapped out for queries
# that have never had a driver row (they stay covered by the local
# pytest oracle mirror, which runs ALL queries). Rotation policy:
# (1) any query whose engine code or oracle changed this round stays in;
# (2) formerly-red rows stay in until driver-green;
# (3) freed slots go to never-driver-checked queries, oldest families
#     first. Keep the list at ~50 entries.
#
# r7 window: the NEW families first (the SQL-tester acceptance tier
# running real reference test/sql suites, the TPC-DS correlated-
# subquery family + six batch-3 shapes, st_contains, jsonpath
# wildcard/descent), then every
# query whose engine code changed this round (chunking tail fix,
# lakehouse merge dup-guard/de-literalized overlap/DELETE null
# semantics, the streaming CoW upsert rework + auto-compaction, the
# fulltext index metadata, and the ManagedTable no-version upsert
# load-order change), then the ~25 STALEST driver rows (r1/r2-era
# TPC-H/window/setop/asof/funnel families) whose shared engine core
# moved since their last driver check.
_PRIORITY = [
    # --- r12 rotation (r11 verdict ask #6): the 11 new
    # tpcds6 families (never driver-checked) first, then the
    # 39 stalest rows — every row last checked in round 2
    # (dialect scalar/agg/stream/table-model families) plus
    # the 25 oldest round-4 rows (agg sketches, connector,
    # meta-scan, files export, streaming, set-op ALL).
    # dialect_date_format_mysql / dialect_str_to_date_
    # roundtrip double as driver checks on this round's
    # date-arith dialect rework.
    "tpcds_q20_catalog_ratio",
    "tpcds_q26_catalog_demo_avgs",
    "tpcds_q42_month_category",
    "tpcds_q52_month_brand",
    "tpcds_q55_brand_month",
    "tpcds_q60_category_channel_union",
    "tpcds_q62_web_latency_buckets",
    "tpcds_q63_month_vs_avg",
    "tpcds_q79_customer_baskets",
    "tpcds_q80_channel_rollup",
    "tpcds_q82_onhand_price_band",
    "agg_approx_distinct_bounds",
    "agg_bitmap_algebra",
    "agg_group_concat",
    "agg_histogram_equiwidth",
    "agg_percentile_exact",
    "dialect_date_format_mysql",
    "func_array_higher_order",
    "func_bit_ops",
    "func_math_family",
    "func_variant_type",
    "multimodal_decode_meta",
    "recursive_cte_months",
    "stream_tumbling_revenue",
    "table_range_partition_prune",
    "agg_approx_top_k",
    "agg_array_agg_distinct",
    "agg_mann_whitney",
    "agg_map_agg",
    "agg_min_max_by",
    "agg_state_merge",
    "agg_theta_distinct",
    "asof_inner_tolerance",
    "connector_duckdb_sink",
    "dialect_str_to_date_roundtrip",
    "files_orc_partitioned_export",
    "func_array_family2",
    "func_inet_aton_ntoa",
    "func_map_family",
    "func_money_bytes_format",
    "func_ngram_search",
    "func_string_advanced",
    "lang_id_confusion",
    "large_in_list_join",
    "meta_scan_minmax",
    "pipeline_curate_corpus",
    "schema_scan_columns",
    "session_window_agg",
    "setop_except_all",
    "setop_intersect_all",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    if len(_PRIORITY) != len(set(_PRIORITY)):
        raise ValueError("_PRIORITY contains duplicates")
    ordered = {n: merged[n] for n in _PRIORITY}
    ordered.update({n: q for n, q in merged.items() if n not in ordered})
    return ordered


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(getattr(mod, "ORACLE", {}))
    return merged
