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
    # --- r11 rotation: staleness-first (r10 verdict ask #7).
    # Every registered query has had >=1 driver check; this
    # window re-drives the 50 stalest rows — everything whose
    # last driver check was round 1 (39 rows: early TPC-H,
    # window/grouping/setop/subquery/scalar families) plus the
    # 11 oldest round-2 rows. The TPC-H rows double as checks
    # on the r11 bench-headline extension to all 22 queries.
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier",
    "tpch_q17_small_quantity",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales",
    "window_rank",
    "window_lead_lag",
    "window_ntile_dist",
    "window_moving_avg",
    "window_first_last",
    "grouping_rollup",
    "grouping_cube",
    "grouping_sets_explicit",
    "setop_except",
    "setop_intersect",
    "setop_union_counts",
    "subquery_exists",
    "subquery_not_exists",
    "subquery_scalar",
    "qualify_top_order",
    "pivot_status",
    "case_when_buckets",
    "topk_parts",
    "values_inline_join",
    "explode_words",
    "posexplode_embedding",
    "generate_series_months",
    "func_string_family",
    "tpch_q12_shipmode_priority",
    "tpch_q21_suppliers_kept_waiting",
    "json_extract_props",
    "asof_purchase_view",
    "join_nonequi_range",
    "point_lookup_pk",
    "skew_salted_join",
    "agg_pushdown_nation_revenue",
    "sessionize_stats",
    "text_quality_stats",
    "token_count_stats",
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
