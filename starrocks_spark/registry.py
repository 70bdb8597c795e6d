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
    # --- r9 NEW: FILES() acceptance tier (oss:// staging replay,
    # option surface, strict-load semantics) — plus every SQL-tester
    # row, since the runner changed broadly this round (classify word
    # boundaries, files preamble, INSERT strict/ratio path, CTAS
    # column transform, parse_r_file shell staging)
    "dialect_sqltester_files",
    "dialect_sqltester_case_when",
    "dialect_sqltester_orderby_agg",
    "dialect_sqltester_asof_join",
    "dialect_sqltester_agg_limit",
    "dialect_sqltester_grouping_set",
    "dialect_sqltester_tinyint_agg",
    "dialect_sqltester_null_safe_equal",
    "dialect_sqltester_sum_rewrite",
    "dialect_sqltester_unnest",
    "dialect_sqltester_shorthand_cast",
    "dialect_sqltester_pk_partial_update",
    "dialect_sqltester_delete_conditions",
    "dialect_sqltester_mv",
    "dialect_sqltester_vector_index",
    "dialect_bitmap_sql_surface",
    # --- r9 session 2: decimal tier (int→decimal W-rule casts,
    # largeint digit-string storage, allowPrecisionLoss=false scale
    # retention) + the distinct-over-window restructure and the
    # single-arg round() BIGINT rule touch these rows' shared desugars
    "dialect_sqltester_decimal",
    "distinct_multi_agg",
    "window_running_total",
    # --- r9 changed engine code: models.py REPLACE fallback now
    # prefers stamped load order in the rollup merge path; murmur
    # chained-seed mask touches every fingerprint/hash row
    "table_agg_keys_rollup",
    "table_dup_keys_batches",
    "table_rollup_autoselect",
    "table_agg_keys_hll",
    "table_primary_upsert_delete",
    "func_hash_family",
    "fingerprint_common_fragments",
    # --- rotation: stalest never-driver-checked families (ssb last
    # checked r2, funnel/retention r2, dedup/ann r5-r6, engine-side
    # FILES round-trips r3-r4)
    "ssb_q1_1",
    "ssb_q1_2",
    "ssb_q1_3",
    "ssb_q2_1",
    "ssb_q2_2",
    "ssb_q2_3",
    "ssb_q3_1",
    "ssb_q3_2",
    "ssb_q3_3",
    "ssb_q3_4",
    "ssb_q4_1",
    "ssb_q4_2",
    "ssb_q4_3",
    "funnel_counts",
    "funnel_modes",
    "retention_weekly",
    "dedup_exact_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_brute_force",
    "ann_ivf_probe",
    "ann_lsh_bucketed",
    "files_csv_roundtrip",
    "files_json_roundtrip",
    "files_orc_partitioned_export",
    "multimodal_wav_decode",
    "asof_purchase_view",
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
