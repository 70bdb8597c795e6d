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
    ssb,
    streaming_queries,
    table_funcs,
    table_model_queries,
    tpcds,
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
    sketch_queries,
    connector_queries,
    curation_queries,
    ssb,
    tpcds,
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
# r5 window: the 3 r4-red rows (driver-hostile oracle types, all fixed)
# plus everything whose code or oracle changed this round (embedding
# dedup planting, percentile-sketch oracle, PYTHONPATH-sensitive
# connector scan), the four NEW curation queries, and then every
# remaining never-driver-checked query — after this window the entire
# registry except a handful of rotating sentinels has a hard driver row
# in some round.
_PRIORITY = [
    # r4-red rows — must re-prove green
    "table_lakehouse_time_travel",
    "func_time_slice_modes",
    "dedup_cluster_keepers",
    # changed this round: planted embedding dups / DOUBLE quantile oracle
    "embedding_cosine_dups",
    "agg_percentile_sketch",
    # changed this round: worker PYTHONPATH export (pickled-class paths)
    "connector_duckdb_scan",
    # new this round: corpus-curation operators
    "pack_token_shards",
    "split_stratified_counts",
    "quality_gopher_repetition",
    "pii_redaction_stats",
    "decontaminate_eval_overlap",
    "corpus_mix_sample",
    # --- first-time driver slots below (the full remaining backlog) ---
    # scalar/date families
    "func_date_family",
    "time_slice_quarter_hour",
    "func_conditional_family",
    "func_json_construct",
    "func_conv_bin",
    "func_aes_crypto",
    "func_struct_family",
    # aggregate breadth
    "agg_min_max_n",
    "agg_stats_fixed",
    "agg_bool_sum_map",
    "agg_any_value_mode",
    # table functions / unnest
    "json_each_props",
    "unnest_multi_outer",
    "unnest_bitmap_users",
    # ANN / fulltext / AI surfaces
    "ann_lsh_multiprobe",
    "ann_sq8_quantized",
    "fulltext_match_any",
    "ai_query_enrich",
    # new this round: lakehouse ADD COLUMN evolution + zone-map pruning
    "table_lakehouse_schema_evolution",
    "table_lakehouse_zonemap_prune",
    # streaming variants
    "stream_dedup_distinct",
    "stream_lakehouse_sink",
    # dialect breadth
    "dialect_interval_arith",
    "dialect_alias_functions",
    "dialect_qualify_topn",
    # table models
    "table_dup_keys_batches",
    # SSB flat benchmark — 5 of the remaining 11 (q2_1/q4_3 proved in
    # r4; the rest ceded slots to this round's new operators and rotate
    # in next round — the family's plan shape is identical across
    # members)
    "ssb_q1_1",
    "ssb_q1_3",
    "ssb_q2_2",
    "ssb_q3_1",
    "ssb_q4_2",
    # new this round: real WAV/PPM decode (analytic oracles)
    "multimodal_wav_decode",
    "multimodal_ppm_decode",
    # new this round: sync rollup index + auto-selection
    "table_rollup_autoselect",
    "mv_incremental_refresh",
    # new this round: transparent MV rewrite
    "mv_transparent_rewrite",
    # new this round: OR->UNION join split + UKFK star pruning
    "join_or_union_split",
    "star_pruned_join",
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
