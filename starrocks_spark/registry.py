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
# r6 window: everything whose engine code or oracle changed this round
# (the search-index overhaul: two-phase top-k, stored SQ8/IVF/fulltext
# indexes, row-local IVF assignment; the portable ai_embed embedder;
# curation contract fixes; scratch-root relocation of managed tables),
# the two formerly rows-only queries now carrying hard oracles
# (ai_embed_similarity, func_geo_haversine), the NEW tpcds/mv-join/
# information_schema families, and the last never-driver-checked
# stragglers (6 SSB siblings + dedup_boilerplate_report). After this
# window every registered query has had a driver row in some round.
_PRIORITY = [
    # search operators — two-phase top-k + stored index artifacts
    "ann_brute_force",
    "ann_lsh_multiprobe",
    "ann_ivf_probe",
    "ann_sq8_quantized",
    "fulltext_match_any",
    "fulltext_match_all",
    # formerly rows-only, now hard-oracled
    "ai_embed_similarity",
    "func_geo_haversine",
    # curation changes: fixed eval-set demo, gopher absent-row fix,
    # split-label escaping; siblings in the same touched module
    "decontaminate_eval_overlap",
    "quality_gopher_repetition",
    # NEW: stream-static dimension enrichment
    "stream_static_enrich",
    # dedup family now reads the stored SignatureIndex (code changed)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_keepers",
    # never-driver-checked stragglers — closes the ledger
    "dedup_boilerplate_report",
    "ssb_q1_2",
    "ssb_q2_3",
    "ssb_q3_2",
    "ssb_q3_3",
    "ssb_q3_4",
    "ssb_q4_1",
    # NEW: TPC-DS-shaped family
    "tpcds_q5_channel_rollup",
    "tpcds_q11_yoy_growth",
    "tpcds_q21_before_after",
    "tpcds_q34_basket_counts",
    "tpcds_q36_margin_rank",
    "tpcds_q38_channel_intersect",
    "tpcds_q45_or_subquery",
    "tpcds_q51_cumulative_compare",
    "tpcds_q59_weekly_yoy",
    "tpcds_q67_rollup_topn",
    "tpcds_q88_time_bands",
    "tpcds_q93_returns_adjusted",
    "tpcds_q97_channel_overlap",
    "tpcds_q10_exists_profile",
    "tpcds_q14_cross_channel",
    "tpcds_q33_union_by_brand",
    "tpcds_q49_return_ranks",
    "tpcds_q54_revenue_buckets",
    "tpcds_q64_snowflake",
    "tpcds_q78_web_only_ratio",
    # NEW: multi-table MV rewrite (+ MV siblings whose catalog changed)
    "mv_join_rewrite",
    # NEW: colocate bucketed join (first driver row for the family)
    "join_colocate_bucketed",
    # NEW: lakehouse copy-on-write MERGE with zone-map file pruning
    "table_lakehouse_merge",
    # NEW: information_schema breadth
    "schema_scan_tables",
    "schema_scan_partitions",
    "schema_scan_column_stats",
    "schema_scan_history",
    # refined-quantizer IVF (new this round)
    "ann_ivf_kmeans",
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
