"""Plan-shape assertions — the scale contract, checked via explain().

Each test pins a physical-plan property that decides 100 TB behavior
(SURVEY.md §4.4): predicate pushdown reaching the parquet scan,
column pruning, broadcast of small dimensions, parquet aggregate
pushdown (MetaScanNode analog), whole-stage codegen in the hot path,
and shuffle-free co-located joins on bucketed tables (the reference's
colocate join, Partitions.thrift:63-66).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    p = plan_str(df)
    assert "PushedFilters" in p
    assert "l_quantity" in p.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning_reads_only_projected_columns(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    p = plan_str(df)
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_small_dimension_join_broadcasts(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    df = cust.join(nat, cust.c_nationkey == nat.n_nationkey).groupBy(
        "n_name"
    ).count()
    p = plan_str(df)
    assert "BroadcastHashJoin" in p, p


def test_parquet_aggregate_pushdown_meta_scan(spark, sf_dir):
    from starrocks_spark.sources.files import meta_scan

    orders = meta_scan(spark, f"{sf_dir}/orders.parquet")
    df = orders.agg(
        F.count("*").alias("n"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
    )
    p = plan_str(df)
    assert "PushedAggregation" in p, p
    assert "MIN(o_orderkey)" in p or "min(o_orderkey)" in p


def test_tpch_q1_whole_stage_codegen(spark, sf_dir):
    from starrocks_spark.queries.tpch import QUERIES

    df = QUERIES["tpch_q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE materializes the final plan only after execution
    p = plan_str(df, mode="formatted")
    # "* " prefix = inside a WholeStageCodegen span in formatted mode;
    # the aggregate must be Tungsten hash agg and codegen'd
    assert "* HashAggregate" in p, p
    assert "* Filter" in p or "* Project" in p


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Colocate join: both sides bucketed by the join key into the
    same bucket count → SortMergeJoin with NO Exchange on either side
    (reference colocate groups, Partitions.thrift:63-66)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # in-memory catalog: a previous session's warehouse dirs survive
    # the DROP — clear them so saveAsTable can claim the location
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/b_orders", ignore_errors=True)
    shutil.rmtree(f"{warehouse}/b_customer", ignore_errors=True)
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("b_customer")
    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    # merge hint: broadcast would win at this tiny SF and bypass the
    # bucketed path; at 100 TB both sides exceed the broadcast
    # threshold and SMJ-over-buckets is what the planner picks anyway
    df = bo.join(bc.hint("merge"), bo.o_custkey == bc.c_custkey).select(
        "o_orderkey", "c_name"
    )
    p = plan_str(df, mode="simple")
    assert "Exchange" not in p, p
    assert "Bucketed: true" in plan_str(df) or "SortMergeJoin" in p
    df.count()  # executes fine


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """AQE must be on (adaptive DOP, skew-join) — the runtime re-plan
    layer the reference gets from its adaptive pipeline engine."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_runtime_bloom_filter_enabled(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_agg_pushdown_partial_agg_below_join(spark, sf_dir):
    """rollup_join must aggregate the fact table BEFORE the dimension
    joins: in the formatted plan (operators numbered leaf-to-root) the
    fact-side HashAggregate's id is smaller than every join's."""
    from starrocks_spark.queries.agg_pushdown_queries import (
        agg_pushdown_nation_revenue,
    )

    df = agg_pushdown_nation_revenue(spark, sf_dir)
    p = plan_str(df, mode="simple")
    assert p.count("HashAggregate") >= 3  # partial+final of pre-agg, final
    assert "BroadcastHashJoin" in p
    # the scan feeding the first HashAggregate must be lineitem, and no
    # join may appear between them (pre-agg hugs the scan)
    before_first_join = p.split("BroadcastHashJoin")[-1]
    assert "lineitem" in before_first_join
    assert "HashAggregate" in before_first_join


def test_ssb_flat_scan_prunes_year_partitions(spark, sf_dir):
    """SSB q1.1 must hit the materialized flat table with a d_year
    PARTITION filter (directory pruning — the 100 TB contract: a
    one-year query reads one year) and push the row filters to
    parquet."""
    from starrocks_spark.queries import ssb

    p = plan_str(ssb.q1_1(spark, sf_dir))
    part = p.split("PartitionFilters")[1].splitlines()[0]
    assert "d_year" in part and "1996" in part
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "lo_discount" in pushed and "lo_quantity" in pushed


def test_fulltext_match_broadcasts_term_stats(spark, sf_dir):
    """The per-term df table is a literal handful of rows — it must
    broadcast, and the posting build must not shuffle more than the
    (term,doc) aggregation."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import fulltext

    docs = load_table(spark, sf_dir, "documents")
    p = plan_str(fulltext.match_rank(docs, ["vector", "hash"], k=5))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_theta_state_build_has_no_unbounded_collect(spark, sf_dir):
    """theta_state must be distinct + windowed top-K (bounded rows per
    group), never a collect_set over raw values: the plan shows a
    window sort, and the only collect_list runs AFTER the K filter."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import sketches
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    df = sketches.theta_state(orders, ["o_orderpriority"],
                              F.col("o_custkey"), k=64)
    p = plan_str(df)
    assert "Window" in p
    assert "collect_set" not in p


def test_query_profile_surfaces_runtime_metrics(spark, sf_dir):
    """profile() must report executed-plan SQLMetrics (the reference's
    query-profile analog): the scan's actual row count and a positive
    aggregate peak memory, off the AQE-final tree."""
    from starrocks_spark.plans.profile import profile_summary

    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    rows = {r["operator"]: r for r in profile_summary(df).collect()}
    scan = next(r for op, r in rows.items() if op.startswith("Scan"))
    assert scan["output_rows"] == li.count()
    agg = [r for op, r in rows.items() if op == "HashAggregate"]
    assert agg and any(r["peak_memory"] and r["peak_memory"] > 0
                       for r in agg)


def test_pack_sequences_broadcasts_bucket_offsets(spark, sf_dir):
    """The distributed prefix sum must join the per-bucket offsets via
    BROADCAST (they are metadata-scale), and the heavy window must be
    bucket-partitioned, never one partition per stream."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    df = curation.pack_sequences(docs, budget=2048)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the row-level window partitions by (stream, _bkt); only the tiny
    # per-bucket totals window partitions by stream alone — so at least
    # one windowspec must carry _bkt as a partitioning key
    specs = [
        seg.split(",")[:3] for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert any(
        "_bkt" in col for spec in specs for col in spec
    ), f"no window partitioned by _bkt in: {plan[:2000]}"


def test_rollup_read_scans_index_not_base(spark, sf_dir):
    """read_agg over a covered grouping must SCAN the rollup directory,
    not the fact table (file-level proof of index selection)."""
    from pyspark.sql import functions as F

    from starrocks_spark.catalog import load_table
    from starrocks_spark.tables.models import ManagedTable, TableModel

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.lit(1).cast("long").alias("v"),
    )
    t = ManagedTable.create(spark, TableModel.DUP_KEYS,
                            ["user_id", "event_type"])
    t.add_rollup("bt", ["event_type"], {"v": "sum"})
    t.insert(events)
    df = t.read_agg(["event_type"], {"s": ("sum", "v")})
    # inputFiles() is truncation-proof (plan strings clip long scratch
    # paths): every file read must come from the rollup index, none
    # from the base table directory
    files = df.inputFiles()
    assert files and all(".rollup_bt" in f for f in files), files
    assert t.last_index_used == "bt"
    t.drop()


def test_or_split_join_avoids_nested_loop(spark, sf_dir):
    """The OR->UNION split must plan as hash/sort-merge equi-joins;
    the naive disjunctive join is a nested loop (the thing the rewrite
    exists to kill)."""
    from pyspark.sql import functions as F

    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators.or_rewrite import or_split_join

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c1 = F.col("c_custkey") == F.col("o_custkey")
    c2 = F.col("c_custkey") == (F.col("o_orderkey") % 2000)

    naive = customer.join(orders, c1 | c2, "inner")
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive_plan  # what Spark does without the rule

    split = or_split_join(customer, orders, [c1, c2])
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert plan.count("Join") >= 2


def test_star_schema_prunes_unneeded_dim_joins(spark, sf_dir):
    """Needing no dim columns builds ZERO joins; needing columns from
    one dim builds exactly one broadcast join; integrity='none' dims
    always join (dropping them could change cardinality)."""
    from pyspark.sql import functions as F

    from starrocks_spark.catalog import load_table
    from starrocks_spark.plans.star import StarSchema

    li = load_table(spark, sf_dir, "lineitem")
    star = StarSchema(li)
    star.add_dim("part", load_table(spark, sf_dir, "part"),
                 fk="l_partkey", pk="p_partkey")
    star.add_dim("supplier", load_table(spark, sf_dir, "supplier"),
                 fk="l_suppkey", pk="s_suppkey")

    none_needed = star.join_needed(["l_quantity"])
    assert star.last_joined == []
    plan0 = none_needed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan0

    one = star.join_needed(["p_type", "l_quantity"])
    assert star.last_joined == ["part"]
    plan1 = one._jdf.queryExecution().executedPlan().toString()
    assert plan1.count("BroadcastHashJoin") == 1

    # weak integrity forces the join even when unneeded
    star2 = StarSchema(li)
    star2.add_dim("part", load_table(spark, sf_dir, "part"),
                  fk="l_partkey", pk="p_partkey", integrity="none")
    star2.join_needed(["l_quantity"])
    assert star2.last_joined == ["part"]


def test_dict_mapping_plans_as_broadcast_lookup(spark):
    """dict_mapping() desugars to a correlated scalar subquery that
    Catalyst decorrelates into a BroadcastHashJoin (LeftSingle,
    BuildRight) — the classic broadcast dim lookup, never a
    shuffled SortMergeJoin (fe DictMappingExpr; r10 verdict ask)."""
    from starrocks_spark.plans.sqltester import ScriptRunner

    r = ScriptRunner(spark, strict=True)
    r.execute("create table dictt_plan (k bigint not null, "
              "v bigint auto_increment) primary key(k) "
              "distributed by hash(k) buckets 1")
    r.execute("insert into dictt_plan values (1, default), "
              "(2, default)")
    r.execute("create table facts_plan (k bigint not null, "
              "x bigint) primary key(k) distributed by hash(k) "
              "buckets 1")
    r.execute("insert into facts_plan values (1, 10), (2, 20)")
    df = r.execute("select dict_mapping('dictt_plan', k, true) as v "
                   "from facts_plan").df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_forced_broadcast_of_sf_scaling_relations(spark, sf_dir):
    """r11 verdict #1: customer/part/supplier (and aggregates keyed by
    their keys) scale with SF — they must NOT carry a forced broadcast
    hint. With size-based broadcast disabled, the only
    BroadcastExchange nodes left are the hinted SF-invariant frames
    (nation/region/single-row scalars); everything else sort-merges —
    which is exactly the 100×-scale plan AQE falls back to."""
    from starrocks_spark.queries import tpch2

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        def n_bcast(df):
            return plan_str(df, "simple").count("BroadcastExchange")

        # q7: the two nation dims (n1/n2) are the only hinted frames
        assert n_bcast(tpch2.q7_volume_shipping(spark, sf_dir)) == 2
        # q8: nation + region hinted; cust_region/supp must shuffle
        assert n_bcast(tpch2.q8_market_share(spark, sf_dir)) == 2
        # q16: no SF-invariant frame at all -> zero broadcasts
        assert n_bcast(tpch2.q16_parts_supplier(spark, sf_dir)) == 0
        # q2: nation only; part/min_unit/supplier must shuffle
        assert n_bcast(tpch2.q2_min_cost_supplier(spark, sf_dir)) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
