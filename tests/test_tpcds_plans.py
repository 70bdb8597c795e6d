"""Plan-shape assertions for the TPC-DS-shaped family — the scale
contracts behind queries/tpcds.py (SURVEY §6: the reference's largest
published benchmark is TPC-DS 1 TB)."""

from __future__ import annotations

from starrocks_spark.queries import tpcds
from tests.test_plans import plan_str


def test_q64_snowflake_broadcasts_every_dim(spark, sf_dir):
    """The deep snowflake joins customer/nation/region/part/supplier —
    ALL five must broadcast; the only shuffle join is fact⋈orders."""
    p = plan_str(tpcds.tpcds_q64_snowflake(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 5, p.count("BroadcastHashJoin")
    # the one fact-fact join (lineitem⋈orders) may shuffle or, at this
    # fixture scale, broadcast under AQE — but there must be no
    # nested-loop fallback anywhere in the tree
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q49_rank_filter_compiles_to_window_group_limit(spark, sf_dir):
    """rank() <= 10 within each channel branch must compile to
    WindowGroupLimit (partial before the exchange): the global-order
    window then shuffles only ~10 survivors per input partition, never
    the full per-item aggregate — the property that keeps a global
    top-N safe when |items| grows 1000×."""
    p = plan_str(tpcds.tpcds_q49_return_ranks(spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "Partial" in p.split("WindowGroupLimit")[1].splitlines()[0] \
        or p.count("WindowGroupLimit") >= 2


def test_q5_rollup_is_one_scan_with_expand(spark, sf_dir):
    """ROLLUP compiles to Expand over a single fact scan — not one
    scan per grouping set."""
    p = plan_str(tpcds.tpcds_q5_channel_rollup(spark, sf_dir))
    assert "Expand" in p
    # one "Location:" detail block per scan — exactly one source
    assert p.count("Location: InMemoryFileIndex") == 1, p


def test_q38_intersect_aggregates_before_join(spark, sf_dir):
    """Channel INTERSECT runs over aggregate-shrunk distinct key sets:
    HashAggregate pairs appear below the intersect joins, so the
    shuffles carry distinct customers, not fact rows."""
    p = plan_str(tpcds.tpcds_q38_channel_intersect(spark, sf_dir))
    assert "HashAggregate" in p
    # intersect plans as left-semi joins over the distinct sets
    assert "LeftSemi" in p


def test_q1_correlated_subquery_decorrelates_to_agg_join(spark, sf_dir):
    """The q1/q30/q81 correlated scalar subquery ('> 1.2× the group
    average') must decorrelate into a per-group HashAggregate joined
    back to the outer rows — NOT a per-row subquery execution. A
    per-row plan re-runs the inner aggregate once per outer row: the
    difference between one shuffle and |outer| jobs at scale."""
    df = tpcds.tpcds_q1_store_returns(spark, sf_dir)
    p = plan_str(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in phys  # no scalar-subquery nodes survive
    # the decorrelated inner aggregate: a per-store avg...
    assert "HashAggregate" in p
    # ...joined to the outer ctr rows on the correlation key
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p \
        or "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q4_six_way_chain_reuses_yearly_cte_exchange(spark, sf_dir):
    """The 6-way self-join of the yearly CTE must not nested-loop and
    must keep every branch as a hash join on the customer key."""
    p = plan_str(tpcds.tpcds_q4_growth_chain(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# second batch (queries/tpcds2.py)

def test_q32_excess_discount_decorrelates(spark, sf_dir):
    """q32/q92's '> 1.3× the per-item average' correlated scalar
    subquery must decorrelate to a per-item aggregate + equi-join on
    l_partkey — one shuffle, not |lineitem| subquery executions."""
    from starrocks_spark.queries import tpcds2

    df = tpcds2.tpcds_q32_excess_discount(spark, sf_dir)
    p = plan_str(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in phys
    assert "HashAggregate" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q16_exists_gates_become_semi_and_anti_joins(spark, sf_dir):
    """q16/q94's EXISTS other-supplier / NOT EXISTS returned-line must
    plan as one left-semi and one left-anti join on l_orderkey."""
    from starrocks_spark.queries import tpcds2

    p = plan_str(tpcds2.tpcds_q16_multi_supplier_clean(spark, sf_dir))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q44_topn_is_distributed_take_ordered(spark, sf_dir):
    """q44's best/worst rankings must come from a distributed TopN
    (TakeOrderedAndProject) over the per-part aggregate, never a
    single-reducer window over the full frame."""
    from starrocks_spark.queries import tpcds2

    p = plan_str(tpcds2.tpcds_q44_best_worst(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_q47_windows_share_one_grouped_frame(spark, sf_dir):
    """q47's avg + lag + lead all run over the (brand, yr) partitions
    of ONE grouped frame: a single fact scan feeds one aggregate, and
    no window re-shuffles the raw fact."""
    from starrocks_spark.queries import tpcds2

    p = plan_str(tpcds2.tpcds_q47_monthly_deviation(spark, sf_dir))
    assert p.count("Location: InMemoryFileIndex") == 2  # fact + part
    assert "Window" in p


# --- batch 3 (queries/tpcds3.py) ------------------------------------------

def test_q24_threshold_is_broadcast_scalar(spark, sf_dir):
    """The 5%-of-global-average gate must arrive as a 1-row BROADCAST
    (BroadcastNestedLoopJoin over the scalar aggregate), never as a
    single-partition window over the whole grouped frame — the
    difference between an O(1) exchange and collapsing every pair onto
    one reducer at scale."""
    from starrocks_spark.queries import tpcds3
    p = plan_str(tpcds3.tpcds_q24_scalar_threshold(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    # no global (empty-partition) window anywhere
    assert "Window" not in p.replace("WindowGroupLimit", ""), p


def test_q95_dual_exists_is_two_semi_joins(spark, sf_dir):
    """Both EXISTS gates (multi-warehouse order, returned line) must
    plan as semi joins against aggregate-shrunk order-key sets — not
    per-row subqueries."""
    from starrocks_spark.queries import tpcds3
    p = plan_str(tpcds3.tpcds_q95_dual_exists(spark, sf_dir))
    assert p.count("LeftSemi") >= 2, p
    assert "CartesianProduct" not in p


def test_q6_category_average_never_rescans_fact(spark, sf_dir):
    """The per-category average decorrelates onto the ITEM DIMENSION:
    exactly one lineitem scan in the whole plan (the q6 correlated
    subquery runs over part, which is broadcast-joined back)."""
    from starrocks_spark.queries import tpcds3
    df = tpcds3.tpcds_q6_above_avg_price_states(spark, sf_dir)
    p = plan_str(df)
    assert p.lower().count("lineitem") <= 2, p  # scan + its location
    assert "BroadcastHashJoin" in p


def test_q70_rollup_rank_single_expand(spark, sf_dir):
    """The ranked rollup report stays one Expand over one fact scan
    feeding the rank window — the grouping-level rank never forks the
    aggregation into per-level scans."""
    from starrocks_spark.queries import tpcds3
    p = plan_str(tpcds3.tpcds_q70_topstate_rollup(spark, sf_dir))
    assert "Expand" in p
    assert "Window" in p


def test_q12_share_window_runs_over_aggregate(spark, sf_dir):
    """q12's category-share window must evaluate over the grouped
    (p_type, p_brand) frame — one Window above one HashAggregate pair,
    never a window over fact rows (the difference between a
    thousands-row exchange and re-shuffling the fact)."""
    from starrocks_spark.queries import tpcds4
    df = tpcds4.tpcds_q12_category_share(spark, sf_dir)
    p = plan_str(df)
    assert "Window" in p
    # one fact scan feeds the aggregate that feeds the window — the
    # share computation must not fork a second scan of lineitem
    assert p.count("Location: InMemoryFileIndex") <= 2, p
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_q56_union_reaggregates_partial_sums(spark, sf_dir):
    """q56's three-channel UNION must union three already-aggregated
    brand frames (Union over HashAggregates), then re-aggregate —
    never union raw fact rows."""
    from starrocks_spark.queries import tpcds4
    p = plan_str(tpcds4.tpcds_q56_channel_union_totals(spark, sf_dir))
    assert "Union" in p
    # aggregates below the union: at least 3 branch aggs + final agg
    assert p.count("HashAggregate") >= 4, p.count("HashAggregate")


def test_q96_scalar_count_is_semi_join_gates(spark, sf_dir):
    """q96's scalar count must gate through hash semi joins over the
    single fact scan — no nested loop, no cartesian, one scan."""
    from starrocks_spark.queries import tpcds4
    p = plan_str(tpcds4.tpcds_q96_band_count(spark, sf_dir))
    assert "LeftSemi" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q69_profile_gates_are_semi_and_anti_joins(spark, sf_dir):
    """q69's store-yes/web-no/catalog-no profile must plan as one semi
    plus two anti joins over DISTINCT-shrunk customer sets — never
    per-row subqueries or nested loops."""
    from starrocks_spark.queries import tpcds5
    p = plan_str(tpcds5.tpcds_q69_store_only_customers(spark, sf_dir))
    assert "LeftSemi" in p
    assert p.count("LeftAnti") >= 2, p.count("LeftAnti")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q77_outer_merge_joins_two_aggregates(spark, sf_dir):
    """q77's sales-vs-returns merge must FULL OUTER join two
    already-aggregated (channel, nation) frames — aggregates appear
    below the outer join, so the join carries dozens of rows, not the
    fact."""
    from starrocks_spark.queries import tpcds5
    p = plan_str(tpcds5.tpcds_q77_sales_returns_outer(spark, sf_dir))
    assert "FullOuter" in p
    assert "HashAggregate" in p
    assert "Expand" in p  # the trailing ROLLUP


def test_q92_per_part_average_decorrelates(spark, sf_dir):
    """q92's 1.3×-average gate must join ONE per-part aggregate back
    to the window's lines — no scalar subquery per row, no second
    uncorrelated scan fan-out."""
    from starrocks_spark.queries import tpcds5
    df = tpcds5.tpcds_q92_excess_discount(spark, sf_dir)
    p = plan_str(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in phys
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_q14_scalar_threshold_reuses_cached_per_item(spark, sf_dir):
    """per_item is read twice (once for the scalar average, once for
    the threshold filter); the cache() pins the reuse so the second
    read is an InMemoryTableScan, never a recomputation of the
    intersect+join+aggregate chain (r7 verdict #3)."""
    p = plan_str(tpcds.tpcds_q14_cross_channel(spark, sf_dir))
    assert p.count("InMemoryTableScan") >= 2, p
