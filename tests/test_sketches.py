"""Sketch-state column tests (operators/sketches.py): merge
associativity / order-independence, exactness of the percentile
histogram algebra, and the AGG_KEYS sketch-column lifecycle."""

from __future__ import annotations

from pyspark.sql import functions as F

from starrocks_spark.operators import sketches
from starrocks_spark.tables.models import ManagedTable, TableModel


def test_percentile_state_merge_associative_exact(spark):
    """Partial histogram states built under different shardings merge
    to the IDENTICAL state (exact counts — not just close estimates)."""
    df = spark.range(0, 5000).select(
        "id",
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    direct = df.groupBy("g").agg(
        sketches.pct_state(F.col("x"), 10.0, 16).alias("state")
    )
    for shard_mod in (4, 7):
        sharded = (
            df.groupBy("g", (F.col("id") % shard_mod).alias("s"))
            .agg(sketches.pct_state(F.col("x"), 10.0, 16).alias("state"))
            .groupBy("g")
            .agg(sketches.pct_merge("state", 16).alias("state"))
        )
        a = {r["g"]: r["state"] for r in direct.collect()}
        b = {r["g"]: r["state"] for r in sharded.collect()}
        assert a == b


def test_percentile_quantile_matches_exact_rank(spark):
    """Quantile read-out = lower bound of the bucket holding the
    ceil(p*n)-th value — cross-check against a hand computation."""
    vals = [float(v) for v in [1, 2, 3, 50, 51, 52, 53, 99, 100, 700]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    state = df.agg(sketches.pct_state(F.col("x"), 10.0, 64).alias("s"))
    row = state.select(
        sketches.pct_quantile(F.col("s"), 0.5, 10.0).alias("q50"),
        sketches.pct_quantile(F.col("s"), 0.9, 10.0).alias("q90"),
        sketches.pct_quantile(F.col("s"), 1.0, 10.0).alias("q100"),
    ).collect()[0]
    # rank ceil(0.5*10)=5 -> value 51 -> bucket 5 -> 50.0
    assert row["q50"] == 50.0
    # rank 9 -> value 100 -> bucket 10 -> 100.0
    assert row["q90"] == 100.0
    # rank 10 -> value 700 -> clamped to bucket 63 -> 630.0 (overflow bucket)
    assert row["q100"] == 630.0


def test_hll_union_order_independent(spark):
    """Unioning the SAME partial sketches in any order gives the same
    estimate (associative/commutative state algebra)."""
    df = spark.range(0, 8000).select(
        (F.col("id") % 5).alias("s"), F.col("id").alias("v")
    )
    parts = df.groupBy("s").agg(sketches.hll_state("v").alias("sk"))
    est_fwd = parts.orderBy(F.asc("s")).coalesce(1).agg(
        sketches.hll_estimate(sketches.hll_merge("sk")).alias("e")
    ).collect()[0]["e"]
    est_rev = parts.orderBy(F.desc("s")).coalesce(1).agg(
        sketches.hll_estimate(sketches.hll_merge("sk")).alias("e")
    ).collect()[0]["e"]
    assert est_fwd == est_rev


def test_hll_small_cardinality_exact(spark):
    """At small per-key cardinality the estimate equals the exact
    distinct count — the regime the oracle-checked query runs in."""
    df = spark.range(0, 3200).select(
        (F.col("id") % 40).alias("k"), (F.col("id") % 640).alias("v")
    )
    got = df.groupBy("k").agg(
        sketches.hll_estimate(sketches.hll_state("v")).alias("e")
    )
    exact = df.groupBy("k").agg(F.count_distinct("v").alias("e"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_agg_keys_hll_multi_rowset_exact(spark):
    """AGG_KEYS hll_union column: 3 rowsets with overlapping keys,
    compaction, read — estimate must equal the exact distinct count
    (small cardinality regime), proving ingest-state + rowset-merge."""
    df = spark.range(0, 6000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 210).alias("uv"),
        F.lit(1).cast("long").alias("n"),
    )
    t = ManagedTable.create(
        spark, TableModel.AGG_KEYS, ["k"],
        agg_spec={"uv": "hll_union", "n": "sum"},
    )
    for i in range(3):
        t.insert(df.filter(F.col("event_id") % 3 == i))
    t.compact()
    got = t.read().select(
        "k", sketches.hll_estimate("uv").alias("users"), "n"
    )
    exact = df.groupBy("k").agg(
        F.count_distinct("uv").alias("users"), F.sum("n").alias("n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exact.collect())
    )
