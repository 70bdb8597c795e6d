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


def test_theta_state_merge_lossless_and_order_independent(spark):
    """KMV theta: merging per-shard partial states yields EXACTLY the
    global state (the lossless-merge property the estimator relies
    on), under any sharding."""
    df = spark.range(0, 4000).select(
        "id", (F.col("id") % 2).alias("g"), (F.col("id") * 7).alias("v")
    )
    direct = {
        r["g"]: r["theta_state"]
        for r in sketches.theta_state(df, ["g"], F.col("v"), k=64).collect()
    }
    for shard_mod in (3, 11):
        partial = sketches.theta_state(
            df.withColumn("s", F.col("id") % shard_mod),
            ["g", "s"], F.col("v"), k=64,
        )
        merged = {
            r["g"]: r["state"]
            for r in partial.groupBy("g")
            .agg(sketches.theta_merge("theta_state", k=64).alias("state"))
            .collect()
        }
        assert merged == direct, f"shard_mod={shard_mod}"


def test_theta_estimate_accuracy_and_exact_below_k(spark):
    """Below K the sketch is exact; above K the KMV estimate lands
    within the standard ~1/sqrt(K) error band."""
    small = spark.range(0, 40).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    st = sketches.theta_state(small, ["g"], F.col("v"), k=64)
    est = st.select(sketches.theta_estimate(F.col("theta_state"), k=64)
                    .alias("e")).collect()[0]["e"]
    assert est == 40.0

    big = spark.range(0, 20000).select(
        F.lit(0).alias("g"), F.col("id").alias("v"))
    st = sketches.theta_state(big, ["g"], F.col("v"), k=256)
    est = st.select(sketches.theta_estimate(F.col("theta_state"), k=256)
                    .alias("e")).collect()[0]["e"]
    assert abs(est - 20000) / 20000 < 0.20  # 3σ ≈ 3/sqrt(256) ≈ 0.19


def test_theta_intersect_estimate(spark):
    """|A ∩ B| estimate from two states: exact when both sets fit
    below K; within the error band when they don't."""
    a = spark.range(0, 3000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    b = spark.range(1500, 4500).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    sa = sketches.theta_state(a, ["g"], F.col("v"), k=256) \
        .withColumnRenamed("theta_state", "sa")
    sb = sketches.theta_state(b, ["g"], F.col("v"), k=256) \
        .withColumnRenamed("theta_state", "sb")
    est = sa.join(sb, "g").select(
        sketches.theta_intersect_estimate(F.col("sa"), F.col("sb"), k=256)
        .alias("e")
    ).collect()[0]["e"]
    assert abs(est - 1500) / 1500 < 0.30  # intersection noise ~2x union's


def test_topk_state_capped_merge_deterministic(spark):
    """Capped states (capacity < distinct items) merge
    deterministically: dropped tails under-count, ranks stay stable,
    and with capacity ≥ distinct the merged read-out is exact."""
    df = spark.range(0, 10000).select(
        "id",
        (F.col("id") % 4).alias("s"),
        # zipf-ish: item j appears ~10000/2^j times
        F.floor(F.log2(F.col("id") % 1000 + 1)).cast("string").alias("item"),
    )
    # exact: capacity 32 ≥ 10 distinct items
    states = sketches.topk_state(df, ["s"], F.col("item"), capacity=32)
    got = sketches.topk_merge_read(states, [], k=3, capacity=32) \
        .orderBy("rank").collect()
    exact = (
        df.groupBy("item").count()
        .orderBy(F.col("count").desc(), F.col("item"))
        .limit(3).collect()
    )
    assert [(r["item"], r["cnt"]) for r in got] == \
        [(r["item"], r["count"]) for r in exact]

    # capped: capacity 2 < distinct — top-1 must still be the true
    # heavy hitter (it dominates every shard), counts exact for it
    capped = sketches.topk_state(df, ["s"], F.col("item"), capacity=2)
    top1 = sketches.topk_merge_read(capped, [], k=1, capacity=2).collect()[0]
    assert top1["item"] == exact[0]["item"]
    assert top1["cnt"] == exact[0]["count"]
