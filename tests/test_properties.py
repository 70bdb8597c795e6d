"""Property-based tests (hypothesis) for the determinism-critical
algebra: the fixed-point float policy (queries/_util.py) must agree
bit-for-bit with DuckDB under ANY inputs and ANY partitioning, and the
sketch states must merge associatively under ANY sharding. These are
the invariants every oracle comparison rests on — pinned here against
adversarial inputs rather than fixture luck.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# reasonable OLAP-ish doubles: not inf/nan, bounded exponent so the
# *1e4 fixed-point step cannot overflow DECIMAL(38,0)
_doubles = st.floats(
    min_value=-1e12, max_value=1e12,
    allow_nan=False, allow_infinity=False, width=64,
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_doubles, min_size=1, max_size=50))
def test_dsum_bit_identical_spark_vs_duckdb(spark, xs):
    """dsum(xs) computed by Spark (any partitioning) and DuckDB must
    produce the IDENTICAL double."""
    from starrocks_spark.queries._util import dsum, sql_dsum
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(x,) for x in xs], ["x"]).repartition(7)
    got = df.agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    want = con.execute(f"SELECT {sql_dsum('x')} FROM t").fetchone()[0]
    con.close()
    assert got == want, (got, want, xs)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=0, max_value=10**9),
             min_size=1, max_size=300),
    st.sampled_from([2, 3, 5]),
)
def test_theta_state_merge_equals_direct_build(spark, values, shards):
    """For ANY value multiset and ANY sharding, merging per-shard
    theta states equals the directly-built global state."""
    import pyspark.sql.functions as F
    from starrocks_spark.operators import sketches

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["i", "v"]).withColumn(
        "g", F.lit(0)
    )
    direct = sketches.theta_state(df, ["g"], F.col("v"), k=32) \
        .collect()[0]["theta_state"]
    partial = sketches.theta_state(
        df.withColumn("s", F.col("i") % shards), ["g", "s"],
        F.col("v"), k=32,
    )
    merged = partial.groupBy("g").agg(
        sketches.theta_merge("theta_state", k=32).alias("st")
    ).collect()[0]["st"]
    assert merged == direct


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200),
    st.sampled_from([2, 4]),
)
def test_topk_uncapped_merge_exact(spark, items, shards):
    """With capacity ≥ distinct items, merged per-shard top-k states
    read out the exact global counts under any sharding."""
    import pyspark.sql.functions as F
    from collections import Counter
    from starrocks_spark.operators import sketches

    rows = [(i, it) for i, it in enumerate(items)]
    df = spark.createDataFrame(rows, ["i", "item"])
    states = sketches.topk_state(
        df.withColumn("s", F.col("i") % shards), ["s"],
        F.col("item"), capacity=16,
    )
    got = sketches.topk_merge_read(states, [], k=8, capacity=16).collect()
    want = Counter(items)
    for r in got:
        assert want[r["item"]] == r["cnt"]
    # ranks must follow (count desc, item asc) deterministically
    keys = [(-r["cnt"], r["item"]) for r in got]
    assert keys == sorted(keys)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),   # doc_id
            st.sampled_from(["a", "b"]),                 # stream
            st.text(alphabet="ab cd", min_size=0, max_size=40),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.sampled_from([8, 32, 128]),
)
def test_pack_sequences_invariants(spark, rows, budget):
    """For ANY corpus and budget: within a stream (ordered by id)
    offsets are a contiguous token stream — start(next) = start(prev)
    + n_tok(prev) — and shard/offset are exactly start divmod budget.
    Holds regardless of the bucket width (i.e. of how the distributed
    prefix sum splits)."""
    from starrocks_spark.operators import curation

    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = curation.pack_sequences(
        df, budget=budget, bucket_width=4
    ).orderBy("stream", "doc_id").collect()
    by_stream: dict[str, list] = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    assert sum(len(v) for v in by_stream.values()) == len(rows)
    for rs in by_stream.values():
        expect_start = 0
        for r in rs:
            assert r["start"] == expect_start
            assert r["shard_id"] == r["start"] // budget
            assert r["offset"] == r["start"] % budget
            expect_start += r["n_tok"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=100, unique=True))
def test_split_label_partition_of_unity(spark, ids):
    """Every id gets exactly one non-null label, and the label is a
    pure function of the id (stable under re-evaluation and subset)."""
    import pyspark.sql.functions as F

    from starrocks_spark.operators import curation

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", curation.split_label(F.col("doc_id")).alias("s")
        ).collect()
    }
    assert set(got) == set(ids)
    assert all(v in ("train", "val", "test") for v in got.values())
    # subset stability: half the ids relabel identically
    half = ids[: len(ids) // 2] or ids
    df2 = spark.createDataFrame([(i,) for i in half], ["doc_id"])
    got2 = {
        r["doc_id"]: r["s"]
        for r in df2.select(
            "doc_id", curation.split_label(F.col("doc_id")).alias("s")
        ).collect()
    }
    assert all(got2[i] == got[i] for i in half)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sampled_from([3, 7, 16, 64]))
def test_results_independent_of_shuffle_partitions(spark, nparts):
    """Cluster-layout independence: flagship operators must produce
    IDENTICAL results under any shuffle-partition count (the setting
    that differs most between local[32] and a 1000-executor cluster)."""
    import pyspark.sql.functions as F

    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import curation, dedup

    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
    ).replace("sf0.01", "sf0.001")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    docs = load_table(spark, sf_dir, "documents")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        got_pack = sorted(
            (r["doc_id"], r["shard_id"], r["offset"])
            for r in curation.pack_sequences(docs, budget=512).collect()
        )
        got_pairs = sorted(
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(docs).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    want_pack = sorted(
        (r["doc_id"], r["shard_id"], r["offset"])
        for r in curation.pack_sequences(docs, budget=512).collect()
    )
    want_pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    )
    assert got_pack == want_pack
    assert got_pairs == want_pairs
