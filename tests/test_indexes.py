"""Stored search indexes (operators/indexes.py) + the scale-shape
contracts of the round-6 search overhaul: two-phase top-k (no
single-reducer per-query ranking), row-local IVF assignment (no
crossJoin explode / window shuffle), and build-once/query-many index
artifacts whose query results equal the inline operators'."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.operators import similarity
from starrocks_spark.operators.indexes import (
    FulltextIndex, IvfIndex, Sq8Index,
)
from tests.test_plans import plan_str


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------- plans

def test_topk_ranks_in_two_phases_no_single_reducer(spark, emb):
    """The scored set must NOT be exchanged on q_id alone before the
    survivors filter: phase 1 partitions on (q_id, _p) — per-partition
    parallel — and only ≤ k×n_parts survivors reach the q_id-only
    window."""
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= 5)
    p = plan_str(similarity.brute_force_topk(q, c, k=5))
    # two Window operators = two ranking phases
    assert p.count("Window") >= 2
    # the first exchange feeding a window carries BOTH q_id and _p
    exchanges = [
        seg.splitlines()[0] for seg in p.split("hashpartitioning(")[1:]
    ]
    window_parts = [e for e in exchanges if "q_id" in e]
    assert any("_p" in e for e in window_parts), exchanges
    # phase order: the (q_id, _p) exchange must appear BEFORE the
    # q_id-only exchange in the plan text (deeper = earlier is not
    # guaranteed by position, so check the q_id-only exchange exists
    # too — it ranks only the survivors)
    assert any("_p" not in e for e in window_parts), exchanges


def test_ivf_assignment_is_map_only(spark, emb):
    """Centroid assignment must be pure map work: no Exchange, no
    Window, no Join in its plan (round-5 verdict: the old crossJoin +
    argmax window amplified the corpus n_centroids× through a
    shuffle)."""
    c = emb.filter(F.col("vec_id") >= 20)
    cents = similarity.centroid_rows(c, n_centroids=8)
    lists = similarity.assign_centroids(c, cents)
    p = plan_str(lists)
    assert "Exchange" not in p, p
    assert "Window" not in p, p
    assert "Join" not in p, p


def test_ivf_assignment_matches_window_argmax(spark, emb):
    """Row-local argmax == the old windowed argmax, including the
    cent_id ASC tie-break."""
    from pyspark.sql import Window
    from starrocks_spark.functions import vector as V

    c = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 120))
    cents = similarity.centroid_rows(c, n_centroids=8)
    fast = similarity.assign_centroids(c, cents) \
        .select("cent_id", "vec_id")

    cent_df = spark.createDataFrame(
        [(cid, v) for cid, v in cents], ["cent_id", "cv"]
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("_sim"), F.col("cent_id")
    )
    slow = (
        c.crossJoin(F.broadcast(cent_df))
        .withColumn("_sim", V.cosine(F.col("embedding"), F.col("cv")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cent_id", "vec_id")
    )
    assert sorted(_rows(fast)) == sorted(_rows(slow))


# ------------------------------------------------------- stored indexes

def test_sq8_index_build_query_matches_inline(spark, emb, tmp_path):
    corpus = emb.filter(F.col("vec_id") >= 10)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    inline = similarity.sq8_topk(q, corpus, k=5, dim=64)
    idx = Sq8Index.build(spark, corpus, str(tmp_path / "sq8"), dim=64)
    stored = idx.topk(q, k=5)
    assert sorted(_rows(inline)) == sorted(_rows(stored))
    # the stored codes are 2-byte ints (half the float32 scan bytes)
    codes = idx.table.read()
    assert dict(codes.dtypes)["_code"] == "array<smallint>"
    # a second open (fresh reader) serves without rebuilding
    again = Sq8Index(spark, str(tmp_path / "sq8")).topk(q, k=5)
    assert sorted(_rows(stored)) == sorted(_rows(again))


def test_ivf_index_build_query_matches_inline(spark, emb, tmp_path):
    corpus = emb.filter(F.col("vec_id") >= 20)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    inline = similarity.ivf_topk(q, corpus, k=5, n_centroids=16, nprobe=4)
    idx = IvfIndex.build(spark, corpus, str(tmp_path / "ivf"),
                         n_centroids=16)
    stored = idx.topk(q, k=5, nprobe=4)
    assert sorted(_rows(inline)) == sorted(_rows(stored))


def test_ivf_index_query_has_no_assignment_stage(spark, emb, tmp_path):
    """The stored-index query plan reads the lists table — the corpus
    assignment expression (16 centroid literals) must NOT appear."""
    corpus = emb.filter(F.col("vec_id") >= 20)
    idx = IvfIndex.build(spark, corpus, str(tmp_path / "ivf2"),
                         n_centroids=16)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    p = plan_str(idx.topk(q, k=5, nprobe=4))
    # exactly one corpus-side source: the lists parquet (not embeddings)
    assert "lists" in p
    assert "array_max" not in p  # the assignment argmax is build-only


def test_fulltext_index_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    from starrocks_spark.operators import fulltext

    docs = load_table(spark, sf_dir, "documents")
    terms = ["vector", "hash", "scan"]
    inline = fulltext.match_rank(docs, terms, mode="any", k=30)
    idx = FulltextIndex.build(spark, docs, str(tmp_path / "ft"))
    stored = idx.match(terms, mode="any", k=30)
    assert sorted(_rows(inline)) == sorted(_rows(stored))
    # bucket + term predicates push into the stored-postings scan
    p = plan_str(idx.match(terms, mode="any", k=30))
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "bucket" in pushed and "term" in pushed, pushed
    # ALL semantics too
    inline_all = fulltext.match_rank(docs, terms, mode="all", k=20)
    stored_all = idx.match(terms, mode="all", k=20)
    assert sorted(_rows(inline_all)) == sorted(_rows(stored_all))


def test_snapshot_index_artifacts_are_commit_logged(spark, emb, tmp_path):
    """Index tables ride the SnapshotTable commit log: version 0 exists
    and a rebuild publishes version 1 while 0 stays readable."""
    corpus = emb.filter(F.col("vec_id") >= 10)
    path = str(tmp_path / "sq8log")
    idx = Sq8Index.build(spark, corpus, path, dim=64)
    assert idx.table.snapshot().version == 0
    Sq8Index.build(spark, corpus, path, dim=64)
    idx2 = Sq8Index(spark, path)
    assert idx2.table.snapshot().version == 1
    assert idx2.table.read(version=0).count() == corpus.count()


def test_topk_layout_independent(spark, emb):
    """Two-phase top-k must return IDENTICAL rows for any input
    partitioning (1, 7, 32 partitions) and equal the naive
    single-window ranking — partition ids participate only in phase 1,
    never in the result."""
    from pyspark.sql import Window

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    base = emb.filter(F.col("vec_id") >= 5)
    results = []
    for parts in (1, 7, 32):
        out = similarity.brute_force_topk(q, base.repartition(parts), k=5)
        results.append(sorted(_rows(out)))
    assert results[0] == results[1] == results[2]

    # naive single-window reference
    from starrocks_spark.functions import vector as V

    scored = F.broadcast(
        q.select("q_id", F.col("embedding").alias("_qv"))
    ).crossJoin(
        base.select("vec_id", F.col("embedding").alias("_cv"))
    ).select(
        "q_id", "vec_id",
        V.cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("vec_id"))
    naive = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )
    assert results[0] == sorted(_rows(naive))


def test_sq8_codes_bounded_and_recon_in_range(spark, emb):
    corpus = emb.filter(F.col("vec_id") >= 10)
    lo, hi = similarity.sq8_train_bounds(corpus, dim=64)
    codes = similarity.sq8_encode(corpus, lo, hi)
    mm = codes.select(
        F.min(F.array_min("_code")).alias("lo"),
        F.max(F.array_max("_code")).alias("hi"),
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] <= 255
    recon = similarity.sq8_reconstruct(codes, lo, hi)
    bad = recon.select(F.explode("_rv").alias("x")).filter(
        (F.col("x") < min(lo) - 1e-9) | (F.col("x") > max(hi) + 1e-9)
    )
    assert bad.count() == 0
