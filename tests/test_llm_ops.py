"""Unit tests for the LLM-pipeline operators on tiny inline data."""

from __future__ import annotations

from pyspark.sql import functions as F

from starrocks_spark.functions import text as T
from starrocks_spark.functions import vector as V
from starrocks_spark.operators import dedup, multimodal, similarity


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "something else")],
        ["doc_id", "text"],
    )
    rows = dedup.exact_duplicates(df).collect()
    assert len(rows) == 1
    assert rows[0]["cluster_size"] == 2
    assert rows[0]["keeper_id"] == 1


def test_minhash_finds_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different words entirely here")],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_lsh_pairs(df, jaccard_threshold=0.3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert 0.3 <= pairs[0]["jaccard"] < 1.0


def test_simhash_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "unrelated totally different text")],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_pairs(df).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f", "en"), (2, "a b c d e f", "en"),
         (3, "a b c d e f", "fr")],  # other lang → other block
        ["doc_id", "text", "lang"],
    )
    pairs = dedup.ngram_jaccard_pairs(df).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


def test_brute_force_topk_exact(spark):
    q = spark.createDataFrame([(0, [1.0, 0.0])], ["q_id", "embedding"])
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    rows = similarity.brute_force_topk(q, c, k=2).collect()
    assert [(r["rank"], r["vec_id"]) for r in rows] == [(1, 1), (2, 3)]
    assert abs(rows[0]["cos_sim"] - 1.0) < 1e-12


def test_lsh_bucket_deterministic(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)])], ["vec_id", "embedding"]
    )
    b1 = df.select(V.lsh_bucket(F.col("embedding")).alias("b")).collect()[0]["b"]
    b2 = df.select(V.lsh_bucket(F.col("embedding")).alias("b")).collect()[0]["b"]
    assert b1 == b2
    assert 0 <= b1 < 256


def test_multimodal_meta(spark):
    import hashlib

    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    out = multimodal.fake_decode_meta(multimodal.with_binary_payload(df)).collect()
    assert out[0]["n_bytes"] == 5
    assert out[0]["content_md5"] == hashlib.md5(b"hello").hexdigest()


def test_quality_features_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "!!!")], ["doc_id", "text"])
    qf = T.quality_features(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in qf.items()]
    ).collect()}
    assert rows[1]["n_words"] == 0 and rows[1]["punct_ratio"] == 0.0
    assert rows[2]["n_words"] == 0 and rows[2]["punct_ratio"] == 1.0
