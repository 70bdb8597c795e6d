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
        [(1, "a b c d e f"), (2, "a b c d e f"),
         (3, "q r s t u v w x")],  # disjoint shingles → no LSH band match
        ["doc_id", "text"],
    )
    pairs = dedup.ngram_jaccard_pairs(df).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


def test_ngram_jaccard_block_cap_drops_boilerplate_block(spark):
    # 30 identical docs form one oversized LSH band per band index;
    # cap=10 drops them all (boilerplate goes to a dedicated pass, not
    # a quadratic self-join), a loose cap keeps all 435 pairs
    df = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere forever")
         for i in range(30)],
        ["doc_id", "text"],
    )
    assert dedup.ngram_jaccard_pairs(df, block_cap=10).count() == 0
    assert dedup.ngram_jaccard_pairs(df, block_cap=1000).count() == 435


def test_cosine_dup_pairs_lsh_blocked(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64),
         (3, [(-1.0) ** i * 1.0 for i in range(64)])],
        ["vec_id", "embedding"],
    )
    pairs = similarity.cosine_dup_pairs(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    # cap of 1 drops every block with >1 member → nothing to compare
    assert similarity.cosine_dup_pairs(df, block_cap=1).count() == 0


def test_multiprobe_recall_not_below_single_bucket(spark, sf_dir):
    from starrocks_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= 20)
    truth = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }

    def recall(probes):
        got = {
            (r["q_id"], r["vec_id"])
            for r in similarity.lsh_bucketed_topk(
                q, c, k=5, planes=4, probes=probes
            ).collect()
        }
        return len(got & truth) / len(truth)

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    # deterministic dataset: probing 3 extra buckets (4/16 of the
    # corpus scanned) must recover meaningfully more than the single
    # bucket (1/16 scanned)
    assert r3 >= max(0.35, r0 + 0.1)


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


def test_connected_components_chains_and_isolates(spark):
    """CC must merge transitive chains (a-b, b-c => one cluster) and
    converge past the default shallow-graph fast path."""
    from starrocks_spark.operators import dedup

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4), pair 10-11, triangle 20-21-22
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11),
         (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    cc = {r["id"]: r["cluster_id"]
          for r in dedup.connected_components(pairs).collect()}
    assert {cc[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {cc[i] for i in (10, 11)} == {10}
    assert {cc[i] for i in (20, 21, 22)} == {20}


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """IVF: recall@5 vs brute force must be monotone in nprobe and
    reach 1.0 when every list is probed (degenerates to brute force)."""
    from starrocks_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= 20)
    truth = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r["q_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                q, c, k=5, n_centroids=16, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 <= r16
    assert r16 == 1.0
    assert r4 > 0.3  # probing 1/4 of the lists recovers a real share


def test_ai_embed_deterministic_unit_norm(spark, sf_dir):
    """The fake embedder must be deterministic across runs and emit
    L2-normalized float32 vectors of the requested dim (the contract a
    real sentence-transformer swap-in must also satisfy)."""
    import math

    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import ai

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 10
    )
    a = {r["doc_id"]: r["embedding"]
         for r in ai.ai_embed(docs, dim=8).collect()}
    b = {r["doc_id"]: r["embedding"]
         for r in ai.ai_embed(docs, dim=8).collect()}
    assert a == b
    for v in a.values():
        assert len(v) == 8
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3


def test_ai_query_backend_called_per_batch_not_per_row(spark, sf_dir):
    """The backend must receive batched prompt lists (the entire point
    of the mapInPandas shape) — never one-element calls per row."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import ai

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") < 64).coalesce(1)

    def counting_backend(prompts):
        # runs on executors; assert INSIDE the task and surface via result
        assert len(prompts) > 1, "backend called row-at-a-time"
        return [f"n={len(prompts)}" for _ in prompts]

    out = ai.ai_query(docs, "{text}", backend=counting_backend,
                      batch_size=256).collect()
    sizes = {r["completion"] for r in out}
    assert all(int(s[2:]) > 1 for s in sizes)


def test_wav_builder_decoder_roundtrip_reference():
    """Decoder output must equal a straight numpy recomputation (no
    Spark) — catches endianness/offset bugs independent of the oracle."""
    import numpy as np

    from starrocks_spark.operators import multimodal as mm

    for doc_id in (0, 1, 17, 123):
        b = mm.build_wav(doc_id)
        assert b[0:4] == b"RIFF" and b[8:12] == b"WAVE"
        n = 256 + doc_id % 128
        samples = np.array(
            [((doc_id * 7919 + i * 104729) % 65536) - 32768
             for i in range(n)], dtype=np.int64)
        # decode via the same parser the operator uses
        import struct
        pos = 12
        rate = None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
            if cid == b"fmt ":
                _, ch, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", b[pos + 8:pos + 24])
            elif cid == b"data":
                got = np.frombuffer(b[pos + 8:pos + 8 + sz], dtype="<i2")
            pos += 8 + sz + (sz & 1)
        assert rate == 8000 + (doc_id % 5) * 1000
        assert (got.astype(np.int64) == samples).all()


def test_ppm_thumbnail_matches_numpy_reference(spark):
    import numpy as np

    from starrocks_spark.operators import multimodal as mm

    df = spark.createDataFrame([(9,), (40,)], ["doc_id"])
    out = {
        r["doc_id"]: r
        for r in mm.decode_ppm_meta(
            mm.with_media_payload(df, "ppm")).collect()
    }
    for doc_id in (9, 40):
        w, h = 8 + doc_id % 9, 6 + doc_id % 7
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        px = ((doc_id + 3 * x + 5 * y + 7 * c) % 256).astype(np.int64)
        gray = px.sum(axis=2) // 3
        ys = np.linspace(0, h, 3, dtype=int)
        xs = np.linspace(0, w, 3, dtype=int)
        cells = [int(gray[ys[i]:ys[i+1], xs[j]:xs[j+1]].mean())
                 for i in range(2) for j in range(2)]
        assert out[doc_id]["thumb"] == ",".join(map(str, cells))
        assert out[doc_id]["width"] == w and out[doc_id]["height"] == h


def test_wav_decoder_rejects_garbage(spark):
    from py4j.protocol import Py4JJavaError

    from starrocks_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, b"not a wav")], ["doc_id", "payload"])
    import pytest as _pytest
    with _pytest.raises(Exception):
        mm.decode_wav_meta(df).collect()


def test_sq8_recall_vs_brute_force(spark, sf_dir):
    """SQ8 midpoint reconstruction is a faithful 8-bit approximation:
    recall@5 vs exact brute force should be near-perfect on the
    fixture corpus."""
    from pyspark.sql import functions as F

    from starrocks_spark.catalog import load_table
    from starrocks_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding")
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(q, c, k=5).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in similarity.sq8_topk(q, c, k=5, dim=64).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_minhash_band_table_served_from_cache(spark):
    """r12 optimization pin: the LSH band explode (k-salt minhash +
    per-band md5) and the capped band table are persisted, so the
    cap's sizes aggregate and both self-join sides read InMemory
    relations instead of re-evaluating the signature expressions."""
    from starrocks_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 7} {i}") for i in range(40)],
        ["doc_id", "text"],
    )
    out = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # mh pairs table (verify joins), banded block table (self-join
    # sides) and the pre-cap band explode must all be cache reads
    assert plan.count("InMemoryRelation") >= 3, plan[:2000]


def test_connected_components_reliable_checkpoint_switch(
        spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT=<dir> must route CC's iterative
    state through reliable checkpoint() (survives executor loss on a
    cluster; r12 verdict What's-wrong #2): the checkpoint leaf changes
    to a ReliableCheckpointRDD written under the directory, and the
    labels are unchanged."""
    from starrocks_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    ck = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", ck)
    out = dedup.connected_components(pairs)
    cc = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert {cc[i] for i in (1, 2, 3, 4)} == {1}
    assert {cc[i] for i in (10, 11)} == {10}
    # the leaf is a reliable checkpoint: RDD files landed under ck
    import os
    found = any(f.startswith("rdd-") for _, ds, _ in os.walk(ck)
                for f in ds)
    assert found, "no ReliableCheckpointRDD directory written"
    assert "ReliableCheckpoint" in out.rdd.toDebugString().decode()
