"""Unit tests for operators/curation.py — the shard-prep pipeline ops.

The registry parity test already checks the four curation queries
against DuckDB end-to-end; these cover the edge cases the fixtures
can't force (short docs, exact prefix-sum equivalence, split-label
totality, PII pattern boundaries).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from starrocks_spark.operators import curation


def test_pack_matches_single_window_prefix_sum(spark, sf_dir):
    """The distributed (bucketed) prefix sum must equal the naive
    single-window cumsum EXACTLY — same start/shard/offset per doc."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    packed = curation.pack_sequences(docs, budget=512, bucket_width=64)

    _, bpe = T.token_counts(F.col("text"))
    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        docs.select(
            F.col("source").alias("stream"), "doc_id",
            bpe.cast("long").alias("n_tok"),
        )
        .withColumn("start", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("shard_id", F.floor(F.col("start") / 512))
        .withColumn("offset", F.col("start") % 512)
    )
    diff = packed.exceptAll(naive)
    assert diff.count() == 0
    assert packed.count() == naive.count()
    # multiple shards must actually exist (non-vacuous)
    assert packed.agg(F.max("shard_id")).first()[0] > 0


def test_split_label_total_and_stable(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    labeled = df.select(
        "doc_id", curation.split_label(F.col("doc_id")).alias("split")
    )
    counts = dict(
        (r["split"], r["n"])
        for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert counts.keys() == {"train", "val", "test"}  # all buckets hit
    assert sum(counts.values()) == 2000  # no NULL labels
    assert counts["train"] > counts["val"] + counts["test"]
    # determinism: recompute equals itself
    again = df.select(
        "doc_id", curation.split_label(F.col("doc_id")).alias("split")
    )
    assert labeled.exceptAll(again).count() == 0


def test_gopher_short_and_repetitive_docs(spark):
    rows = [
        (1, "one"),                       # 1 word → no bigrams
        (2, "spam spam spam spam spam"),  # all bigrams identical
        (3, "a b c d e f g h"),           # all bigrams distinct
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curation.gopher_repetition(df, n=2, min_words=3).collect()
    }
    # one row per INPUT doc (round-5 advice): sub-n-word docs come back
    # with zero counts, NULL frac, and an explicit keep=false instead
    # of silently vanishing from the output
    assert set(out) == {1, 2, 3}
    assert out[1]["n_grams"] == 0 and out[1]["top_gram_count"] == 0
    assert out[1]["top_gram_frac"] is None
    assert out[1]["keep"] is False
    assert out[2]["top_gram_frac"] == 1.0 and not out[2]["keep"]
    assert out[3]["top_gram_frac"] < 0.2 and out[3]["keep"]


def test_pii_redact_counts_and_placeholders(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@site.org or x@y.io, call 555-123-4567"),
            (2, "server 192.168.0.1 clean text"),
            (3, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    red = curation.pii_redact(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", red["n_email"].alias("e"), red["n_phone"].alias("p"),
            red["n_ip"].alias("i"), red["clean"].alias("clean")
        ).collect()
    }
    assert (got[1]["e"], got[1]["p"], got[1]["i"]) == (2, 1, 0)
    assert "<EMAIL>" in got[1]["clean"] and "<PHONE>" in got[1]["clean"]
    assert "@" not in got[1]["clean"]
    assert got[2]["i"] == 1 and "<IP>" in got[2]["clean"]
    assert got[3]["clean"] == "no pii here"


def test_curation_ops_handle_empty_input(spark):
    """Every curation operator must return an EMPTY result (not crash)
    on an empty corpus — the first batch of a new pipeline is often
    empty."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    empty = spark.createDataFrame(
        [], StructType([
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ])
    )
    assert curation.pack_sequences(empty, budget=128).count() == 0
    assert curation.gopher_repetition(empty).count() == 0
    red = curation.pii_redact(F.col("text"))
    assert empty.select(red["clean"], red["n_email"]).count() == 0


def test_dedup_handles_empty_and_single_doc(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from starrocks_spark.operators import dedup

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert dedup.minhash_lsh_pairs(empty).count() == 0
    one = spark.createDataFrame([(1, "just one document here")], schema)
    assert dedup.minhash_lsh_pairs(one).count() == 0
    # CC on an empty pair set
    pairs = spark.createDataFrame(
        [], StructType([StructField("id_a", LongType()),
                        StructField("id_b", LongType())])
    )
    assert dedup.connected_components(pairs).count() == 0


def test_mix_sample_rates_and_unknown_sources(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "zzz") for i in range(2000)],
        ["doc_id", "source"],
    )
    kept = curation.mix_sample(df, {"a": 0.5})
    rows = kept.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in rows}
    assert "zzz" not in by          # unweighted source → rate 0
    assert 350 < by.get("a", 0) < 650   # ~50% of 1000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.mix_sample(df, {"a": 1.5})


def test_ngram_contamination_detects_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "totally different words with no shared grams at all"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(99, "x alpha beta gamma delta epsilon zeta eta theta y")],
        ["doc_id", "text"],
    )
    hits = {r["doc_id"]: r["n_hits"]
            for r in curation.ngram_contamination(train, eval_df, n=8)
            .collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits


def test_ngram_contamination_ignores_sub_n_gram_docs(spark):
    """Regression (review finding): docs shorter than n words must NOT
    be flagged — the MinHash shingle fallback (full text as one
    shingle) does not apply to the strict n-gram contract."""
    short = spark.createDataFrame([(1, "the end")], ["doc_id", "text"])
    hits = curation.ngram_contamination(short, short, n=8).collect()
    assert hits == []


def test_star_pk_need_answered_from_fact(spark, sf_dir):
    """Regression (review finding): needing only the dim's PRIMARY KEY
    must not force a join — the declared fk=pk equivalence answers it
    from the fact side."""
    from starrocks_spark.catalog import load_table
    from starrocks_spark.plans.star import StarSchema

    li = load_table(spark, sf_dir, "lineitem")
    star = StarSchema(li)
    star.add_dim("part", load_table(spark, sf_dir, "part"),
                 fk="l_partkey", pk="p_partkey")
    out = star.join_needed(["p_partkey"])
    assert star.last_joined == []
    assert "p_partkey" in out.columns
    sample = out.select("l_partkey", "p_partkey").limit(100).collect()
    assert all(r["l_partkey"] == r["p_partkey"] for r in sample)


def test_chunk_documents_boundaries(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # 10 words
        (2, "a b"),                                   # shorter than one chunk
        (3, ""),                                      # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curation.chunk_documents(df, chunk_tokens=4, stride=3)
    got = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 1,4,7 (last start <= 10-4+1=7) -> 3 chunks
    assert [k for k in got if k[0] == 1] == [(1, 0), (1, 1), (1, 2)]
    assert got[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert got[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
    assert got[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert all(got[(1, i)]["n_tokens"] == 4 for i in range(3))
    # doc 2: one short chunk with the remainder
    assert got[(2, 0)]["n_tokens"] == 2
    assert got[(2, 0)]["chunk_text"] == "a b"
    # doc 3: exactly one empty chunk (documents never vanish)
    assert got[(3, 0)]["n_tokens"] == 0
    # guards
    import pytest

    with pytest.raises(ValueError):
        curation.chunk_documents(df, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        curation.chunk_documents(df, chunk_tokens=0)


def test_chunk_documents_misaligned_tail_covered(spark):
    """(n - chunk) % stride != 0: the final (shorter) chunk must still
    cover the tail tokens — every token appears in some chunk."""
    rows = [(1, " ".join(f"w{i}" for i in range(11)))]  # 11 words
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curation.chunk_documents(df, chunk_tokens=4, stride=3)
    got = sorted(out.collect(), key=lambda r: r["chunk_id"])
    # starts 1,4,7 then the tail start 10 (ceil(7/3)=3 -> 1+3*3=10)
    assert [r["start_tok"] for r in got] == [1, 4, 7, 10]
    assert got[-1]["chunk_text"] == "w9 w10"
    assert got[-1]["n_tokens"] == 2
    covered = set()
    for r in got:
        covered |= set(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(11)}
    # oracle twin agrees on the misaligned case
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, '%s' AS text"
        % " ".join(f"w{i}" for i in range(11))
    )
    osql = curation.sql_chunk_documents(chunk_tokens=4, stride=3)
    orows = con.execute(osql).fetchall()
    assert sorted(r[2] for r in orows) == [1, 4, 7, 10]
