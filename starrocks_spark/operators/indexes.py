"""Persisted index artifacts with separate BUILD and QUERY paths —
the Spark-native analog of the reference's storage-attached indexes
(vector: be/src/storage/index/vector/tenann_index_reader.h; inverted:
be/src/storage/index/inverted/). The reference builds these structures
once per rowset and reads them at query time; round 5's inline
operators rebuilt them per query, so the sublinear/byte-saving claims
never materialized. Here each index is a ``SnapshotTable`` (atomic
commit log, time travel, zone maps) plus a small JSON metadata file:

* ``Sq8Index`` — per-dimension codebook (metadata) + byte codes
  (stored table). Queries pay decode + scan over 2-byte codes instead
  of 4-byte floats; training never reruns.
* ``IvfIndex`` — centroid table (metadata-scale, in the JSON) +
  inverted lists stored range-partitioned by cent_id, so the log's
  per-file zone maps cluster each centroid's list into few files.
  Queries probe nprobe lists; assignment never reruns.
* ``FulltextIndex`` — (term, bucket, doc_id, tf) postings stored
  clustered by term-hash bucket + the corpus doc count (metadata).
  A MATCH reads only its terms' posting rows; the corpus is never
  re-exploded.

Builds are one-time jobs (in production: per corpus snapshot, via the
same commit-log transaction as the data); ``starrocks_spark.scratch``
memoizes them per process so repeated queries in one session hit the
stored artifact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.functions import vector as V
from starrocks_spark.operators import similarity as S
from starrocks_spark.tables.lakehouse import SnapshotTable


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "index_meta.json"), "w") as f:
        json.dump(meta, f)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "index_meta.json")) as f:
        return json.load(f)


class Sq8Index:
    """Stored SQ8 codes: build once (train bounds + encode + commit),
    query many (decode + scan). The stored code column is
    array<smallint> — half the bytes of the float32 corpus; parquet
    byte-packs the 0..255 range further."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.table = SnapshotTable(spark, os.path.join(path, "codes"))
        meta = _read_meta(path)
        self.lo: list[float] = meta["lo"]
        self.hi: list[float] = meta["hi"]
        self.corpus_id: str = meta["corpus_id"]

    @classmethod
    def build(cls, spark: SparkSession, corpus: DataFrame, path: str,
              corpus_id: str = "vec_id", vec_col: str = "embedding",
              dim: int = 64) -> "Sq8Index":
        lo, hi = S.sq8_train_bounds(corpus, vec_col, dim)
        codes = S.sq8_encode(corpus, lo, hi, corpus_id, vec_col)
        SnapshotTable(spark, os.path.join(path, "codes")).overwrite(codes)
        _write_meta(path, {"lo": lo, "hi": hi, "corpus_id": corpus_id})
        return cls(spark, path)

    def topk(self, queries: DataFrame, k: int = 5,
             query_id: str = "q_id", vec_col: str = "embedding",
             score_name: str = "approx_cos") -> DataFrame:
        recon = S.sq8_reconstruct(self.table.read(), self.lo, self.hi,
                                  self.corpus_id) \
            .withColumn("_rn_", F.sqrt(V.dot(F.col("_rv"), F.col("_rv"))))
        # norms once per row below the join (bit-identical to cosine():
        # same sqrt(dot) expression and operand order), one dot fold
        # per scored pair
        q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv")) \
            .withColumn("_qn_", F.sqrt(V.dot(F.col("_qv"), F.col("_qv"))))
        scored = F.broadcast(q).crossJoin(recon).select(
            query_id, self.corpus_id,
            (V.dot(F.col("_qv"), F.col("_rv"))
             / (F.col("_qn_") * F.col("_rn_"))).alias(score_name),
        )
        return S.topk_per_query(
            scored, query_id, self.corpus_id, score_name, k
        ).select(query_id, "rank", self.corpus_id, score_name)


class IvfIndex:
    """Stored IVF inverted lists. Centroids live in the index metadata
    (metadata-scale by construction); the lists are stored range-
    partitioned by cent_id so the commit log's zone maps give each
    file a tight cent_id range — a probe's equi-join reads its lists,
    not the corpus."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.table = SnapshotTable(spark, os.path.join(path, "lists"))
        meta = _read_meta(path)
        self.cents: list[tuple[int, list[float]]] = [
            (int(c), [float(x) for x in v]) for c, v in meta["cents"]
        ]
        self.corpus_id: str = meta["corpus_id"]

    @classmethod
    def build(cls, spark: SparkSession, corpus: DataFrame, path: str,
              corpus_id: str = "vec_id", vec_col: str = "embedding",
              n_centroids: int = 16, list_files: int = 8,
              kmeans_iters: int = 0) -> "IvfIndex":
        cents = S.centroid_rows(corpus, corpus_id, vec_col, n_centroids)
        if kmeans_iters:
            # Lloyd refinement before committing the lists — better
            # list balance/recall for the same nprobe (similarity.py
            # kmeans_refine; fixed-point-exact, so oracle-checkable)
            cents = S.kmeans_refine(corpus, cents, corpus_id, vec_col,
                                    iters=kmeans_iters)
        # vecn: the row's pre-computed norm, stored with the list entry
        # (parquet round-trips the double exactly) — probes then pay
        # one dot fold per pair instead of three.
        # persisted below repartitionByRange: the range partitioner's
        # SAMPLING pass would otherwise evaluate the assignment stage
        # (16 × 64-dim dot folds per row) a second time (r13, guide
        # §2.3); the build is eager, so the cache is released before
        # returning.
        from pyspark.storagelevel import StorageLevel

        assigned = S.assign_centroids(corpus, cents, corpus_id, vec_col) \
            .withColumnRenamed("_cv", "vec") \
            .withColumnRenamed("_vn", "vecn") \
            .persist(StorageLevel.MEMORY_AND_DISK)
        try:
            SnapshotTable(spark, os.path.join(path, "lists")).overwrite(
                assigned.repartitionByRange(list_files, "cent_id")
            )
        finally:
            assigned.unpersist()
        _write_meta(path, {"cents": cents, "corpus_id": corpus_id})
        return cls(spark, path)

    def topk(self, queries: DataFrame, k: int = 5, nprobe: int = 4,
             query_id: str = "q_id", vec_col: str = "embedding",
             metric: str = "cosine") -> DataFrame:
        """``metric``: 'cosine' (descending similarity, the default)
        or 'l2' (ascending distance — the VECTORINDEX l2_distance
        probe; internally ranked on the negated distance so the
        shared top-k machinery applies)."""
        probed = S.probe_centroids(queries, self.cents, query_id,
                                   vec_col, nprobe)
        lists = self.table.read()
        # cosine path: probe rows carry _qn, stored lists carry vecn —
        # one dot fold per pair, bit-identical to cosine()
        score = ((V.dot(F.col("_qv"), F.col("vec"))
                  / (F.col("_qn") * F.col("vecn")))
                 if metric == "cosine"
                 else -V.l2_distance(F.col("_qv"), F.col("vec")))
        scored = probed.join(lists, "cent_id").select(
            query_id, self.corpus_id, score.alias("score"),
        )
        out = S.topk_per_query(
            scored, query_id, self.corpus_id, "score", k)
        if metric == "cosine":
            return out.select(query_id, "rank", self.corpus_id,
                              F.col("score").alias("cos_sim"))
        return out.select(query_id, "rank", self.corpus_id,
                          (-F.col("score")).alias("l2_dist"))


class FulltextIndex:
    """Stored inverted posting table (term, bucket, doc_id, tf) +
    corpus doc count. Build explodes the corpus ONCE; every MATCH
    afterwards is a filter on the stored postings (term + bucket
    predicates push to the parquet scan; the bucket clustering keeps a
    query's terms in few files)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.table = SnapshotTable(spark, os.path.join(path, "postings"))
        meta = _read_meta(path)
        self.n_docs: int = meta["n_docs"]
        # single source of truth is fulltext.N_BUCKETS at build time;
        # persisted so an index built under a different bucket count is
        # still queried with ITS hash space, not the current module's.
        from starrocks_spark.operators import fulltext as _ft

        self.n_buckets: int = meta.get("n_buckets", _ft.N_BUCKETS)

    @classmethod
    def build(cls, spark: SparkSession, docs: DataFrame, path: str,
              posting_files: int = 8) -> "FulltextIndex":
        from pyspark.storagelevel import StorageLevel

        from starrocks_spark.operators.fulltext import (
            N_BUCKETS, build_posting_table,
        )

        # persisted: repartitionByRange SAMPLES its input to pick the
        # range bounds, so the corpus explode + (term, doc) aggregate
        # would otherwise be evaluated twice — once for the sampling
        # pass, once for the shuffle (r13, guide §2.3). The build is
        # eager (overwrite writes immediately), so the cache is
        # released before returning.
        postings = build_posting_table(docs) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        try:
            SnapshotTable(spark, os.path.join(path, "postings")) \
                .overwrite(postings.repartitionByRange(
                    posting_files, "bucket", "term"))
        finally:
            postings.unpersist()
        _write_meta(path, {"n_docs": docs.count(),
                           "n_buckets": N_BUCKETS})
        return cls(spark, path)

    def match(self, query_terms: list[str], mode: str = "any",
              k: int = 20) -> DataFrame:
        from starrocks_spark.operators.fulltext import rank_postings

        terms = [t.lower() for t in query_terms]
        # the query's bucket ids (same hash space the index was BUILT
        # under — self.n_buckets from index_meta.json) stay an
        # EXPRESSION: abs(hash(<literal>)) % n is foldable, so
        # Catalyst's ConstantFolding turns the IN-list into literals
        # at plan time and the predicate pushes to the postings
        # parquet scan (PushedFilters: In(bucket, ...)). The old form
        # ran a separate 1-row Spark job per MATCH just to evaluate
        # the same constants (r13, guide §1.2 fixed-overhead shape).
        bucket_of = [
            F.abs(F.hash(F.lit(t))) % self.n_buckets
            for t in sorted(set(terms))
        ]
        hits = self.table.read().filter(
            F.col("bucket").isin(*bucket_of)
            & F.col("term").isin(terms)
        )
        return rank_postings(hits, terms, self.n_docs, mode, k)
