"""Similarity search over embedding columns: brute-force cosine top-k
(the exactness baseline) and random-hyperplane-LSH-bucketed top-k (the
scale path). Reference surface: approx_cosine_similarity /
approx_l2_distance + the tenann ANN index
(be/src/storage/index/vector/tenann_index_reader.h).

Scale design: the query set is broadcast (it is small by definition);
brute force scans the corpus once per batch of queries — a map-only
pass at any corpus size. The LSH variant turns search into an
equi-join on bucket id, cutting the scanned fraction to ~1/2^planes
per query; recall is tuned by planes and by probing neighbor buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from starrocks_spark.functions import vector as V


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query over the full corpus.
    queries: (q_id, embedding); corpus: (vec_id, embedding)."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        query_id,
        corpus_id,
        V.cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cos_sim"), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "cos_sim")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's
    LSH bucket; exact cosine + rank within the bucket only."""
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qv"),
        V.lsh_bucket(F.col(vec_col), planes, dim).alias("_bucket"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("_cv"),
        V.lsh_bucket(F.col(vec_col), planes, dim).alias("_bucket"),
    )
    scored = F.broadcast(q).join(c, "_bucket").select(
        query_id,
        corpus_id,
        V.cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "cos_sim")
    )


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key
    (exact within block; at scale the block comes from LSH buckets)."""
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
    )
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            V.cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
