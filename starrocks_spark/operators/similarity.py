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
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's
    LSH bucket; exact cosine + rank within the candidate set only.

    ``probes`` > 0 is the recall knob (multi-probe LSH): each query
    additionally probes the ``probes`` neighbor buckets at Hamming
    distance 1 (lowest plane bits flipped first). A vector whose
    projection sits near one hyperplane lands in the neighbor bucket;
    probing recovers it for ~(1+probes)/2^planes of the corpus scanned
    instead of 1/2^planes — cost stays an equi-join, recall climbs
    toward brute force as probes → planes."""
    probe_list = [0] + [1 << p for p in range(min(probes, planes))]
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.array(*[
                V.lsh_bucket(F.col(vec_col), planes, dim)
                .bitwiseXOR(F.lit(flip)) for flip in probe_list
            ])
        ).alias("_bucket"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("_cv"),
        V.lsh_bucket(F.col(vec_col), planes, dim).alias("_bucket"),
    )
    scored = (
        F.broadcast(q).join(c, "_bucket")
        # a corpus vector can match several probe buckets of one query
        .dropDuplicates([query_id, corpus_id])
        .select(
            query_id,
            corpus_id,
            V.cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
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
    threshold: float = 0.9,
    planes: int = 8,
    dim: int = 64,
    block_cap: int = 2000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by random-
    hyperplane LSH bucket with a per-block size cap.

    Earlier design blocked on a label column — unbounded block sizes
    (at 100 TB one label is most of the corpus → quadratic self-join).
    Hyperplane buckets shrink exponentially in ``planes`` (corpus/2^p
    expected), correlate with cosine similarity (near-dup vectors sign-
    agree on most projections), and the cap bounds the worst block."""
    from starrocks_spark.operators.dedup import capped_blocks

    base = capped_blocks(
        df.select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            V.lsh_bucket(F.col(vec_col), planes, dim).alias("_blk"),
        ),
        "_blk",
        block_cap,
    )
    a = base.select(
        "_blk", F.col(id_col).alias("id_a"), F.col("_v").alias("_va")
    )
    b = base.select(
        "_blk", F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            V.cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: the coarse-quantizer scale path the
    reference covers with its tenann IVF index families.

    Build: centroids are a deterministic sample of the corpus (the
    ``n_centroids`` lowest-id vectors — a cheap, reproducible
    quantizer init; a k-means refinement would slot in here without
    changing any downstream mechanics). Every corpus vector is
    assigned to its nearest centroid: a broadcast of the tiny centroid
    table + one windowed argmax — map-side at any corpus size, and the
    resulting (cent_id → vectors) inverted lists are the IVF
    partitions.

    Search: each query ranks the SAME broadcast centroid table, keeps
    its top ``nprobe`` lists, and scans only those — an equi-join on
    cent_id touching ~nprobe/n_centroids of the corpus — then exact
    cosine top-k within. Recall knob = nprobe (monotone: nprobe =
    n_centroids degenerates to brute force)."""
    cents = F.broadcast(
        corpus.orderBy(corpus_id).limit(n_centroids).select(
            F.col(corpus_id).alias("cent_id"),
            F.col(vec_col).alias("_cent_v"),
        )
    )

    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv"))
    w_assign = Window.partitionBy(corpus_id).orderBy(
        F.desc("_sim"), F.col("cent_id")
    )
    lists = (
        c.crossJoin(cents)
        .withColumn("_sim", V.cosine(F.col("_cv"), F.col("_cent_v")))
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select("cent_id", corpus_id, "_cv")
    )

    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    w_probe = Window.partitionBy(query_id).orderBy(
        F.desc("_sim"), F.col("cent_id")
    )
    probed = (
        q.crossJoin(cents)
        .withColumn("_sim", V.cosine(F.col("_qv"), F.col("_cent_v")))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id, "_qv", "cent_id")
    )

    scored = probed.join(lists, "cent_id").select(
        query_id,
        corpus_id,
        V.cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w_rank = Window.partitionBy(query_id).orderBy(
        F.desc("cos_sim"), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "cos_sim")
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
) -> DataFrame:
    """SQ8 scalar-quantized ANN (Faiss SQ8 analog; reference: tenann
    index families): per-dimension [lo, hi] over the corpus — a
    CLOSED-FORM one-pass codebook, no iterative k-means — encodes each
    float32 component into one byte; queries score against midpoint-
    reconstructed vectors.

    At 100 TB the quantized index is 1/4 the scan bytes of the raw
    float32 corpus, training is a single metadata-scale aggregate, and
    both encode and scan stay row-local (bounds travel by broadcast).
    """
    v = F.col(vec_col)
    bounds = corpus.agg(
        F.array(*[F.min(F.get(v, i).cast("double")) for i in range(dim)])
        .alias("_lo"),
        F.array(*[F.max(F.get(v, i).cast("double")) for i in range(dim)])
        .alias("_hi"),
    )

    def width(i):
        return F.get(F.col("_hi"), i) - F.get(F.col("_lo"), i)

    def code(i):
        x = F.get(v, i).cast("double")
        w = width(i)
        return F.when(
            w > 0,
            F.least(F.lit(255.0),
                    F.floor((x - F.get(F.col("_lo"), i)) * 256.0 / w)
                    .cast("double")),
        ).otherwise(F.lit(0.0))

    enc = corpus.crossJoin(F.broadcast(bounds)).select(
        F.col(corpus_id),
        F.array(*[code(i) for i in range(dim)]).alias("_code"),
        # carry the bounds through: a second crossJoin against the
        # unpersisted bounds plan would re-run the full-corpus min/max
        # aggregate (an extra corpus scan)
        "_lo", "_hi",
    )
    # midpoint decode at scan time (the stored index is the byte codes)
    recon = enc.select(
        corpus_id,
        F.array(*[
            F.get(F.col("_lo"), i)
            + (F.get(F.col("_code"), i) + 0.5)
            * F.when(width(i) > 0, width(i)).otherwise(F.lit(0.0))
            / 256.0
            for i in range(dim)
        ]).alias("_rv"),
    )
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    scored = F.broadcast(q).crossJoin(recon).select(
        query_id, corpus_id,
        V.cosine(F.col("_qv"), F.col("_rv")).alias("approx_cos"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("approx_cos"), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "approx_cos")
    )
