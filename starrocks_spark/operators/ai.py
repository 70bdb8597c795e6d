"""AI function surface: ``ai_query`` (prompt → completion) and
``ai_embed`` (text → embedding) as batched table operators.

Reference: be/src/exprs/ai_functions.cpp + FunctionSet ``ai_query`` —
a scalar function that ships each row's prompt to a configured model
endpoint. The Spark-native shape is NOT a per-row scalar call (one
HTTP round-trip per row would be the classic row-at-a-time
anti-pattern): it is a ``mapInPandas`` operator that receives Arrow
batches, issues ONE backend call per micro-batch of prompts, and
streams results back — constant memory, batched I/O, and the
concurrency knob is simply the partition count.

No model endpoint exists in this container, so the default backend is
an honest DETERMINISTIC FAKE (template completion / md5-derived unit
vector) keeping every piece of real plumbing — batch iteration,
schema, backpressure via batch size — testable and oracle-checkable.
``RemoteBackend`` raises NotImplementedError exactly where an HTTP
client (or a local model runtime) would plug in.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StringType, StructField, StructType,
)

Backend = Callable[[list[str]], list[str]]


def fake_completion_backend(prompts: list[str]) -> list[str]:
    """Deterministic stand-in completion: echoes the first 5
    whitespace tokens — stable across engines, so oracles can
    reproduce it in SQL."""
    return [" ".join(p.split()[:5]) for p in prompts]


class RemoteBackend:
    """Plug-in point for a real endpoint (HTTP client, local runtime).

    Kept as a class so credentials/session reuse live per-executor,
    constructed once per task, not per batch."""

    def __init__(self, endpoint: str):
        self.endpoint = endpoint

    def __call__(self, prompts: list[str]) -> list[str]:
        raise NotImplementedError(
            "no model endpoint exists in this environment; implement "
            "the batched call here (requests.post(self.endpoint, ...))"
        )


AI_QUERY_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("completion", StringType()),
])


def ai_query(
    df: DataFrame,
    prompt_template: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    backend: Backend = fake_completion_backend,
    batch_size: int = 256,
) -> DataFrame:
    """ai_query over a corpus: fill ``{text}`` into the template per
    row, call ``backend`` once per ≤``batch_size`` prompts."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                prompts = [
                    prompt_template.replace("{text}", t)
                    for t in chunk[text_col].astype(str)
                ]
                yield pd.DataFrame({
                    "doc_id": chunk[id_col].astype("int64").values,
                    "completion": backend(prompts),
                })

    return df.select(id_col, text_col).mapInPandas(_run, AI_QUERY_SCHEMA)


AI_EMBED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def ai_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 8,
) -> DataFrame:
    """Deterministic fake embedder: md5-seeded pseudo-vector in
    [-1, 1]^dim, L2-normalized in float32. Real plumbing (Arrow
    batches, array<float> output schema) with a swap-in point for a
    sentence-transformer; feeds directly into operators/similarity.py.

    Every arithmetic step is pinned to an engine-portable form (hex-
    string md5 seeding, float32 rounding via explicit casts, a
    SEQUENTIAL left-fold norm): DuckDB reproduces the embeddings
    bit-for-bit (REAL arithmetic is IEEE float32 there too), which is
    what makes ``ai_embed_similarity`` a hard value-level oracle row
    instead of a rows-only check."""

    def _embed_one(text: str) -> list[float]:
        import numpy as np

        hh = hashlib.md5(text.encode()).hexdigest()
        seeds = [
            int(hashlib.md5(f"{hh}:{i}".encode()).hexdigest()[:8], 16)
            for i in range(dim)
        ]
        # float32 value of (seed / 2^31 − 1), kept as exact doubles
        vals = [float(np.float32(s / 2**31 - 1.0)) for s in seeds]
        n = math.sqrt(sum(x * x for x in vals))  # sequential fold
        if n == 0.0:
            return vals
        nf = np.float32(n)
        return [float(np.float32(x) / nf) for x in vals]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64").values,
                "embedding": pdf[text_col].astype(str).map(_embed_one),
            })

    return df.select(id_col, text_col).mapInPandas(_run, AI_EMBED_SCHEMA)


def sql_ai_embed(src_sql: str, id_col: str = "doc_id",
                 text_col: str = "text", dim: int = 8) -> str:
    """DuckDB twin of ``ai_embed``'s deterministic fake embedder —
    bit-identical float32 vectors (verified: REAL arithmetic in DuckDB
    is IEEE float32, md5 hex chains match Python's hashlib on UTF-8).
    Yields ``SELECT {id_col}, embedding`` over ``src_sql``."""
    vals = (
        f"[CAST((('0x' || substr(md5(md5({text_col}) || ':' || "
        f"CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT) / 2147483648.0 - 1.0 "
        f"AS REAL) FOR i IN generate_series(1, {dim})]"
    )
    return f"""
SELECT {id_col}, list_transform(vv, x -> x / CAST(n AS REAL)) AS embedding
FROM (
  SELECT {id_col}, vv,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(vv, x -> x::DOUBLE * x::DOUBLE)),
              (a, b) -> a + b)) AS n
  FROM (SELECT {id_col}, {vals} AS vv FROM ({src_sql}))
)"""
