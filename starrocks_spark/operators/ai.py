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
    """

    def _embed_one(text: str) -> list[float]:
        import numpy as np

        h = hashlib.md5(text.encode()).digest()
        seeds = [
            int.from_bytes(
                hashlib.md5(h + bytes([i])).digest()[:4], "big"
            ) for i in range(dim)
        ]
        v = np.array(
            [s / 2**31 - 1.0 for s in seeds], dtype="float32"
        )
        n = float((v.astype("float64") ** 2).sum()) ** 0.5
        return (v / n).astype("float32").tolist() if n else v.tolist()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64").values,
                "embedding": pdf[text_col].astype(str).map(_embed_one),
            })

    return df.select(id_col, text_col).mapInPandas(_run, AI_EMBED_SCHEMA)
