"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas iterators (mapInPandas).

The real image/audio decode libraries are not in this container, so
``decode`` is STUBBED: `fake_decode_meta` computes deterministic
metadata (byte length + md5) so the Spark-side plumbing — schema,
batch iteration, partitioning — is real and oracle-checkable, while
`decode_image_stub` raises NotImplementedError exactly where a real
decoder (PIL/torchvision/ffmpeg) would plug in.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads never pass through
Python object boxing (Arrow buffers end-to-end); repartition upstream
by size for even task durations when payloads are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType
)

DECODED_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
])


def decode_image_stub(payload: bytes) -> "object":
    """Placeholder for a real image decoder (PIL.Image.open etc.)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; wire PIL/torchvision here"
    )


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""
    id_name, bin_name = id_col, bin_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": pdf[bin_name].map(len).astype("int64"),
                "content_md5": pdf[bin_name].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            })

    return df.select(id_col, bin_col).mapInPandas(_extract, DECODED_META_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column from text (stand-in for an
    image/audio payload in the synthetic fixtures)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
