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


# ---------------------------------------------------------------------------
# REAL decoders (pure numpy/struct — no external media libraries)
#
# JPEG/PNG/MP3 need libraries this container lacks (decode_image_stub
# stays the documented plug-in point), but uncompressed containers are
# fully decodable with numpy: RIFF/WAVE PCM and binary PPM (P6). These
# run the honest end-to-end path — real bytes in a binary column, a
# real header parser, numpy array math — inside Arrow-batched
# mapInPandas, which is exactly how a PIL/ffmpeg decoder would run.

import struct

import numpy as np
from pyspark.sql.types import BinaryType, DoubleType, IntegerType

WAV_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("sum_sq", LongType()),
    StructField("rms", DoubleType()),
])


def build_wav(doc_id: int) -> bytes:
    """Deterministic 16-bit mono PCM WAV derived from doc_id (the
    fixture generator: both engines know this closed form)."""
    n = 256 + doc_id % 128
    rate = 8000 + (doc_id % 5) * 1000
    # vectorized sample synthesis (guide §4.2): the old per-sample
    # Python list comprehension was ~4M interpreter ops per 10k docs;
    # identical values (all terms positive, % matches Python's)
    samples = (
        (doc_id * 7919 + np.arange(n, dtype=np.int64) * 104729) % 65536
        - 32768
    ).astype(np.int16)
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def _decode_wav_row(b: bytes) -> tuple:
    """Parse one RIFF/WAVE payload: chunk walk + numpy sample math."""
    assert b[0:4] == b"RIFF" and b[8:12] == b"WAVE", "not a WAV"
    # walk chunks (fmt may be followed by others before data)
    pos, rate, channels, bits = 12, 0, 0, 0
    samples = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)
    sq = np.square(samples.astype(np.int64))
    ssq = int(sq.sum())
    n = int(samples.size)
    return rate, channels, bits, n, ssq, float(np.sqrt(ssq / n))


def _wav_meta_frame(ids, metas) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": ids,
        "sample_rate": [m[0] for m in metas],
        "n_channels": [m[1] for m in metas],
        "bit_depth": [m[2] for m in metas],
        "n_samples": [m[3] for m in metas],
        "sum_sq": [m[4] for m in metas],
        "rms": [m[5] for m in metas],
    })


def decode_wav_meta(df: DataFrame, id_col: str = "doc_id",
                    bin_col: str = "payload") -> DataFrame:
    """Parse RIFF/WAVE headers and PCM samples with numpy; emit audio
    metadata + exact energy (sum of squares) + RMS."""
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_wav_row(bytes(b)) for b in pdf[bin_col]]
            yield _wav_meta_frame(pdf[id_col].astype("int64"), metas)

    return df.select(id_col, bin_col).mapInPandas(_extract, WAV_META_SCHEMA)


PPM_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sum_r", LongType()),
    StructField("sum_g", LongType()),
    StructField("sum_b", LongType()),
    StructField("thumb", StringType()),
])


def build_ppm(doc_id: int) -> bytes:
    """Deterministic binary PPM (P6): pixel(x,y,c) = (doc_id + 3x + 5y
    + 7c) mod 256."""
    w, h = 8 + doc_id % 9, 6 + doc_id % 7
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    px = ((doc_id + 3 * x + 5 * y + 7 * c) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm_meta(df: DataFrame, id_col: str = "doc_id",
                    bin_col: str = "payload",
                    thumb: int = 2) -> DataFrame:
    """Parse P6 headers, reshape pixels with numpy, emit per-channel
    exact sums + a ``thumb``×``thumb`` block-mean grayscale thumbnail
    (integer math, comma-joined — a real downsample/feature-extract
    pass)."""
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_ppm_row(bytes(b), thumb) for b in pdf[bin_col]]
            yield _ppm_meta_frame(pdf[id_col].astype("int64"), metas)

    return df.select(id_col, bin_col).mapInPandas(_extract, PPM_META_SCHEMA)


def _decode_ppm_row(b: bytes, thumb: int = 2) -> tuple:
    """Parse one P6 payload: header, pixel reshape, channel sums,
    block-mean thumbnail."""
    assert b[:2] == b"P6", "not a P6 PPM"
    parts = b.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    px = np.frombuffer(parts[3], dtype=np.uint8)[: w * h * 3] \
        .reshape(h, w, 3).astype(np.int64)
    sums = px.sum(axis=(0, 1))
    gray = px.sum(axis=2) // 3
    ys = np.linspace(0, h, thumb + 1, dtype=int)
    xs = np.linspace(0, w, thumb + 1, dtype=int)
    cells = [
        int(gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean())
        for i in range(thumb) for j in range(thumb)
    ]
    return w, h, int(sums[0]), int(sums[1]), int(sums[2]), \
        ",".join(map(str, cells))


def _ppm_meta_frame(ids, metas) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": ids,
        "width": [m[0] for m in metas],
        "height": [m[1] for m in metas],
        "sum_r": [m[2] for m in metas],
        "sum_g": [m[3] for m in metas],
        "sum_b": [m[4] for m in metas],
        "thumb": [m[5] for m in metas],
    })


def media_meta(df: DataFrame, kind: str,
               id_col: str = "doc_id", thumb: int = 2) -> DataFrame:
    """Build + decode in ONE mapInPandas pass (guide §4: the payload
    bytes are born and consumed inside the same Python task, so the
    real RIFF/PPM container bytes never cross the JVM↔Python boundary
    at all — the old two-operator composition shipped every payload
    Python→JVM→Python between build and decode). The decode still
    parses the same real bytes via the same row decoders, so the
    output is identical to with_media_payload → decode_*_meta."""
    builder = {"wav": build_wav, "ppm": build_ppm}[kind]
    decode, frame, schema = {
        "wav": (_decode_wav_row, _wav_meta_frame, WAV_META_SCHEMA),
        "ppm": (lambda b: _decode_ppm_row(b, thumb),
                _ppm_meta_frame, PPM_META_SCHEMA),
    }[kind]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(builder(int(i))) for i in pdf[id_col]]
            yield frame(pdf[id_col].astype("int64"), metas)

    return df.select(id_col).mapInPandas(_gen, schema)


def with_media_payload(df: DataFrame, kind: str,
                       id_col: str = "doc_id") -> DataFrame:
    """Attach a real media payload built from the id column (WAV or
    PPM). The builder runs in mapInPandas too — payload bytes are born
    and consumed inside Arrow batches, never as driver-side literals."""
    builder = {"wav": build_wav, "ppm": build_ppm}[kind]
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("payload", BinaryType()),
    ])

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "payload": [builder(int(i)) for i in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(_gen, schema)
