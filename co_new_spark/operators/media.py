"""Multimodal (image/audio/video) column plumbing over opaque binary payloads.

The engine treats media as ``binary`` columns with typed metadata, processed
via Arrow-batched ``mapInPandas`` so each executor core streams record
batches through Python once — the pattern a 100 TB multimodal pipeline needs
(decode / feature-extract / frame-sample per batch, never per row).

The actual codec step is STUBBED (this environment ships no image/audio
libraries): ``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives stable pseudo-features
from the payload bytes (sha256-seeded), so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and fully tested while the
codec is swappable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

_MAGIC = [
    (b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"), (b"GIF8", "gif"),
    (b"RIFF", "riff"), (b"<html", "html"), (b"<!doc", "html"),
]


def sniff_format(payload: bytes) -> str:
    head = (payload or b"")[:8].lower()
    for magic, name in _MAGIC:
        if head[: len(magic)].lower() == magic.lower():
            return name
    return "unknown"


def decode_image(payload: bytes, deterministic_fake: bool = False) -> dict:
    """Stub decode: real codec not available in this environment.

    With ``deterministic_fake`` the 'decoded' features are a pure function of
    the payload bytes (stable across runs/partitionings), which is what the
    pipeline tests and the dedup contract need.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass deterministic_fake=True for the test double")
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "n_channels": 1 + (h[2] % 4),
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


MEDIA_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("phash", LongType()),
])


def media_meta(df: DataFrame, bin_col: str = "html", key_col: str = "url") -> DataFrame:
    """binary payloads -> typed media metadata via mapInPandas (Arrow batches)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            feats = [decode_image(p, deterministic_fake=True) for p in payloads]
            yield pd.DataFrame({
                "url": pdf[key_col],
                "n_bytes": [len(p or b"") for p in payloads],
                "format": [sniff_format(p) for p in payloads],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_channels": [f["n_channels"] for f in feats],
                "phash": [f["phash"] for f in feats],
            })

    return df.select(key_col, bin_col).mapInPandas(batches, MEDIA_META_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_hash", LongType()),
    StructField("frame_bytes", BinaryType()),
])


def frame_sample(df: DataFrame, n_frames: int = 4, bin_col: str = "html",
                 key_col: str = "url") -> DataFrame:
    """'Video' frame sampling plumbing: split each payload into n_frames
    evenly-spaced byte windows, emit one row per sampled frame (explode shape).

    A real decoder slots into the chunk step; batching/schema stay identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, idxs, hashes, chunks = [], [], [], []
            for url, payload in zip(pdf[key_col], pdf[bin_col]):
                b = payload or b""
                step = max(len(b) // n_frames, 1)
                for k in range(n_frames):
                    chunk = b[k * step:(k + 1) * step][:256]
                    urls.append(url)
                    idxs.append(k)
                    hashes.append(int.from_bytes(
                        hashlib.sha256(chunk).digest()[:8], "big", signed=True))
                    chunks.append(chunk)
            yield pd.DataFrame({"url": urls, "frame_idx": idxs,
                                "frame_hash": hashes, "frame_bytes": chunks})

    return df.select(key_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


def fake_embed(df: DataFrame, dim: int = 16, bin_col: str = "html",
               key_col: str = "url") -> DataFrame:
    """Deterministic payload -> embedding stub (unit-norm float list).

    Stands in for a model-inference stage; shows the partition-parallel
    batched shape (one numpy op per Arrow batch, not per row).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for payload in pdf[bin_col]:
                h = hashlib.sha256(payload or b"").digest()
                v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                                  dtype=np.int32).astype(np.float64)
                n = np.linalg.norm(v)
                rows.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame({"url": pdf[key_col], "embedding": rows})

    out = StructType([
        StructField("url", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    return df.select(key_col, bin_col).mapInPandas(batches, out)
