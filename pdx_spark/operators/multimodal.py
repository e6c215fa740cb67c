"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (this container has no image/audio libs): the
default codec is a deterministic fake (md5-derived bytes -> fixed-size
float features) so the Spark-side plumbing — schema, batch shape,
partition sizing, UDF signatures — is real and tested; swap
`decode_image`/`decode_audio` for Pillow/torchaudio calls in production
(they raise NotImplementedError when real=True).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),    # opaque encoded bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("codec", T.StringType(), True),
])

FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
])

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.md5(f"{seed}:{i}".encode()).digest()
                   * (8 + i % 5))[: 64 + (i * 7) % 256]
        rows.append((i, kind, bytearray(payload),
                     64 if kind == "image" else None,
                     48 if kind == "image" else None,
                     1000 + i if kind != "image" else None,
                     {"image": "png", "audio": "wav", "video": "mp4"}[kind]))
    return spark.createDataFrame(rows, MEDIA)


def decode_image(payload: bytes, real: bool = False) -> np.ndarray:
    """STUB: real image decode requires Pillow (not in this container).
    Deterministic fake: md5-chained over the LOWERCASE-HEX encoding of the
    payload -> FEATURE_DIM floats in [0,1). Hashing the hex string (not
    the raw bytes) keeps the stub reproducible in ANSI SQL, so the
    media_features entry gets a real DuckDB oracle (DuckDB md5 only
    accepts VARCHAR). Each little-endian uint16 / 2^16 is exact in
    float32, so Spark and SQL produce bit-equal doubles."""
    if real:
        raise NotImplementedError("image decode requires Pillow; stubbed here")
    hx = payload.hex()
    h = (hashlib.md5(hx.encode()).digest()
         + hashlib.md5((hx + ":2").encode()).digest())
    return np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65536.0


def decode_audio(payload: bytes, real: bool = False) -> np.ndarray:
    if real:
        raise NotImplementedError("audio decode requires soundfile/torchaudio; stubbed")
    return decode_image(payload)  # same deterministic fake feature shape


def extract_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-dim float
    features out. The batch loop is the production shape (decode one
    batch of payloads per Python call, never per row in Spark)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })
    return media.mapInPandas(fn, schema=FEATURES)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (real decoder would emit the frame bytes; stub emits offsets +
    deterministic per-frame features)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("offset_ms"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(f"{m}:{o}".encode()).tolist()
                     for m, o in zip(pdf["media_id"], pdf["offset_ms"])]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "offset_ms": pdf["offset_ms"],
                                "features": feats})

    return frames.mapInPandas(
        fn, schema="media_id long, offset_ms int, features array<float>")
