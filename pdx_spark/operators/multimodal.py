"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The real decode paths run with zero external deps:
`decode_image(real=True)` decodes PNG via the vendored pure-stdlib
reader (pdx_spark.functions.png) and falls back to Pillow for other
formats when importable (clear NotImplementedError otherwise);
`decode_audio(real=True)` decodes WAV via the stdlib `wave` module.
The default codec remains a deterministic fake (md5-derived bytes ->
fixed-size float features) so the Spark-side plumbing — schema, batch
shape, partition sizing, UDF signatures — is oracle-checkable in ANSI
SQL everywhere.
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


def _have_pil() -> bool:
    import importlib.util
    return importlib.util.find_spec("PIL") is not None


def decode_image(payload: bytes, real: bool = False) -> np.ndarray:
    """real=True: REAL decode — grayscale 4x4 thumbnail -> FEATURE_DIM
    floats in [0,1]. PNG payloads go through the vendored pure-stdlib
    reader (pdx_spark.functions.png: zlib scanlines + the five PNG
    filters, ITU-601 luminance, box resample) so the real path runs with
    zero external deps and is backend-independent; non-PNG formats fall
    back to Pillow when importable, else raise a clear
    NotImplementedError.

    Default (real=False): deterministic fake — md5-chained over the
    LOWERCASE-HEX encoding of the payload -> FEATURE_DIM floats in
    [0,1). Hashing the hex string (not the raw bytes) keeps the stub
    reproducible in ANSI SQL, so the media_features entry gets a real
    DuckDB oracle (DuckDB md5 only accepts VARCHAR). Each little-endian
    uint16 / 2^16 is exact in float32, so Spark and SQL produce
    bit-equal doubles."""
    if real:
        from pdx_spark.functions import png as _png
        if _png.is_png(payload):
            lum = _png.to_luminance(_png.read_png(payload))
            return (_png.box_resize(lum, 4, 4).reshape(-1)
                    .astype(np.float32) / 255.0)[:FEATURE_DIM]
        if not _have_pil():
            raise NotImplementedError(
                "non-PNG image decode requires Pillow (pip install "
                "Pillow); PNG decodes everywhere via the vendored "
                "reader, and the deterministic stub (real=False) works "
                "for any payload")
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return (np.asarray(img, dtype=np.float32).reshape(-1)
                / 255.0)[:FEATURE_DIM]
    hx = payload.hex()
    h = (hashlib.md5(hx.encode()).digest()
         + hashlib.md5((hx + ":2").encode()).digest())
    return np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65536.0


def decode_audio(payload: bytes, real: bool = False) -> np.ndarray:
    """real=True: stdlib WAV decode (wave module — no external deps):
    FEATURE_DIM per-bucket RMS energies of the int16 mono signal,
    normalized to [0,1]. Default: the same deterministic fake as
    decode_image."""
    if real:
        import io
        import wave
        with wave.open(io.BytesIO(payload)) as w:
            raw = w.readframes(w.getnframes())
        sig = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
        if len(sig) == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        pad = (-len(sig)) % FEATURE_DIM
        sig = np.pad(sig, (0, pad))
        buckets = sig.reshape(FEATURE_DIM, -1)
        rms = np.sqrt((buckets ** 2).mean(axis=1)) / 32768.0
        return rms.astype(np.float32)
    return decode_image(payload)  # same deterministic fake feature shape


def extract_features(media: DataFrame, batch_rows: int = 64,
                     real: bool = False) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-dim float
    features out. The batch loop is the production shape (decode one
    batch of payloads per Python call, never per row in Spark).
    real=True routes image payloads through Pillow and audio payloads
    through the stdlib WAV decoder (kind column selects the codec)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                feats = [
                    (decode_audio(bytes(p), real=True) if k == "audio"
                     else decode_image(bytes(p), real=True)).tolist()
                    for p, k in zip(pdf["payload"], pdf["kind"])]
            else:
                feats = [decode_image(bytes(p)).tolist()
                         for p in pdf["payload"]]
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
