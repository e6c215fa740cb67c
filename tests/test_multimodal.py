"""Multimodal plumbing tests: schema/batch shape are real, decode is a
deterministic stub (raises for real=True — libs absent by design)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdx_spark.operators.multimodal import (FEATURE_DIM, decode_image,
                                            extract_features, frame_sample,
                                            synthesize_media)


def test_decode_stub_contract():
    f = decode_image(b"abc")
    assert f.shape == (FEATURE_DIM,) and f.dtype == np.float32
    assert np.array_equal(f, decode_image(b"abc"))          # deterministic
    assert not np.array_equal(f, decode_image(b"abd"))
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", real=True)


def test_extract_features(spark):
    media = synthesize_media(spark, n=60)
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism across runs
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_frame_sample(spark):
    media = synthesize_media(spark, n=30)
    frames = frame_sample(media, every_ms=500)
    pdf = frames.toPandas()
    assert (pdf.groupby("media_id").offset_ms.is_monotonic_increasing).all()
    videos = media.filter(F.col("kind") == "video").collect()
    counts = pdf.groupby("media_id").size().to_dict()
    for v in videos:
        assert counts[v["media_id"]] == v["duration_ms"] // 500 + 1
