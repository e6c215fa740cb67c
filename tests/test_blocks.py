"""Codec unit tests (analog of the reference's kernel cross-validation,
tests/test_distance_computers.cpp, and layout scatter/gather tests)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdx_spark.config import BM25Params
from pdx_spark.functions.blocks import (bit_width, decode_block,
                                        encode_blocks, pack, unpack)


def test_pack_roundtrip_basic():
    v = np.array([0, 1, 5, 255, 1023], dtype=np.int64)
    w = bit_width(v)
    assert w == 10
    assert np.array_equal(unpack(pack(v, w), w, len(v)), v)


def test_pack_zero_width():
    v = np.zeros(7, dtype=np.int64)
    assert pack(v, 0) == b""
    assert np.array_equal(unpack(b"", 0, 7), v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_pack_roundtrip_property(values):
    v = np.array(values, dtype=np.int64)
    w = bit_width(v)
    assert np.array_equal(unpack(pack(v, w), w, len(v)), v)


def test_encode_decode_blocks():
    rng = np.random.default_rng(42)
    n = 1000
    doc_ids = np.sort(rng.choice(100_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 500, size=n).astype(np.int64)
    blocks = encode_blocks(doc_ids, tfs, dls, shard=0, term="t",
                           block_size=128, avgdl=60.0, params=BM25Params())
    assert len(blocks) == (n + 127) // 128
    got_ids, got_tfs, got_dls = [], [], []
    for b in blocks:
        i, t, d = decode_block(b)
        assert b["first_doc"] == i[0] and b["last_doc"] == i[-1]
        assert b["max_tf"] == t.max() and b["min_dl"] == d.min()
        got_ids.append(i); got_tfs.append(t); got_dls.append(d)
    assert np.array_equal(np.concatenate(got_ids), doc_ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    assert np.array_equal(np.concatenate(got_dls), dls)


def test_gmax_is_true_block_max():
    from pdx_spark.functions.bm25 import tfnorm_np
    p = BM25Params()
    doc_ids = np.arange(10, dtype=np.int64)
    tfs = np.array([1, 2, 3, 9, 1, 1, 2, 1, 4, 1], dtype=np.int64)
    dls = np.array([10, 20, 5, 100, 7, 9, 11, 13, 2, 80], dtype=np.int64)
    [b] = encode_blocks(doc_ids, tfs, dls, 0, "t", 128, 30.0, p)
    assert b["gmax"] == tfnorm_np(tfs, dls, 30.0, p).max()
