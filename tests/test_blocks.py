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


# ---- property: the shard scorer is exact under any θ -----------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _shard_case(draw):
    width = 64
    n_terms = draw(st.integers(1, 5))
    terms = [f"t{i}" for i in range(n_terms)]
    postings = {}
    for t in terms:
        docs = draw(st.lists(st.integers(0, width - 1), min_size=1,
                             max_size=20, unique=True))
        postings[t] = sorted((d, draw(st.integers(1, 9))) for d in docs)
    dls = {d: draw(st.integers(1, 50))
           for d in {d for ps in postings.values() for d, _ in ps}}
    q_terms = draw(st.lists(st.sampled_from(terms + ["absent"]),
                            min_size=1, max_size=4, unique=True))
    theta = draw(st.one_of(st.none(), st.floats(0.0, 3.0)))
    k = draw(st.integers(1, 8))
    return postings, dls, sorted(q_terms), theta, k


@settings(max_examples=60, deadline=None)
@given(_shard_case())
def test_shard_scorer_property(case):
    """For ANY postings/query/θ: every row the scorer returns carries the
    EXACT BM25 score, rows are the per-shard top-k of the candidate set,
    and no doc with true score > θ (i.e. a doc that could enter the
    global top-k) is ever pruned — the exactness invariant behind
    rank-identity."""
    import numpy as np
    import pandas as pd

    from pdx_spark.config import BM25Params
    from pdx_spark.functions.blocks import encode_blocks
    from pdx_spark.functions.bm25 import tfnorm_np
    from pdx_spark.operators.searcher import _shard_scorer

    postings, dls, q_terms, theta, k = case
    params, avgdl, n_docs = BM25Params(), 10.0, 1000
    idf = {t: 1.0 + 0.1 * i for i, t in enumerate(sorted(postings))}
    idf["absent"] = 0.5

    rows = []
    for t, ps in postings.items():
        ids = np.array([d for d, _ in ps], dtype=np.int64)
        tfs = np.array([tf for _, tf in ps], dtype=np.int64)
        dl = np.array([dls[d] for d, _ in ps], dtype=np.int64)
        rows.extend(encode_blocks(ids, tfs, dl, 0, t, 8, avgdl, params))
    seg = pd.DataFrame(rows)

    payload = {"queries": [(0, q_terms, k, theta)], "idf": idf,
               "avgdl": avgdl, "k1": params.k1, "b": params.b,
               "docs_per_shard": 64, "assigned": False, "has_mask": False,
               "predicate_mode": None}
    out = _shard_scorer(payload, has_aux=False)(seg)

    # naive truth
    truth = {}
    for t in q_terms:
        for d, tf in postings.get(t, []):
            g = float(tfnorm_np(np.array([tf]), np.array([dls[d]]),
                                avgdl, params)[0])
            truth[d] = truth.get(d, 0.0) + idf[t] * g
    got = {int(r.doc_id): float(r.score) for r in out.itertuples()}
    for d, s in got.items():
        assert abs(s - truth[d]) < 1e-9, (d, s, truth[d])  # exact scores
    ranked = sorted(truth.items(), key=lambda x: (-x[1], x[0]))
    if theta is None:
        want = [d for d, s in ranked[:k] if s > 0]
        assert sorted(got) == sorted(want)
    else:
        # no doc with true score > θ within the top-k may be pruned
        must_have = [d for d, s in ranked[:k] if s > theta]
        assert set(must_have) <= set(got), (must_have, got, theta)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(0, 10_000))
def test_encode_runs_matches_encode_blocks(seed, extra):
    """The vectorized whole-group encoder (encode_runs) must be
    BYTE-identical to the per-run reference (encode_blocks) — same
    metadata, same widths, same packed payloads — across Zipf-ish run
    length mixes, huge deltas/dls, and partial unaligned blocks."""
    from pdx_spark.config import BM25Params
    from pdx_spark.functions.blocks import encode_runs

    rng = np.random.default_rng(seed)
    params, avgdl, bsz = BM25Params(), 37.5, 16
    n_runs = int(rng.integers(1, 40))
    runs = []
    for i in range(n_runs):
        rl = int(np.clip(rng.zipf(1.4), 1, 200))
        ids = np.cumsum(rng.integers(1, 1 + extra + int(rng.integers(1, 10**6)), rl))
        tfs = rng.integers(1, 1000, rl)
        dls = rng.integers(1, 10**7, rl)
        runs.append((ids.astype(np.int64), tfs.astype(np.int64),
                     dls.astype(np.int64)))

    ref = []
    for i, (ids, tfs, dls) in enumerate(runs):
        ref.extend(encode_blocks(ids, tfs, dls, 5, f"t{i}", bsz, avgdl,
                                 params))
    lens = np.array([len(r[0]) for r in runs], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = (ends - lens).astype(np.int64)
    got = encode_runs(
        np.concatenate([r[0] for r in runs]),
        np.concatenate([r[1] for r in runs]),
        np.concatenate([r[2] for r in runs]),
        starts, ends,
        np.array([f"t{i}" for i in range(n_runs)], dtype=object),
        5, bsz, avgdl, params)
    assert len(ref) == len(got["n"])
    for i, r in enumerate(ref):
        for k in ("term", "shard", "block_id", "n", "first_doc",
                  "last_doc", "max_tf", "min_dl", "gmax", "ids_bw",
                  "tfs_bw", "dls_bw", "ids", "tfs", "dls"):
            v = got[k][i]
            v = v.item() if hasattr(v, "item") else v
            assert r[k] == v, (i, k, r[k], v)


def test_encode_runs_empty_token_group():
    """A group whose docs have zero tokens encodes to zero blocks."""
    from pdx_spark.config import BM25Params, IndexConfig
    from pdx_spark.operators.indexer import _encode_sorted

    out = _encode_sorted(np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty(0, object), 0, IndexConfig(), 10.0,
                         BM25Params())
    assert len(out) == 0


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_encode_runs_arrow_matches(seed):
    """encode_runs_arrow (contiguous-buffer BinaryArray output) must be
    byte-identical to encode_runs."""
    import pyarrow as pa

    from pdx_spark.config import BM25Params
    from pdx_spark.functions.blocks import encode_runs, encode_runs_arrow

    rng = np.random.default_rng(seed)
    params, avgdl, bsz = BM25Params(), 21.5, 16
    n_runs = int(rng.integers(1, 30))
    runs = []
    for i in range(n_runs):
        rl = int(np.clip(rng.zipf(1.4), 1, 150))
        ids = np.cumsum(rng.integers(1, 10**5, rl))
        runs.append((ids.astype(np.int64),
                     rng.integers(1, 500, rl).astype(np.int64),
                     rng.integers(1, 10**6, rl).astype(np.int64)))
    lens = np.array([len(r[0]) for r in runs], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = (ends - lens).astype(np.int64)
    terms = np.array([f"t{i}" for i in range(n_runs)], dtype=object)
    args = (np.concatenate([r[0] for r in runs]),
            np.concatenate([r[1] for r in runs]),
            np.concatenate([r[2] for r in runs]), starts, ends)
    ref = encode_runs(*args, terms, 9, bsz, avgdl, params)
    vocab = pa.array([f"t{i}" for i in range(n_runs)])
    got = encode_runs_arrow(
        *args, lambda rob: vocab.take(pa.array(rob)), 9, bsz, avgdl,
        params).to_pydict()
    n_blocks = len(ref["n"])
    assert len(got["n"]) == n_blocks
    for k in ("term", "shard", "block_id", "n", "first_doc", "last_doc",
              "max_tf", "min_dl", "gmax", "ids_bw", "tfs_bw", "dls_bw",
              "ids", "tfs", "dls"):
        refv = [x.item() if hasattr(x, "item") else x for x in ref[k]]
        assert refv == got[k], k
