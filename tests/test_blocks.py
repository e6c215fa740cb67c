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


def _random_blocks(rng, n_blocks):
    """Random (bufs, widths, ns, values) with mixed widths, unaligned
    partial blocks, and zero-width blocks."""
    bufs, widths, ns, vals = [], [], [], []
    for _ in range(n_blocks):
        n = int(rng.integers(1, 40))
        w = int(rng.integers(0, 21))
        v = np.zeros(n, np.int64) if w == 0 else \
            rng.integers(0, 1 << w, size=n).astype(np.int64)
        bufs.append(pack(v, w))
        widths.append(w)
        ns.append(n)
        vals.append(v)
    return (np.array(bufs, dtype=object), np.array(widths, np.int64),
            np.array(ns, np.int64), np.concatenate(vals))


def test_unpack_rows_matches_per_block_unpack():
    """Word-gather unpack_rows == per-block unpack() on mixed widths,
    including unaligned partial blocks and zero-width blocks."""
    from pdx_spark.functions.blocks import unpack_rows
    rng = np.random.default_rng(7)
    for trial in range(20):
        bufs, widths, ns, want = _random_blocks(rng, int(rng.integers(1, 60)))
        got = unpack_rows(bufs, widths, ns)
        assert np.array_equal(got, want), trial
    # empty input
    assert len(unpack_rows(np.array([], dtype=object),
                           np.array([], np.int64),
                           np.array([], np.int64))) == 0


def test_unpack_rows_rejects_length_mismatch():
    from pdx_spark.functions.blocks import unpack_rows
    bufs = np.array([pack(np.array([3, 1], np.int64), 4) + b"x"],
                    dtype=object)  # one stray byte
    try:
        unpack_rows(bufs, np.array([4], np.int64), np.array([2], np.int64))
    except ValueError:
        return
    raise AssertionError("length mismatch not detected")


def test_decode_term_run_views_matches_bufs():
    """Arrow-view decode (BinaryArray buffers, incl. a SLICED array with
    offset != 0) is bit-identical to the bytes-object path, and the
    cross-run stitch matches per-run decode_term_run calls."""
    import pyarrow as pa
    from pdx_spark.functions.blocks import (decode_term_run,
                                            decode_term_run_views)
    from pdx_spark.operators.searcher import _payload_view
    rng = np.random.default_rng(11)
    params, avgdl = BM25Params(), 33.0
    # several term runs over one doc range, concatenated as one
    # (term, first_doc)-sorted frame
    rows = {k: [] for k in ("ids", "tfs", "dls", "ibw", "tbw", "dbw",
                            "n", "fd", "ld")}
    per_run = []
    for r in range(6):
        rl = int(rng.integers(1, 300))
        ids = np.cumsum(rng.integers(1, 50, rl)).astype(np.int64)
        tfs = rng.integers(1, 30, rl).astype(np.int64)
        dls = rng.integers(1, 900, rl).astype(np.int64)
        blocks = encode_blocks(ids, tfs, dls, shard=0, term=f"t{r}",
                               block_size=32, avgdl=avgdl, params=params)
        per_run.append((ids, tfs, dls, blocks))
        for b in blocks:
            rows["ids"].append(b["ids"]); rows["tfs"].append(b["tfs"])
            rows["dls"].append(b["dls"]); rows["ibw"].append(b["ids_bw"])
            rows["tbw"].append(b["tfs_bw"]); rows["dbw"].append(b["dls_bw"])
            rows["n"].append(b["n"]); rows["fd"].append(b["first_doc"])
            rows["ld"].append(b["last_doc"])
    as_np = {k: np.array(v, dtype=object if k in ("ids", "tfs", "dls")
                         else np.int64) for k, v in rows.items()}
    # bytes path over ALL runs at once (the cross-run stitch)
    gi, gt, gd = decode_term_run(
        as_np["ids"], as_np["tfs"], as_np["dls"], as_np["ibw"],
        as_np["tbw"], as_np["dbw"], as_np["n"], as_np["fd"], as_np["ld"])
    # equals per-run decode concatenated
    want_i = np.concatenate([r[0] for r in per_run])
    want_t = np.concatenate([r[1] for r in per_run])
    want_d = np.concatenate([r[2] for r in per_run])
    assert np.array_equal(gi, want_i)
    assert np.array_equal(gt, want_t)
    assert np.array_equal(gd, want_d)
    # Arrow-view path, including a sliced array (offset != 0)
    for do_slice in (False, True):
        views = []
        for k in ("ids", "tfs", "dls"):
            cells = list(as_np[k])
            if do_slice:  # offset != 0: cell starts are not at byte 0
                arr = pa.array([b"PADCELL"] + cells, type=pa.binary()).slice(1)
            else:
                arr = pa.array(cells, type=pa.binary())
            views.append(_payload_view(arr))
        vi, vt, vd = decode_term_run_views(
            views[0], views[1], views[2], as_np["ibw"], as_np["tbw"],
            as_np["dbw"], as_np["n"], as_np["fd"], as_np["ld"])
        assert np.array_equal(vi, want_i), do_slice
        assert np.array_equal(vt, want_t), do_slice
        assert np.array_equal(vd, want_d), do_slice


def test_topk_merge_pdf_matches_window_semantics():
    """Driver-side merge == (score desc, doc_id asc) window top-k per
    query, ties included deterministically."""
    import pandas as pd
    from pdx_spark.operators.searcher import Searcher
    rng = np.random.default_rng(5)
    n = 500
    pdf = pd.DataFrame({
        "query_id": pd.Series(rng.integers(0, 9, n), dtype="int32"),
        "doc_id": pd.Series(rng.choice(10_000, n, replace=False),
                            dtype="int64"),
        # few distinct scores -> plenty of ties
        "score": pd.Series(rng.integers(0, 5, n) / 2.0, dtype="float64")})
    live = [(q, ["t"], int(rng.integers(1, 8))) for q in range(9)]
    got = Searcher._topk_merge_pdf([pdf], live)
    kmap = dict((q, k) for q, _, k in live)
    want = (pdf.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True])
            .groupby("query_id", sort=True)
            .apply(lambda g: g.head(kmap[int(g.name)]))
            .reset_index(drop=True))
    assert len(got) == len(want)
    assert np.array_equal(got["query_id"].to_numpy(),
                          want["query_id"].to_numpy())
    assert np.array_equal(got["doc_id"].to_numpy(),
                          want["doc_id"].to_numpy())
    assert np.array_equal(got["score"].to_numpy(),
                          want["score"].to_numpy())
