"""Randomized end-to-end consistency: a corpus NOT shaped like the
standard fixture (different vocab law, doc lengths, empty/punct docs),
a random query mix (present/absent terms, k extremes, AND, msm), every
engine path vs the brute-force oracle. Guards against fixture-tuned
bugs; seeds are fixed so failures reproduce."""

import math

import numpy as np
import pandas as pd
import pytest

from pdx_spark.config import IndexConfig
from pdx_spark.operators.indexer import Indexer
from pdx_spark.operators.searcher import Searcher
from pdx_spark.oracle import BM25Oracle
from pdx_spark.schemas import TRANSCRIPTS

SEED = 20260818


def random_corpus(rng, n_docs=400, vocab=250):
    """Zipf-ish vocab with deliberate nasties: empty docs, punct-only
    docs, heavy repetition, single-token docs."""
    words = np.array([f"t{i:04d}" for i in range(vocab)])
    p = 1.0 / np.arange(1, vocab + 1) ** 1.2
    p /= p.sum()
    texts = []
    for d in range(n_docs):
        r = rng.random()
        if r < 0.02:
            texts.append("")
        elif r < 0.04:
            texts.append("!!! ,,, ...")
        elif r < 0.08:
            texts.append(str(rng.choice(words)))
        else:
            dl = int(rng.integers(3, 60))
            toks = rng.choice(words, size=dl, p=p)
            if r < 0.20:  # heavy repetition block
                toks[: dl // 2] = toks[0]
            texts.append(" ".join(toks))
    n_convs = max(n_docs // 8, 1)
    pdf = pd.DataFrame({
        "conv_id": [f"c{d % n_convs:05d}" for d in range(n_docs)],
        "turn_idx": pd.Series([d // n_convs for d in range(n_docs)],
                              dtype="int32"),
        "role": ["user"] * n_docs,
        "tool": [None] * n_docs,
        "ts": pd.to_datetime("2026-01-01"),
        "text": texts,
    })
    return pdf[[f.name for f in TRANSCRIPTS.fields]]


def random_queries(rng, vocab=250, n=24):
    out = []
    for qid in range(n):
        nt = int(rng.integers(1, 5))
        ts = [f"t{int(rng.integers(0, vocab * 1.2)):04d}"  # ~17% OOV
              for _ in range(nt)]
        k = int(rng.choice([1, 3, 10, 10, 10_000]))
        out.append((qid, " ".join(ts), k))
    return out


@pytest.mark.parametrize("seed", [SEED, SEED + 1])
def test_random_corpus_all_paths_vs_oracle(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    pdf = random_corpus(rng)
    ordered = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = BM25Oracle(dict(enumerate(ordered["text"])))

    path = str(tmp_path / f"idx{seed}")
    Indexer(spark, cfg=IndexConfig(block_size=16, docs_per_shard=32)) \
        .build(spark.createDataFrame(pdf, schema=TRANSCRIPTS), path)
    s = Searcher.load(spark, path)
    queries = random_queries(rng)

    def check(res, want_of, tag):
        got = {}
        for r in res.collect():
            got.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"])))
        for qid, qtext, k in queries:
            g = sorted(got.get(qid, []), key=lambda x: (-x[1], x[0]))
            w = want_of(qtext, k)
            assert len(g) == len(w), (tag, seed, qid, qtext, g, w)
            for (gd, gs), (wd, ws) in zip(g, w):
                assert gd == wd and math.isclose(gs, ws, rel_tol=1e-9), \
                    (tag, seed, qid, qtext, g, w)

    check(s.search_batch(queries, exact=True),
          lambda q, k: oracle.topk(q, k), "exact")
    check(s.search_batch(queries, two_phase_min_shards=2,
                         force_two_phase=True),
          lambda q, k: oracle.topk(q, k), "pruned")
    check(s.search_batch(queries, require_all_terms=True,
                         two_phase_min_shards=2, force_two_phase=True),
          lambda q, k: oracle.topk(q, k, require_all_terms=True), "AND")
    check(s.search_batch(queries, min_should_match=2,
                         two_phase_min_shards=2, force_two_phase=True),
          lambda q, k: oracle.topk(q, k, min_should_match=2), "msm2")
