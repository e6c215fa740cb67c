"""Dedup operator tests against tiny hand-checkable corpora + Python
set-arithmetic oracles."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdx_spark.functions.tokenize import tokenize_py
from pdx_spark.operators.dedup import (embedding_cosine_pairs,
                                       exact_dup_groups, minhash_lsh_pairs,
                                       ngram_jaccard_pairs, shingles_df,
                                       simhash63, simhash_near_dup_pairs)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # dup of 0
    (2, "the quick brown fox jumps over the sleepy dog"),        # near-dup
    (3, "completely different text about spark and parquet"),
    (4, "Completely DIFFERENT text about spark and parquet!"),   # tok-dup of 3
    (5, "unrelated words entirely here nothing shared at all"),
]


def py_shingles(text, n=3):
    t = tokenize_py(text)
    if not t:
        return set()
    if len(t) <= n:
        return {" ".join(t)}
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def py_jaccard(a, b, n=3):
    sa, sb = py_shingles(a, n), py_shingles(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dups(docs_df):
    groups = exact_dup_groups(docs_df).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["doc_ids"] == [0, 1] and g["canonical_doc_id"] == 0


def test_shingles_match_python(docs_df):
    got = shingles_df(docs_df, n=3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in got}
    for doc_id, text in DOCS:
        assert counts.get(doc_id, 0) == len(py_shingles(text, 3)), doc_id


def test_jaccard_pairs_match_python(docs_df):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs_df, n=3, threshold=0.3).collect()}
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = py_jaccard(ta, tb, 3)
        if j >= 0.3:
            want[(ia, ib)] = round(j, 6)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (3, 4) in got and got[(3, 4)] == 1.0  # tokenization normalizes


def test_minhash_lsh_finds_exact_dups(docs_df):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs_df, n=3, num_hashes=16,
                                        bands=4, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0 and pairs[(3, 4)] == 1.0
    # verification step guarantees no false positives at the threshold
    for (a, b), j in pairs.items():
        assert round(py_jaccard(DOCS[a][1], DOCS[b][1]), 6) == j >= 0.5


def test_simhash_identical_for_dups_and_distant_for_unrelated(docs_df):
    sims = {r["doc_id"]: r["simhash"] for r in simhash63(docs_df).collect()}
    assert sims[0] == sims[1]          # exact dups identical
    assert sims[3] == sims[4]          # tokenized dups identical
    assert all(0 <= v < (1 << 63) for v in sims.values())
    h = bin(sims[0] ^ sims[5]).count("1")
    assert h > 10  # unrelated docs far apart


def test_simhash_near_dup_pairs(docs_df):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(docs_df, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(3, 4)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_embedding_cosine_pairs(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((5, 8)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(5)]
    rows.append((5, base[0].tolist()))                       # exact copy of 0
    rows.append((6, (base[1] * 2.0).tolist()))               # scaled copy of 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_cosine_pairs(df, threshold=0.999).collect()}
    assert pairs[(0, 5)] == 1.0
    assert pairs[(1, 6)] == 1.0  # cosine is scale-invariant
    assert set(pairs) == {(0, 5), (1, 6)}


def test_exact_dups_capped_doc_ids(spark):
    """Boilerplate corpus: one hash group with 10^3 members. With
    max_doc_ids the listing is bounded (smallest ids kept) while n_dups
    and canonical_doc_id stay exact; the capped path must agree with the
    uncapped one on those fields."""
    rows = [(i, "boilerplate header text") for i in range(1000)]
    rows += [(2000, "a unique document"), (2001, "another unique one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = exact_dup_groups(df, max_doc_ids=5).collect()
    assert len(capped) == 1
    g = capped[0]
    assert g["n_dups"] == 1000
    assert g["canonical_doc_id"] == 0
    assert g["doc_ids"] == [0, 1, 2, 3, 4]
    # and cap larger than the group == uncapped result
    full = exact_dup_groups(df, max_doc_ids=5000).collect()[0]
    assert full["doc_ids"] == list(range(1000))


def test_simhash_band_cap_bounds_hot_buckets(spark):
    """Degenerate corpus: many identical boilerplate docs concentrate in
    one band bucket per band; the cap drops those buckets from candidate
    generation (documented recall trade) while distinct near-dup pairs in
    cold buckets survive."""
    rows = [(i, "same exact boilerplate everywhere") for i in range(200)]
    rows += [(1000, "rare quick brown fox jumps high"),
             (1001, "rare quick brown fox jumps high")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in simhash_near_dup_pairs(df, max_hamming=3,
                                             max_band_df=50).collect()}
    # the 200-member boilerplate bucket (19,900 pairs) is capped away...
    assert all(a >= 1000 for a, _ in pairs)
    # ...while the small-bucket pair is still found
    assert (1000, 1001) in pairs


def test_simhash_pairs_uncapped_unchanged_by_refactor(docs_df):
    """The exploded-bucket rewrite must produce the identical pair set the
    4-way-union implementation did (union of per-band joins == join on
    the exploded (band, bk) frame)."""
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(docs_df, max_hamming=63).collect()}
    # every candidate pair that shares any band appears exactly once
    assert pairs[(0, 1)] == 0 and pairs[(3, 4)] == 0
    for (a, b), h in pairs.items():
        assert a < b and 0 <= h <= 63
