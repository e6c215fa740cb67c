"""Phrase search (positional side artifact + JVM intersect-join) vs a
pure-python oracle; delta/compact lifecycle."""

import math

import pytest

from pdx_spark.config import BM25Params
from pdx_spark.functions.tokenize import tokenize_py
from pdx_spark.operators.indexer import Indexer
from pdx_spark.operators.phrase import phrase_topk
from pdx_spark.operators.searcher import Searcher
from pdx_spark.schemas import TRANSCRIPTS


def phrase_oracle(texts: dict[int, str], phrase: str, k: int,
                  params: BM25Params | None = None,
                  dead: set[int] = frozenset()) -> list[tuple[int, float]]:
    """Brute force: phrase tf by scanning token lists; phrase-unit BM25
    (idf of phrase df, tfnorm of phrase tf) — the operator's contract."""
    p = params or BM25Params()
    terms = tokenize_py(phrase)
    n = len(terms)
    dls = {d: len(tokenize_py(t)) for d, t in texts.items()}
    live = {d: v for d, v in dls.items() if d not in dead}
    n_docs = len(live)
    avgdl = sum(live.values()) / n_docs if n_docs else 0.0
    ptf = {}
    for d, text in texts.items():
        if d in dead:
            continue
        toks = tokenize_py(text)
        c = sum(1 for i in range(len(toks) - n + 1)
                if toks[i:i + n] == terms)
        if c:
            ptf[d] = c
    dfp = len(ptf)
    if not dfp:
        return []
    idf = math.log((n_docs - dfp + 0.5) / (dfp + 0.5) + 1.0)
    out = []
    for d, tf in ptf.items():
        dl = live[d]
        g = tf * (p.k1 + 1.0) / (tf + p.k1 * (1 - p.b + p.b * dl / avgdl))
        out.append((d, idf * g))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def pos_index(spark, tiny_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("phrase") / "idx")
    Indexer(spark).build(tiny_df, path, store_positions=True)
    return path


@pytest.fixture(scope="module")
def texts(tiny_pdf):
    ordered = tiny_pdf.sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    return dict(enumerate(ordered["text"]))


def _pick_phrase(texts, n=2):
    # deterministic in-vocabulary adjacent pair: first doc with >= n toks
    for d in sorted(texts):
        toks = tokenize_py(texts[d])
        if len(toks) >= n:
            return " ".join(toks[:n])
    raise AssertionError("fixture has no multi-token doc")


def run(spark, path, phrase, k=10):
    s = Searcher.load(spark, path)
    rows = phrase_topk(s, phrase, k=k).collect()
    return [(r["doc_id"], r["score"]) for r in rows]


def assert_match(got, want, tag=""):
    assert len(got) == len(want), (tag, got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and math.isclose(gs, ws, rel_tol=1e-9), \
            (tag, got, want)


def test_phrase_vs_oracle(spark, pos_index, texts):
    for phrase in (_pick_phrase(texts, 2), _pick_phrase(texts, 3)):
        want = phrase_oracle(texts, phrase, 10)
        assert want, f"fixture regression: phrase {phrase!r} matches nothing"
        assert_match(run(spark, pos_index, phrase), want, phrase)
    # order matters: the reversed bigram is a different (likely absent)
    # phrase, and whatever it matches must again equal the oracle
    rev = " ".join(reversed(_pick_phrase(texts, 2).split()))
    assert_match(run(spark, pos_index, rev),
                 phrase_oracle(texts, rev, 10), "reversed")
    # absent phrase -> empty; single term degenerates to that term's df
    assert run(spark, pos_index, "zzunknown zzalsounknown") == []
    # repeated token in the phrase: the same positions leg joins twice
    # with different shifts — still exact ("t t" matches only doubled
    # occurrences)
    t = _pick_phrase(texts, 1)
    doubled = f"{t} {t}"
    assert_match(run(spark, pos_index, doubled),
                 phrase_oracle(texts, doubled, 10), "doubled")
    one = _pick_phrase(texts, 1)
    assert_match(run(spark, pos_index, one),
                 phrase_oracle(texts, one, 10), "single-term")


def test_phrase_requires_positions(spark, tiny_index):
    s = Searcher.load(spark, tiny_index)
    with pytest.raises(ValueError, match="positional"):
        phrase_topk(s, "w0001 w0002")


def test_phrase_append_and_compact(spark, tiny_df, texts, tmp_path):
    from pdx_spark.operators.maintenance import Maintainer
    path = str(tmp_path / "idx")
    Indexer(spark).build(tiny_df, path, store_positions=True)

    new = tiny_df.limit(2).toPandas()
    new["conv_id"] = "zzz_phrase_conv"
    new["text"] = "uniqphrase alpha beta " + new["text"]
    Maintainer(spark, path).append(
        spark.createDataFrame(new, schema=TRANSCRIPTS))

    n0 = len(texts)
    new_texts = dict(texts)
    for i, t in enumerate(new.sort_values("turn_idx")["text"]):
        new_texts[n0 + i] = t

    got = run(spark, path, "uniqphrase alpha")
    want = phrase_oracle(new_texts, "uniqphrase alpha", 10)
    assert len(want) == 2
    assert_match(got, want, "appended")

    # compact folds base+delta positions into one dir; results identical
    m = Maintainer(spark, path)
    assert len(m.manifest["positions_dirs"]) == 2
    m.compact()
    m2 = Maintainer(spark, path)
    assert len(m2.manifest["positions_dirs"]) == 1
    assert_match(run(spark, path, "uniqphrase alpha"), want, "compacted")
    old = _pick_phrase(texts, 2)
    assert_match(run(spark, path, old),
                 phrase_oracle(new_texts, old, 10), "compacted-old")
