"""Edge-of-domain behavior: tiny/degenerate corpora, odd text. The
reference's test suite leans on such cases (tests/test_search.cpp
boundary sections); rank-identity must hold at the edges too."""

import pandas as pd
import pytest

from pdx_spark.config import IndexConfig
from pdx_spark.operators.indexer import Indexer
from pdx_spark.operators.searcher import Searcher
from pdx_spark.oracle import BM25Oracle
from pdx_spark.schemas import TRANSCRIPTS

CFG = IndexConfig(block_size=4, docs_per_shard=8)


def _pdf(rows):
    return pd.DataFrame(
        [(c, i, "user", t, None, pd.Timestamp("2026-01-01"))
         for c, i, t in rows],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def _build(spark, tmp_path, rows, name):
    path = str(tmp_path / name)
    df = spark.createDataFrame(_pdf(rows), schema=TRANSCRIPTS)
    Indexer(spark, cfg=CFG).build(df, path)
    return Searcher.load(spark, path)


def test_single_doc(spark, tmp_path):
    s = _build(spark, tmp_path, [("c0", 0, "hello world hello")], "one")
    o = BM25Oracle({0: "hello world hello"})
    assert [(d, round(x, 9)) for d, x in s.search("hello", k=5)] == \
           [(d, round(x, 9)) for d, x in o.topk("hello", 5)]
    assert s.search("absent", k=5) == []


def test_empty_and_punct_docs(spark, tmp_path):
    rows = [("c0", 0, ""), ("c0", 1, "...!!!"), ("c1", 0, "real text here"),
            ("c1", 1, None)]
    s = _build(spark, tmp_path, rows, "empties")
    assert s.n_docs == 4  # empty docs are docs (dl=0), just never match
    hits = s.search("text", k=10)
    assert len(hits) == 1
    o = BM25Oracle({0: "", 1: "", 2: "real text here", 3: ""})
    assert round(hits[0][1], 9) == round(o.topk("text", 1)[0][1], 9)


def test_unicode_and_case(spark, tmp_path):
    rows = [("c0", 0, "HeLLo WoRLD"), ("c0", 1, "héllo wörld"),
            ("c1", 0, "hello123 world456")]
    s = _build(spark, tmp_path, rows, "uni")
    # tokenizer is [a-z0-9]+ on lowercased text: accents split tokens
    got = {d for d, _ in s.search("hello", k=10)}
    assert 0 in got and 1 not in got
    got2 = {d for d, _ in s.search("hello123", k=10)}
    assert got2 == {2}


def test_k_exceeds_corpus(spark, tmp_path):
    rows = [("c0", i, f"common tok{i}") for i in range(3)]
    s = _build(spark, tmp_path, rows, "smallk")
    hits = s.search("common", k=100)
    assert len(hits) == 3
    scores = [x for _, x in hits]
    assert scores == sorted(scores, reverse=True)


def test_dup_doc_scores_tie_break(spark, tmp_path):
    rows = [("c0", 0, "same text"), ("c0", 1, "same text"),
            ("c1", 0, "same text")]
    s = _build(spark, tmp_path, rows, "ties")
    hits = s.search("same", k=3)
    assert [d for d, _ in hits] == [0, 1, 2]  # equal scores -> doc_id asc
    assert len({round(x, 12) for _, x in hits}) == 1
