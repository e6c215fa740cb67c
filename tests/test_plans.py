"""Physical-plan assertions: the things that matter at 100 TB must be
visible in explain() output — term filters pushed into the parquet scan,
column pruning active, broadcast joins where intended."""

import pytest
from pyspark.sql import functions as F

from pdx_spark.operators.searcher import Searcher
from pdx_spark.plans.planner import (assert_pushed_filter, plan_string,
                                     scan_read_schema)


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    return Searcher.load(spark, tiny_index)


def test_term_filter_pushed_to_segment_scan(searcher):
    seg = searcher.segments().filter(F.col("term").isin(["w0001", "w0002"]))
    assert assert_pushed_filter(seg, "term"), plan_string(seg)


def test_term_stats_scan_prunes_columns(searcher):
    df = searcher.term_stats().filter(F.col("term") == "w0001").select("term", "df")
    schemas = scan_read_schema(df)
    assert schemas, "no parquet scan found"
    assert all("gmax" not in s for s in schemas), schemas


def test_exact_scorer_broadcasts_query_terms(spark, tiny_df):
    from pdx_spark.config import BM25Params
    from pdx_spark.operators import corpus as C
    from pdx_spark.operators.exact import exact_topk
    ids = C.assign_doc_ids(tiny_df)
    posts = C.postings(ids)
    docs = C.build_docs(ids)
    n, avgdl = C.corpus_stats(docs)
    ts = C.term_stats(posts, n, avgdl, BM25Params())
    res = exact_topk(posts, ts, n, avgdl, BM25Params(), [(0, "w0001 w0002", 5)])
    plan = plan_string(res)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_choose_filter_mode(spark, searcher):
    from pdx_spark.plans.planner import choose_filter_mode
    docs = searcher.docs()
    mode_rare, n_rare = choose_filter_mode(docs, "role = 'system'", searcher.n_docs)
    assert mode_rare == "allow" and n_rare < 0.5 * searcher.n_docs
    mode_all, n_all = choose_filter_mode(docs, "doc_id >= 0", searcher.n_docs)
    assert mode_all == "deny" and n_all == searcher.n_docs
