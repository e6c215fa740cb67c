"""Streaming ingest: availableNow micro-batches -> delta appends; final
search results equal a one-shot batch build over the same data."""

import os

import pytest
from pyspark.sql import functions as F

from pdx_spark.config import IndexConfig
from pdx_spark.operators.indexer import Indexer, read_manifest
from pdx_spark.operators.searcher import Searcher
from pdx_spark.schemas import TRANSCRIPTS
from pdx_spark.sources.fixtures import make_transcripts_pdf
from pdx_spark.streaming.ingest import stream_transcripts

CFG = IndexConfig(block_size=16, docs_per_shard=64)


def test_streaming_append_matches_batch(spark, tmp_path):
    pdf = make_transcripts_pdf(40)
    convs = sorted(pdf["conv_id"].unique())
    base = pdf[pdf["conv_id"].isin(convs[:30])]
    inc1 = pdf[pdf["conv_id"].isin(convs[30:35])]
    inc2 = pdf[pdf["conv_id"].isin(convs[35:])]

    # batch reference: one-shot build on everything
    full_path = str(tmp_path / "full")
    all_df = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    Indexer(spark, cfg=CFG).build(all_df, full_path)

    # streaming: base build, then two files arriving in a stream dir
    stream_path = str(tmp_path / "streamed")
    Indexer(spark, cfg=CFG).build(
        spark.createDataFrame(base, schema=TRANSCRIPTS), stream_path)
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    spark.createDataFrame(inc1, schema=TRANSCRIPTS).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    spark.createDataFrame(inc2, schema=TRANSCRIPTS).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    stream_transcripts(spark, in_dir, stream_path,
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       trigger_once=True, max_files_per_trigger=1)

    m = read_manifest(stream_path)
    assert len(m["deltas"]) >= 1
    assert m["n_docs"] == len(pdf)

    sa = Searcher.load(spark, full_path)
    sb = Searcher.load(spark, stream_path)
    for q in ["w0000", "w0005 w0100", "w3000"]:
        ra = [(s, round(x, 9)) for s, x in
              [(d, s_) for d, s_ in sa.search(q, k=10)]]
        rb = [(s, round(x, 9)) for s, x in
              [(d, s_) for d, s_ in sb.search(q, k=10)]]
        # doc_ids differ between the two indexes (different insertion
        # order), so compare (conv_id, turn_idx, score) instead
        ka = _keys(spark, sa, q)
        kb = _keys(spark, sb, q)
        assert ka == kb, q


def _keys(spark, searcher, q):
    res = searcher.search_batch([(0, q, 10)])
    rows = (searcher.lookup_keys(res)
            .select("conv_id", "turn_idx", F.round("score", 9).alias("s"))
            .collect())
    return sorted((r["conv_id"], r["turn_idx"], r["s"]) for r in rows)
