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


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer over micro-batches == batch
    sessionization (gap logic), minus each user's final still-open
    session (held in state, unflushed under NoTimeout)."""
    import pandas as pd

    from pdx_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for u in range(6):
        t = base + pd.Timedelta(minutes=u)
        for s in range(3):               # 3 sessions per user
            for e in range(2 + (u + s) % 3):   # 2-4 events each
                rows.append((f"u{u}", t))
                t += pd.Timedelta(minutes=5)
            t += pd.Timedelta(minutes=90)      # gap > 30min closes
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"]).sort_values("ts")
    mid = pdf["ts"].quantile(0.5)
    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    sdf = spark.createDataFrame(pdf, "user_id string, ts timestamp")
    # two time-split files -> two micro-batches; state must carry across
    sdf.filter(F.col("ts") <= F.lit(mid)).coalesce(1) \
       .write.mode("append").parquet(in_dir)
    sdf.filter(F.col("ts") > F.lit(mid)).coalesce(1) \
       .write.mode("append").parquet(in_dir)

    src = (spark.readStream.schema("user_id string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (sessionize_stream(src, gap_sec=1800)
         .writeStream.format("memory").queryName("sess_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in spark.table("sess_out").collect()}

    # batch truth: lag/gap sessionization, drop each user's last session
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (sdf.withColumn("prev", F.lag("ts").over(w))
            .withColumn("new_s", F.when(
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800),
                1).otherwise(0))
            .withColumn("sid", F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").cast("int").alias("n_events")))
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("sid"))
    want = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in sess.join(last_sid, ["user_id", "sid"], "left_anti")
            .collect()}
    assert got == want and len(want) == 6 * 2  # 2 closed sessions per user
