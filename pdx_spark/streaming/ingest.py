"""Structured-Streaming ingest: continuous transcript arrival -> periodic
delta-segment appends.

The reference has no streaming (SURVEY §2.7); its only incremental
facility is synchronous Append/Delete (index.hpp:581-638). The honest
Spark translation is micro-batched maintenance: readStream over a
transcripts directory, foreachBatch -> Maintainer.append (delta
segments + stats refresh), checkpointed so ingest resumes exactly-once
per micro-batch. Queries see each delta as soon as its manifest commit
lands — same visibility model as the reference's post-Append search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pdx_spark.schemas import TRANSCRIPTS


def stream_transcripts(spark, input_dir: str, index_path: str,
                       checkpoint_dir: str, trigger_once: bool = True,
                       max_files_per_trigger: int = 16,
                       max_deltas: int = 16):
    """Start (and with trigger_once=True, run to completion) a streaming
    append pipeline. Returns the StreamingQuery."""
    from pdx_spark.operators.maintenance import Maintainer

    src = (spark.readStream.schema(TRANSCRIPTS)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir))

    def on_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        # batch_id makes the append idempotent: Structured Streaming
        # replays the last uncommitted micro-batch on restart, and
        # append() no-ops when batch_id <= manifest.last_batch_id
        mt = Maintainer(spark, index_path)
        mt.append(batch_df, batch_id=batch_id)
        # health policy: fold delta artifacts when too many accumulated
        # (minor stats compaction / targeted segment patch) so unbounded
        # micro-batching keeps a bounded merged-at-read path count
        mt.maintain(max_deltas=max_deltas)

    writer = (src.writeStream.foreachBatch(on_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if trigger_once:
        q.awaitTermination()
    return q


def windowed_turn_counts(spark, input_dir: str, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming windowed aggregation over arriving transcripts: turns per
    (role, tumbling ts window) with late-data watermark. Returned
    unstarted (caller picks sink); used with availableNow in tests where
    it must equal the batch groupBy on the same data."""
    from pyspark.sql import functions as F

    src = spark.readStream.schema(TRANSCRIPTS).parquet(input_dir)
    return (src.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("role"))
            .agg(F.count("*").alias("n_turns"))
            .select(F.col("w.start").alias("window_start"), "role", "n_turns"))
