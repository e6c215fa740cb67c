"""Corpus preparation: dense doc-id assignment, docs side table, postings.

Dense doc_id = rank of (conv_id, turn_idx) under stable global ordering
(FIXTURES.md §1; the reference's identity row_ids, index.hpp:329-333).
Dense ids are load-bearing: shard = doc_id / docs_per_shard gives every
shard a contiguous doc range, so block metadata (first/last doc) prunes
cleanly and doc arrays index densely.

Scale note: a naive `row_number() OVER (ORDER BY ...)` is a single-task
bottleneck at 10^12 rows. We use range-partition + per-partition local
ranks + a driver-side prefix sum over per-partition counts (the
prefix-sum trick is the analog of ComputeClusterOffsets,
ivf_wrapper.hpp:76-87). Only the tiny counts vector hits the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark.config import BM25Params, IndexConfig
from pdx_spark.functions.tokenize import tokens_col


def assign_doc_ids(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """transcripts(+any cols) -> same rows + dense int64 doc_id, ordered by
    (conv_id, turn_idx). Deterministic regardless of sampled range
    boundaries: offsets come from actual partition counts."""
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)

    ranged = transcripts.repartitionByRange(num_partitions, "conv_id", "turn_idx") \
                        .withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)  # pin sampled boundaries

    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "pid int, part_offset long")

    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    return (ranged
            .withColumn("_local", F.row_number().over(w) - 1)
            .join(F.broadcast(offsets_df), F.col("_pid") == F.col("pid"))
            .withColumn("doc_id", (F.col("part_offset") + F.col("_local")).cast("long"))
            .drop("_pid", "pid", "_local", "part_offset"))


def build_docs(with_ids: DataFrame) -> DataFrame:
    """Docs side table (schemas.DOCS): per-doc metadata, token length, and
    xxhash64(text) for the per-turn text-equality roundtrip invariant."""
    return with_ids.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
        F.size(tokens_col(F.col("text"))).cast("int").alias("dl"),
        F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    )


def postings(with_ids: DataFrame, cfg: IndexConfig | None = None) -> DataFrame:
    """(term, doc_id, tf, dl) — the flat inverted file before blocking.
    Pure JVM: tokenize -> posexplode-free explode -> groupBy count (Spark
    plans a partial (map-side) aggregate before the shuffle)."""
    toks = with_ids.select(
        "doc_id", tokens_col(F.col("text")).alias("toks"))
    toks = toks.withColumn("dl", F.size("toks"))
    return (toks
            .select("doc_id", "dl", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").cast("int").alias("tf"))
            .select("term", "doc_id", "tf", "dl"))


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    row = docs.agg(F.count("*").alias("n"),
                   F.avg("dl").alias("avgdl")).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def term_stats(postings_df: DataFrame, n_docs: int, avgdl: float,
               params: BM25Params) -> DataFrame:
    """Per-term df / max_tf / gmax (schemas.TERM_STATS). The broadcastable
    'global statistics' analog of the reference's quantization params +
    centroid table (scalar.hpp:60-74)."""
    from pdx_spark.functions.bm25 import tfnorm_col
    g = tfnorm_col(F.col("tf"), F.col("dl"), F.lit(avgdl), params)
    return (postings_df
            .groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.max("tf").alias("max_tf"),
                 F.max(g).alias("gmax")))
