#!/usr/bin/env python
"""spark-submit entry point (north rule: `spark-submit --py-files`).

Build an index and run the fixture query batch, using ONLY the
SparkSession provided by spark-submit (no embedded master config — the
cluster manager decides executors).

Usage:
  python tools/make_pyfiles.py                       # -> dist/pdx_spark.zip
  spark-submit --master 'local-cluster[8,4,12288]' \
      --conf spark.executor.memory=10g \
      --py-files dist/pdx_spark.zip tools/submit_job.py \
      --transcripts /root/repo/.fixtures/transcripts_bench.parquet \
      --index /tmp/pdx_submit_idx --queries 800 --k 10

Prints one JSON line with build/query timings (same shape as bench.py
phases) so N-vs-4N runs are comparable. tools/cluster_scaling_run.py
drives this at two executor counts for the north-rule scaling evidence
with true PROCESS isolation (one JVM + python workers per executor).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--warmup", action="store_true",
                    help="untimed small build + query first (JIT/codegen)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("pdx_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS
    from pdx_spark.sources.fixtures import make_queries_pdf

    df = spark.read.schema(TRANSCRIPTS).parquet(args.transcripts)
    n_turns = df.count()

    out = {"n_turns": n_turns,
           "cores": spark.sparkContext.defaultParallelism,
           "executors": spark.sparkContext.getConf().get(
               "spark.executor.instances", "?")}

    qpdf = make_queries_pdf(args.queries)
    queries = [(int(r.query_id), str(r.query_text), int(r.k))
               for r in qpdf.itertuples()]

    if args.warmup and not args.skip_build:
        wpath = args.index + "_warm"
        Indexer(spark).build(df.limit(20_000), wpath)
        sw = Searcher.load(spark, wpath)
        sw.search_batch(queries[:4])
        import shutil
        shutil.rmtree(wpath, ignore_errors=True)

    if not args.skip_build:
        t0 = time.time()
        Indexer(spark).build(df, args.index, n_chunks=1)
        out["build_sec"] = round(time.time() - t0, 3)
        out["build_turns_per_sec"] = round(n_turns / out["build_sec"], 1)

    s = Searcher.load(spark, args.index)
    s.search_batch(queries[:4])  # warm the scan path, cache idf plumbing
    t0 = time.time()
    rows = s.search_batch(queries).count()
    out["query_sec"] = round(time.time() - t0, 3)
    out["qps"] = round(len(queries) / out["query_sec"], 2)
    out["result_rows"] = rows
    print("PDXRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
