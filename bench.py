#!/usr/bin/env python
"""Benchmark harness (driver contract): index-build + BM25 query throughput
at $SPARK_GRAFT_SF_DIR scale, measured at two parallelism levels to
evidence the north-rule scaling gate (local[N] vs local[4N] stands in for
N vs 4N executors in this sandbox).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Mirrors the reference harness shape (batch the query set; report per-run
seconds; /root/reference/benchmarks/benchmark_utils.hpp:194-318) with
k=10 over the 200-query fixture set.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(CPUS // 4, 1)

_SF = 0.1
for tag, sf in (("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)):
    if tag in SF_DIR:
        _SF = sf
SCALE_BY_SF = {0.001: "tiny", 0.01: "small", 0.1: "bench"}
FIXTURE_SCALE = os.environ.get("PDX_BENCH_SCALE", SCALE_BY_SF[_SF])


def run_at(cores: int, queries, trans_path: str) -> dict:
    """Build index + run the batched query set at local[cores]."""
    from pdx_spark.config import IndexConfig, get_spark
    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS

    spark = get_spark(cores=cores, app=f"pdx_bench_{cores}",
                      shuffle_partitions=max(cores, 8))
    out = {}
    try:
        df = spark.read.schema(TRANSCRIPTS).parquet(trans_path)
        n_turns = df.count()
        out["n_turns"] = n_turns

        idx_path = os.path.join(tempfile.gettempdir(), f"pdx_bench_idx_{cores}")
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.time()
        Indexer(spark, cfg=IndexConfig()).build(df, idx_path, n_chunks=1)
        out["build_sec"] = time.time() - t0
        out["build_turns_per_sec"] = n_turns / out["build_sec"]

        searcher = Searcher.load(spark, idx_path)
        # warm-up (JIT, file listing, stats fetch) — not measured, mirrors
        # the reference's warmup runs (benchmark_utils.hpp:195)
        searcher.search_batch(queries[:4]).collect()

        t0 = time.time()
        res = searcher.search_batch(queries)
        n_rows = res.count()
        out["query_sec"] = time.time() - t0
        out["qps"] = len(queries) / out["query_sec"]
        out["result_rows"] = n_rows

        t0 = time.time()
        searcher.search_batch(queries[:50], exact=True).count()
        out["exact50_sec"] = time.time() - t0
        shutil.rmtree(idx_path, ignore_errors=True)
    finally:
        spark.stop()
    return out


def main():
    from pdx_spark.sources.fixtures import (make_queries_pdf,
                                            transcripts_path)

    trans_path = transcripts_path(FIXTURE_SCALE)
    qpdf = make_queries_pdf(200)
    queries = [(int(r.query_id), str(r.query_text), int(r.k))
               for r in qpdf.itertuples()]

    hi = run_at(CPUS, queries, trans_path)
    lo = run_at(LOW_CPUS, queries, trans_path)

    ratio = CPUS / LOW_CPUS
    scaling = {
        "cores_low": LOW_CPUS, "cores_high": CPUS,
        "build_eff": (hi["build_turns_per_sec"] / lo["build_turns_per_sec"]) / ratio,
        "query_eff": (hi["qps"] / lo["qps"]) / ratio,
        "build_tps_low": lo["build_turns_per_sec"],
        "build_tps_high": hi["build_turns_per_sec"],
        "qps_low": lo["qps"], "qps_high": hi["qps"],
    }
    phases = {
        f"build_c{CPUS}": round(hi["build_sec"], 3),
        f"query200_c{CPUS}": round(hi["query_sec"], 3),
        f"exact50_c{CPUS}": round(hi["exact50_sec"], 3),
        f"build_c{LOW_CPUS}": round(lo["build_sec"], 3),
        f"query200_c{LOW_CPUS}": round(lo["query_sec"], 3),
    }
    total = round(hi["build_sec"] + hi["query_sec"], 3)
    print(json.dumps({
        "metric": "bm25_build_plus_200query_batch",
        "value": total, "unit": "sec",
        "queries": phases, "sf": _SF,
        "n_turns": hi["n_turns"],
        "throughput": {"build_turns_per_sec": round(hi["build_turns_per_sec"], 1),
                       "qps": round(hi["qps"], 2)},
        "scaling": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in scaling.items()},
    }))


if __name__ == "__main__":
    main()
