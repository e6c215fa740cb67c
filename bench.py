#!/usr/bin/env python
"""Benchmark harness (driver contract): index-build + BM25 query
throughput at $SPARK_GRAFT_SF_DIR scale on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ..., "throughput": {...}}

The N-vs-4N scaling evidence (north rule) is produced by
tools/scaling_run.py (interleaved legs, best-of-2 — this host is noisy)
and reported in BENCH.md; this per-round bench runs one leg to stay
inside the driver's time budget.

Mirrors the reference harness shape (batched query set, per-phase
seconds; /root/reference/benchmarks/benchmark_utils.hpp:194-318).
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
N_QUERIES = int(os.environ.get("PDX_BENCH_QUERIES", "200"))
N_AMORTIZED = int(os.environ.get("PDX_BENCH_QUERIES_BIG", "800"))

_SF = 0.1
for tag, sf in (("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)):
    if tag in SF_DIR:
        _SF = sf
SCALE_BY_SF = {0.001: "tiny", 0.01: "small", 0.1: "bench"}
FIXTURE_SCALE = os.environ.get("PDX_BENCH_SCALE", SCALE_BY_SF[_SF])


def proc_tree_cpu() -> float:
    """CPU-seconds consumed by THIS process tree (python driver + Spark
    JVM + python workers, including reaped children via cutime/cstime).
    /proc/stat is host-wide on this box — neighbor tenants pollute it —
    so work accounting must be per-subtree."""
    me = os.getpid()
    procs = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # after comm: field 1=state, 2=ppid, 12..15=utime,stime,cutime,cstime
            procs[int(d)] = (int(parts[1]),
                             int(parts[11]) + int(parts[12])
                             + int(parts[13]) + int(parts[14]))
        except Exception:
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [me]
    while stack:
        pid = stack.pop()
        if pid in procs:
            total += procs[pid][1]
        stack.extend(children.get(pid, []))
    return total / os.sysconf("SC_CLK_TCK")


def run_leg(cores: int, queries, trans_path: str, warmup: bool = True) -> dict:
    """Build index + run the batched query set at local[cores]."""
    from pdx_spark.config import IndexConfig, get_spark
    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS

    spark = get_spark(cores=cores, app=f"pdx_bench_{cores}",
                      shuffle_partitions=max(cores, 8))
    out = {"cores": cores}
    try:
        df = spark.read.schema(TRANSCRIPTS).parquet(trans_path)
        n_turns = df.count()
        out["n_turns"] = n_turns

        idx_path = os.path.join(tempfile.gettempdir(), f"pdx_bench_idx_{cores}")
        if warmup:  # JIT/codegen warmup on a slice, not timed
            wpath = idx_path + "_warm"
            shutil.rmtree(wpath, ignore_errors=True)
            Indexer(spark, cfg=IndexConfig()).build(df.limit(20_000), wpath)
            shutil.rmtree(wpath, ignore_errors=True)

        shutil.rmtree(idx_path, ignore_errors=True)
        c0 = proc_tree_cpu()
        t0 = time.time()
        Indexer(spark, cfg=IndexConfig()).build(df, idx_path, n_chunks=1)
        out["build_sec"] = time.time() - t0
        out["build_cpu_sec"] = proc_tree_cpu() - c0
        out["build_turns_per_sec"] = n_turns / out["build_sec"]

        searcher = Searcher.load(spark, idx_path)
        searcher.search_batch(queries[:4])  # warmup

        c0 = proc_tree_cpu()
        t0 = time.time()
        res = searcher.search_batch(queries)
        out["result_rows"] = res.count()
        out["query_sec"] = time.time() - t0
        out["query_cpu_sec"] = proc_tree_cpu() - c0
        out["qps"] = len(queries) / out["query_sec"]

        # amortized serving regime (r4 judge #8): the engine's serving
        # model is batched, and per-batch fixed cost (planning + job
        # scheduling) amortizes with batch size — track both regimes
        # round-over-round so a fixed-cost regression can't hide in one
        from pdx_spark.sources.fixtures import make_queries_pdf
        big = [(int(r.query_id), str(r.query_text), int(r.k))
               for r in make_queries_pdf(N_AMORTIZED).itertuples()]
        t0 = time.time()
        searcher.search_batch(big).count()
        out["query_big_sec"] = time.time() - t0
        out["qps_big"] = len(big) / out["query_big_sec"]
        out["n_big"] = len(big)

        t0 = time.time()
        searcher.search_batch(queries[:50], exact=True).count()
        out["exact50_sec"] = time.time() - t0

        t0 = time.time()
        searcher.search_batch(queries, two_phase_min_shards=2, force_two_phase=True).count()
        out["query_pruned_sec"] = time.time() - t0

        # O(delta) maintenance: append ~2% of the corpus as a delta and
        # re-query — appends never rewrite base artifacts (see
        # maintenance.py), so this should cost delta-proportional time
        from pyspark.sql import functions as F

        from pdx_spark.operators.maintenance import Maintainer
        app_df = df.filter(F.crc32(F.col("conv_id").cast("string")) % 50 == 0)
        n_app = app_df.count()
        t0 = time.time()
        Maintainer(spark, idx_path).append(app_df, batch_id=0)
        out["append_sec"] = time.time() - t0
        out["append_rows"] = n_app
        out["append_rows_per_sec"] = n_app / out["append_sec"]
        t0 = time.time()
        Searcher.load(spark, idx_path).search_batch(queries[:50]).count()
        out["query_post_append_sec"] = time.time() - t0
        shutil.rmtree(idx_path, ignore_errors=True)
    finally:
        spark.stop()
    return out


def main():
    from pdx_spark.sources.fixtures import make_queries_pdf, transcripts_path

    trans_path = transcripts_path(FIXTURE_SCALE)
    qpdf = make_queries_pdf(N_QUERIES)
    queries = [(int(r.query_id), str(r.query_text), int(r.k))
               for r in qpdf.itertuples()]

    leg = run_leg(CPUS, queries, trans_path)
    phases = {
        f"build_c{CPUS}": round(leg["build_sec"], 3),
        f"query{len(queries)}_c{CPUS}": round(leg["query_sec"], 3),
        f"query{len(queries)}_pruned_c{CPUS}": round(leg["query_pruned_sec"], 3),
        f"query{leg['n_big']}_amortized_c{CPUS}": round(leg["query_big_sec"], 3),
        f"exact50_c{CPUS}": round(leg["exact50_sec"], 3),
        f"append2pct_c{CPUS}": round(leg["append_sec"], 3),
        f"query50_post_append_c{CPUS}": round(leg["query_post_append_sec"], 3),
    }
    total = round(leg["build_sec"] + leg["query_sec"], 3)
    print(json.dumps({
        "metric": "bm25_build_plus_query_batch",
        "value": total, "unit": "sec",
        "queries": phases, "sf": _SF,
        "n_turns": leg["n_turns"],
        "throughput": {
            "build_turns_per_sec": round(leg["build_turns_per_sec"], 1),
            "qps": round(leg["qps"], 2),
            "qps_amortized": round(leg["qps_big"], 2),
            "append_rows_per_sec": round(leg["append_rows_per_sec"], 1)},
    }))


if __name__ == "__main__":
    main()
