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
import os
import time


def _parse_cores(spec: str) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out |= set(range(int(a), int(b) + 1))
        else:
            out.add(int(part))
    return out


def _descendants(root_pids: set[int]) -> set[int]:
    kids: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
            kids.setdefault(ppid, []).append(int(d))
        except Exception:
            continue
    out, stack = set(), list(root_pids)
    while stack:
        p = stack.pop()
        if p in out:
            continue
        out.add(p)
        stack.extend(kids.get(p, []))
    return out


def pin_processes(exec_cores: set[int], driver_cores: set[int]) -> int:
    """Hard CPU budgets, the way a real cluster's container limits work:
    every executor backend process AND its descendants (python workers)
    onto exec_cores; everything else in this job's tree (driver JVM,
    master/worker threads, this script) onto driver_cores. Returns the
    number of executor-tree processes pinned. Re-run before each timed
    phase — python daemons spawn lazily and must inherit or be caught."""
    exec_roots: set[int] = set()
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="ignore")
        except Exception:
            continue
        if "CoarseGrainedExecutorBackend" in cmd:
            exec_roots.add(int(d))
    exec_tree = _descendants(exec_roots) if exec_roots else set()
    me_tree = _descendants({os.getppid() if os.getppid() > 1 else os.getpid()})
    n = 0
    for p in exec_tree:
        try:
            os.sched_setaffinity(p, exec_cores)
            n += 1
        except Exception:
            pass
    for p in me_tree - exec_tree:
        try:
            os.sched_setaffinity(p, driver_cores)
        except Exception:
            pass
    return n


def _stage_totals(spark):
    """Aggregate completed-stage executor metrics via the UI REST API
    (None when the UI is disabled — the default in timed runs). Diffing
    snapshots around a phase separates executor work (runTime/cpuTime)
    from driver/serial time: wall*cores - runTime = cores idle waiting
    on the driver, the quantity the N->4N efficiency number hides."""
    try:
        import json as _json
        import urllib.request
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return None
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages",
                timeout=5) as r:
            data = _json.load(r)
        agg: dict[str, float] = {}
        for s in data:
            if s.get("status") not in ("COMPLETE", "ACTIVE"):
                continue
            for k in ("executorRunTime", "executorCpuTime",
                      "executorDeserializeTime", "numCompleteTasks",
                      "inputBytes", "shuffleReadBytes",
                      "shuffleWriteBytes"):
                agg[k] = agg.get(k, 0) + (s.get(k) or 0)
        return agg
    except Exception:
        return None


def _phase_delta(a, b, wall_sec: float, cores: int):
    if a is None or b is None:
        return None
    d = {k: b.get(k, 0) - a.get(k, 0) for k in b}
    run_s = d.get("executorRunTime", 0) / 1e3
    return {
        "exec_run_sec": round(run_s, 2),
        "exec_cpu_sec": round(d.get("executorCpuTime", 0) / 1e9, 2),
        "deser_sec": round(d.get("executorDeserializeTime", 0) / 1e3, 2),
        "tasks": int(d.get("numCompleteTasks", 0)),
        "input_mb": round(d.get("inputBytes", 0) / 1e6, 1),
        "shuffle_mb": round((d.get("shuffleReadBytes", 0)
                             + d.get("shuffleWriteBytes", 0)) / 1e6, 1),
        # cores-seconds NOT spent running tasks: driver/serial + sched
        "idle_core_sec": round(max(0.0, wall_sec * cores - run_s), 2),
        "parallel_occupancy": round(run_s / max(wall_sec * cores, 1e-9), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--warmup", action="store_true",
                    help="untimed small build + query first (JIT/codegen)")
    ap.add_argument("--pin-exec", default=None,
                    help="core list (e.g. 0-7) to pin executor trees to")
    ap.add_argument("--pin-driver", default=None,
                    help="core list (e.g. 28-31) for the driver tree")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("pdx_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS
    from pdx_spark.sources.fixtures import make_queries_pdf

    df = spark.read.schema(TRANSCRIPTS).parquet(args.transcripts)
    n_turns = df.count()  # also forces executor registration (for pinning)

    pin = None
    if args.pin_exec and args.pin_driver:
        ec, dc = _parse_cores(args.pin_exec), _parse_cores(args.pin_driver)

        def pin():
            n = pin_processes(ec, dc)
            print(f"# pinned {n} executor-tree procs to {sorted(ec)}",
                  flush=True)
        pin()

    out = {"n_turns": n_turns,
           "cores": spark.sparkContext.defaultParallelism,
           "pin_exec": args.pin_exec, "pin_driver": args.pin_driver,
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

    ncores = spark.sparkContext.defaultParallelism
    if not args.skip_build:
        if pin:
            pin()
        snap0 = _stage_totals(spark)
        t0 = time.time()
        man = Indexer(spark).build(df, args.index, n_chunks=1)
        out["build_sec"] = round(time.time() - t0, 3)
        ph = _phase_delta(snap0, _stage_totals(spark),
                          out["build_sec"], ncores)
        if ph is not None:
            out["build_exec"] = ph
        out["build_turns_per_sec"] = round(n_turns / out["build_sec"], 1)
        # per-stage breakdown so N-vs-4N legs show WHICH stage scaled
        stages = {}
        for ent in man.get("lineage", []):
            for k, v in (ent.get("timings") or {}).items():
                stages[k] = stages.get(k, 0.0) + float(v)
        for key, ch in man.get("chunks", {}).items():
            stages[f"encode_chunk{key}"] = float(ch.get("sec", 0.0))
        for ent in man.get("lineage", []):
            if ent.get("stage") == "build_complete":
                stages["total"] = float(ent["sec"])
        out["build_stages"] = stages

    s = Searcher.load(spark, args.index)
    s.search_batch(queries[:4])  # warm the scan path, cache idf plumbing
    if pin:
        pin()  # catch python daemons spawned since the last pin
    snap0 = _stage_totals(spark)
    t0 = time.time()
    rows = s.search_batch(queries).count()
    out["query_sec"] = round(time.time() - t0, 3)
    ph = _phase_delta(snap0, _stage_totals(spark), out["query_sec"], ncores)
    if ph is not None:
        out["query_exec"] = ph
    out["qps"] = round(len(queries) / out["query_sec"], 2)
    out["result_rows"] = rows
    print("PDXRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
