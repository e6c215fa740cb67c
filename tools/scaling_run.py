#!/usr/bin/env python
"""North-rule scaling evidence: the same job at local[N] and local[4N]
on the same input (sandbox stand-in for N vs 4N executors).

This host shows up to 2.4x run-to-run noise across processes, so legs
are INTERLEAVED (hi, lo, hi, lo) and the best (min) time per leg is
reported — same spirit as the reference harness's IQR outlier trimming
(benchmark_utils.hpp:244-318).

Writes/updates the "## Measured" section of BENCH.md and prints JSON.

Usage: python tools/scaling_run.py [--repeats 2] [--scale bench]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_leg  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW = max(CPUS // 4, 1)


def _spin(sec):
    import time as _t
    t0 = _t.time()
    x = 0
    while _t.time() - t0 < sec:
        for _ in range(10000):
            x += 1
    return x


def spin_calibration() -> dict:
    """Measure what the host actually delivers at LOW and HIGH thread
    counts with a pure-python spinner. Virtualized hosts here advertise
    32 cores but deliver ~24 effective at 32 threads — the hardware
    ceiling for (thr_4N/thr_N)/4 must be reported next to the engine's
    number or the gate is unmeasurable."""
    import multiprocessing as mp
    spin = _spin

    out = {}
    for n in (1, LOW, CPUS):
        with mp.Pool(n) as pool:
            res = pool.map(spin, [4.0] * n)
        out[n] = sum(res) / 4.0 / 1e6
    cap = (out[CPUS] / out[LOW]) / (CPUS / LOW)
    return {"miters_per_sec": {str(k): round(v, 1) for k, v in out.items()},
            "effective_cores_high": round(out[CPUS] / out[1], 1),
            "effective_cores_low": round(out[LOW] / out[1], 1),
            "hardware_efficiency_ceiling": round(cap, 3)}


def cpu_seconds() -> float:
    """Total machine CPU-seconds consumed (user+nice+system) from
    /proc/stat. This host's wall-clock is noisy (observed 4x swings on
    identical jobs — shared hypervisor); CPU-seconds per leg shows
    whether the JOB's work scales, independent of host throttling."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return (int(parts[1]) + int(parts[2]) + int(parts[3])) / os.sysconf("SC_CLK_TCK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--queries", type=int, default=200)
    args = ap.parse_args()

    from pdx_spark.sources.fixtures import make_queries_pdf, transcripts_path
    trans_path = transcripts_path(args.scale)
    qpdf = make_queries_pdf(args.queries)
    queries = [(int(r.query_id), str(r.query_text), int(r.k))
               for r in qpdf.itertuples()]

    calib = spin_calibration()
    print(f"# calibration: {calib}", file=sys.stderr, flush=True)

    legs = {CPUS: [], LOW: []}
    for rep in range(args.repeats):
        for cores in (CPUS, LOW):
            c0 = cpu_seconds()
            leg = run_leg(cores, queries, trans_path, warmup=(rep == 0))
            leg["host_cpu_sec"] = cpu_seconds() - c0  # host-wide (noisy)
            leg["cpu_sec"] = leg.get("build_cpu_sec", 0) + leg.get("query_cpu_sec", 0)
            legs[cores].append(leg)
            print(f"# rep{rep} c{cores}: build={leg['build_sec']:.1f}s"
                  f"/{leg.get('build_cpu_sec', 0):.0f}cpu "
                  f"query={leg['query_sec']:.2f}s"
                  f"/{leg.get('query_cpu_sec', 0):.0f}cpu "
                  f"host={leg['host_cpu_sec']:.0f}cpu "
                  f"rows={leg.get('result_rows')}", file=sys.stderr, flush=True)

    def best(cores, key):
        return min(l[key] for l in legs[cores])

    n_turns = legs[CPUS][0]["n_turns"]
    build_hi, build_lo = best(CPUS, "build_sec"), best(LOW, "build_sec")
    query_hi, query_lo = best(CPUS, "query_sec"), best(LOW, "query_sec")
    ratio = CPUS / LOW
    result = {
        "n_turns": n_turns, "queries": len(queries),
        "cores": {"low": LOW, "high": CPUS},
        "build_sec": {"low": round(build_lo, 2), "high": round(build_hi, 2)},
        "build_turns_per_sec": {"low": round(n_turns / build_lo, 1),
                                "high": round(n_turns / build_hi, 1)},
        "query_sec": {"low": round(query_lo, 2), "high": round(query_hi, 2)},
        "qps": {"low": round(len(queries) / query_lo, 2),
                "high": round(len(queries) / query_hi, 2)},
        "scaling_efficiency": {
            "build": round((build_lo / build_hi) / ratio, 3),
            "query": round((query_lo / query_hi) / ratio, 3),
        },
        "repeats": args.repeats,
        "calibration": calib,
        "efficiency_vs_hardware_ceiling": {
            "build": round((build_lo / build_hi) / ratio
                           / calib["hardware_efficiency_ceiling"], 3),
            "query": round((query_lo / query_hi) / ratio
                           / calib["hardware_efficiency_ceiling"], 3),
        },
        "cpu_sec_per_leg": {str(c): [round(l["cpu_sec"], 1) for l in legs[c]]
                            for c in legs},
        "wall_sec_per_leg": {str(c): [round(l["build_sec"] + l["query_sec"], 1)
                                      for l in legs[c]] for c in legs},
        "note": "best-of-N per leg, legs interleaved (noisy host); "
                "cpu_sec shows work-inflation independent of host throttle",
    }
    print(json.dumps(result))

    bench_md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH.md")
    section = f"""## Measured (latest scaling run)

Corpus: {n_turns:,} turns (deterministic fixture, scale={args.scale});
{len(queries)} batched queries, k=10 default. Same job, same input, two
parallelism levels (local[{LOW}] vs local[{CPUS}] = N vs 4N stand-in).
Best of {args.repeats} interleaved repeats per leg (noisy host — see
tools/scaling_run.py).

| phase | local[{LOW}] | local[{CPUS}] | throughput {LOW}c | throughput {CPUS}c | efficiency N->4N | vs hardware ceiling |
|---|---|---|---|---|---|---|
| index build | {build_lo:.1f}s | {build_hi:.1f}s | {n_turns/build_lo:,.0f} turns/s | {n_turns/build_hi:,.0f} turns/s | {result['scaling_efficiency']['build']:.2f} | {result['efficiency_vs_hardware_ceiling']['build']:.2f} |
| query batch ({len(queries)}q) | {query_lo:.2f}s | {query_hi:.2f}s | {len(queries)/query_lo:.1f} q/s | {len(queries)/query_hi:.1f} q/s | {result['scaling_efficiency']['query']:.2f} | {result['efficiency_vs_hardware_ceiling']['query']:.2f} |

Hardware calibration (pure-python spinners, same host, same moment):
the virtualized host delivers {calib['effective_cores_low']} effective
cores at {LOW} threads but only {calib['effective_cores_high']} at
{CPUS} threads, so a PERFECTLY scaling job measures at most
**{calib['hardware_efficiency_ceiling']:.2f}** on the
(thr_4N/thr_N)/4 metric here. The "vs hardware ceiling" column divides
the measured efficiency by that ceiling. Per-leg process-tree
CPU-seconds (work parity across parallelism):
`{json.dumps(result['cpu_sec_per_leg'])}`.

Raw JSON: `{json.dumps(result)}`
"""
    header = "# BENCH — measured performance + scaling evidence\n\n"
    body = ""
    if os.path.exists(bench_md):
        with open(bench_md) as f:
            old = f.read()
        if "## Measured" in old:
            body = old.split("## Measured")[0]
        else:
            body = old + "\n"
    with open(bench_md, "w") as f:
        f.write((body or header) + section)


if __name__ == "__main__":
    main()
