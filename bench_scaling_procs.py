#!/usr/bin/env python
"""N -> 4N scaling, process-level executor proxy (the official measurement).

Why processes, not threads: a real cluster scales by adding executor
PROCESSES. This sandbox's hypervisor collapses when >16 vCPUs stay busy
(kernel/steal time storms measured at 40-67% of CPU; see BASELINE.md), which
makes local[8] -> local[32] inside one JVM measure host-scheduler behavior,
not engine scaling. The faithful proxy is therefore executor processes of 4
cores each: throughput of ONE pipeline process (local[4], the 'N' baseline)
vs FOUR concurrent pipeline processes (4 x local[4] = 16 cores, '4N'), each
applying the same-sized seeded input to its own target — exactly how 4N
executors split the segment space, since batches are independent across key
ranges.

Why CPU pinning (--pin, default on): a real 4-core executor is confined to
its 4 cores by the resource manager (YARN cgroups / k8s cpu limits). An
unpinned local[4] JVM on a 32-vCPU host spills its GC, netty, and Python
worker threads onto the 28 idle cores — inflating the 'N' baseline with
capacity a real executor does not have, and understating efficiency. Each
worker process is therefore taskset-pinned to a disjoint 4-CPU set (single:
cpus 0-3; quad: 0-3 / 4-7 / 8-11 / 12-15) and its JVM is told
-XX:ActiveProcessorCount=4 so GC/thread-pool sizing matches a 4-core
container. This is the same isolation a cluster gives each executor.

Why a fixed pre-touched heap (-Xms=-Xmx -XX:+AlwaysPreTouch): this
sandbox's hypervisor serializes fresh-page allocation pathologically — a
measured microbenchmark (numpy copy with per-iteration allocation) showed 16
concurrent allocating processes achieving 15% of ONE process's throughput,
while the identical copy into pre-allocated buffers scaled near-linearly
(3.9x at 4 procs). An untuned JVM faults in heap pages continuously
(growth + GC region commits), so concurrent workers collapsed on EPT fault
handling, not on engine contention. Pre-touching the whole heap at startup
moves every heap fault outside the timed apply window — exactly what a
long-running executor's steady state looks like. Each worker also gets its
own spark.local.dir (a shared one measurably serialized shuffle I/O).

Why 2M events per worker: per-batch fixed cost (planning, parquet listing,
job scheduling) is ~12s at local[4]; at 500k events it dominates the apply
window and the measurement degenerates to fixed-cost accounting. 2M events
puts >65% of the window in variable (per-event) work, which is what scales.

Why interleaved medians: the VM's effective CPU swings 2-4x minute to
minute (identical runs: 14k-81k events/s). Trials alternate
single/quad/single/quad/... and the efficiency is computed from medians so
both configurations sample the same noise distribution.

  efficiency = median(quad aggregate events/s) / (4 * median(single events/s))

Writes BENCH/scaling_procs.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import shutil
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

WORKER = """
import json, sys, tempfile, shutil
local_dir = sys.argv[2]
heap = sys.argv[3]
from debezium_connector_cassandra_spark.session import get_spark
spark = get_spark(app_name="cdc-scale-worker", master="local[4]",
                  extra_conf={
                      "spark.local.dir": local_dir,
                      "spark.driver.extraJavaOptions":
                          f"-XX:ActiveProcessorCount=4 -Xms{heap} -XX:+AlwaysPreTouch",
                  })
from bench import bench_pipeline
wd = tempfile.mkdtemp(prefix="cdc_scale_", dir="/dev/shm")
try:
    r = bench_pipeline(spark, 0.1, wd, n_events=int(sys.argv[1]), segments_per_batch=8)
finally:
    shutil.rmtree(wd, ignore_errors=True)
print("WORKER_RESULT " + json.dumps(r))
"""


def run_worker(n_events: int, cpuset: str | None = None, slot: int = 0) -> dict:
    env = dict(os.environ)
    heap = env.get("SPARK_SCALE_WORKER_MEM", "8g")
    env["SPARK_DRIVER_MEMORY"] = heap
    local_dir = f"/dev/shm/spark-local-{slot}"
    os.makedirs(local_dir, exist_ok=True)
    cmd = [sys.executable, "-c", WORKER, str(n_events), local_dir, heap]
    if cpuset and shutil.which("taskset"):
        cmd = ["taskset", "-c", cpuset] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=HERE, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_RESULT ")][-1]
    return json.loads(line[len("WORKER_RESULT "):])


QUAD_CPUSETS = ["0-3", "4-7", "8-11", "12-15"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=5, help="interleaved single/quad trial pairs")
    ap.add_argument("--no-pin", action="store_true", help="disable taskset CPU pinning")
    ap.add_argument("--capacity-probe", action="store_true",
                    help="interleave engine-independent host-capacity probes "
                         "(bench_host_capacity kernel) with each trial pair and "
                         "report host-normalized efficiency")
    ap.add_argument("--probe-duration", type=float, default=10.0)
    ap.add_argument("--out", default="scaling_procs.json",
                    help="output file name under BENCH/")
    args = ap.parse_args()
    pin = not args.no_pin and shutil.which("taskset") is not None

    if args.capacity_probe:
        from bench_host_capacity import _run_group

    singles, quads, caps = [], [], []
    for t in range(args.trials):
        if args.capacity_probe:
            c4 = _run_group(list(range(4)), args.probe_duration)
            c16 = _run_group(list(range(16)), args.probe_duration)
            caps.append(round(c16 / c4, 3))
            print(f"# trial {t} host capacity 16v4: {caps[-1]}x", file=sys.stderr)
        s = run_worker(args.n_events, cpuset=QUAD_CPUSETS[0] if pin else None, slot=0)
        singles.append(s["events_per_sec"])
        print(f"# trial {t} single(local[4]): {s['events_per_sec']} ev/s", file=sys.stderr)
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            futs = [
                ex.submit(run_worker, args.n_events,
                          QUAD_CPUSETS[i] if pin else None, i)
                for i in range(4)
            ]
            rs = [f.result() for f in futs]
        agg = sum(r["events_per_sec"] for r in rs)
        quads.append(agg)
        print(f"# trial {t} quad(4 x local[4]): {[round(r['events_per_sec']) for r in rs]} agg={round(agg)}", file=sys.stderr)

    med_s, med_q = statistics.median(singles), statistics.median(quads)
    summary = {
        "metric": "throughput scaling efficiency, 1 -> 4 executor processes of 4 cores (N -> 4N)",
        "protocol": (
            "interleaved trials, medians (VM capacity varies 2-4x minute to minute); "
            + ("taskset-pinned disjoint 4-CPU sets, -XX:ActiveProcessorCount=4, fixed "
               "pre-touched heap, per-worker spark.local.dir "
               "(executor-container isolation proxy)" if pin else "unpinned")
        ),
        "n_events_per_worker": args.n_events,
        "pinned": pin,
        "single_trials_events_per_sec": singles,
        "quad_trials_aggregate_events_per_sec": [round(q, 1) for q in quads],
        "median_single": round(med_s, 1),
        "median_quad_aggregate": round(med_q, 1),
        "speedup": round(med_q / med_s, 3),
        "efficiency": round(med_q / (4 * med_s), 3),
    }
    if caps:
        # engine speedup each pair, divided by the capacity the HOST granted
        # 16-vs-4 busy pinned vCPUs at that moment (pure-numpy probe, no
        # Spark): the engine's share of achievable scaling
        per_pair_norm = [
            round((q / s) / c, 3) for q, s, c in zip(quads, singles, caps)
        ]
        summary["host_capacity_ratios"] = caps
        summary["per_pair_host_normalized_scaling"] = per_pair_norm
        summary["median_host_normalized_scaling"] = round(
            statistics.median(per_pair_norm), 3
        )
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", args.out), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
