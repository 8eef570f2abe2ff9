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
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

WORKER = """
import json, sys, tempfile, shutil
from debezium_connector_cassandra_spark.session import get_spark
spark = get_spark(app_name="cdc-scale-worker", master="local[4]",
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
from bench import bench_pipeline
wd = tempfile.mkdtemp(prefix="cdc_scale_", dir="/dev/shm")
try:
    r = bench_pipeline(spark, 0.1, wd, n_events=int(sys.argv[1]), segments_per_batch=8)
finally:
    shutil.rmtree(wd, ignore_errors=True)
print("WORKER_RESULT " + json.dumps(r))
"""


def run_worker(n_events: int) -> dict:
    env = dict(os.environ)
    env["SPARK_DRIVER_MEMORY"] = env.get("SPARK_SCALE_WORKER_MEM", "14g")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_events)],
        env=env, capture_output=True, text=True, cwd=HERE, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_RESULT ")][-1]
    return json.loads(line[len("WORKER_RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=1_000_000)
    ap.add_argument("--trials", type=int, default=3, help="interleaved single/quad trial pairs")
    args = ap.parse_args()

    singles, quads = [], []
    for t in range(args.trials):
        s = run_worker(args.n_events)
        singles.append(s["events_per_sec"])
        print(f"# trial {t} single(local[4]): {s['events_per_sec']} ev/s", file=sys.stderr)
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            rs = [f.result() for f in [ex.submit(run_worker, args.n_events) for _ in range(4)]]
        agg = sum(r["events_per_sec"] for r in rs)
        quads.append(agg)
        print(f"# trial {t} quad(4 x local[4]): {[round(r['events_per_sec']) for r in rs]} agg={round(agg)}", file=sys.stderr)

    med_s, med_q = statistics.median(singles), statistics.median(quads)
    summary = {
        "metric": "throughput scaling efficiency, 1 -> 4 executor processes of 4 cores (N -> 4N)",
        "protocol": "interleaved trials, medians (VM capacity varies 2-4x minute to minute)",
        "n_events_per_worker": args.n_events,
        "single_trials_events_per_sec": singles,
        "quad_trials_aggregate_events_per_sec": [round(q, 1) for q in quads],
        "median_single": round(med_s, 1),
        "median_quad_aggregate": round(med_q, 1),
        "speedup": round(med_q / med_s, 3),
        "efficiency": round(med_q / (4 * med_s), 3),
    }
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "scaling_procs.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
