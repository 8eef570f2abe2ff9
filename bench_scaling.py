#!/usr/bin/env python
"""N -> 4N scaling measurement (BASELINE.json criterion).

Runs the identical end-to-end CDC pipeline (same seeded input, same batch
plan) in two fresh Spark processes — local[8] and local[32], the sandbox
proxy for N vs 4N executors — and reports throughput at each plus scaling
efficiency = (events_per_sec@32 / events_per_sec@8) / 4.

Usage: python bench_scaling.py [--n-events 2000000] [--repeats 1]
Writes BENCH/scaling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_once(cpus: int, n_events: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py"),
            "--pipeline-only",
            "--n-events",
            str(n_events),
            "--segments-per-batch",
            "8",
        ],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    results = {8: [], 32: []}
    for _ in range(args.repeats):
        for cpus in (8, 32):
            r = run_once(cpus, args.n_events)
            results[cpus].append(r["pipeline"])
            print(f"# local[{cpus}]: {r['pipeline']}", file=sys.stderr)

    best8 = max(p["events_per_sec"] for p in results[8])
    best32 = max(p["events_per_sec"] for p in results[32])
    efficiency = round((best32 / best8) / 4, 3)
    summary = {
        "metric": "throughput scaling efficiency, local[8] -> local[32] (N -> 4N proxy)",
        "n_events": args.n_events,
        "events_per_sec_8": best8,
        "events_per_sec_32": best32,
        "speedup": round(best32 / best8, 3),
        "efficiency": efficiency,
        "runs": {str(k): v for k, v in results.items()},
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
