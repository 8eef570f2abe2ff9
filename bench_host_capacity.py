#!/usr/bin/env python
"""Engine-independent host parallel-capacity probe.

Companion to bench_scaling_procs.py: measures how much aggregate compute the
HOST actually grants 16 busy pinned vCPUs relative to 4, using a pure-numpy
kernel with zero Spark, zero JVM, and pre-allocated buffers (so none of the
measured sandbox pathologies — page-fault serialization, JVM heap growth —
contaminate the number). If the engine's quad/single throughput ratio
matches the host's capacity ratio, the engine scales perfectly within what
the hypervisor schedules; the gap to 4.0 is host co-tenancy, not engine
contention.

    capacity_ratio   = agg(16 pinned workers on cpus 0-15)
                     / agg( 4 pinned workers on cpus 0-3)
    normalized_eff   = (engine quad/single) / capacity_ratio

Workers are single-threaded numpy processes (hash-mix + sort + sum over
pre-allocated arrays — the CPU/memory mix of a shuffle-heavy pipeline),
one per vCPU, taskset-pinned, interleaved 4-then-16 per trial, medians.
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

_KERNEL = r"""
import time, numpy as np
dur = float(__import__("sys").argv[1])
rng = np.random.default_rng(7)
a = rng.integers(0, 1 << 60, size=1_000_000, dtype=np.int64)
b = np.empty_like(a)
scratch = np.empty_like(a)
t_end = time.time() + dur
iters = 0
while time.time() < t_end:
    np.multiply(a, np.int64(0x27D4EB2F165667C5), out=b)
    np.bitwise_xor(b, b >> 29, out=b)
    scratch[:] = b
    scratch.sort()
    s = int(scratch[::4096].sum())
    iters += 1
print(iters)
"""


def _worker(cpu: int, dur: float) -> int:
    cmd = ["taskset", "-c", str(cpu), sys.executable, "-c", _KERNEL, str(dur)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return int(out.stdout.strip().splitlines()[-1])


def _run_group(cpus: list[int], dur: float) -> float:
    with cf.ThreadPoolExecutor(max_workers=len(cpus)) as ex:
        counts = list(ex.map(lambda c: _worker(c, dur), cpus))
    return sum(counts) / dur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--duration", type=float, default=15.0)
    args = ap.parse_args()

    four = list(range(4))
    sixteen = list(range(16))
    r4, r16 = [], []
    for t in range(args.trials):
        r4.append(_run_group(four, args.duration))
        print(f"# trial {t}  4-cpu agg: {r4[-1]:.1f} iters/s", file=sys.stderr)
        r16.append(_run_group(sixteen, args.duration))
        print(f"# trial {t} 16-cpu agg: {r16[-1]:.1f} iters/s", file=sys.stderr)
    med4, med16 = statistics.median(r4), statistics.median(r16)
    out = {
        "metric": "host parallel capacity ratio, 16 vs 4 pinned busy vCPUs (pure numpy, no Spark)",
        "duration_sec_per_group": args.duration,
        "agg_4cpu_trials": [round(x, 1) for x in r4],
        "agg_16cpu_trials": [round(x, 1) for x in r16],
        "median_4cpu": round(med4, 1),
        "median_16cpu": round(med16, 1),
        "capacity_ratio": round(med16 / med4, 3),
        "ideal": 4.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
