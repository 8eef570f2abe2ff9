#!/usr/bin/env python
"""Measure the maintained-transcript-view (IVM) overhead in the ingest loop.

Runs the SAME seeded log through CdcRunner twice per trial — with and
without ``maintain_assembly`` — interleaved, and reports median wall times
plus the relative overhead. The refresh is recompute-from-state over only
the touched buckets, so the expected cost is a small constant fraction of
the apply (it re-reads/re-aggregates |touched buckets| of state, writes
the same buckets of the view).

Writes BENCH/assembly_ivm.json:
  {"n_events": ..., "trials": N,
   "plain_sec": [...], "ivm_sec": [...],
   "median_plain": ..., "median_ivm": ..., "overhead_frac": ...}
"""

from __future__ import annotations

import json
import shutil
import statistics
import tempfile
import time

from debezium_connector_cassandra_spark.session import get_spark
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

N_EVENTS = 200_000
TRIALS = 3


def run_once(spark, log_path: str, maintain: bool) -> float:
    wd = tempfile.mkdtemp(prefix="ivm_bench_")
    try:
        r = CdcRunner(
            spark,
            log_path,
            f"{wd}/t",
            segments_per_batch=2,
            n_buckets=16,
            maintain_assembly=maintain,
        )
        t0 = time.time()
        r.run()
        wall = time.time() - t0
        if maintain:
            assert r.read_assembly().count() > 0
        return round(wall, 3)
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="ivm-bench")
    wd = tempfile.mkdtemp(prefix="ivm_log_")
    try:
        log = gen_mutation_log(
            spark, N_EVENTS, n_convs=2000, events_per_segment=25_000, seed=71
        )
        write_mutation_log(log, f"{wd}/log")
        plain, ivm = [], []
        for _ in range(TRIALS):  # interleaved: host noise hits both arms
            plain.append(run_once(spark, f"{wd}/log", False))
            ivm.append(run_once(spark, f"{wd}/log", True))
        mp, mi = statistics.median(plain), statistics.median(ivm)
        out = {
            "n_events": N_EVENTS,
            "trials": TRIALS,
            "plain_sec": plain,
            "ivm_sec": ivm,
            "median_plain": mp,
            "median_ivm": mi,
            "overhead_frac": round(mi / mp - 1, 4),
        }
        with open("BENCH/assembly_ivm.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
