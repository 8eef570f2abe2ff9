"""Tombstone-GC long-run evidence -> BENCH/gc_longrun.json.

A 40-segment drain (20 batches, GC every 4) over a delete-heavy stream:
records the tombstone store size after every sweep, the total purged, and
the final store bound. The design claim under test: with gc_grace derived
from the producer's writetime-inversion window, the store size is a
function of the GRACE WINDOW, not of stream length — the one relation that
would otherwise grow forever at 100 TB stays O(window).

Usage: python bench_gc_longrun.py [n_events]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.session import get_spark
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
    writetime_inversion_window_us,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="gc-longrun", master="local[16]")
    wd = tempfile.mkdtemp(prefix="gc_longrun_")
    try:
        log_path = f"{wd}/log"
        # delete-heavy mix so tombstones actually accumulate
        df = gen_mutation_log(
            spark,
            n_events,
            n_convs=max(n_events // 100, 100),
            max_turns=50,
            events_per_segment=max(n_events // 40, 1),
            seed=13,
            op_weights=(50, 18, 14, 8, 10),
            wt_jitter_events=500,
        )
        write_mutation_log(df, log_path)
        n_tombs_total = df.where(F.col("op").isin("d", "p", "r")).count()
        grace = writetime_inversion_window_us(500)

        r = CdcRunner(
            spark,
            log_path,
            f"{wd}/t",
            segments_per_batch=2,
            n_buckets=32,
            gc_grace_us=grace,
            gc_every_batches=4,
        )
        t0 = time.time()
        results = r.run()
        wall = time.time() - t0
        audit = r.gc_log.read().orderBy("batch_id").collect()
        store_final = r.target.tombstones.read().count()
        out = {
            "what": (
                "tombstone store boundedness over a 20-batch drain with GC "
                "every 4 batches; delete-heavy stream (d/p/r = 32% of ops), "
                "gc_grace_us = producer inversion window "
                f"({grace} us); local[16]"
            ),
            "n_events": n_events,
            "n_batches": len(results),
            "apply_wall_sec": round(wall, 1),
            "events_per_sec": round(n_events / wall, 1),
            "tombstones_written_total": n_tombs_total,
            "gc_sweeps": [
                {"n_purged": a["n_purged"], "n_kept": a["n_kept"]} for a in audit
            ],
            "purged_total": sum(a["n_purged"] for a in audit),
            "store_rows_final": store_final,
            "store_vs_written": round(store_final / max(n_tombs_total, 1), 4),
        }
        with open("BENCH/gc_longrun.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
