#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pipeline": {...end-to-end CDC numbers...}}

Two parts:
1. headline engine queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1), each timed with a noop write so the whole
   plan executes; $SPARK_GRAFT_TRIALS (default 3) interleaved trials,
   medians reported (single trials are meaningless under this host's 2-4x
   CPU swings — see BASELINE.md);
2. the end-to-end CDC pipeline (BASELINE.json metric): generate a seeded
   mutation log sized to the scale factor (20M events/sf), then run the
   micro-batch runner (decode -> dedup -> cell-LWW reduce -> tombstones ->
   COW merge -> offsets/lineage/metrics) and report change-events/sec.

Scaling protocol (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on the
same input — see bench_scaling.py which orchestrates both and computes the
N->4N efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def _noop_write(df) -> None:
    df.write.mode("overwrite").format("noop").save()


HEADLINE_QUERIES = [
    "cdc_full_state",
    "cdc_lww_upserts",
    "cdc_range_tombstones",
    "cdc_decode_envelope",
    "cdc_dedup_events",
    "cdc_schema_evolution",
    "cdc_snapshot_union",
    "cdc_offsets_checkpoint",
    # round 4: logged-batch explode + full state (the BatchTest analog)
    "cdc_batch_mutations",
    # round 5: every remaining scalar family through the full state build
    "cdc_types_scalar",
    # round 5: session-window sessionization (merging windows, no per-key sort)
    "cdc_conv_sessions",
    # round 5: point-in-time replay (pushed-down horizon filter + full state)
    "cdc_state_asof",
    # round 5: ordered per-conversation export off the final state
    "cdc_transcript_assembly",
]


def bench_queries(
    spark, sf_dir: str, trials: int | None = None
) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Headline query timings: >=3 INTERLEAVED trials, median per query.

    Interleaving (trial 1 runs every query, then trial 2, ...) plus medians
    is the protocol BASELINE.md uses for the scaling criterion — this host's
    minute-to-minute CPU swings (measured 2-4x) make single trials unusable
    for round-over-round comparison. Trial 0 additionally pays the one-time
    derived-log build + persist; the median discards it.
    Returns (medians, all trial timings)."""
    import statistics

    import __spark_entry__ as em

    trials = trials or int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    qs = em.queries()
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE_QUERIES}
    for _ in range(trials):
        for name in HEADLINE_QUERIES:
            t0 = time.time()
            _noop_write(qs[name](spark, sf_dir))
            raw[name].append(round(time.time() - t0, 3))
    medians = {name: round(statistics.median(ts), 3) for name, ts in raw.items()}
    return medians, raw


def bench_pipeline(
    spark,
    sf: float,
    workdir: str,
    n_events: int | None = None,
    segments_per_batch: int = 4,
    binary_payload: bool = False,
    payload_format: str = "json",
) -> dict:
    """End-to-end pipeline bench. ``binary_payload=True`` runs the
    full-fidelity configuration: the log carries serialized payloads (as the
    reference's commit-log segments do) and the pipeline decodes them (S5)
    before applying — the compute-dense mode used for the scaling
    measurement. ``payload_format`` picks the codec: 'json' (from_json
    codegen) or 'binary' (the real binary layout + vectorized numpy
    decoder, functions/binary_codec.py)."""
    from debezium_connector_cassandra_spark.sources.generator import (
        gen_mutation_log,
        write_mutation_log,
    )
    from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

    n_events = n_events or max(int(20_000_000 * sf), 50_000)
    n_convs = max(n_events // 100, 100)
    log_path = os.path.join(workdir, "mutation_log")
    target_path = os.path.join(workdir, "target")

    t0 = time.time()
    log = gen_mutation_log(
        spark,
        n_events,
        n_convs=n_convs,
        max_turns=50,
        events_per_segment=max(n_events // 8, 1),
        n_log_partitions=4,
        seed=42,
        hot_fraction=0.05,
    )
    log_schema = None
    if binary_payload:
        if payload_format == "binary":
            from debezium_connector_cassandra_spark.functions.binary_codec import (
                encode_payload_binary,
            )

            log = encode_payload_binary(log)
        else:
            from debezium_connector_cassandra_spark.functions.decode import (
                encode_payload,
            )

            log = encode_payload(log)
        log_schema = "infer"
    write_mutation_log(log, log_path)
    gen_sec = time.time() - t0

    runner = CdcRunner(
        spark, log_path, target_path,
        segments_per_batch=segments_per_batch, n_buckets=32,
        log_schema=log_schema,
        decode_binary=binary_payload,
        payload_format=payload_format,
    )
    t0 = time.time()
    results = runner.run()
    apply_sec = time.time() - t0
    n_applied = sum(r["n_decoded"] for r in results)
    final_rows = runner.target.state.read().count()
    return {
        "n_events": n_events,
        "n_batches": len(results),
        "gen_sec": round(gen_sec, 2),
        "apply_sec": round(apply_sec, 2),
        "events_per_sec": round(n_applied / apply_sec, 1),
        "final_state_rows": final_rows,
        "batch_wall_ms": [r["wall_ms"] for r in results],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--n-events", type=int, default=None)
    ap.add_argument("--segments-per-batch", type=int, default=4)
    ap.add_argument("--keep-workdir", default=None)
    ap.add_argument("--binary-payload", action="store_true",
                    help="serialize payloads and decode (S5 fidelity mode)")
    ap.add_argument("--payload-format", choices=["json", "binary"],
                    default="json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from debezium_connector_cassandra_spark.session import get_spark

    spark = get_spark(app_name="cdc-bench", master=f"local[{cpus}]")

    t_total = time.time()
    queries: dict[str, float] = {}
    query_trials: dict[str, list[float]] = {}
    if not args.pipeline_only:
        queries, query_trials = bench_queries(spark, sf_dir)

    workdir = args.keep_workdir or tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        pipeline = bench_pipeline(
            spark, sf, workdir, n_events=args.n_events,
            segments_per_batch=args.segments_per_batch,
            binary_payload=args.binary_payload,
            payload_format=args.payload_format,
        )
    finally:
        if not args.keep_workdir:
            shutil.rmtree(workdir, ignore_errors=True)

    total = round(time.time() - t_total, 3)
    print(
        json.dumps(
            {
                "metric": "change-events/sec applied end-to-end (log tail -> merged lake state); headline query secs",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "query_trials": query_trials,
                "sf": sf,
                "cpus": int(cpus),
                "pipeline": pipeline,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
