#!/usr/bin/env python
"""spark-submit entry point (north_rule: `spark-submit --py-files`).

Package the engine and run any stage of the pipeline on a cluster:

    zip -r dcs.zip debezium_connector_cassandra_spark
    spark-submit --py-files dcs.zip cdc_submit.py gen    --log /lake/mutation_log --n-events 100000000
    spark-submit --py-files dcs.zip cdc_submit.py run    --log /lake/mutation_log --target /lake/transcripts
    spark-submit --py-files dcs.zip cdc_submit.py stream --log /lake/mutation_log --target /lake/transcripts --checkpoint /lake/_ckpt
    spark-submit --py-files dcs.zip cdc_submit.py snapshot --source-table /lake/pre_existing --target /lake/transcripts
    spark-submit --py-files dcs.zip cdc_submit.py show   --target /lake/transcripts

In local mode the session defaults come from SPARK_GRAFT_CPUS; under a real
cluster master the same code runs unchanged (the engine never assumes local
mode — bucketing, AQE and broadcast decisions are cluster-native).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="cdc_submit")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a deterministic mutation log")
    g.add_argument("--log", required=True)
    g.add_argument("--n-events", type=int, required=True)
    g.add_argument("--n-convs", type=int, default=None)
    g.add_argument("--events-per-segment", type=int, default=1_000_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hot-fraction", type=float, default=0.0)
    g.add_argument("--dup-fraction", type=float, default=0.0)
    g.add_argument("--ttl-seconds", type=int, default=None,
                   help="emit expiring cells (deletion_ts = writetime + ttl)")
    g.add_argument("--pack-batches", type=int, default=None, metavar="N",
                   help="pack runs of N mutations into atomic LOGGED-batch records")
    g.add_argument("--encode-payload", choices=["none", "json", "binary"],
                   default="none",
                   help="serialize cells into a payload column (S5 fidelity "
                        "log; pair with run --decode-binary)")

    r = sub.add_parser("run", help="drain pending segments (micro-batch loop)")
    r.add_argument("--log", required=True)
    r.add_argument("--target", required=True)
    r.add_argument("--segments-per-batch", type=int, default=8)
    r.add_argument("--n-buckets", type=int, default=64)
    r.add_argument("--max-batches", type=int, default=None)
    r.add_argument("--export-changes", action="store_true",
                   help="persist change envelopes to <target>/changes")
    r.add_argument("--no-delete-tombstones", action="store_true",
                   help="suppress null-value tombstone records after deletes")
    r.add_argument("--unpaired-range-markers", action="store_true",
                   help="log carries separate start/end bound markers")
    r.add_argument("--routing-mode", choices=["partition_values", "commitlog_file"],
                   default=None,
                   help="R1 queue-index mode (event.order.guarantee analog); "
                        "default lets the apply's key shuffle route")
    r.add_argument("--n-queues", type=int, default=8)
    r.add_argument("--infer-log-schema", action="store_true",
                   help="read the log with schema inference (evolved cells / "
                        "table_kind classify-and-skip columns)")
    r.add_argument("--decode-binary", action="store_true",
                   help="log carries serialized payloads (S5 fidelity mode)")
    r.add_argument("--batch-mutations", action="store_true",
                   help="log carries atomic multi-change records (LOGGED batch analog)")
    r.add_argument("--tracing", action="store_true",
                   help="emit the per-event span relation alongside the changes export")
    r.add_argument("--on-error", choices=["raise", "isolate"], default="raise",
                   help="isolate = quarantine failing segments (error lineage, "
                        "CommitLogTransfer error folder) and keep draining")
    r.add_argument("--gc-grace-us", type=int, default=None,
                   help="enable tombstone GC: purge stored tombstones below "
                        "(max applied writetime - this grace); size it from the "
                        "producer's writetime-inversion bound")
    r.add_argument("--gc-every-batches", type=int, default=8)
    r.add_argument("--maintain-assembly", action="store_true",
                   help="maintain the per-conversation transcript view "
                        "(assembly table) inside the ingest loop")
    r.add_argument("--payload-format", choices=["json", "binary"], default="json",
                   help="payload codec for --decode-binary")

    s = sub.add_parser("stream", help="structured-streaming tail")
    s.add_argument("--log", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--n-buckets", type=int, default=64)
    s.add_argument("--continuous", action="store_true", help="keep tailing (default: drain available and stop)")

    rm = sub.add_parser("run-multi", help="drain a multi-table log (per-table targets)")
    rm.add_argument("--log", required=True)
    rm.add_argument("--target-root", required=True)
    rm.add_argument(
        "--tables", required=True,
        help=("JSON file: [{keyspace, table, partition_key, clustering_key, "
              "payload: [[name, cassandra-type], ...]}, ...]"),
    )
    rm.add_argument("--segments-per-batch", type=int, default=8)
    rm.add_argument("--n-buckets", type=int, default=64)
    rm.add_argument("--export-changes", action="store_true")
    rm.add_argument("--payload-format", choices=["json", "binary"], default="json")
    rm.add_argument("--batch-mutations", action="store_true",
                    help="log carries per-keyspace atomic multi-change records")

    sn = sub.add_parser("snapshot", help="bootstrap from an existing table")
    sn.add_argument("--source-table", required=True, help="parquet path of pre-existing transcripts")
    sn.add_argument("--target", required=True)
    sn.add_argument("--log", required=True, help="mutation-log path (for the shared offsets tables)")
    sn.add_argument("--mode", choices=["initial", "always", "never"], default="initial")
    sn.add_argument("--writetime", type=int, default=0)

    sh = sub.add_parser("show", help="print target state summary")
    sh.add_argument("--target", required=True)

    args = ap.parse_args()

    from debezium_connector_cassandra_spark.session import get_spark
    from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

    spark = get_spark(app_name=f"cdc-{args.cmd}")

    if args.cmd == "gen":
        from debezium_connector_cassandra_spark.sources.generator import (
            gen_mutation_log,
            write_mutation_log,
        )

        df = gen_mutation_log(
            spark,
            args.n_events,
            n_convs=args.n_convs or max(args.n_events // 100, 100),
            events_per_segment=args.events_per_segment,
            seed=args.seed,
            hot_fraction=args.hot_fraction,
            dup_fraction=args.dup_fraction,
            ttl_seconds=args.ttl_seconds,
        )
        if args.pack_batches:
            from debezium_connector_cassandra_spark.sources.generator import (
                pack_batches,
            )

            df = pack_batches(df, group_size=args.pack_batches)
        if args.encode_payload == "json":
            from debezium_connector_cassandra_spark.functions.decode import (
                encode_payload,
            )

            df = encode_payload(df)
        elif args.encode_payload == "binary":
            from debezium_connector_cassandra_spark.functions.binary_codec import (
                encode_payload_binary,
            )

            df = encode_payload_binary(df)
        write_mutation_log(df, args.log)
        print(json.dumps({"generated": args.n_events, "log": args.log}))
        return

    if args.cmd == "run":
        runner = CdcRunner(
            spark, args.log, args.target,
            segments_per_batch=args.segments_per_batch, n_buckets=args.n_buckets,
            export_changes=args.export_changes,
            tombstones_on_delete=not args.no_delete_tombstones,
            unpaired_range_markers=args.unpaired_range_markers,
            routing_mode=args.routing_mode,
            n_queues=args.n_queues,
            log_schema="infer" if (args.infer_log_schema or args.decode_binary) else None,
            decode_binary=args.decode_binary,
            payload_format=args.payload_format,
            batch_mutations=args.batch_mutations,
            tracing=args.tracing,
            gc_grace_us=args.gc_grace_us,
            gc_every_batches=args.gc_every_batches,
            maintain_assembly=args.maintain_assembly,
        )
        results = runner.run(max_batches=args.max_batches, on_error=args.on_error)
        print(json.dumps({"batches": results}))
        return

    if args.cmd == "run-multi":
        from debezium_connector_cassandra_spark.functions.types import TypeMapper
        from debezium_connector_cassandra_spark.model import TableSpec
        from debezium_connector_cassandra_spark.streaming.multi_table import (
            MultiTableRunner,
        )

        tm = TypeMapper()
        with open(args.tables) as f:
            specs = [
                TableSpec(
                    keyspace=t["keyspace"],
                    table=t["table"],
                    partition_key=t.get("partition_key", "conv_id"),
                    clustering_key=t.get("clustering_key", "turn_idx"),
                    payload=tm.payload_from_ddl([tuple(c) for c in t["payload"]]),
                )
                for t in json.load(f)
            ]
        runner = MultiTableRunner(
            spark, args.log, args.target_root, specs,
            segments_per_batch=args.segments_per_batch, n_buckets=args.n_buckets,
            export_changes=args.export_changes,
            payload_format=args.payload_format,
            batch_mutations=args.batch_mutations,
        )
        results = runner.run()
        print(json.dumps({
            "batches": len(results),
            "n_decoded": sum(r["n_decoded"] for r in results),
            "tables": sorted(runner.specs),
        }))
        return

    if args.cmd == "stream":
        from debezium_connector_cassandra_spark.streaming.stream import CdcStream

        runner = CdcRunner(spark, args.log, args.target, n_buckets=args.n_buckets)
        stream = CdcStream(runner)
        if args.continuous:
            q = stream.start(args.checkpoint, available_now=False)
            q.awaitTermination()
        else:
            stream.run_available(args.checkpoint)
        print(json.dumps({"streamed": True}))
        return

    if args.cmd == "snapshot":
        from debezium_connector_cassandra_spark.sources.snapshot import (
            SnapshotMode,
            SnapshotProcessor,
        )

        runner = CdcRunner(spark, args.log, args.target)
        src = spark.read.parquet(args.source_table)
        stats = SnapshotProcessor(runner).take(
            src, snapshot_writetime=args.writetime, mode=SnapshotMode(args.mode)
        )
        print(json.dumps({"snapshot": stats}))
        return

    if args.cmd == "show":
        from debezium_connector_cassandra_spark.plans.apply import CdcTarget

        target = CdcTarget.open(spark, args.target)
        df = target.read_transcripts()
        print(json.dumps({
            "rows": df.count(),
            "version": target.state.current_version(),
            "schema": [f.name for f in df.schema.fields],
        }))


if __name__ == "__main__":
    main()
