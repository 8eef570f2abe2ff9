"""Structured Streaming front-end: readStream over the commit-log directory,
foreachBatch into the same apply path as the batch runner.

This is the push-style dual of CdcRunner's pull loop — the closest Spark
analog of the reference's directory watcher (S1: blocks on ENTRY_CREATE,
AbstractDirectoryWatcher.java:24): Spark's file-stream source tracks newly
appearing files under ``segment_id=N/`` partitions, and each micro-batch
flows through ``apply_batch`` (idempotent, so Spark's at-least-once
foreachBatch contract still yields exactly-once table state — the same
argument as the batch runner's crash-replay story).

Ordering caveat (why there is NO offset pre-filter here): the file source
does not deliver files in (segment, position) order — with
``maxFilesPerTrigger`` a backfill can surface segment 10 before segment 2.
Filtering a micro-batch against a high-watermark would silently DROP rows
of late-delivered files (Spark's checkpoint marks them consumed; they are
never re-read) — permanent loss. Re-applying rows, by contrast, is free
(idempotent merge). So every delivered row is applied, and lineage is
recorded with status ``streamed`` — never ``done``, because a micro-batch
cannot know whether it saw ALL of a segment's files. The batch front-end
treats ``streamed`` segments as pending and re-applies them in full when
the job switches front-ends (a bounded, idempotent re-read — the price of
the file source's unordered delivery).

Use ``Trigger.AvailableNow`` (``available_now=True``) to drain everything
present and stop — the streaming equivalent of ``CdcRunner.run()``; omit it
for a continuously tailing daemon like the reference.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from ..model import MUTATION_LOG_SCHEMA
from ..plans.apply import apply_batch
from .runner import CdcRunner


class CdcStream:
    def __init__(self, runner: CdcRunner, max_files_per_trigger: int | None = None):
        if getattr(runner, "unpaired_range_markers", False):
            # marker pairing needs a segment's full row set in one pass; the
            # file source delivers arbitrary file subsets per micro-batch, so
            # a start/end pair can straddle two batches and silently drop —
            # refuse instead (use the batch front-end for marker logs)
            raise ValueError(
                "unpaired_range_markers is incompatible with the streaming "
                "front-end (bound markers can straddle micro-batches); use "
                "CdcRunner.run()"
            )
        self.runner = runner
        self.max_files_per_trigger = max_files_per_trigger

    def _source(self) -> DataFrame:
        # mirror the runner's log configuration: an explicitly configured
        # schema, or one inferred from the on-disk log (readStream requires
        # a schema up front), falling back to the canonical log shape
        schema = self.runner.log_schema
        if schema == "infer":
            schema = self.runner.spark.read.parquet(self.runner.log_path).schema
        elif schema is None:
            schema = MUTATION_LOG_SCHEMA
        reader = self.runner.spark.readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(self.runner.log_path)
        if getattr(self.runner, "batch_mutations", False):
            return df  # cells travel inside the changes array
        if "cells" not in df.columns and not self.runner.decode_binary:
            raise ValueError(
                "streaming source schema has no 'cells' column and decode_binary "
                "is off — a mis-schema'd read would materialize empty state"
            )
        return df

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Every delivered row is applied — no watermark pre-filter (see
        # module docstring: filtering against out-of-order file delivery
        # loses data; re-applying is a harmless idempotent no-op). Spark
        # replays a failed micro-batch (at-least-once); apply_batch keeps
        # the table state exactly-once.
        # offsets/lineage stats over the RAW batch (skipped unsupported rows
        # still advance offsets, matching the batch front-end's pre-scan)
        if getattr(self.runner, "batch_mutations", False):
            # logged batches explode before everything else, exactly like the
            # batch front-end (shared offset per batch — handleMutation:255-272)
            from ..functions.decode import explode_batch_mutations

            batch_df = explode_batch_mutations(batch_df)
        seg_rows = (
            batch_df.groupBy("segment_id", "log_partition")
            .agg(F.count("*").alias("n"), F.max("position").alias("max_pos"))
            .collect()
        )
        if not seg_rows:
            return
        if "table_kind" in batch_df.columns:
            # D3 classify-and-skip, same as the batch front-end
            from ..functions.decode import split_unsupported

            supported, _ = split_unsupported(batch_df)
            batch_df = supported.drop("table_kind")
        if self.runner.decode_binary:
            # same codec selection as the batch front-end (json | binary)
            batch_df = self.runner._decode_payload(batch_df)
        if self.runner.excluded_fields:
            from ..functions.decode import with_envelope

            batch_df = with_envelope(
                batch_df, excluded_fields=self.runner.excluded_fields
            ).select(*[c for c in batch_df.columns])
        apply_batch(self.runner.target, batch_df)
        now_ms = int(time.time() * 1000)
        best: dict[int, tuple[int, int]] = {}
        for r in seg_rows:
            cand = (r["segment_id"], r["max_pos"])
            if best.get(r["log_partition"], (-2, -2)) < cand:
                best[r["log_partition"]] = cand
        self.runner.offsets.append_small(
            [
                {"log_partition": lp, "segment_id": s, "position": p, "updated_at": now_ms}
                for lp, (s, p) in sorted(best.items())
            ]
        )
        for lp, cand in best.items():
            if self.runner._watermarks.get(lp, (-2, -2)) < cand:
                self.runner._watermarks[lp] = cand
        # 'streamed', never 'done': a micro-batch sees an arbitrary file
        # subset, so segment completeness is unknowable here
        self.runner.lineage.append_small(
            [
                {
                    "segment_id": r["segment_id"],
                    "log_partition": r["log_partition"],
                    "status": "streamed",
                    "n_events": r["n"],
                }
                for r in seg_rows
            ]
        )

    def start(self, checkpoint_dir: str, available_now: bool = True):
        writer = (
            self._source()
            .writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self, checkpoint_dir: str, timeout_sec: int = 600) -> None:
        """Drain all currently-available segments and stop (the streaming
        twin of CdcRunner.run())."""
        q = self.start(checkpoint_dir, available_now=True)
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
