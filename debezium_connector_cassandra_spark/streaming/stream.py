"""Structured Streaming front-end: readStream over the commit-log directory,
foreachBatch into the same apply path as the batch runner.

This is the push-style dual of CdcRunner's pull loop — the closest Spark
analog of the reference's directory watcher (S1: blocks on ENTRY_CREATE,
AbstractDirectoryWatcher.java:24): Spark's file-stream source tracks newly
appearing files under ``segment_id=N/`` partitions, and each micro-batch
flows through ``apply_batch`` (idempotent, so Spark's at-least-once
foreachBatch contract still yields exactly-once table state — the same
argument as the batch runner's crash-replay story).

Use ``Trigger.AvailableNow`` (``available_now=True``) to drain everything
present and stop — the streaming equivalent of ``CdcRunner.run()``; omit it
for a continuously tailing daemon like the reference.

The engine's own ``_offsets`` table is still maintained (per-batch max
(segment, position)), so a job can switch between the streaming and batch
front-ends at any point: both resume from the same watermark.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import MUTATION_LOG_SCHEMA
from ..plans.apply import apply_batch
from .runner import CdcRunner


class CdcStream:
    def __init__(self, runner: CdcRunner, max_files_per_trigger: int | None = None):
        self.runner = runner
        self.max_files_per_trigger = max_files_per_trigger

    def _source(self) -> DataFrame:
        reader = self.runner.spark.readStream.schema(MUTATION_LOG_SCHEMA)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(self.runner.log_path)
        return df.select(*[f.name for f in MUTATION_LOG_SCHEMA.fields])

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Spark replays a failed micro-batch (at-least-once); apply_batch is
        # idempotent so the table state stays exactly-once. The engine
        # offsets table is updated after the state commit, as in the runner.
        offsets = self.runner.checkpointed_offsets()
        if offsets:
            from ..sources.log_scan import offset_filter

            batch_df = batch_df.where(offset_filter(offsets))
        seg_rows = (
            batch_df.groupBy("segment_id", "log_partition")
            .agg(F.count("*").alias("n"), F.max("position").alias("max_pos"))
            .collect()
        )
        if not seg_rows:
            return
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
        self.runner.lineage.append_small(
            [
                {
                    "segment_id": r["segment_id"],
                    "log_partition": r["log_partition"],
                    "status": "done",
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
