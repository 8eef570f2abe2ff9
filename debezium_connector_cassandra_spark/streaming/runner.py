"""The micro-batch driver loop — Spark lifecycle replacing SURVEY §3.1.

One iteration:
  read _offsets -> discover unprocessed (segment, position) ranges ->
  scan log slice (partition-pruned, position-pushdown) -> decode/envelope ->
  apply_batch (dedup -> LWW reduce -> tombstones -> COW merge) ->
  append _offsets + _lineage + _metrics.

Exactly-once: state commit happens inside apply_batch BEFORE offsets are
appended; a crash between the two replays the batch, which is a no-op
because the merge is idempotent (strict writetime comparisons). This is the
same at-least-once + idempotent-replay contract as the reference
(FileOffsetWriter monotonic offsets + offset skip-check + reprocess bypass,
R5/R8) — but here the *table state* is exactly-once by construction.

Backpressure (R2 bounded queue analog) = ``segments_per_batch``: the batch
sizing knob bounding memory/shuffle per iteration.

Error handling (R3/R7/R8): a failing segment batch is recorded in _lineage
with status 'error' (archive-to-error-folder analog); ``reprocess`` replays
named segments with the offset check bypassed (reference
reprocessingCommitLogs set, CommitLogProcessor.java:113-117).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.table import LakeTable
from ..model import LINEAGE_SCHEMA, METRICS_SCHEMA, OFFSETS_SCHEMA
from ..plans.apply import CdcTarget, apply_batch
from ..sources.generator import read_mutation_log
from ..sources.log_scan import discover_segments, offset_filter
from ..functions.decode import with_envelope


class CdcRunner:
    def __init__(
        self,
        spark: SparkSession,
        log_path: str,
        target_path: str,
        segments_per_batch: int = 8,
        n_buckets: int = 16,
        excluded_fields: tuple[str, ...] = (),
        schema_changes: tuple = (),
        log_schema=None,
        decode_binary: bool = False,
    ):
        self.spark = spark
        self.log_path = log_path
        self.target_path = target_path
        self.segments_per_batch = segments_per_batch
        self.excluded_fields = excluded_fields
        self.schema_changes = list(schema_changes)
        self.log_schema = log_schema
        self.decode_binary = decode_binary
        if LakeTable.exists(f"{target_path}/state"):
            self.target = CdcTarget.open(spark, target_path)
        else:
            self.target = CdcTarget.create(spark, target_path, n_buckets=n_buckets)
        self.offsets = self._bookkeeping("_offsets", OFFSETS_SCHEMA)
        self.lineage = self._bookkeeping("_lineage", LINEAGE_SCHEMA)
        self.metrics = self._bookkeeping("_metrics", METRICS_SCHEMA)

    def _bookkeeping(self, name: str, schema) -> LakeTable:
        path = f"{self.target_path}/{name}"
        if LakeTable.exists(path):
            return LakeTable(self.spark, path)
        return LakeTable.create(self.spark, path, schema, key_col=schema.fields[0].name, n_buckets=1)

    # -- checkpoint state ---------------------------------------------------
    def checkpointed_offsets(self) -> dict[int, tuple[int, int]]:
        """log_partition -> (segment_id, position) high-watermark (R5)."""
        if self.offsets.is_empty():
            return {}
        rows = (
            self.offsets.read()
            .groupBy("log_partition")
            .agg(F.max(F.struct("segment_id", "position")).alias("w"))
            .select("log_partition", "w.segment_id", "w.position")
            .collect()
        )
        return {r["log_partition"]: (r["segment_id"], r["position"]) for r in rows}

    def done_segments(self) -> set[int]:
        if self.lineage.is_empty():
            return set()
        rows = (
            self.lineage.read()
            .where(F.col("status") == "done")
            .select("segment_id")
            .distinct()
            .collect()
        )
        return {r["segment_id"] for r in rows}

    # -- planning -----------------------------------------------------------
    def pending_segments(self) -> list[int]:
        all_segments = discover_segments(self.log_path)
        done = self.done_segments()
        return [s for s in all_segments if s not in done]

    # -- one batch ----------------------------------------------------------
    def run_batch(
        self,
        segment_ids: list[int],
        reprocess: bool = False,
        position_limit: int | None = None,
    ) -> dict:
        """Process the given segments as one batch. ``position_limit``
        truncates the LAST segment at a byte position — the live-segment
        incremental-tail mode (S4): a later batch resumes past the
        checkpointed position."""
        t0 = time.time()
        batch_id = int(t0 * 1000)
        if self.schema_changes:
            # R9: replay DDL onto the lake BEFORE applying batches that carry
            # the new shape (SchemaChangeListener scenario)
            from .schema_evolution import replay_schema_changes

            replay_schema_changes(self.target, self.schema_changes, max(segment_ids))
        log = read_mutation_log(self.spark, self.log_path, schema=self.log_schema).where(
            F.col("segment_id").isin(*[int(s) for s in segment_ids])
        )
        offsets = self.checkpointed_offsets()
        if offsets:
            log = log.where(
                offset_filter(offsets, set(segment_ids) if reprocess else None)
            )
        if position_limit is not None:
            last = max(segment_ids)
            log = log.where(
                (F.col("segment_id") < last) | (F.col("position") <= position_limit)
            )
        if self.decode_binary:
            # S5: the log carries serialized payload bytes (the commit-log
            # fidelity mode) — decode into typed cells before applying
            from ..functions.decode import decode_payload_jvm

            log = decode_payload_jvm(log)
        if self.excluded_fields:
            # D10 field-exclude rewrites cells; the full envelope (ts_ms,
            # source, ...) is NOT built on the apply hot path — it exists for
            # the export surface (with_envelope), the apply needs only cells
            log = with_envelope(log, excluded_fields=self.excluded_fields).select(
                *[c for c in log.columns]
            )

        # one pruned-scan job feeding offsets, lineage AND the decode count
        seg_rows = (
            log.groupBy("segment_id", "log_partition")
            .agg(F.count("*").alias("n"), F.max("position").alias("max_pos"))
            .collect()
        )
        n_decoded = sum(r["n"] for r in seg_rows)

        stats = apply_batch(self.target, log)

        now_ms = int(time.time() * 1000)
        # offsets: per log partition, the max (segment, position) this batch
        # has durably applied (idx-watermark analog, S4)
        best: dict[int, tuple[int, int]] = {}
        for r in seg_rows:
            cur = best.get(r["log_partition"])
            cand = (r["segment_id"], r["max_pos"])
            if cur is None or cand > cur:
                best[r["log_partition"]] = cand
        self.offsets.append_small(
            [
                {
                    "log_partition": lp,
                    "segment_id": seg,
                    "position": pos,
                    "updated_at": now_ms,
                }
                for lp, (seg, pos) in sorted(best.items())
            ]
        )
        # lineage: per-segment completion (EOF/archive analog, R3/R7); a
        # position-limited tail leaves the last segment un-finalized
        open_segment = max(segment_ids) if position_limit is not None else None
        self.lineage.append_small(
            [
                {
                    "segment_id": r["segment_id"],
                    "log_partition": r["log_partition"],
                    "status": "reprocess" if reprocess else (
                        "open" if r["segment_id"] == open_segment else "done"
                    ),
                    "n_events": r["n"],
                }
                for r in seg_rows
            ]
        )
        wall_ms = int((time.time() - t0) * 1000)
        self.metrics.append_small(
            [
                {
                    "batch_id": batch_id,
                    "segment_lo": min(segment_ids),
                    "segment_hi": max(segment_ids),
                    "n_decoded": n_decoded,
                    "n_deduped": stats["n_events"],
                    "n_applied": stats["n_events"],
                    "wall_ms": wall_ms,
                }
            ]
        )
        return {
            "batch_id": batch_id,
            "segments": segment_ids,
            "n_decoded": n_decoded,
            "wall_ms": wall_ms,
            **stats,
        }

    # -- the loop -----------------------------------------------------------
    def run(self, max_batches: int | None = None) -> list[dict]:
        """Drain pending segments in segment order, segments_per_batch at a
        time (Trigger.AvailableNow-style)."""
        results = []
        n = 0
        while True:
            pending = self.pending_segments()
            if not pending or (max_batches is not None and n >= max_batches):
                break
            batch = pending[: self.segments_per_batch]
            results.append(self.run_batch(batch))
            n += 1
        return results

    def reprocess(self, segment_ids: list[int]) -> dict:
        """R8 error-segment reprocessing: replay named segments bypassing the
        offset skip-check; state is unchanged on a true replay because the
        merge is idempotent."""
        return self.run_batch(segment_ids, reprocess=True)
