"""Multi-table / multi-keyspace capture — the reference's KeyspaceTable +
SchemaHolder machinery re-expressed over one shared commit log.

Reference shape (core/.../KeyspaceTable.java, SchemaHolder.java:18-52,
scenario tests/.../MultipleTablesProcessingTest.java:27-106): one commit-log
stream interleaves mutations of every cdc-enabled table; each mutation is
decoded against ITS table's schema (SchemaHolder lookup) and routed to its
own topic/target, while offsets advance on the shared log.

Spark formulation:
- the log (model.MULTI_TABLE_LOG_SCHEMA) carries (keyspace, table) routing
  columns and a per-table serialized payload;
- one NARROW pre-scan per batch (grouped by fqtn, segment, log_partition)
  yields per-table offsets/lineage stats and per-table op-kind counts;
- per table: filter + `from_json` decode with that table's cells schema
  (whole-stage codegen — the multi-table analog of decode.decode_payload_jvm)
  then the standard apply_batch into that table's own CdcTarget;
- bookkeeping is PER TABLE (fqtn column): offsets are (fqtn, log_partition)
  watermarks, lineage rows are (fqtn, segment) grained. A segment is globally
  'done' when every table's apply committed — the runner marks per-table
  lineage as each apply lands, so a crash mid-batch resumes with only the
  un-committed tables replaying (idempotent merges make the replay a no-op
  for tables that already applied).

Snapshot table selection (S7) is the real anti-join the reference performs
(SnapshotProcessor.getTablesToSnapshot:154-161): cdc-enabled tables MINUS
already-snapshotted ones, as a DataFrame anti-join on the offsets table.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.table import LakeTable
from ..model import (
    GC_SCHEMA,
    METRICS_SCHEMA,
    MT_LINEAGE_SCHEMA,
    MT_OFFSETS_SCHEMA,
    MULTI_TABLE_LOG_SCHEMA,
    TableSpec,
)
from ..plans.apply import CdcTarget, apply_batch, gc_tombstones
from ..sources.log_scan import discover_segments

_KINDS = ("d", "p", "r")


def _prune_mt_offsets(df):
    """Keep only the per-(table, log_partition) watermark row (snapshot
    sentinel rows are each their own group's max)."""
    df = df.sort_values(["fqtn", "log_partition", "segment_id", "position", "updated_at"])
    return df.groupby(["fqtn", "log_partition"], as_index=False).tail(1).reset_index(drop=True)


def decode_table_payload(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Decode one table's serialized payload into typed cells (S5, per-table
    schema from the SchemaHolder analog). JVM `from_json` — codegen path."""
    return df.withColumn(
        "cells",
        F.from_json(
            F.decode(F.col("payload"), "utf-8"),
            spec.cells_type(),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ),
    ).drop("payload", "keyspace", "table")


def decode_table_payload_arrow(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Arrow pandas-UDF twin of decode_table_payload for ANY TableSpec —
    the vectorized-UDF decode the north star mandates, generalized from the
    fixed-schema `functions.decode.decode_payload_arrow`.

    Fully vectorized (the flattened-column technique the binary codec uses,
    functions/binary_codec.py): the whole Arrow batch's payloads join into
    ONE newline-delimited buffer parsed by a single ``pyarrow.json``
    C++ call against the spec's explicit cell schema — no per-row
    ``json.loads`` and no per-row Python dict assembly; each decoded cell
    column leaves the UDF as an Arrow StructArray-backed pandas series.
    Timestamp cell values parse as ISO8601 strings and convert with one
    vectorized ``pd.to_datetime`` per column. Tests assert bit-parity with
    the JVM path (test_arrow_decode_matches_jvm_per_spec)."""
    import io

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.json as pj
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.pandas.types import to_arrow_type

    names = [n for n, _ in spec.payload]
    ts_cols = {n for n, t in spec.payload if t.simpleString() == "timestamp"}
    from pyspark.sql import types as _T

    if any(isinstance(t, _T.MapType) for _, t in spec.payload):
        # Arrow's JSON parser has no map-type support; map cells ride the
        # default JVM from_json path (decode_table_payload), which is also
        # the production hot path
        raise ValueError(
            "decode_table_payload_arrow does not support map-typed cells; "
            "use decode_table_payload (the JVM from_json default)"
        )

    def _cell_schema(parse: bool) -> pa.Schema:
        """Arrow cell layout; with ``parse=True`` timestamp values stay
        strings (pd.to_datetime handles the offset suffix afterwards)."""
        fields = []
        for n, t in spec.payload:
            if n in ts_cols:
                # parse as ISO string, emit naive UTC micros (the JVM path's
                # semantics after session-tz normalization)
                vt = pa.string() if parse else pa.timestamp("us")
            else:
                vt = to_arrow_type(t)
            fields.append(
                pa.field(
                    n,
                    pa.struct(
                        [
                            pa.field("value", vt),
                            pa.field("deletion_ts", pa.int64()),
                            pa.field("set", pa.bool_()),
                        ]
                    ),
                )
            )
        return pa.schema(fields)

    parse_schema = _cell_schema(parse=True)
    out_types = {n: f.type for n, f in zip(names, _cell_schema(parse=False))}

    def _finalize(name: str, arr: pa.StructArray) -> pd.Series:
        value = arr.field("value")
        if name in ts_cols:
            ts = pd.to_datetime(value.to_pandas(), format="ISO8601", utc=True)
            value = pa.Array.from_pandas(
                ts.dt.tz_localize(None), type=pa.timestamp("us")
            )
        set_ = pc.fill_null(arr.field("set"), False)
        rebuilt = pa.StructArray.from_arrays(
            [value, arr.field("deletion_ts"), set_],
            fields=list(out_types[name]),
            mask=arr.is_null(),
        )
        # Spark's pandas serializer iterates struct rows expecting
        # dict-or-None; hand it Arrow's C-level dict materialization
        return rebuilt.to_pandas()

    @pandas_udf(spec.cells_type())
    def _decode(payload: pd.Series) -> pd.DataFrame:
        if len(payload) == 0:
            return pd.DataFrame({n: pd.Series([], dtype=object) for n in names})
        # one buffer, one C++ parse for the whole batch (NULL payload rows
        # parse as {} -> all-null cells; the outer mask nulls the struct)
        buf = b"\n".join(b"{}" if b is None else bytes(b) for b in payload)
        tab = pj.read_json(
            io.BytesIO(buf),
            parse_options=pj.ParseOptions(
                explicit_schema=parse_schema, unexpected_field_behavior="ignore"
            ),
        )
        return pd.DataFrame(
            {n: _finalize(n, tab.column(n).combine_chunks()) for n in names}
        )

    # a NULL payload (tombstone op) must decode to a NULL struct, matching
    # from_json(NULL); the UDF can only emit per-field nulls, so mask here
    return df.withColumn(
        "cells",
        F.when(F.col("payload").isNotNull(), _decode(F.col("payload"))),
    ).drop("payload", "keyspace", "table")


class MultiTableRunner:
    """CdcRunner generalized to N tables over one shared mutation log."""

    def __init__(
        self,
        spark: SparkSession,
        log_path: str,
        target_root: str,
        specs: list[TableSpec],
        segments_per_batch: int = 8,
        n_buckets: int = 8,
        table_changes: tuple = (),
        export_changes: bool = False,
        tombstones_on_delete: bool = True,
        payload_format: str = "json",
        batch_mutations: bool = False,
        gc_grace_us: int | None = None,
        gc_every_batches: int = 8,
        maintain_assembly: dict | None = None,
    ):
        """``table_changes``: DDL ledger of table lifecycle events —
        ``(effective_segment, "create", TableSpec)`` /
        ``(effective_segment, "drop", fqtn)`` — the reference's
        onTableCreated / onTableDropped callbacks
        (Cassandra4SchemaChangeListener.java:114-159 create, :162-217 drop),
        replayed against the discovered segment range before each drain."""
        self.spark = spark
        self.log_path = log_path
        self.target_root = target_root
        self.specs: dict[str, TableSpec] = {s.fqtn: s for s in specs}
        self.segments_per_batch = segments_per_batch
        self.n_buckets = n_buckets
        self.table_changes = list(table_changes)
        self.export_changes = export_changes
        self.tombstones_on_delete = tombstones_on_delete
        if payload_format not in ("json", "binary"):
            raise ValueError(f"unknown payload_format {payload_format!r}")
        # 'json' = per-table from_json (codegen); 'binary' = the per-TableSpec
        # binary layout + vectorized numpy decoder (functions/binary_codec.py)
        self.payload_format = payload_format
        # logged-batch mode: the log carries per-keyspace atomic multi-change
        # records whose changes may span TABLES (the reference Mutation
        # shape, handleMutation:255-272); _read_log explodes before anything
        self.batch_mutations = batch_mutations
        # maintained per-table transcript views: {fqtn: {"text": col,
        # "role": col|None}} — refreshed after every state commit with the
        # shared recompute-from-state step (operators.transcript.
        # refresh_assembly); tables absent from the dict have no view
        self.maintain_assembly: dict[str, dict] = dict(maintain_assembly or {})
        for fqtn, cfg in self.maintain_assembly.items():
            if fqtn not in self.specs:
                raise ValueError(f"maintain_assembly: unknown table {fqtn!r}")
            payload_cols = set(self.specs[fqtn].payload_dict)
            for key in ("text",) + (("role",) if cfg.get("role") else ()):
                if cfg.get(key) and cfg[key] not in payload_cols:
                    raise ValueError(
                        f"maintain_assembly[{fqtn!r}]: column {cfg[key]!r} "
                        f"not in payload {sorted(payload_cols)}"
                    )
        self.assemblies: dict[str, LakeTable] = {}
        self.targets: dict[str, CdcTarget] = {}
        for fqtn, spec in self.specs.items():
            self._ensure_target(fqtn, spec)
        # tombstone GC (gc_grace analog, same contract as CdcRunner): horizon
        # = max applied writetime - grace, swept across EVERY table's store
        if gc_grace_us is not None and gc_grace_us < 0:
            raise ValueError("gc_grace_us must be >= 0")
        self.gc_grace_us = gc_grace_us
        self.gc_every_batches = max(int(gc_every_batches), 1)
        self._max_writetime: int | None = None
        self.offsets = self._bookkeeping("_offsets", MT_OFFSETS_SCHEMA)
        self.lineage = self._bookkeeping("_lineage", MT_LINEAGE_SCHEMA)
        self.metrics = self._bookkeeping("_metrics", METRICS_SCHEMA)
        self.gc_log = self._bookkeeping("_gc", GC_SCHEMA) if gc_grace_us is not None else None
        self.offsets.compaction_transform = _prune_mt_offsets
        self._done = self._load_done()
        from ..sources.snapshot import SnapshotMetrics

        self.metrics_snapshot = SnapshotMetrics()

    def snapshot_metrics(self) -> dict:
        """Snapshot-context gauge values (CassandraSnapshotMetrics.java:26-110)
        — tables captured/remaining, per-table rows scanned, duration."""
        return self.metrics_snapshot.gauges()

    def _ensure_target(self, fqtn: str, spec: TableSpec) -> None:
        path = f"{self.target_root}/{fqtn}"
        if LakeTable.exists(f"{path}/state"):
            self.targets[fqtn] = CdcTarget.open(self.spark, path)
        else:
            self.targets[fqtn] = CdcTarget.create(
                self.spark, path, n_buckets=self.n_buckets, payload=spec.payload_dict
            )
        if self.export_changes:
            from ..lake.changes import ChangesExport

            self.changes_tables = getattr(self, "changes_tables", {})
            self.changes_tables[fqtn] = ChangesExport(self.spark, f"{path}/changes")
        if fqtn in self.maintain_assembly:
            from ..operators.transcript import ASSEMBLY_SCHEMA

            apath = f"{path}/assembly"
            if LakeTable.exists(apath):
                self.assemblies[fqtn] = LakeTable(self.spark, apath)
            else:
                # share the table's state bucket function (pruned refreshes)
                self.assemblies[fqtn] = LakeTable.create(
                    self.spark,
                    apath,
                    ASSEMBLY_SCHEMA,
                    "conv_id",
                    self.targets[fqtn].state.manifest()["n_buckets"],
                )

    def apply_table_changes(self, up_to_segment: int, discovered: list[int]) -> None:
        """Replay table create/drop DDL effective at or before
        ``up_to_segment``. Idempotent: a created table that already exists /
        a dropped table already absent are no-ops (crash-safe replay).

        CREATE registers the spec and marks every discovered segment BEFORE
        the effective segment as done for that table (capture starts at
        creation — pre-existing data arrives via snapshot, not the log).
        DROP marks every discovered segment AT/AFTER the effective segment
        as done: capture stops at the drop point while segments preceding it
        still drain normally; materialized state is retained (the reference
        likewise stops emitting but deletes nothing).
        """
        for eff, action, arg in self.table_changes:
            if eff > up_to_segment:
                continue
            if action == "create":
                spec = arg
                if spec.fqtn not in self.specs:
                    self.specs[spec.fqtn] = spec
                    self._ensure_target(spec.fqtn, spec)
                    self._done.setdefault(spec.fqtn, set()).update(
                        s for s in discovered if s < eff
                    )
            elif action == "drop":
                if arg in self.specs:
                    self._done.setdefault(arg, set()).update(
                        s for s in discovered if s >= eff
                    )
            else:
                raise ValueError(f"unknown table change action: {action!r}")

    def _bookkeeping(self, name: str, schema) -> LakeTable:
        path = f"{self.target_root}/{name}"
        if LakeTable.exists(path):
            return LakeTable(self.spark, path)
        return LakeTable.create(
            self.spark, path, schema, key_col=schema.fields[0].name, n_buckets=1
        )

    # -- recovered checkpoint state ------------------------------------------
    def _load_done(self) -> dict[str, set[int]]:
        """fqtn -> set of segments that table has fully applied."""
        done: dict[str, set[int]] = {f: set() for f in self.specs}
        if self.lineage.is_empty():
            return done
        rows = (
            self.lineage.read()
            .where(F.col("status") == "done")
            .select("fqtn", "segment_id")
            .distinct()
            .collect()
        )
        for r in rows:
            done.setdefault(r["fqtn"], set()).add(r["segment_id"])
        return done

    def checkpointed_offsets(self) -> dict[tuple[str, int], tuple[int, int]]:
        """(fqtn, log_partition) -> (segment_id, position) high-watermark."""
        if self.offsets.is_empty():
            return {}
        rows = (
            self.offsets.read()
            .groupBy("fqtn", "log_partition")
            .agg(F.max(F.struct("segment_id", "position")).alias("w"))
            .select("fqtn", "log_partition", "w.segment_id", "w.position")
            .collect()
        )
        return {
            (r["fqtn"], r["log_partition"]): (r["segment_id"], r["position"])
            for r in rows
        }

    # -- planning -------------------------------------------------------------
    def pending_segments(self) -> list[int]:
        """Segments not yet done for EVERY (currently captured) table."""
        all_segments = discover_segments(self.log_path)
        if self.table_changes and all_segments:
            self.apply_table_changes(max(all_segments), all_segments)
        return [
            s
            for s in all_segments
            if any(s not in self._done.setdefault(f, set()) for f in self.specs)
        ]

    def _read_log(self, segment_ids: list[int]) -> DataFrame:
        if self.batch_mutations:
            from ..functions.decode import explode_mt_batch_mutations
            from ..model import MT_BATCH_LOG_SCHEMA

            raw = (
                self.spark.read.schema(MT_BATCH_LOG_SCHEMA)
                .parquet(self.log_path)
                .where(F.col("segment_id").isin(*[int(s) for s in segment_ids]))
            )
            return explode_mt_batch_mutations(raw)
        return (
            self.spark.read.schema(MULTI_TABLE_LOG_SCHEMA)
            .parquet(self.log_path)
            .where(F.col("segment_id").isin(*[int(s) for s in segment_ids]))
        )

    # -- one batch --------------------------------------------------------------
    def run_batch(self, segment_ids: list[int]) -> dict:
        t0 = time.time()
        batch_id = int(t0 * 1000)
        log = self._read_log(segment_ids)

        # ONE narrow pre-scan: per (table, segment, log_partition) counts,
        # max positions, and per-kind sums — offsets + lineage + apply stats
        seg_rows = (
            log.groupBy("keyspace", "table", "segment_id", "log_partition")
            .agg(
                F.count("*").alias("n"),
                F.max("position").alias("max_pos"),
                F.max("writetime").alias("max_wt"),
                *[
                    F.sum((F.col("op") == k).cast("long")).alias(f"n_{k}")
                    for k in _KINDS
                ],
            )
            .collect()
        )
        # candidate applied-writetime high watermark (tombstone-GC horizon
        # input) — folded into self._max_writetime only after EVERY
        # per-table apply in this batch commits, so a mid-loop failure can
        # never leave the horizon ahead of not-yet-applied events
        batch_max_wt = max(
            (r["max_wt"] for r in seg_rows if r["max_wt"] is not None),
            default=None,
        )
        by_table: dict[str, list] = {f: [] for f in self.specs}
        for r in seg_rows:
            fqtn = f"{r['keyspace']}.{r['table']}"
            if fqtn in by_table:
                by_table[fqtn].append(r)

        results = {}
        n_applied = 0
        now_ms = int(time.time() * 1000)
        for fqtn, spec in self.specs.items():
            done = self._done.setdefault(fqtn, set())
            pending = [s for s in segment_ids if s not in done]
            if not pending:
                continue
            pending_set = set(pending)
            rows = [r for r in by_table[fqtn] if r["segment_id"] in pending_set]
            stats = {"n": sum(r["n"] for r in rows)}
            stats.update({k: sum(r[f"n_{k}"] for r in rows) for k in _KINDS})
            if stats["n"]:
                sub = log.where(
                    (F.col("keyspace") == spec.keyspace)
                    & (F.col("table") == spec.table)
                    & F.col("segment_id").isin(*[int(s) for s in pending])
                )
                if self.payload_format == "binary":
                    from ..functions.binary_codec import (
                        decode_table_payload_binary,
                    )

                    sub = decode_table_payload_binary(sub, spec)
                else:
                    sub = decode_table_payload(sub, spec)
                results[fqtn] = apply_batch(self.targets[fqtn], sub, stats=stats)
                self._refresh_assembly(fqtn, sub)
                if self.export_changes:
                    # MT batches consume whole segments, so the decoded slice
                    # is per-segment complete — export directly from it
                    from ..lake.changes import envelope_rows

                    self.changes_tables[fqtn].write_segments(
                        envelope_rows(
                            sub,
                            tombstones_on_delete=self.tombstones_on_delete,
                            keyspace=spec.keyspace,
                            table=spec.table,
                        ),
                        pending,
                    )
            else:
                results[fqtn] = {"n_events": 0}
            # per-table offsets: max (segment, position) per log partition
            best: dict[int, tuple[int, int]] = {}
            for r in rows:
                cand = (r["segment_id"], r["max_pos"])
                if best.get(r["log_partition"], (-2, -2)) < cand:
                    best[r["log_partition"]] = cand
            offset_rows = [
                {
                    "fqtn": fqtn,
                    "log_partition": lp,
                    "segment_id": seg,
                    "position": pos,
                    "updated_at": now_ms,
                }
                for lp, (seg, pos) in sorted(best.items())
            ]
            lineage_rows = []
            seen = {}
            for r in rows:
                seen.setdefault(r["segment_id"], []).append(r)
            for seg in pending:
                for r in seen.get(seg, []):
                    lineage_rows.append(
                        {
                            "fqtn": fqtn,
                            "segment_id": r["segment_id"],
                            "log_partition": r["log_partition"],
                            "status": "done",
                            "n_events": r["n"],
                        }
                    )
                if seg not in seen:  # zero rows for this table in the segment
                    lineage_rows.append(
                        {
                            "fqtn": fqtn,
                            "segment_id": int(seg),
                            "log_partition": -1,
                            "status": "done",
                            "n_events": 0,
                        }
                    )
                self._done[fqtn].add(seg)
            # durable per-table bookkeeping lands right after THIS table's
            # apply commits — a crash mid-batch resumes with only the
            # not-yet-committed tables replaying (idempotent merges make any
            # overlap a no-op). This is the "marks per-table lineage as each
            # apply lands" contract from the module docstring.
            self.offsets.append_small(offset_rows)
            self.lineage.append_small(lineage_rows)
            n_applied += stats["n"]

        # every per-table apply committed — the batch's writetimes are now
        # APPLIED and may advance the GC horizon
        if batch_max_wt is not None and (
            self._max_writetime is None or batch_max_wt > self._max_writetime
        ):
            self._max_writetime = batch_max_wt

        n_decoded = sum(r["n"] for r in seg_rows)
        wall_ms = int((time.time() - t0) * 1000)
        self.metrics.append_small(
            [
                {
                    "batch_id": batch_id,
                    "segment_lo": min(segment_ids),
                    "segment_hi": max(segment_ids),
                    "n_decoded": n_decoded,
                    "n_deduped": n_applied,
                    "n_applied": n_applied,
                    "n_skipped": 0,
                    "wall_ms": wall_ms,
                }
            ]
        )
        return {
            "batch_id": batch_id,
            "segments": segment_ids,
            "n_decoded": n_decoded,
            "wall_ms": wall_ms,
            "tables": results,
        }

    # -- tombstone GC (gc_grace, swept across every table) -------------------
    def gc(self) -> dict:
        """Purge each table's stored tombstones below (max applied writetime
        - gc_grace_us); one ``_gc`` audit row per table per invocation. Same
        safety argument as CdcRunner.gc()."""
        if self.gc_grace_us is None:
            raise ValueError("tombstone GC is disabled; pass gc_grace_us to enable")
        if self._max_writetime is None:
            return {"n_purged": 0, "tables": {}}
        horizon = int(self._max_writetime) - int(self.gc_grace_us)
        batch_id = int(time.time() * 1000)
        per_table, audit_rows, total = {}, [], 0
        for fqtn, target in self.targets.items():
            res = gc_tombstones(target, horizon)
            per_table[fqtn] = res["n_purged"]
            total += res["n_purged"]
            audit_rows.append(
                {
                    "batch_id": batch_id,
                    "fqtn": fqtn,
                    "horizon_wt": horizon,
                    "n_purged": res["n_purged"],
                    "n_kept": res["n_kept"],
                }
            )
        self.gc_log.append_small(audit_rows)
        return {"n_purged": total, "horizon_wt": horizon, "tables": per_table}

    # -- the loop -----------------------------------------------------------
    def run(self, max_batches: int | None = None) -> list[dict]:
        results = []
        n = 0
        while True:
            pending = self.pending_segments()
            if not pending or (max_batches is not None and n >= max_batches):
                break
            results.append(self.run_batch(pending[: self.segments_per_batch]))
            n += 1
            if self.gc_grace_us is not None and n % self.gc_every_batches == 0:
                self.gc()
        return results

    # -- user-facing reads ----------------------------------------------------
    def _refresh_assembly(self, fqtn: str, batch_keys: DataFrame) -> None:
        """Maintained-view step (no-op for tables without a view)."""
        if fqtn not in self.assemblies:
            return
        from ..operators.transcript import refresh_assembly

        cfg = self.maintain_assembly[fqtn]
        refresh_assembly(
            self.assemblies[fqtn],
            self.targets[fqtn],
            batch_keys,
            role_col=cfg.get("role"),
            text_col=cfg["text"],
        )

    def read_assembly(self, fqtn: str) -> DataFrame:
        """The maintained per-conversation view of one table."""
        if fqtn not in self.assemblies:
            raise ValueError(f"no maintained assembly for {fqtn!r}")
        return self.assemblies[fqtn].read().select(
            "conv_id", "n_turns", "last_turn", "total_chars", "transcript"
        )

    def read_table(self, fqtn: str) -> DataFrame:
        """Payload view of one table with its LOGICAL key column names."""
        spec = self.specs[fqtn]
        return spec.denormalize(self.targets[fqtn].read_transcripts())

    # -- snapshot selection (S7, the real anti-join) ---------------------------
    def tables_to_snapshot(self) -> list[str]:
        """cdc-enabled tables MINUS already-snapshotted — as a DataFrame
        anti-join against the snapshot completion markers in _offsets
        (reference getTablesToSnapshot:154-161)."""
        enabled = self.spark.createDataFrame(
            [(f,) for f in self.specs], "fqtn string"
        )
        if self.offsets.is_empty():
            return sorted(r["fqtn"] for r in enabled.collect())
        snapped = self.offsets.read().where(F.col("log_partition") == -1).select("fqtn")
        remaining = enabled.join(snapped, "fqtn", "left_anti")
        return sorted(r["fqtn"] for r in remaining.collect())

    def snapshot(self, sources: dict[str, DataFrame], snapshot_writetime: int) -> dict:
        """Bootstrap-snapshot every not-yet-snapshotted table (S6+S7).

        ``sources``: fqtn -> source DataFrame with the table's LOGICAL column
        names. Completion markers are all-or-nothing per table (sentinel
        log_partition=-1 rows, reference OffsetPosition.java:20-21,43-45)."""
        from ..sources.snapshot import snapshot_to_mutations

        out = {}
        now_ms = int(time.time() * 1000)
        todo = [f for f in self.tables_to_snapshot() if f in sources]
        # gauge lifecycle mirrors SnapshotProcessor.java:129-141 (+ per-table
        # rowsScanned :268-277)
        self.metrics_snapshot.set_table_count(len(todo))
        if todo:
            self.metrics_snapshot.start_snapshot()
        try:
            for fqtn in todo:
                src = self.specs[fqtn].normalize(sources[fqtn])
                mutations = snapshot_to_mutations(src, snapshot_writetime)
                out[fqtn] = apply_batch(self.targets[fqtn], mutations)
                self._refresh_assembly(fqtn, mutations)
                self.metrics_snapshot.set_rows_scanned(
                    fqtn, out[fqtn].get("n_events", 0)
                )
                self.metrics_snapshot.complete_table()
                self.offsets.append_small(
                    [
                        {
                            "fqtn": fqtn,
                            "log_partition": -1,
                            "segment_id": -1,
                            "position": -1,
                            "updated_at": now_ms,
                        }
                    ]
                )
        except Exception:
            self.metrics_snapshot.abort_snapshot()
            raise
        if todo:
            self.metrics_snapshot.stop_snapshot()
        return out


class MultiTableStream:
    """Structured-Streaming front-end over a MULTI-TABLE commit log — the
    reference's primary operating shape (streaming AND multi-table at once:
    one CommitLogProcessor thread feeding per-table decode via SchemaHolder,
    MultipleTablesProcessingTest.java:27-106). The multi-table twin of
    stream.CdcStream: readStream over the shared log directory, and inside
    each foreachBatch a per-table filter + decode + apply, with PER-TABLE
    offsets and ``streamed`` lineage.

    Same ordering contract as CdcStream (see its module docstring): the file
    source delivers arbitrary file subsets per micro-batch, so no watermark
    pre-filter (re-applying is an idempotent no-op; filtering loses late
    files), and lineage is ``streamed`` — never ``done`` — because a
    micro-batch cannot prove segment completeness. The batch front-end
    treats ``streamed`` segments as pending and re-applies them in full when
    the job switches front-ends (bounded, idempotent).

    Table lifecycle DDL (table_changes) is a batch-front-end feature: the
    create/drop ledger needs the discovered segment range, which a streaming
    micro-batch does not see — a runner configured with table_changes is
    refused here.
    """

    def __init__(self, runner: MultiTableRunner, max_files_per_trigger: int | None = None):
        if runner.table_changes:
            raise ValueError(
                "table_changes (create/drop DDL ledger) requires the batch "
                "front-end — a streaming micro-batch cannot see the "
                "discovered segment range; use MultiTableRunner.run()"
            )
        self.runner = runner
        self.max_files_per_trigger = max_files_per_trigger

    def _source(self) -> DataFrame:
        if self.runner.batch_mutations:
            from ..model import MT_BATCH_LOG_SCHEMA

            schema = MT_BATCH_LOG_SCHEMA
        else:
            schema = MULTI_TABLE_LOG_SCHEMA
        reader = self.runner.spark.readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.parquet(self.runner.log_path)

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        r = self.runner
        if r.batch_mutations:
            # same explode-before-everything the batch front-end does
            from ..functions.decode import explode_mt_batch_mutations

            batch_df = explode_mt_batch_mutations(batch_df)
        seg_rows = (
            batch_df.groupBy("keyspace", "table", "segment_id", "log_partition")
            .agg(F.count("*").alias("n"), F.max("position").alias("max_pos"))
            .collect()
        )
        if not seg_rows:
            return
        now_ms = int(_time.time() * 1000)
        by_table: dict[str, list] = {}
        for row in seg_rows:
            by_table.setdefault(f"{row['keyspace']}.{row['table']}", []).append(row)
        for fqtn, spec in r.specs.items():
            rows = by_table.get(fqtn)
            if not rows:
                continue
            sub = batch_df.where(
                (F.col("keyspace") == spec.keyspace)
                & (F.col("table") == spec.table)
            )
            if r.payload_format == "binary":
                from ..functions.binary_codec import decode_table_payload_binary

                sub = decode_table_payload_binary(sub, spec)
            else:
                sub = decode_table_payload(sub, spec)
            apply_batch(r.targets[fqtn], sub)
            r._refresh_assembly(fqtn, sub)
            best: dict[int, tuple[int, int]] = {}
            for row in rows:
                cand = (row["segment_id"], row["max_pos"])
                if best.get(row["log_partition"], (-2, -2)) < cand:
                    best[row["log_partition"]] = cand
            r.offsets.append_small(
                [
                    {
                        "fqtn": fqtn,
                        "log_partition": lp,
                        "segment_id": seg,
                        "position": pos,
                        "updated_at": now_ms,
                    }
                    for lp, (seg, pos) in sorted(best.items())
                ]
            )
            r.lineage.append_small(
                [
                    {
                        "fqtn": fqtn,
                        "segment_id": row["segment_id"],
                        "log_partition": row["log_partition"],
                        "status": "streamed",
                        "n_events": row["n"],
                    }
                    for row in rows
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
        """Drain all currently-available segments and stop — the streaming
        twin of MultiTableRunner.run()."""
        q = self.start(checkpoint_dir, available_now=True)
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
