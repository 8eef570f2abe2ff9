"""The per-batch apply plan — Spark lifecycle replacing SURVEY §3's three
Java entry points:

    read log slice -> decode/envelope -> dedup -> tombstone union ->
    per-key cell-LWW reduce -> finalize vs tombstones ->
    kill + merge target (COW, touched buckets only) -> persist new tombstones

Exactly-once contract (north_rule): the merge is idempotent (cell writetimes
are compared strictly, so re-applying an already-applied batch is a no-op),
therefore committing state BEFORE offsets is crash-safe: a failure between
the two replays the batch harmlessly (reference reaches the same property via
at-least-once + offset skip-check, handleMutation:259-263).

Scale shape of one batch (the plan .explain should show):
- parquet scan of only the new segments (partition pruning on segment_id) and
  positions (predicate pushdown on position)
- one shuffle for the per-key reduction (hash agg with map-side combine — hot
  conv_ids collapse before the exchange)
- tombstone relations pre-aggregated, joined broadcast (AQE decides at
  runtime from actual size)
- target read restricted to touched buckets; COW write of those buckets only
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..lake.table import LakeTable
from ..model import STATE_SCHEMA, state_schema_for
from ..operators.dedup import dedup_events
from ..operators.lww import (
    drop_invisible,
    finalize_state,
    kill_state,
    merge_states,
    reduce_events,
)
from ..operators.tombstones import (
    TombstoneSet,
    extract_tombstones,
    rows_to_tombstones,
    tomb_wt_for_keys,
    tombstones_to_rows,
    union_tombstones,
)

TOMBSTONE_STORE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("lo", T.IntegerType(), True),
        T.StructField("hi", T.IntegerType(), True),
        T.StructField("lo_incl", T.BooleanType(), False),
        T.StructField("hi_incl", T.BooleanType(), False),
        T.StructField("wt", T.LongType(), False),
    ]
)


@dataclass
class CdcTarget:
    """The materialized target: state table + persistent tombstone store
    (Cassandra keeps tombstones until gc_grace for exactly this reason: an
    out-of-order write arriving later must still lose to an earlier delete
    with a higher writetime)."""

    state: LakeTable
    tombstones: LakeTable

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        n_buckets: int = 16,
        payload: dict | None = None,
    ) -> "CdcTarget":
        schema = state_schema_for(payload) if payload else STATE_SCHEMA
        state = LakeTable.create(spark, f"{path}/state", schema, "conv_id", n_buckets)
        tombs = LakeTable.create(spark, f"{path}/tombstones", TOMBSTONE_STORE_SCHEMA, "conv_id", max(n_buckets // 4, 1))
        return cls(state=state, tombstones=tombs)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "CdcTarget":
        return cls(
            state=LakeTable(spark, f"{path}/state"),
            tombstones=LakeTable(spark, f"{path}/tombstones"),
        )

    def add_payload_column(self, name: str, dtype: T.DataType) -> int:
        """R9 schema evolution: replayed BEFORE applying batches carrying the
        new column (reference Cassandra4SchemaChangeListener.onTableUpdated:
        220-260 -> SchemaHolder update). Metadata-only lake commit: the
        payload column and its _wt_ twin are added; old files read NULLs."""
        self.state.add_column(name, dtype)
        return self.state.add_column(f"_wt_{name}", T.LongType())

    def alter_payload_column(self, name: str, dtype: T.DataType) -> int:
        """R9 ALTER TYPE (onTableUpdated with a type change): metadata-only
        widening of a payload column; the _wt_ twin is unaffected."""
        return self.state.alter_column_type(name, dtype)

    def read_transcripts(
        self, version: int | None = None, buckets: list[int] | None = None
    ) -> DataFrame:
        """User-facing view: payload columns only, reconciliation metadata
        dropped (per-row invariant surface: per-turn text equality under
        stable (conv_id, turn_idx) ordering). ``buckets`` prunes the read
        to the given state buckets (file-level pruning, no scan)."""
        cols = [
            f.name
            for f in self.state.schema(version).fields
            if not f.name.startswith("_")
        ]
        return self.state.read(buckets=buckets, version=version).select(*cols)


def apply_batch(
    target: CdcTarget,
    batch: DataFrame,
    strict_dedup: bool = False,
    stats: dict | None = None,
) -> dict:
    """Apply one decoded mutation batch to the target. Returns metrics.

    ``stats`` — optional precomputed ``{"n": total, "d": ..., "p": ...,
    "r": ...}`` event counts (the runner folds them into its narrow
    offsets/lineage pre-scan, so the batch is scanned exactly once at full
    width — by the reduction). When absent, a single column-pruned counting
    job computes them here.

    Steps map to SURVEY operators: D3-D12 are upstream in decode ->
    R6 (reduce+merge) -> tombstone persistence (Cassandra gc_grace analog).

    **Duplicate delivery needs no dedup pass here** (reference D2, offset
    skip-check handleMutation:259-263): every aggregate in this plan —
    per-cell max(wt,seg,pos), liveness max, tombstone max — is idempotent
    under exact duplicates, so at-least-once delivery already yields
    exactly-once table state. The reference needs the skip-check because its
    downstream (ordered Kafka emission) is duplication-sensitive; a
    set-oriented semilattice apply is not. This deletes a full-width shuffle
    per batch. ``strict_dedup=True`` adds the explicit dropDuplicates pass
    (useful when exact per-event metrics must not double-count).
    """
    timing = os.environ.get("CDC_APPLY_TIMING")
    _t0 = time.time()

    def _mark(step: str) -> None:
        nonlocal _t0
        if timing:
            now = time.time()
            print(f"[apply_batch] {step}: {now - _t0:.2f}s", file=sys.stderr, flush=True)
            _t0 = now

    if strict_dedup:
        batch = dedup_events(batch)
    if stats is None:
        # one job: total + per-op-kind event counts (column-pruned scan;
        # the batch is NOT cached — a pass over it is a pruned parquet
        # scan, cheaper than materializing wide rows)
        stats = (
            batch.agg(
                F.count("*").alias("n"),
                *[
                    F.coalesce(
                        F.sum(F.when(F.col("op") == k, 1).otherwise(0)), F.lit(0)
                    ).alias(k)
                    for k in ("d", "p", "r")
                ],
            )
            .collect()[0]
            .asDict()
        )
    n_events = stats["n"]
    kind_counts = {k: stats[k] for k in ("d", "p", "r")}
    n_tombs = sum(kind_counts.values())
    _mark("stats")

    stored_empty = target.tombstones.is_empty()

    # conv-grain tombstones only: the row-delete ('d') kind is FOLDED
    # into the key reduction below (same grouping key, zero extra
    # shuffle) and applied to the target inside the merge join via
    # _kill_wt — so every remaining tombstone join is a small
    # broadcastable conv-grain relation.
    new_tombs = extract_tombstones(
        batch, kinds=tuple(k for k in ("p", "r") if kind_counts.get(k))
    )  # 'd' is folded into the reduction, never joined

    # --- touched buckets -----------------------------------------------
    # Distinct (state bucket, tombstone-store bucket) pairs over every
    # conv_id the batch touches — upsert/delete keys AND partition/range
    # tombstone targets are all just the batch's conv_ids. The runner
    # folds the pairs into its narrow pre-scan (``stats["bucket_pairs"]``,
    # a bounded collect_set) so the steady-state loop never runs a
    # discovery job; direct callers fall back to one column-pruned
    # map-side-combined distinct, bounded by the bucket-count product.
    # This replaces two separate jobs that each materialized the
    # full-width key reduction just to enumerate buckets.
    pairs = stats.get("bucket_pairs") if isinstance(stats, dict) else None
    if pairs is None:
        from ..lake.table import bucket_expr

        state_m = target.state.manifest()
        store_m = target.tombstones.manifest()
        pairs = [
            (r["_sb"], r["_tb"])
            for r in batch.select(
                bucket_expr(state_m["key_col"], state_m["n_buckets"]).alias("_sb"),
                bucket_expr(store_m["key_col"], store_m["n_buckets"]).alias("_tb"),
            )
            .distinct()
            .collect()
        ]
    bucket_ids = sorted({sb for sb, _ in pairs})
    _mark("touched-buckets")

    # --- per-key reduction (i/u/d in ONE hash agg) ---------------------
    # NOT cached: each consumer prunes it differently (the merge needs
    # full width once; the tombstone flush needs only the _d_wt grain),
    # so recomputing the pruned shapes is cheaper than materializing the
    # wide struct rows into the columnar cache and reading them back.
    reduced = reduce_events(batch)

    pr_tombs = TombstoneSet(row=None, partition=new_tombs.partition, range=new_tombs.range)
    if stored_empty:
        join_tombs = pr_tombs
    else:
        # the tombstone store is bucketed by conv_id too — read only the
        # buckets the batch's conversations hash into
        store_buckets = sorted({tb for _, tb in pairs})
        stored = rows_to_tombstones(target.tombstones.read(buckets=store_buckets))
        join_tombs = union_tombstones(pr_tombs, stored)
    if join_tombs.row is None and join_tombs.partition is None and join_tombs.range is None:
        batch_state = finalize_state(reduced)
    else:
        batch_state = finalize_state(
            tomb_wt_for_keys(reduced, join_tombs, keys_unique=True)
        )

    # --- kill + merge target (only touched buckets are read/rewritten)
    try:
        if target.state.is_empty():
            merged = drop_invisible(batch_state)
        else:
            tgt = target.state.read(buckets=bucket_ids)
            if new_tombs.partition is not None or new_tombs.range is not None:
                # conv-grain kills for target keys absent from the batch
                tgt = kill_state(tomb_wt_for_keys(tgt, pr_tombs, keys_unique=True))
            merged = merge_states(tgt, batch_state)

        if bucket_ids:
            new_version = target.state.overwrite_buckets(merged, bucket_ids)
        else:
            new_version = target.state.current_version()
        _mark("merge+cow-write")

        # --- persist new tombstones for future out-of-order batches -------
        if n_tombs:
            d_rows = (
                reduced.where(F.col("_d_wt").isNotNull()).select(
                    F.lit("d").alias("kind"),
                    "conv_id",
                    F.col("turn_idx").alias("lo"),
                    F.col("turn_idx").alias("hi"),
                    F.lit(True).alias("lo_incl"),
                    F.lit(True).alias("hi_incl"),
                    F.col("_d_wt").alias("wt"),
                )
                if kind_counts["d"]
                else None
            )
            tomb_rows = tombstones_to_rows(new_tombs, extra=d_rows)
            if n_tombs <= 20_000:
                # driver-side flush, no Spark job (offset-flush analog)
                target.tombstones.append_small([r.asDict() for r in tomb_rows.collect()])
            else:
                target.tombstones.append(tomb_rows)
        _mark("tombstone-append")

        return {
            "n_events": n_events,
            "n_buckets_rewritten": len(bucket_ids),
            "n_new_tombstones": n_tombs,
            "state_version": new_version,
        }
    finally:
        reduced.unpersist()


def gc_tombstones(target: CdcTarget, writetime_horizon: int) -> dict:
    """Drop stored tombstones older than the horizon (gc_grace analog): once
    no in-flight segment can carry a writetime <= horizon — the producer
    bounds writetime inversion to a fixed window (generator:
    writetime_inversion_window_us) — tombstones below it can never affect
    future batches. Without this the store is the design's one
    unbounded-growth relation: every batch's conv-grain tombstones would
    accumulate forever into the rows_to_tombstones read above.

    Returns ``{"n_purged", "n_kept", "version"}``; a no-op purge skips the
    rewrite commit entirely."""
    store = target.tombstones
    if store.is_empty():
        return {"n_purged": 0, "n_kept": 0, "version": store.current_version()}
    counts = (
        store.read()
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum((F.col("wt") > writetime_horizon).cast("long")), F.lit(0)
            ).alias("k"),
        )
        .collect()[0]
    )
    n_kept = int(counts["k"])
    n_purged = int(counts["n"]) - n_kept
    if n_purged == 0:
        return {"n_purged": 0, "n_kept": n_kept, "version": store.current_version()}
    kept = store.read().where(F.col("wt") > writetime_horizon)
    version = store.overwrite_all(kept)
    return {"n_purged": n_purged, "n_kept": n_kept, "version": version}
