"""Tombstone relations and their application — D8/D9 + the delete half of R6.

Cassandra reconciliation rules the engine reproduces (reference encodes them
via deletion_ts cells ``populateRegularColumns:575-588``, partition deletes
``handlePartitionDeletion:363-393``, range markers
``handleRangeTombstoneBoundMarker:461-498``, and event-time rules
``handleRowModifications:429``):

- a tombstone at writetime W kills cells / row-liveness with writetime <= W
  (**delete wins ties**);
- a row delete (op 'd') targets one (conv_id, turn_idx);
- a partition delete (op 'p') targets every turn of a conv_id;
- a range tombstone (op 'r') targets turns within [start, end] with
  inclusive/exclusive bound methods.

Set-oriented formulation: instead of replaying deletes in order, compute for
every candidate key the **max applicable tombstone writetime** and compare
once. This is what makes replay order-insensitive and lets segments process
in parallel (SURVEY §4 "key semantic transform").

Scale notes: tombstones are a small fraction of the stream and are
pre-aggregated (per key / per conv) before joining, so AQE turns these joins
into broadcasts at runtime; the range join is an equi-join on conv_id with a
residual bound predicate — never a cartesian product.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class TombstoneSet:
    """The three tombstone relations extracted from a decoded batch.

    A member may be None when it is statically known empty (metadata-level
    knowledge — lets the planner skip the join entirely)."""

    row: DataFrame | None        # (conv_id, turn_idx, wt)   op='d', pre-agg max wt
    partition: DataFrame | None  # (conv_id, wt)             op='p', pre-agg max wt
    range: DataFrame | None      # (conv_id, lo, hi, lo_incl, hi_incl, wt)  op='r'

    def prune(self, kind_counts: dict) -> "TombstoneSet":
        """Null out relations a per-kind count proved empty."""
        return TombstoneSet(
            row=self.row if kind_counts.get("d") else None,
            partition=self.partition if kind_counts.get("p") else None,
            range=self.range if kind_counts.get("r") else None,
        )


def extract_tombstones(
    batch: DataFrame, kinds: tuple[str, ...] = ("d", "p", "r")
) -> TombstoneSet:
    # SQL-string predicates/projections: one py4j round trip each (these
    # three relations are built on every query construction — see lww.py);
    # ``kinds`` lets a caller that statically knows an op kind is absent
    # skip assembling that relation entirely
    _max_wt = F.expr("max(writetime) AS wt")
    row = (
        batch.where("op = 'd'").groupBy("conv_id", "turn_idx").agg(_max_wt)
        if "d" in kinds
        else None
    )
    partition = (
        batch.where("op = 'p'").groupBy("conv_id").agg(_max_wt)
        if "p" in kinds
        else None
    )
    # ranges pre-aggregate at BOUNDS grain (identical bounds keep max wt):
    # a hot partition receiving thousands of range deletes over a bounded
    # clustering space collapses to the distinct-bounds count before any
    # join — same reason row/partition tombstones pre-aggregate
    if "r" not in kinds:
        return TombstoneSet(row=row, partition=partition, range=None)
    rng = (
        batch.where("op = 'r'")
        .selectExpr(
            "conv_id",
            "range_start.turn_idx AS lo",
            "range_end.turn_idx AS hi",
            "range_start.method = 'INCL_START_BOUND' AS lo_incl",
            "range_end.method = 'INCL_END_BOUND' AS hi_incl",
            "writetime AS wt",
        )
        .groupBy("conv_id", "lo", "hi", "lo_incl", "hi_incl")
        .agg(F.expr("max(wt) AS wt"))
    )
    return TombstoneSet(row=row, partition=partition, range=rng)


def union_tombstones(a: TombstoneSet, b: TombstoneSet) -> TombstoneSet:
    """Member-wise union; None members (statically empty) cost nothing."""

    def u(x, y, regroup_keys=None):
        if x is None:
            return y
        if y is None:
            return x
        out = x.unionByName(y)
        if regroup_keys:
            out = out.groupBy(*regroup_keys).agg(F.max("wt").alias("wt"))
        return out

    return TombstoneSet(
        row=u(a.row, b.row, ["conv_id", "turn_idx"]),
        partition=u(a.partition, b.partition, ["conv_id"]),
        range=u(a.range, b.range, ["conv_id", "lo", "hi", "lo_incl", "hi_incl"]),
    )


def pair_range_markers(log: DataFrame) -> DataFrame:
    """D9 full form — pair UNPAIRED range-tombstone bound markers.

    Cassandra emits range deletions as separate bound markers in commit-log
    order (start marker, then end marker for the same partition); the
    reference accumulates the start until its end arrives
    (RangeTombstoneContext.java:20-40, handleRangeTombstoneBoundMarker
    Cassandra4CommitLogReadHandlerImpl.java:461-511). Input op='r' rows carry
    exactly ONE of range_start / range_end; all other ops pass through.

    Spark formulation: markers of one partition key pair by log order —
    lag(range_start) over (conv_id ORDER BY segment_id, position) pulls each
    end marker's preceding start marker; the paired event keeps the END
    marker's (writetime, segment, position) identity. Only op='r' rows enter
    the window shuffle (a small fraction of the stream); scope is one batch,
    matching the reference's per-commit-log pairing context. Malformed
    streams (end with no preceding start, dangling start) drop, as the
    reference logs-and-skips.
    """
    from pyspark.sql import Window as W

    markers = log.where(F.col("op") == "r")
    rest = log.where(F.col("op") != "r")
    w = W.partitionBy("conv_id").orderBy("segment_id", "position")
    prev_start = F.lag(F.col("range_start")).over(w)
    prev_was_start = F.lag(F.col("range_start").isNotNull()).over(w)
    paired = (
        markers.withColumn("_prev_start", prev_start)
        .withColumn("_prev_is_start", prev_was_start)
        .where(
            F.col("range_end").isNotNull()
            & F.coalesce(F.col("_prev_is_start"), F.lit(False))
        )
        .withColumn("range_start", F.col("_prev_start"))
        .drop("_prev_start", "_prev_is_start")
    )
    return rest.unionByName(paired)


def range_covers(lo, hi, lo_incl, hi_incl, turn) -> "F.Column":
    """Bound predicate with inclusivity methods (reference RangeData bound
    kinds, CassandraSchemaFactory.java:347-423). The hot path
    (``tomb_wt_for_keys``) inlines this predicate as a SQL string — one
    py4j round trip; this Column form is the reusable public twin."""
    above = F.when(lo_incl, turn >= lo).otherwise(turn > lo)
    below = F.when(hi_incl, turn <= hi).otherwise(turn < hi)
    return above & below


def tomb_wt_for_keys(
    keys: DataFrame, tombs: TombstoneSet, keys_unique: bool = False
) -> DataFrame:
    """For a (conv_id, turn_idx) key relation, compute max applicable
    tombstone writetime as column ``tomb_wt`` (NULL when none applies).

    ``keys`` may carry arbitrary extra columns; they are preserved.
    Up to three left joins, each against a pre-aggregated (hence small,
    AQE-broadcastable) tombstone relation; the range join is equi on conv_id
    with a residual bound filter — never a cartesian. Relations known empty
    (None) cost nothing.

    ``keys_unique=True`` asserts the caller's relation already has at most
    one row per (conv_id, turn_idx) — true for a reduction output or a
    state table — skipping the defensive dropDuplicates aggregation in
    front of the range join (one fewer shuffle+agg on the hot apply path).
    """
    out = keys
    wt_cols = []
    if tombs.row is not None:
        out = out.join(tombs.row.withColumnRenamed("wt", "d_wt"), ["conv_id", "turn_idx"], "left")
        wt_cols.append("d_wt")
    if tombs.partition is not None:
        out = out.join(tombs.partition.withColumnRenamed("wt", "p_wt"), ["conv_id"], "left")
        wt_cols.append("p_wt")
    if tombs.range is not None:
        r_keys = keys.select("conv_id", "turn_idx")
        if not keys_unique:
            r_keys = r_keys.dropDuplicates()
        r_applicable = (
            r_keys
            .join(tombs.range, "conv_id")
            .where(
                "(CASE WHEN lo_incl THEN turn_idx >= lo ELSE turn_idx > lo END)"
                " AND (CASE WHEN hi_incl THEN turn_idx <= hi ELSE turn_idx < hi END)"
            )
            .groupBy("conv_id", "turn_idx")
            .agg(F.expr("max(wt) AS r_wt"))
        )
        out = out.join(r_applicable, ["conv_id", "turn_idx"], "left")
        wt_cols.append("r_wt")

    if not wt_cols:
        tomb = "CAST(NULL AS BIGINT)"
    elif len(wt_cols) == 1:
        tomb = wt_cols[0]
    else:
        tomb = f"greatest({', '.join(wt_cols)})"
    return out.withColumn("tomb_wt", F.expr(tomb)).drop(*wt_cols)


def tombstones_to_rows(tombs: TombstoneSet, extra: DataFrame | None = None) -> DataFrame:
    """Flatten a TombstoneSet to a single storable relation (the persistent
    tombstone store — Cassandra's analog of tombstones retained until
    gc_grace, needed so an out-of-order upsert arriving in a *later* batch
    still loses to an earlier-seen delete with a higher writetime).
    ``extra`` appends an already-flattened relation (e.g. folded 'd' rows
    harvested from the key reduction)."""
    parts = []
    if tombs.row is not None:
        parts.append(
            tombs.row.select(
                F.lit("d").alias("kind"), "conv_id",
                F.col("turn_idx").alias("lo"), F.col("turn_idx").alias("hi"),
                F.lit(True).alias("lo_incl"), F.lit(True).alias("hi_incl"), "wt",
            )
        )
    if tombs.partition is not None:
        parts.append(
            tombs.partition.select(
                F.lit("p").alias("kind"), "conv_id",
                F.lit(None).cast("int").alias("lo"), F.lit(None).cast("int").alias("hi"),
                F.lit(True).alias("lo_incl"), F.lit(True).alias("hi_incl"), "wt",
            )
        )
    if tombs.range is not None:
        parts.append(
            tombs.range.select(
                F.lit("r").alias("kind"), "conv_id", "lo", "hi", "lo_incl", "hi_incl", "wt"
            )
        )
    if extra is not None:
        parts.append(extra)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rows_to_tombstones(df: DataFrame) -> TombstoneSet:
    """Inverse of tombstones_to_rows (reading the persistent store)."""
    return TombstoneSet(
        row=(
            df.where(F.col("kind") == "d")
            .groupBy("conv_id", F.col("lo").alias("turn_idx"))
            .agg(F.max("wt").alias("wt"))
        ),
        partition=df.where(F.col("kind") == "p").groupBy("conv_id").agg(F.max("wt").alias("wt")),
        range=(
            df.where(F.col("kind") == "r")
            .groupBy("conv_id", "lo", "hi", "lo_incl", "hi_incl")
            .agg(F.max("wt").alias("wt"))
        ),
    )
