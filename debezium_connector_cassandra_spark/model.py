"""Data model: transcript rows, mutation-log rows, change envelopes.

Reference analogs (SURVEY §1):
- cell struct {value, deletion_ts, set} — reference ``CassandraSchemaFactory.java:299-314``
- envelope {ts_ms, op, source, after}  — reference ``Record.java:21-90``
- source struct                         — reference ``SourceInfo.java:22-46``
- offset (segment_id, position)         — reference ``OffsetPosition.java:19-57``
- range bound {method, turn_idx}        — reference ``CassandraSchemaFactory.java:347-423``

The payload is the BASELINE.json ``input_hint`` transcript table:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp), primary key (conv_id, turn_idx) with conv_id the partition key
and turn_idx the clustering key.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# op codes — reference Record.java:35-55 (i/u/d/r); we split the reference's
# partition-delete case (Cassandra4CommitLogReadHandlerImpl.java:352-398) into
# its own code 'p', and keep 'r' for range tombstones.
# ---------------------------------------------------------------------------
OP_INSERT = "i"
OP_UPDATE = "u"
OP_ROW_DELETE = "d"
OP_PARTITION_DELETE = "p"
OP_RANGE_TOMBSTONE = "r"
UPSERT_OPS = (OP_INSERT, OP_UPDATE)
TOMBSTONE_OPS = (OP_ROW_DELETE, OP_PARTITION_DELETE, OP_RANGE_TOMBSTONE)

# Regular (non-key) columns of the transcript payload and their Spark types.
REGULAR_COLUMNS: dict[str, T.DataType] = {
    "role": T.StringType(),
    "text": T.StringType(),
    "tool": T.StringType(),
    "ts": T.TimestampType(),
}
KEY_COLUMNS = ("conv_id", "turn_idx")
PARTITION_KEY = "conv_id"
CLUSTERING_KEY = "turn_idx"

# Range-tombstone bound kinds — reference RangeTombstoneBoundMarker handling,
# Cassandra4CommitLogReadHandlerImpl.java:461-511.
INCL_START = "INCL_START_BOUND"
EXCL_START = "EXCL_START_BOUND"
INCL_END = "INCL_END_BOUND"
EXCL_END = "EXCL_END_BOUND"


def cell_type(value_type: T.DataType) -> T.StructType:
    """Cell struct — {value, deletion_ts, set}.

    ``set=false``  -> column not present in the mutation (sparse UPDATE,
                      reference populateRegularColumns:548-574)
    ``deletion_ts``-> cell tombstone / TTL expiry in epoch micros (reference
                      populateRegularColumns:575-588 & SnapshotProcessor TTL
                      math :342-344); a set cell with deletion_ts behaves as a
                      null assignment at the event writetime.
    """
    return T.StructType(
        [
            T.StructField("value", value_type, True),
            T.StructField("deletion_ts", T.LongType(), True),
            T.StructField("set", T.BooleanType(), False),
        ]
    )


CELLS_TYPE = T.StructType(
    [T.StructField(name, cell_type(dtype), True) for name, dtype in REGULAR_COLUMNS.items()]
)

RANGE_BOUND_TYPE = T.StructType(
    [
        T.StructField("method", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# F2 mutation_log — the synthetic commit-log analog. One row per mutation,
# totally ordered by (segment_id, position) like the reference's
# OffsetPosition; partitioned on disk by segment_id (one directory per
# CommitLog-<v>-<id>.log analog).
# ---------------------------------------------------------------------------
MUTATION_LOG_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("writetime", T.LongType(), False),
        T.StructField("cells", CELLS_TYPE, True),
        T.StructField("range_start", RANGE_BOUND_TYPE, True),
        T.StructField("range_end", RANGE_BOUND_TYPE, True),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("snapshot", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Logged-batch mutations — one Mutation carrying SEVERAL row changes at one
# commit-log offset (reference: handleMutation iterates
# mutation.getPartitionUpdates() with ONE shared OffsetPosition,
# Cassandra4CommitLogReadHandlerImpl.java:255-272; scenario
# tests/.../BatchTest.java:26-96 — a LOGGED batch of one partition delete +
# three inserts with explicit per-statement USING TIMESTAMP and TTL).
#
# A batch log row carries ``changes: array<BATCH_CHANGE_TYPE>`` at one
# (segment_id, position); a member's NULL writetime inherits the batch
# default (the no-USING-TIMESTAMP case — Cassandra stamps the batch's
# coordinator time).
# ---------------------------------------------------------------------------
BATCH_CHANGE_TYPE = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("writetime", T.LongType(), True),  # NULL -> batch default
        T.StructField("cells", CELLS_TYPE, True),
        T.StructField("range_start", RANGE_BOUND_TYPE, True),
        T.StructField("range_end", RANGE_BOUND_TYPE, True),
    ]
)

BATCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("writetime", T.LongType(), False),  # batch default wt
        T.StructField("changes", T.ArrayType(BATCH_CHANGE_TYPE, False), False),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("snapshot", T.BooleanType(), False),
    ]
)

# Multi-table batch form: a Cassandra Mutation is PER KEYSPACE and may carry
# PartitionUpdates for SEVERAL TABLES — handleMutation's loop reads
# pu.metadata().name per update under the one shared offset
# (Cassandra4CommitLogReadHandlerImpl.java:255-272). So the MT batch row
# keeps keyspace at the record level and the TABLE inside each change.
MT_BATCH_CHANGE_TYPE = T.StructType(
    [
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("writetime", T.LongType(), True),  # NULL -> batch default
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("range_start", RANGE_BOUND_TYPE, True),
        T.StructField("range_end", RANGE_BOUND_TYPE, True),
    ]
)

MT_BATCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("keyspace", T.StringType(), False),
        T.StructField("writetime", T.LongType(), False),
        T.StructField("changes", T.ArrayType(MT_BATCH_CHANGE_TYPE, False), False),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("snapshot", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Change envelope — reference Record.buildValue (Record.java:80-90):
# {ts_ms, op, source, after}; key = (conv_id, turn_idx).
# ---------------------------------------------------------------------------
SOURCE_TYPE = T.StructType(
    [
        T.StructField("cluster", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("keyspace", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("snapshot", T.BooleanType(), True),
        T.StructField("ts_micro", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Materialized target table (lake). Alongside the payload columns the engine
# keeps reconciliation metadata, because Cassandra semantics are cell-level
# last-writer-wins (reference reconciliation via per-cell timestamps;
# envelope event-time rules Cassandra4CommitLogReadHandlerImpl.java:429):
#   _live_wt   liveness writetime: max writetime of INSERT ops (primary-key
#              liveness, reference RowType predicates :226-236)
#   _wt_<col>  per-column writetime of the winning cell — FLAT longs (not a
#              struct) so schema evolution stays a metadata-only ADD COLUMN
# A row is visible while (liveness survives) OR (any cell survives); a
# tombstone at writetime W kills cells/liveness with writetime <= W
# (delete wins ties — Cassandra reconciliation rule).
# ---------------------------------------------------------------------------


def state_schema_for(payload: dict[str, T.DataType]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            *[T.StructField(n, t, True) for n, t in payload.items()],
            T.StructField("_live_wt", T.LongType(), True),
            *[T.StructField(f"_wt_{n}", T.LongType(), True) for n in payload],
        ]
    )


STATE_SCHEMA = state_schema_for(REGULAR_COLUMNS)

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        *[T.StructField(n, t, True) for n, t in REGULAR_COLUMNS.items()],
    ]
)

# ---------------------------------------------------------------------------
# TableSpec — the multi-table schema descriptor (reference KeyspaceTable +
# SchemaHolder, core/.../KeyspaceTable.java, SchemaHolder.java:18-52).
#
# The engine normalizes every table's rows to CANONICAL key column names
# (conv_id = partition key rendered as string, turn_idx = clustering key as
# int) the same way the reference normalizes mutations into its generic
# Row{partitionKeys[], clusteringKeys[], cells[]} shape
# (CassandraSchemaFactory.java:299-423): the LWW / tombstone algebra is
# written once against the normalized shape, and TableSpec records the
# logical names so the user-facing view (`denormalize`) restores them.
# Current constraints (documented, enforced): exactly one partition key
# (stringable) and at most one clustering key (int-orderable — required by
# range-tombstone bounds).
# ---------------------------------------------------------------------------
from dataclasses import dataclass


@dataclass(frozen=True)
class TableSpec:
    keyspace: str
    table: str
    partition_key: str = PARTITION_KEY
    clustering_key: str = CLUSTERING_KEY
    # ordered (name, Spark type) payload columns
    payload: tuple = tuple(REGULAR_COLUMNS.items())

    @property
    def fqtn(self) -> str:
        return f"{self.keyspace}.{self.table}"

    @property
    def payload_dict(self) -> dict[str, T.DataType]:
        return dict(self.payload)

    def cells_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, cell_type(t), True) for n, t in self.payload]
        )

    def state_schema(self) -> T.StructType:
        return state_schema_for(self.payload_dict)

    def normalize(self, df):
        """Rename logical key columns -> canonical engine names."""
        out = df
        if self.partition_key != PARTITION_KEY:
            out = out.withColumnRenamed(self.partition_key, PARTITION_KEY)
        if self.clustering_key != CLUSTERING_KEY:
            out = out.withColumnRenamed(self.clustering_key, CLUSTERING_KEY)
        return out

    def denormalize(self, df):
        """Rename canonical key columns back to the table's logical names."""
        out = df
        if self.partition_key != PARTITION_KEY:
            out = out.withColumnRenamed(PARTITION_KEY, self.partition_key)
        if self.clustering_key != CLUSTERING_KEY:
            out = out.withColumnRenamed(CLUSTERING_KEY, self.clustering_key)
        return out


TRANSCRIPTS_SPEC = TableSpec(keyspace="agents", table="transcripts")

# Multi-table mutation log: key + offset scaffold shared by every table, the
# payload serialized per-table (the commit-log fidelity shape — a segment
# interleaves mutations of ALL cdc-enabled tables, decoded per table schema
# exactly like the reference's CommitLogReadHandler + SchemaHolder pair).
MULTI_TABLE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("keyspace", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("writetime", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("range_start", RANGE_BOUND_TYPE, True),
        T.StructField("range_end", RANGE_BOUND_TYPE, True),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("snapshot", T.BooleanType(), False),
    ]
)

# Bookkeeping shapes for the multi-table runner (per-table offsets — the
# reference emits per-table source offsets in each record's SourceInfo)
MT_OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("fqtn", T.StringType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("updated_at", T.LongType(), False),
    ]
)

MT_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("fqtn", T.StringType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# Bookkeeping tables (FIXTURES F6)
OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("updated_at", T.LongType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("log_partition", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # done | error | reprocess
        T.StructField("n_events", T.LongType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("segment_lo", T.LongType(), False),
        T.StructField("segment_hi", T.LongType(), False),
        T.StructField("n_decoded", T.LongType(), False),
        T.StructField("n_deduped", T.LongType(), False),
        T.StructField("n_applied", T.LongType(), False),
        # D3: unsupported-partition mutations counted-and-skipped this batch
        # (COUNTER / MATERIALIZED_VIEW / SECONDARY_INDEX — PartitionType
        # guard, Cassandra4CommitLogReadHandlerImpl.java:102-168)
        T.StructField("n_skipped", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# Tombstone-GC audit rows (the gc_grace purge accounting; one row per
# gc() invocation — plans.apply.gc_tombstones). fqtn is "" for the
# single-table runner.
GC_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("fqtn", T.StringType(), False),
        T.StructField("horizon_wt", T.LongType(), False),
        T.StructField("n_purged", T.LongType(), False),
        T.StructField("n_kept", T.LongType(), False),
    ]
)
