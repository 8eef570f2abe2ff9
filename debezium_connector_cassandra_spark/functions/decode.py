"""Decode / classify / envelope construction — the per-mutation "map" stage.

Covers SURVEY §2.2:
- D1  CDC filter                      (reference handleMutation:241-251)
- D3  partition classification        (PartitionType.getPartitionType:137-156)
- D4  row classification              (RowType.getRowType:203-220)
- D10 field exclude filter            (FieldFilterSelector.selectFieldFilter:32-55)
- D11 envelope construction           (RecordMaker.createRecord:58-96)
- D12 event-time assignment           (handleRowModifications:429)
- D13 envelope SMT op remap i/u/d/r -> c/u/d/t (EnvelopeTransformation.apply:30-66)
- S5  binary segment decode analog — a vectorized Arrow (pandas) UDF parsing a
      serialized payload into typed cells, standing in for Cassandra's
      CommitLogReader (Cassandra4CommitLogSegmentReader.java:29-33).

Everything except the binary path is pure Catalyst column expressions
(whole-stage codegen, no Python in the hot loop).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from ..model import CELLS_TYPE, REGULAR_COLUMNS

# ---------------------------------------------------------------------------
# classification — D3/D4. Our synthetic log carries the op code directly, but
# the classifier re-derives partition/row types from structural evidence the
# way the reference does (null clustering key == partition-level operation;
# liveness/deletion flags pick the row type), so the semantics are testable.
# ---------------------------------------------------------------------------

def partition_type() -> Column:
    """PartitionType analog: ROW_LEVEL_MODIFICATION vs PARTITION_KEY_ROW_DELETION."""
    return (
        F.when(F.col("op") == "p", F.lit("PARTITION_KEY_ROW_DELETION"))
        .when(F.col("op") == "r", F.lit("ROW_RANGE_DELETION"))
        .otherwise(F.lit("ROW_LEVEL_MODIFICATION"))
    )


# D3 full form — the reference classifies mutations against COUNTER /
# MATERIALIZED_VIEW / SECONDARY_INDEX tables as unsupported partition types
# and skips them with a warning instead of emitting change events
# (PartitionType.getPartitionType:137-156, validity :158-168, handler guard
# Cassandra4CommitLogReadHandlerImpl.java:102-168). The log models the table
# kind as an optional ``table_kind`` column ('cdc' / absent = capturable).
UNSUPPORTED_KINDS: dict[str, str] = {
    "counter": "COUNTER",
    "materialized_view": "MATERIALIZED_VIEW",
    "secondary_index": "SECONDARY_INDEX",
}


def partition_type_full(kind_col: str = "table_kind") -> Column:
    """partition_type() extended with the unsupported classes (getPartitionType
    full switch): an unsupported table kind wins over the op-derived class."""
    expr = partition_type()
    for kind, ptype in UNSUPPORTED_KINDS.items():
        expr = F.when(F.col(kind_col) == kind, F.lit(ptype)).otherwise(expr)
    return expr


def split_unsupported(df: DataFrame, kind_col: str = "table_kind"):
    """Classify-and-skip: returns ``(supported, skipped_counts)`` where
    ``supported`` excludes unsupported-partition mutations and
    ``skipped_counts`` is a per-PartitionType count relation (the
    counted-and-warned skip the reference performs; the counts land in the
    runner's _metrics as n_skipped).

    A log without the ``table_kind`` column is entirely capturable —
    supported passes through unchanged and the skip relation is empty."""
    if kind_col not in df.columns:
        empty = df.sparkSession.createDataFrame(
            [], "partition_type string, n_skipped long"
        )
        return df, empty
    is_unsup = F.col(kind_col).isin(*UNSUPPORTED_KINDS.keys())
    supported = df.where(~F.coalesce(is_unsup, F.lit(False)))
    skipped = (
        df.where(is_unsup)
        .groupBy(partition_type_full(kind_col).alias("partition_type"))
        .agg(F.count("*").alias("n_skipped"))
    )
    return supported, skipped


def row_type() -> Column:
    """RowType analog: INSERT iff liveness set; DELETE iff row deletion set;
    else UPDATE (reference RowType predicates :226-236)."""
    return (
        F.when(F.col("op") == "i", F.lit("INSERT"))
        .when(F.col("op") == "u", F.lit("UPDATE"))
        .when(F.col("op") == "d", F.lit("DELETE"))
        .when(F.col("op") == "r", F.lit("RANGE_TOMBSTONE"))
        .when(F.col("op") == "p", F.lit("PARTITION_DELETE"))
        .otherwise(F.lit("UNKNOWN"))
    )


def debezium_op() -> Column:
    """D13 SMT remap: i/u/d/r -> c/u/d/t (+ our p -> d at partition grain)."""
    return (
        F.when(F.col("op") == "i", F.lit("c"))
        .when(F.col("op") == "u", F.lit("u"))
        .when(F.col("op").isin("d", "p"), F.lit("d"))
        .otherwise(F.lit("t"))
    )


def source_struct(cluster: str = "synthetic", keyspace: str = "agents", table: str = "transcripts") -> Column:
    """SourceInfo analog (reference SourceInfo.java:22-46)."""
    return F.struct(
        F.lit(cluster).alias("cluster"),
        F.concat(F.lit("CommitLog-7-"), F.col("segment_id").cast("string"), F.lit(".log")).alias("file"),
        F.col("position").alias("pos"),
        F.lit(keyspace).alias("keyspace"),
        F.lit(table).alias("table"),
        F.col("snapshot").alias("snapshot"),
        F.col("writetime").alias("ts_micro"),
    )


def with_envelope(
    df: DataFrame,
    excluded_fields: tuple[str, ...] = (),
    cluster: str = "synthetic",
    keyspace: str = "agents",
    table: str = "transcripts",
) -> DataFrame:
    """D11: attach {ts_ms, op, source, after}-shaped columns.

    ``excluded_fields`` implements D10 (field.exclude.list): excluded cells are
    nulled from INSERT/UPDATE envelopes only — deletes keep their tombstone
    cells, mirroring RecordMaker.createRecord:61-72. ``keyspace``/``table``
    flow into the SourceInfo struct (multi-table routing identity).
    """
    if excluded_fields:
        df = df.withColumn(
            "cells",
            F.when(
                F.col("cells").isNotNull(),
                F.struct(
                    *[
                        (
                            F.when(
                                F.col("op").isin("i", "u"),
                                F.lit(None).cast(field.dataType),
                            )
                            .otherwise(F.col("cells")[field.name])
                            if field.name in excluded_fields
                            else F.col("cells")[field.name]
                        ).alias(field.name)
                        for field in df.schema["cells"].dataType.fields
                    ]
                ),
            ),
        )
    # one appending selectExpr (a withColumn chain cost ~40 py4j round
    # trips per construction; identical analyzed schema)
    return df.selectExpr(
        "*",
        "CAST(writetime / 1000 AS BIGINT) AS ts_ms",
        "CASE WHEN op = 'i' THEN 'c' WHEN op = 'u' THEN 'u' "
        "WHEN op IN ('d','p') THEN 'd' ELSE 't' END AS envelope_op",
        f"named_struct('cluster', '{cluster}', "
        "'file', concat('CommitLog-7-', CAST(segment_id AS STRING), '.log'), "
        "'pos', position, "
        f"'keyspace', '{keyspace}', 'table', '{table}', "
        "'snapshot', snapshot, 'ts_micro', writetime) AS source",
        "CASE WHEN op = 'p' THEN 'PARTITION_KEY_ROW_DELETION' "
        "WHEN op = 'r' THEN 'ROW_RANGE_DELETION' "
        "ELSE 'ROW_LEVEL_MODIFICATION' END AS partition_type",
        "CASE WHEN op = 'i' THEN 'INSERT' WHEN op = 'u' THEN 'UPDATE' "
        "WHEN op = 'd' THEN 'DELETE' WHEN op = 'r' THEN 'RANGE_TOMBSTONE' "
        "WHEN op = 'p' THEN 'PARTITION_DELETE' ELSE 'UNKNOWN' END AS row_type",
    )


# ---------------------------------------------------------------------------
# Logged-batch mutations — the reference processes one Mutation's SEVERAL
# PartitionUpdates under ONE shared OffsetPosition
# (Cassandra4CommitLogReadHandlerImpl.handleMutation:255-272; scenario
# BatchTest.java:26-96). Spark formulation: a batch log row carries
# ``changes: array<struct<...>>`` and explodes into per-change rows BEFORE
# classification, every change keeping the batch's (segment_id, position) —
# so the offset checkpoint advances atomically per batch (the position
# appears once; either all of a batch's changes are applied or none).
# ---------------------------------------------------------------------------


def explode_batch_mutations(log: DataFrame) -> DataFrame:
    """Batch-shaped log (model.BATCH_LOG_SCHEMA) -> canonical per-change
    rows (model.MUTATION_LOG_SCHEMA order).

    Every change carries the batch's offset; a member's NULL writetime
    inherits the batch default (the no-USING-TIMESTAMP case). Pure Catalyst
    explode — whole-stage codegen, the array never round-trips Python."""
    extra = [
        c
        for c in log.columns
        if c
        not in (
            "segment_id",
            "position",
            "log_partition",
            "writetime",
            "changes",
            "schema_version",
            "snapshot",
        )
    ]
    return log.selectExpr(
        "segment_id",
        "position",
        "log_partition",
        "writetime AS _batch_wt",
        "explode(changes) AS c",
        "schema_version",
        "snapshot",
        *extra,
    ).selectExpr(
        "segment_id",
        "position",
        "log_partition",
        "c.op AS op",
        "c.conv_id AS conv_id",
        "c.turn_idx AS turn_idx",
        "coalesce(c.writetime, _batch_wt) AS writetime",
        "c.cells AS cells",
        "c.range_start AS range_start",
        "c.range_end AS range_end",
        "schema_version",
        "snapshot",
        *extra,
    )


def explode_mt_batch_mutations(log: DataFrame) -> DataFrame:
    """Multi-table batch log (model.MT_BATCH_LOG_SCHEMA) -> canonical
    per-change rows (model.MULTI_TABLE_LOG_SCHEMA order).

    A Mutation is per-keyspace and may touch SEVERAL tables — each change
    carries its own table name (pu.metadata().name in the reference's loop)
    while keyspace + offset are the batch's. NULL member writetime inherits
    the batch default."""
    return log.select(
        "segment_id",
        "position",
        "log_partition",
        "keyspace",
        F.col("writetime").alias("_batch_wt"),
        F.explode("changes").alias("c"),
        "schema_version",
        "snapshot",
    ).select(
        "segment_id",
        "position",
        "log_partition",
        "keyspace",
        F.col("c.table").alias("table"),
        F.col("c.op").alias("op"),
        F.col("c.conv_id").alias("conv_id"),
        F.col("c.turn_idx").alias("turn_idx"),
        F.coalesce(F.col("c.writetime"), F.col("_batch_wt")).alias("writetime"),
        F.col("c.payload").alias("payload"),
        F.col("c.range_start").alias("range_start"),
        F.col("c.range_end").alias("range_end"),
        "schema_version",
        "snapshot",
    )


# ---------------------------------------------------------------------------
# S5 analog — binary payload decode.
#
# The generator can serialize `cells` to a compact JSON byte payload (the
# stand-in for Cassandra's binary mutation encoding). Two decoders with
# identical semantics:
#   decode_payload_jvm   — from_json, stays in whole-stage codegen (hot path)
#   decode_payload_arrow — @pandas_udf over Arrow record batches (the
#                          vectorized-UDF decode mandated by the north star;
#                          per-batch Python, never per-row Spark rows)
# Tests assert the two produce identical cells.
# ---------------------------------------------------------------------------

_PAYLOAD_JSON_SCHEMA = CELLS_TYPE


def encode_payload(df: DataFrame) -> DataFrame:
    """Serialize cells -> binary payload (producer-side analog).

    timestampFormat carries full MICROSECOND precision — the default to_json
    format truncates to millis, silently dropping the sub-ms part of
    Cassandra's micro-precision timestamps (the decoder side always parsed
    SSSSSS; the binary codec twin exposed the asymmetry)."""
    return df.withColumn(
        "payload",
        F.encode(
            F.to_json(
                F.col("cells"),
                {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
            ),
            "utf-8",
        ),
    ).drop("cells")


def decode_payload_jvm(df: DataFrame) -> DataFrame:
    """from_json JVM decode — used in the benchmark hot path."""
    return df.withColumn(
        "cells",
        F.from_json(F.decode(F.col("payload"), "utf-8"), _PAYLOAD_JSON_SCHEMA,
                    {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}),
    ).drop("payload")


@pandas_udf(CELLS_TYPE)
def _decode_cells_arrow(payload: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized payload decode: one Python call per record batch.

    Returns a pandas DataFrame whose columns are the cell structs; pandas
    dict-of-dict columns map onto the nested StructType via Arrow.
    """
    def parse(b):
        if b is None:
            return {n: None for n in REGULAR_COLUMNS}
        d = json.loads(bytes(b).decode("utf-8"))
        out = {}
        for n in REGULAR_COLUMNS:
            c = d.get(n)
            if c is None:
                out[n] = None
                continue
            v = c.get("value")
            if n == "ts" and v is not None:
                v = pd.Timestamp(v).tz_localize(None) if pd.Timestamp(v).tzinfo is None else pd.Timestamp(v).tz_convert("UTC").tz_localize(None)
            out[n] = {"value": v, "deletion_ts": c.get("deletion_ts"), "set": bool(c.get("set", False))}
        return out

    parsed = payload.map(parse)
    return pd.DataFrame({n: parsed.map(lambda d, n=n: d[n]) for n in REGULAR_COLUMNS})


def decode_payload_arrow(df: DataFrame) -> DataFrame:
    """Arrow pandas-UDF decode of the binary payload (S5 fidelity path)."""
    return df.withColumn("cells", _decode_cells_arrow(F.col("payload"))).drop("payload")
