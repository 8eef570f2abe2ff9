"""Tracing SPI analog — per-event trace propagation as a SPAN RELATION.

Reference: ``tracing/TracingEmitter.java`` decorates the emitter when
``tracing.enabled=true`` and, per emitted record, creates two nested
OpenTelemetry spans (``TracingUtils.traceEmit``):

- ``db-log-write`` — the original Cassandra write, BACKDATED to the
  mutation timestamp, carrying ``db.*`` attributes from SourceInfo
  (instance/type/cdc-name/table/snapshot/file/pos);
- ``debezium-read`` — the CDC processing, timestamped at emit time, child
  of the write span. The gap between the two is the CDC lag.

Scenario tests: ``QueueProcessorTracingTest.java`` (all record types emit
correctly under the decorator), ``TracingEmitterTest.java``.

Spark formulation: per-record span OBJECTS are the antithesis of
set-oriented execution, so the engine emits the same information as a
map-only SPAN RELATION derived from the export envelopes — two rows per
emitted record, ids deterministic (md5 of the offset identity: a replayed
batch re-emits byte-identical spans, keeping the trace sink idempotent
exactly like the changes export). An OTLP forwarder is transport, out of
scope per SURVEY — the span semantics (backdating, parent link, db.*
attributes, lag) are what a tracing stack consumes.

At 100 TB: pure Catalyst projection + single-pass explode — spans ride the
same scan as the export write, no extra shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPAN_DB_LOG_WRITE = "db-log-write"
SPAN_DEBEZIUM_READ = "debezium-read"


def trace_spans(envelopes: DataFrame, read_ts_ms: int) -> DataFrame:
    """Export envelopes (lake.changes.envelope_rows shape) -> span rows.

    Two rows per record:
    - db-log-write: start_ms = the envelope's ts_ms (backdated, reference
      TracingUtils ``setStartTimestamp(tsMillis)``), no parent, lag NULL;
    - debezium-read: start_ms = ``read_ts_ms`` (processing time), parent =
      the write span, lag_ms = read_ts_ms - ts_ms (the CDC lag observable).

    trace_id = md5 of (file, position, key, envelope_op, tombstone-flag,
    ts_ms) — 16 bytes, the OTel trace-id width; span ids = first 8 bytes of
    salted md5. All deterministic, so replays emit identical spans
    (idempotent trace sink). The identity is wider than (file, position,
    key) because two DISTINCT emitted records can share that triple:
    batch-exploded changes share one position (several members, one offset —
    handleMutation:255-272, distinguished by their member writetime ->
    ts_ms, or by op/key), and a delete's tombstone record lands at
    position+1, which can collide with a neighboring record when positions
    are not strided (distinguished by is_tombstone_record + envelope_op).
    Known residual: two same-key batch members carrying the same op AND both
    inheriting the batch default writetime differ only in cell content and
    would still share ids — emit explicit member writetimes (USING
    TIMESTAMP) where that matters.
    """
    ident = F.concat_ws(
        ":",
        F.col("source.file"),
        F.col("position").cast("string"),
        F.col("conv_id"),
        F.coalesce(F.col("turn_idx").cast("string"), F.lit("")),
        F.col("envelope_op"),
        F.col("is_tombstone_record").cast("string"),
        F.col("ts_ms").cast("string"),
    )
    trace_id = F.md5(ident)
    write_span = F.substring(F.md5(F.concat(trace_id, F.lit("w"))), 1, 16)
    read_span = F.substring(F.md5(F.concat(trace_id, F.lit("r"))), 1, 16)
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    def span(name, span_id, parent, start_ms, lag_ms):
        return F.struct(
            F.lit(name).alias("name"),
            span_id.alias("span_id"),
            parent.alias("parent_span_id"),
            start_ms.cast("long").alias("start_ms"),
            lag_ms.cast("long").alias("lag_ms"),
        )

    lag = F.lit(int(read_ts_ms)) - F.col("ts_ms")
    return envelopes.select(
        "segment_id",
        "position",
        "log_partition",
        "conv_id",
        "turn_idx",
        trace_id.alias("trace_id"),
        # db.* attributes from SourceInfo (TracingUtils.traceEmit)
        F.col("source.keyspace").alias("db_instance"),
        F.lit("cassandra").alias("db_type"),
        F.col("source.cluster").alias("db_cdc_name"),
        F.col("source.table").alias("db_table"),
        F.col("source.snapshot").cast("string").alias("db_snapshot"),
        F.col("source.file").alias("db_file"),
        F.col("position").cast("string").alias("db_pos"),
        F.explode(
            F.array(
                span(SPAN_DB_LOG_WRITE, write_span, null_s, F.col("ts_ms"), null_l),
                span(SPAN_DEBEZIUM_READ, read_span, write_span, F.lit(int(read_ts_ms)), lag),
            )
        ).alias("s"),
    ).select(
        "segment_id",
        "position",
        "log_partition",
        "conv_id",
        "turn_idx",
        "trace_id",
        F.col("s.name").alias("name"),
        F.col("s.span_id").alias("span_id"),
        F.col("s.parent_span_id").alias("parent_span_id"),
        F.col("s.start_ms").alias("start_ms"),
        F.col("s.lag_ms").alias("lag_ms"),
        "db_instance",
        "db_type",
        "db_cdc_name",
        "db_table",
        "db_snapshot",
        "db_file",
        "db_pos",
    )
