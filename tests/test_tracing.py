"""Tracing SPI analog — QueueProcessorTracingTest / TracingEmitterTest
scenarios: every emitted record type produces its span pair, the write span
is backdated to the mutation timestamp, the read span is its child and
carries the CDC lag, and a replay emits identical spans (idempotent sink).
"""

from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.operators.tracing import (
    SPAN_DB_LOG_WRITE,
    SPAN_DEBEZIUM_READ,
    trace_spans,
)
from debezium_connector_cassandra_spark.lake.changes import envelope_rows
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner


def test_trace_spans_contract(spark):
    log = gen_mutation_log(spark, 500, n_convs=15, events_per_segment=250, seed=31)
    env = envelope_rows(log, tombstones_on_delete=True)
    read_ts = 1_800_000_000_000
    spans = trace_spans(env, read_ts_ms=read_ts).cache()

    n_records = env.count()
    assert spans.count() == 2 * n_records  # two spans per emitted record

    # every record type (change, delete, tombstone record) emits a pair —
    # the QueueProcessorTracingTest contract
    per_trace = spans.groupBy("trace_id").agg(
        F.count("*").alias("n"),
        F.collect_set("name").alias("names"),
    )
    bad = per_trace.where(
        (F.col("n") != 2) | (F.size("names") != 2)
    ).count()
    assert bad == 0

    w = spans.where(F.col("name") == SPAN_DB_LOG_WRITE)
    r = spans.where(F.col("name") == SPAN_DEBEZIUM_READ)
    # write span backdated to the mutation ts (< read_ts), no parent
    assert w.where(F.col("start_ms") >= read_ts).count() == 0
    assert w.where(F.col("parent_span_id").isNotNull()).count() == 0
    # read span at processing time, child of the write span, lag = gap
    joined = r.alias("r").join(w.alias("w"), "trace_id")
    assert (
        joined.where(F.col("r.parent_span_id") != F.col("w.span_id")).count() == 0
    )
    assert r.where(F.col("start_ms") != read_ts).count() == 0
    lag_ok = joined.where(
        F.col("r.lag_ms") != read_ts - F.col("w.start_ms")
    ).count()
    assert lag_ok == 0
    # db.* attributes carry the SourceInfo identity
    row = spans.first()
    assert row["db_type"] == "cassandra" and row["db_instance"] == "agents"
    assert row["db_file"].startswith("CommitLog-7-")


def test_runner_tracing_idempotent_and_gated(spark, tmp_path):
    import pytest

    log = gen_mutation_log(spark, 600, n_convs=10, events_per_segment=300, seed=33)
    p = str(tmp_path / "log")
    write_mutation_log(log, p)

    with pytest.raises(ValueError, match="export_changes"):
        CdcRunner(spark, p, str(tmp_path / "t0"), tracing=True)

    r = CdcRunner(
        spark, p, str(tmp_path / "t"), n_buckets=4, export_changes=True,
        tracing=True,
    )
    r.run()
    spans = r.traces.read()
    n_changes = r.changes.read().count()
    assert spans.count() == 2 * n_changes
    # replay (reprocess) rewrites the same segments — span COUNT unchanged
    # and ids identical (deterministic md5 identity); only the read-span
    # timestamps move, as a re-emission's processing time does
    ids_before = {r_["span_id"] for r_ in spans.select("span_id").collect()}
    r.reprocess(sorted({row["segment_id"] for row in log.select("segment_id").distinct().collect()}))
    spans2 = r.traces.read()
    assert spans2.count() == 2 * n_changes
    assert {r_["span_id"] for r_ in spans2.select("span_id").collect()} == ids_before
