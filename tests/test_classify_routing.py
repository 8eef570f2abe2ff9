"""D3 classify-and-skip (unsupported partition types) and R1 routing modes
at the runner surface.

Reference: PartitionType.getPartitionType:137-156 / validity :158-168 /
handler guard Cassandra4CommitLogReadHandlerImpl.java:102-168 (skip with
warning, no change events); getPartitionQueueIndex :672-685 + config
CassandraConnectorConfig.java:246-288 (COMMITLOG_FILE vs PARTITION_VALUES
queue assignment)."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.functions.decode import (
    UNSUPPORTED_KINDS,
    split_unsupported,
)
from debezium_connector_cassandra_spark.operators.routing import (
    COMMITLOG_FILE,
    PARTITION_VALUES,
    queue_index,
    routing_stats,
)
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    tag_table_kinds,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner


@pytest.fixture(scope="module")
def log(spark):
    return gen_mutation_log(
        spark, 3000, n_convs=40, max_turns=20, events_per_segment=1000,
        n_log_partitions=2, seed=7,
    )


def _state_rows(runner):
    return sorted(
        tuple(r) for r in runner.target.read_transcripts().collect()
    )


def test_unsupported_skipped_state_untouched(spark, log, tmp_path):
    tagged = tag_table_kinds(log)
    n_unsup = tagged.where(
        F.col("table_kind").isin(*UNSUPPORTED_KINDS.keys())
    ).count()
    assert n_unsup > 0

    # baseline: the same log with unsupported rows REMOVED up front
    base_path = str(tmp_path / "log_base")
    supported, skipped = split_unsupported(tagged)
    write_mutation_log(supported.drop("table_kind"), base_path)
    r_base = CdcRunner(spark, base_path, str(tmp_path / "t_base"), n_buckets=4)
    r_base.run()

    # engine path: full tagged log, classify-and-skip inside the runner
    tag_path = str(tmp_path / "log_tagged")
    write_mutation_log(tagged, tag_path)
    r = CdcRunner(
        spark, tag_path, str(tmp_path / "t_tag"), n_buckets=4, log_schema="infer"
    )
    results = r.run()

    assert _state_rows(r) == _state_rows(r_base)
    assert sum(b["n_skipped"] for b in results) == n_unsup
    metrics = r.metrics.read()
    assert metrics.agg(F.sum("n_skipped")).collect()[0][0] == n_unsup
    # skipped rows still advance offsets: watermarks equal the full log's max
    want = {
        (r_["log_partition"]): (r_["segment_id"], r_["position"])
        for r_ in tagged.groupBy("log_partition")
        .agg(F.max(F.struct("segment_id", "position")).alias("w"))
        .select("log_partition", "w.segment_id", "w.position")
        .collect()
    }
    assert r.checkpointed_offsets() == want
    # per-kind counts relation covers all three kinds
    kinds = {r_["partition_type"] for r_ in skipped.collect()}
    assert kinds == set(UNSUPPORTED_KINDS.values())


def test_tagged_log_autoincluded_without_schema_config(spark, log, tmp_path):
    """A tagged log read with the DEFAULT schema config must still classify
    and skip: the runner detects the on-disk table_kind column and
    auto-includes it (warning), so counter/MV/SI mutations can never be
    applied as normal rows by a forgotten log_schema='infer'."""
    tagged = tag_table_kinds(log)
    n_unsup = tagged.where(
        F.col("table_kind").isin(*UNSUPPORTED_KINDS.keys())
    ).count()
    tag_path = str(tmp_path / "log_tagged")
    write_mutation_log(tagged, tag_path)

    supported, _ = split_unsupported(tagged)
    base_path = str(tmp_path / "log_base")
    write_mutation_log(supported.drop("table_kind"), base_path)
    r_base = CdcRunner(spark, base_path, str(tmp_path / "t_base"), n_buckets=4)
    r_base.run()

    with pytest.warns(UserWarning, match="table_kind"):
        r = CdcRunner(spark, tag_path, str(tmp_path / "t_tag"), n_buckets=4)
    results = r.run()
    assert sum(b["n_skipped"] for b in results) == n_unsup
    assert _state_rows(r) == _state_rows(r_base)


def test_routing_modes_contract(spark, log):
    # COMMITLOG_FILE: one segment -> exactly one queue
    per_seg = (
        log.withColumn("queue", queue_index(COMMITLOG_FILE, 4))
        .groupBy("segment_id")
        .agg(F.count_distinct("queue").alias("nq"))
        .collect()
    )
    assert all(r["nq"] == 1 for r in per_seg)
    # PARTITION_VALUES: one conv -> exactly one queue
    per_conv = (
        log.withColumn("queue", queue_index(PARTITION_VALUES, 4))
        .groupBy("conv_id")
        .agg(F.count_distinct("queue").alias("nq"))
        .collect()
    )
    assert all(r["nq"] == 1 for r in per_conv)
    # occupancy totals match the log size in both modes
    for mode in (PARTITION_VALUES, COMMITLOG_FILE):
        st = routing_stats(log, mode, n_queues=4)
        assert st.agg(F.sum("n_events")).collect()[0][0] == log.count()


def test_route_df_one_partition_per_queue(spark, log):
    """route_df must place queue i alone in shuffle partition i (the
    reference's one-ordered-queue-per-worker contract): a second hash of the
    queue index would collide queues into shared partitions and leave others
    empty. Over a covering key set, n queues -> n distinct non-empty
    partitions with an identity queue->partition mapping."""
    from debezium_connector_cassandra_spark.operators.routing import route_df

    for mode in (PARTITION_VALUES, COMMITLOG_FILE):
        routed = route_df(log, mode, n_queues=4)
        rows = (
            routed.withColumn("pid", F.spark_partition_id())
            .groupBy("queue")
            .agg(F.collect_set("pid").alias("pids"))
            .collect()
        )
        occupied = {r["queue"] for r in rows}
        assert len(occupied) >= 2  # covering key set exercises several queues
        for r in rows:
            assert r["pids"] == [r["queue"]], (mode, r)


def test_routing_mode_state_invariant(spark, log, tmp_path):
    """Either routing mode (and none) produces the identical final state —
    the LWW reduction is order-insensitive, as in the reference where the
    mode only changes queue ordering guarantees."""
    p = str(tmp_path / "log")
    write_mutation_log(log, p)
    states = []
    for i, mode in enumerate([None, PARTITION_VALUES, COMMITLOG_FILE]):
        r = CdcRunner(
            spark, p, str(tmp_path / f"t{i}"), n_buckets=4, routing_mode=mode
        )
        r.run()
        states.append(_state_rows(r))
    assert states[0] == states[1] == states[2]


def test_unknown_routing_mode_rejected(spark, log, tmp_path):
    p = str(tmp_path / "log")
    write_mutation_log(log, p)
    with pytest.raises(ValueError, match="routing mode"):
        CdcRunner(spark, p, str(tmp_path / "t"), routing_mode="bogus")


def test_streaming_metrics_gauges(spark, log, tmp_path):
    """R10: the CassandraStreamingMetrics gauge values (commit-log
    filename/position per partition, processed/skipped totals) computed
    from bookkeeping state — including after a restart (recovered state)."""
    p = str(tmp_path / "log")
    write_mutation_log(tag_table_kinds(log), p)
    r = CdcRunner(
        spark, p, str(tmp_path / "t"), n_buckets=4, log_schema="infer",
        segments_per_batch=2,
    )
    r.run()
    m = r.streaming_metrics()
    assert m["n_processed"] > 0 and m["n_skipped"] > 0
    assert m["n_segments_done"] == len(r.done_segments())
    want = {
        r_["log_partition"]: (r_["segment_id"], r_["position"])
        for r_ in spark.read.parquet(p)
        .groupBy("log_partition")
        .agg(F.max(F.struct("segment_id", "position")).alias("w"))
        .select("log_partition", "w.segment_id", "w.position")
        .collect()
    }
    for lp, (seg, pos) in want.items():
        g = m["per_partition"][lp]
        assert g["commit_log_filename"] == f"CommitLog-7-{seg}.log"
        assert g["commit_log_position"] == pos
    # gauges survive a restart (recovered from bookkeeping tables)
    r2 = CdcRunner(spark, p, str(tmp_path / "t"), n_buckets=4, log_schema="infer")
    m2 = r2.streaming_metrics()
    assert m2["per_partition"] == m["per_partition"]
    assert m2["n_processed"] == m["n_processed"]
