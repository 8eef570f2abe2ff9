"""R7 post-process plug-in — CommitLogTransfer analog (archive / black-hole /
restore-for-reprocess; reference CommitLogTransfer.java,
BlackHoleCommitLogTransfer.java:15-31, error-restore
CommitLogProcessor.java:113-117)."""

import os

from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.sources.log_scan import (
    CommitLogTransfer,
    discover_segments,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

from .conftest import assert_state_equal
from .oracle import replay


def _mk_log(spark, path, n=1500):
    log = gen_mutation_log(
        spark, n, n_convs=20, max_turns=15, events_per_segment=500, seed=61
    )
    write_mutation_log(log, path)
    return log


def test_archive_on_success_and_restore(spark, tmp_path):
    log_path = str(tmp_path / "log")
    log = _mk_log(spark, log_path)
    transfer = CommitLogTransfer(log_path)
    runner = CdcRunner(
        spark, log_path, str(tmp_path / "t"), segments_per_batch=2,
        n_buckets=4, commit_log_transfer=transfer,
    )
    runner.run()
    # processed segments moved out of the active log root
    assert discover_segments(log_path) == []
    assert sorted(os.listdir(os.path.join(log_path, "_archive"))) == [
        "segment_id=0", "segment_id=1", "segment_id=2",
    ]
    # state unaffected by archival
    assert_state_equal(runner.target.read_transcripts(), replay(log.toPandas()))
    # restore + reprocess: idempotent replay leaves state identical
    assert transfer.restore(1)
    assert discover_segments(log_path) == [1]
    runner.reprocess([1])
    assert_state_equal(runner.target.read_transcripts(), replay(log.toPandas()))


def test_black_hole_deletes(spark, tmp_path):
    log_path = str(tmp_path / "log")
    _mk_log(spark, log_path, n=600)
    transfer = CommitLogTransfer(log_path, delete=True)
    runner = CdcRunner(
        spark, log_path, str(tmp_path / "t"), segments_per_batch=4,
        n_buckets=4, commit_log_transfer=transfer,
    )
    runner.run()
    assert discover_segments(log_path) == []
    assert not os.path.isdir(os.path.join(log_path, "_archive"))
    assert not transfer.restore(0)
