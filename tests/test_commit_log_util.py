"""CommitLogUtil + UuidUtil parity — mirrors the reference's
CommitLogUtilTest.java and UuidUtilTest.java case for case."""

import os
import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.functions.types import (
    uuid_bytes_from_str,
    uuid_str_from_bytes,
)
from debezium_connector_cassandra_spark.sources.commit_log_util import (
    compare_commit_logs,
    delete_commit_log,
    extract_timestamp,
    get_commit_logs,
    get_indexes,
    move_commit_log,
    segment_alias_map,
)


def _touch(d, name):
    p = os.path.join(str(d), name)
    open(p, "w").close()
    return p


def test_move_commit_log(tmp_path):
    src = tmp_path / "from"
    dst = tmp_path / "to"
    src.mkdir(), dst.mkdir()
    _touch(src, "CommitLog-6-1.log")
    _touch(src, "Not-CommitLog-6-1.log")
    for f in os.listdir(src):
        move_commit_log(os.path.join(str(src), f), str(dst))
    assert os.listdir(dst) == ["CommitLog-6-1.log"]
    assert os.listdir(src) == ["Not-CommitLog-6-1.log"]


def test_delete_commit_log(tmp_path):
    log = _touch(tmp_path, "CommitLog-6-1.log")
    not_log = _touch(tmp_path, "Not-CommitLog-6-1.log")
    assert delete_commit_log(log)
    with pytest.raises(ValueError):
        delete_commit_log(not_log)
    assert not os.path.exists(log) and os.path.exists(not_log)


def test_get_commit_logs_and_indexes(tmp_path):
    for i in range(10):
        if i % 2 == 0:
            _touch(tmp_path, f"CommitLog-6-{i}.log")
        else:
            _touch(tmp_path, f"Not-CommitLog-6-{i}.log")
    _touch(tmp_path, "CommitLog-6-4_cdc.idx")
    logs = get_commit_logs(str(tmp_path))
    assert len(logs) == 5
    assert logs == sorted(logs, key=extract_timestamp)
    assert get_indexes(str(tmp_path)) == ["CommitLog-6-4_cdc.idx"]


def test_compare_commit_logs():
    assert compare_commit_logs("CommitLog-6-1.log", "CommitLog-6-2.log") == -1
    assert compare_commit_logs("CommitLog-6-1.log", "CommitLog-6-0.log") == 1
    assert compare_commit_logs("CommitLog-6-1.log", "CommitLog-6-1.log") == 0
    with pytest.raises(ValueError):
        compare_commit_logs("nope.log", "CommitLog-6-1.log")


def test_segment_alias_map(tmp_path):
    for ts in (1700000300, 1700000100, 1700000200):
        _touch(tmp_path, f"CommitLog-7-{ts}.log")
    m = segment_alias_map(str(tmp_path))
    assert m == {
        "CommitLog-7-1700000100.log": 0,
        "CommitLog-7-1700000200.log": 1,
        "CommitLog-7-1700000300.log": 2,
    }


def test_uuid_bytes_round_trip(spark):
    """UuidUtil.asUuid(asBytes(uuid)) == uuid, as Catalyst expressions."""
    us = [str(_uuid.uuid4()) for _ in range(4)] + [
        "00000000-0000-0000-0000-000000000000",
        "0f8fad5b-d9cb-469f-a165-70867728950e",
    ]
    df = spark.createDataFrame([(u,) for u in us], "u string")
    got = df.select(
        "u", uuid_str_from_bytes(uuid_bytes_from_str(F.col("u"))).alias("rt")
    ).collect()
    for r in got:
        assert r["rt"] == r["u"]
    # byte-level check against Python's big-endian uuid bytes
    raw = df.select(uuid_bytes_from_str(F.col("u")).alias("b"), "u").collect()
    for r in raw:
        assert bytes(r["b"]) == _uuid.UUID(r["u"]).bytes
