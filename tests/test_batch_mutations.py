"""Logged-batch mutations: one Mutation carrying several row changes at ONE
commit-log offset.

Reference: handleMutation iterates mutation.getPartitionUpdates() under one
shared OffsetPosition (Cassandra4CommitLogReadHandlerImpl.java:255-272);
scenario tests/.../BatchTest.java:26-96 — a LOGGED batch of one partition
delete + three inserts with explicit per-statement USING TIMESTAMP + TTL,
emitted as 4 change events.
"""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.functions.decode import (
    explode_batch_mutations,
)
from debezium_connector_cassandra_spark.model import BATCH_LOG_SCHEMA
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    pack_batches,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner
from tests.oracle import replay


def _state_rows(runner):
    return sorted(tuple(r) for r in runner.target.read_transcripts().collect())


def test_pack_explode_roundtrip(spark):
    """explode(pack(log)) carries exactly the flat log's changes — same ops,
    keys, writetimes, cells — with each run sharing its batch offset."""
    log = gen_mutation_log(spark, 600, n_convs=20, events_per_segment=200, seed=5)
    packed = pack_batches(log, group_size=4)
    exploded = explode_batch_mutations(packed)
    cols = ["op", "conv_id", "turn_idx", "writetime", "cells", "range_start", "range_end"]
    a = sorted(map(tuple, log.select(*cols).collect()), key=repr)
    b = sorted(map(tuple, exploded.select(*cols).collect()), key=repr)
    assert a == b
    # members of one batch share the batch's offset (atomic offset grain)
    per_batch = (
        exploded.groupBy("segment_id", "position")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert any(r["n"] > 1 for r in per_batch)
    # batch count shrinks by ~group_size
    assert packed.count() <= (log.count() + 3) // 4 + packed.select("segment_id").distinct().count() * 2


def test_runner_batch_state_equals_flat_replay(spark, tmp_path):
    """The runner in batch_mutations mode materializes the same final state
    as the flattened replay, and offsets/lineage advance atomically at the
    batch grain."""
    log = gen_mutation_log(
        spark, 2000, n_convs=30, max_turns=20, events_per_segment=500,
        n_log_partitions=2, seed=9,
    )
    packed = pack_batches(log, group_size=5)
    batch_path = str(tmp_path / "batch_log")
    write_mutation_log(packed, batch_path)

    r = CdcRunner(
        spark, batch_path, str(tmp_path / "t"), n_buckets=4, batch_mutations=True
    )
    results = r.run()

    # final state == sequential replay of the FLAT log (the reference's
    # "batch equals its statements applied individually" semantics)
    want = replay(log.toPandas())
    got = (
        r.target.read_transcripts()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[want.columns]
    )
    got = got.where(pd.notnull(got), None)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # lineage counts CHANGES (one event per row change, like getEvents(4)
    # for a 4-statement batch), not batch records — the pre-scan runs on the
    # exploded relation
    assert sum(b["n_decoded"] for b in results) == log.count()

    # offsets: the watermark position is a BATCH position (atomic grain)
    batch_positions = {
        (row["log_partition"], row["segment_id"], row["position"])
        for row in packed.select("log_partition", "segment_id", "position").collect()
    }
    for lp, (seg, pos) in r.checkpointed_offsets().items():
        assert (lp, seg, pos) in batch_positions


def test_batchtest_scenario_delete_then_inserts(spark, tmp_path):
    """BatchTest.java mirror: ONE logged batch = partition delete at T plus
    inserts at T+1 (explicit USING TIMESTAMP). The inserts out-write the
    delete, so all inserted rows survive."""
    T0 = 1_683_810_323_861_000

    def cell(v):
        return {"value": v, "deletion_ts": None, "set": True}

    def cells(role, text):
        return {
            "role": cell(role),
            "text": cell(text),
            "tool": {"value": None, "deletion_ts": None, "set": False},
            "ts": {"value": None, "deletion_ts": None, "set": False},
        }

    changes = [
        {"op": "p", "conv_id": "abc", "turn_idx": None, "writetime": T0,
         "cells": None, "range_start": None, "range_end": None},
        {"op": "i", "conv_id": "abc", "turn_idx": 1, "writetime": T0 + 1,
         "cells": cells("user", "one"), "range_start": None, "range_end": None},
        {"op": "i", "conv_id": "abc", "turn_idx": 2, "writetime": T0 + 1,
         "cells": cells("assistant", "two"), "range_start": None, "range_end": None},
        {"op": "i", "conv_id": "abc", "turn_idx": 3, "writetime": T0 + 1,
         "cells": cells("tool", "three"), "range_start": None, "range_end": None},
    ]
    row = {
        "segment_id": 0, "position": 0, "log_partition": 0,
        "writetime": T0, "changes": changes, "schema_version": 1,
        "snapshot": False,
    }
    df = spark.createDataFrame([row], BATCH_LOG_SCHEMA)
    p = str(tmp_path / "log")
    df.write.mode("overwrite").partitionBy("segment_id").parquet(p)

    r = CdcRunner(spark, p, str(tmp_path / "t"), n_buckets=2, batch_mutations=True)
    results = r.run()
    assert sum(b["n_decoded"] for b in results) == 4  # one event per change
    state = {
        (row_["conv_id"], row_["turn_idx"]): row_["text"]
        for row_ in r.target.read_transcripts().collect()
    }
    assert state == {("abc", 1): "one", ("abc", 2): "two", ("abc", 3): "three"}


def test_member_writetime_inherits_batch_default(spark, tmp_path):
    """A member with NULL writetime takes the batch's default writetime (the
    no-USING-TIMESTAMP case): here the batch default is NEWER than an
    earlier flat insert, so the batch's update wins."""
    T0 = 1_700_000_000_000_000

    def cells(text, set_text=True):
        return {
            "role": {"value": None, "deletion_ts": None, "set": False},
            "text": {"value": text, "deletion_ts": None, "set": set_text},
            "tool": {"value": None, "deletion_ts": None, "set": False},
            "ts": {"value": None, "deletion_ts": None, "set": False},
        }

    rows = [
        {
            "segment_id": 0, "position": 0, "log_partition": 0, "writetime": T0,
            "changes": [
                {"op": "i", "conv_id": "k", "turn_idx": 1, "writetime": None,
                 "cells": cells("old"), "range_start": None, "range_end": None},
            ],
            "schema_version": 1, "snapshot": False,
        },
        {
            "segment_id": 0, "position": 16, "log_partition": 0,
            "writetime": T0 + 10,
            "changes": [
                {"op": "u", "conv_id": "k", "turn_idx": 1, "writetime": None,
                 "cells": cells("new"), "range_start": None, "range_end": None},
            ],
            "schema_version": 1, "snapshot": False,
        },
    ]
    df = spark.createDataFrame(rows, BATCH_LOG_SCHEMA)
    p = str(tmp_path / "log")
    df.write.mode("overwrite").partitionBy("segment_id").parquet(p)
    r = CdcRunner(spark, p, str(tmp_path / "t"), n_buckets=2, batch_mutations=True)
    r.run()
    rows_ = r.target.read_transcripts().collect()
    assert len(rows_) == 1 and rows_[0]["text"] == "new"


def test_streaming_front_end_batch_parity(spark, tmp_path):
    """The streaming front-end explodes logged batches identically to the
    batch runner: same final state from the same batch-shaped log."""
    from debezium_connector_cassandra_spark.streaming.stream import CdcStream

    log = gen_mutation_log(spark, 900, n_convs=15, events_per_segment=300, seed=21)
    packed = pack_batches(log, group_size=3)
    p = str(tmp_path / "log")
    write_mutation_log(packed, p)

    r_batch = CdcRunner(spark, p, str(tmp_path / "tb"), n_buckets=4, batch_mutations=True)
    r_batch.run()

    r_stream = CdcRunner(spark, p, str(tmp_path / "ts"), n_buckets=4, batch_mutations=True)
    CdcStream(r_stream, max_files_per_trigger=2).run_available(str(tmp_path / "ckpt"))
    assert _state_rows(r_stream) == _state_rows(r_batch)
