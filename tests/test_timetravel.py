"""Point-in-time replay (state_asof) + snapshot_diff semantics.

The event-time fold makes prefix replay exact (RecordMaker.java:58-96 ts
assignment): state_asof(T) must be blind to ANY mutation after T — deletes
can't reach back, upserts can't resurrect.  snapshot_diff must emit the
minimal c/u/d stream whose application transforms before into after.
"""

from pyspark.sql import Row, functions as F

from debezium_connector_cassandra_spark.operators.timetravel import (
    materialize_state,
    snapshot_diff,
    state_asof,
    writetime_horizon,
)
from debezium_connector_cassandra_spark.operators.transcript import (
    assemble_transcripts,
)
from tests.test_apply import _manual_log

PAYLOAD = ["role", "text", "tool", "ts"]


def test_asof_blind_to_future_mutations(spark):
    rows = [
        (0, 0, 0, "i", "c1", 1, 1000, ("user", "hello", None, None)),
        (1, 0, 0, "d", "c1", 1, 9000, None),  # delete after horizon
        (1, 16, 0, "i", "c2", 1, 8000, ("user", "late", None, None)),
    ]
    log = _manual_log(spark, rows)
    asof = {(r.conv_id, r.turn_idx, r.text) for r in state_asof(log, 5000, PAYLOAD).collect()}
    assert asof == {("c1", 1, "hello")}  # future delete/insert invisible
    fin = {(r.conv_id, r.text) for r in materialize_state(log, PAYLOAD).collect()}
    assert fin == {("c2", "late")}  # ...but both land in the final state


def test_asof_horizon_is_inclusive(spark):
    rows = [(0, 0, 0, "i", "c1", 1, 5000, ("user", "x", None, None))]
    log = _manual_log(spark, rows)
    assert state_asof(log, 5000, PAYLOAD).count() == 1
    assert state_asof(log, 4999, PAYLOAD).count() == 0


def test_asof_caps_tombstones_too(spark):
    # partition delete BEFORE the horizon still wins at T
    rows = [
        (0, 0, 0, "i", "c1", 1, 1000, ("user", "a", None, None)),
        (0, 16, 0, "p", "c1", None, 2000, None),
        (1, 0, 0, "i", "c1", 1, 9000, ("user", "reborn", None, None)),
    ]
    log = _manual_log(spark, rows)
    assert state_asof(log, 5000, PAYLOAD).count() == 0
    fin = {r.text for r in materialize_state(log, PAYLOAD).collect()}
    assert fin == {"reborn"}


def test_writetime_horizon_exact_arithmetic(spark):
    rows = [
        (0, 0, 0, "i", "c1", 1, 1000, ("user", "a", None, None)),
        (0, 16, 0, "i", "c1", 2, 9000, ("user", "b", None, None)),
    ]
    hz = writetime_horizon(_manual_log(spark, rows), 3, 4).collect()[0]
    assert hz["horizon_wt"] == 1000 + (9000 - 1000) * 3 // 4  # = 7000


def _state_df(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, role=r, text=x) for c, t, r, x in rows],
        "conv_id string, turn_idx int, role string, text string",
    )


def test_snapshot_diff_classification(spark):
    before = _state_df(
        spark,
        [
            ("c1", 1, "user", "same"),
            ("c1", 2, "user", "old"),
            ("c2", 1, "user", "gone"),
            ("c3", 1, None, "nullrole"),
        ],
    )
    after = _state_df(
        spark,
        [
            ("c1", 1, "user", "same"),  # unchanged -> absent
            ("c1", 2, "user", "new"),  # value change -> u
            ("c3", 1, "tool", "nullrole"),  # null -> value -> u
            ("c4", 1, "user", "created"),  # new key -> c
        ],
    )
    diff = snapshot_diff(before, after, ["conv_id", "turn_idx"], ["role", "text"])
    got = {(r.conv_id, r.turn_idx, r.diff_op, r.role, r.text) for r in diff.collect()}
    assert got == {
        ("c1", 2, "u", "user", "new"),
        ("c2", 1, "d", None, None),
        ("c3", 1, "u", "tool", "nullrole"),
        ("c4", 1, "c", "user", "created"),
    }


def test_snapshot_diff_applies_back(spark):
    """Applying the diff to the as-of state reproduces the final state —
    the changelog really is sufficient (on a generated full-mix log)."""
    from debezium_connector_cassandra_spark.sources.generator import gen_mutation_log

    log = gen_mutation_log(spark, 1500, n_convs=30, seed=41)
    payload = ["role", "text", "tool", "ts"]
    before = state_asof(log, writetime_horizon(log), payload)
    after = materialize_state(log, payload)
    diff = snapshot_diff(before, after, ["conv_id", "turn_idx"], payload)

    keys = ["conv_id", "turn_idx"]
    upserts = diff.where(F.col("diff_op") != "d").select(keys + payload)
    survivors = before.join(diff.select(keys), keys, "left_anti")
    rebuilt = survivors.unionByName(upserts)

    def norm(df):
        return {tuple(r) for r in df.select(keys + payload).collect()}

    assert norm(rebuilt) == norm(after)
    assert diff.count() > 0  # the window actually moved something


def test_assemble_transcripts_order_and_nulls(spark):
    state = _state_df(
        spark,
        [
            ("c1", 3, "assistant", "third"),
            ("c1", 1, "user", "first"),
            ("c1", 2, None, None),  # tombstoned cells keep their slot
            ("c2", 1, "user", "solo"),
        ],
    )
    got = {
        r.conv_id: r
        for r in assemble_transcripts(state.withColumn("tool", F.lit(None).cast("string"))).collect()
    }
    assert got["c1"].n_turns == 3
    assert got["c1"].last_turn == 3
    assert got["c1"].transcript == "user: first\n?: \nassistant: third"
    assert got["c1"].total_chars == len("first") + len("third")
    assert got["c2"].transcript == "user: solo"


def test_incremental_transcripts_equal_full_recompute(spark):
    """IVM contract: carrying untouched conversations + recomputing only the
    diff-touched ones equals the full assembly — including conversations
    that vanish entirely (deleted) and ones born after the horizon."""
    from debezium_connector_cassandra_spark.operators.transcript import (
        incremental_transcripts,
    )
    from debezium_connector_cassandra_spark.sources.generator import gen_mutation_log

    # wide conv pool + a narrow 1/10 change window so the fixture has BOTH
    # touched and untouched conversations
    log = gen_mutation_log(spark, 1500, n_convs=80, seed=43)
    payload = ["role", "text", "tool", "ts"]
    before = state_asof(log, writetime_horizon(log, 9, 10), payload)
    after = materialize_state(log, payload)
    diff = snapshot_diff(before, after, ["conv_id", "turn_idx"], payload)

    inc = incremental_transcripts(assemble_transcripts(before), after, diff)
    full = assemble_transcripts(after)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # and the window genuinely exercised both paths
    touched = {r.conv_id for r in diff.select("conv_id").distinct().collect()}
    carried = {r.conv_id for r in full.collect()} - touched
    assert touched and carried, "fixture must have touched AND untouched convs"


def test_assembly_from_runner_lake_state(spark, tmp_path):
    """Glue: transcripts assembled from the RUNNER's materialized lake state
    equal those assembled from the in-memory pipeline — the export composes
    with the real sink, not just the query path."""
    from debezium_connector_cassandra_spark.sources.generator import (
        gen_mutation_log,
        write_mutation_log,
    )
    from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

    log = gen_mutation_log(spark, 800, n_convs=15, events_per_segment=200, seed=44)
    write_mutation_log(log, str(tmp_path / "log"))
    r = CdcRunner(spark, str(tmp_path / "log"), str(tmp_path / "t"), n_buckets=4)
    r.run()
    payload = ["role", "text", "tool", "ts"]
    from_lake = assemble_transcripts(r.target.read_transcripts())
    from_mem = assemble_transcripts(materialize_state(log, payload))
    assert sorted(map(tuple, from_lake.collect())) == sorted(map(tuple, from_mem.collect()))
