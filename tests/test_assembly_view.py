"""Runner-maintained transcript assembly view (IVM in the ingest loop).

CdcRunner(maintain_assembly=True) keeps a per-conversation transcript table
exactly up to date: after every state commit, the buckets containing the
batch's conversations are re-assembled from state and COW-swapped, BEFORE
offsets land (same crash-safety side as the state)."""

from debezium_connector_cassandra_spark.operators.transcript import (
    assemble_transcripts,
)
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_assembly_tracks_state_across_batches(spark, tmp_path):
    log = gen_mutation_log(spark, 1200, n_convs=30, events_per_segment=150, seed=51)
    write_mutation_log(log, str(tmp_path / "log"))
    r = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "t"),
        segments_per_batch=2,
        n_buckets=8,
        maintain_assembly=True,
    )
    reports = r.run()
    assert len(reports) >= 3  # several refreshes, not one
    assert _rows(r.read_assembly()) == _rows(
        assemble_transcripts(r.target.read_transcripts())
    )


def test_assembly_idempotent_under_reprocess(spark, tmp_path):
    """Replaying a segment with the offset bypass (error-recovery path) must
    leave the maintained view identical — the refresh is recompute-from-
    state, not an increment that could double-apply."""
    log = gen_mutation_log(spark, 800, n_convs=20, events_per_segment=200, seed=52)
    write_mutation_log(log, str(tmp_path / "log"))
    r = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "t"),
        n_buckets=8,
        maintain_assembly=True,
    )
    r.run()
    before = _rows(r.read_assembly())
    seg = sorted(r.done_segments())[0]
    r.reprocess([seg])
    assert _rows(r.read_assembly()) == before


def test_assembly_drops_fully_deleted_conversations(spark, tmp_path):
    """A conversation whose rows are all tombstoned must vanish from the
    view — whole-bucket recompute, not upsert-only maintenance."""
    from tests.test_apply import _manual_log

    # segment 0 creates two convs; segment 1 partition-deletes c1
    rows = [
        (0, 0, 0, "i", "c1", 1, 1000, ("user", "a", None, None)),
        (0, 16, 0, "i", "c2", 1, 1100, ("user", "b", None, None)),
        (1, 0, 0, "p", "c1", None, 2000, None),
    ]
    write_mutation_log(_manual_log(spark, rows), str(tmp_path / "log"))
    r = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "t"),
        segments_per_batch=1,
        n_buckets=4,
        maintain_assembly=True,
    )
    r.run(max_batches=1)
    assert {t[0] for t in _rows(r.read_assembly())} == {"c1", "c2"}
    r.run()
    got = _rows(r.read_assembly())
    assert {t[0] for t in got} == {"c2"}
    assert got == _rows(assemble_transcripts(r.target.read_transcripts()))


def test_assembly_streaming_parity(spark, tmp_path):
    """The streaming front-end maintains the same view: drain via CdcStream
    with maintain_assembly=True, compare against a fresh batch run."""
    from debezium_connector_cassandra_spark.streaming.stream import CdcStream

    log = gen_mutation_log(spark, 800, n_convs=20, events_per_segment=200, seed=53)
    write_mutation_log(log, str(tmp_path / "log"))
    rs = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "ts"),
        n_buckets=8,
        maintain_assembly=True,
    )
    CdcStream(rs, max_files_per_trigger=2).run_available(str(tmp_path / "ckpt"))
    rb = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "tb"),
        n_buckets=8,
        maintain_assembly=True,
    )
    rb.run()
    assert _rows(rs.read_assembly()) == _rows(rb.read_assembly())
    assert _rows(rs.read_assembly()) == _rows(
        assemble_transcripts(rs.target.read_transcripts())
    )


def test_assembly_multi_table(spark, tmp_path):
    """Per-table maintained views in the multi-table runner: the transcripts
    table uses role+text lines, the notes table (no role column) bare body
    lines; the events table gets NO view. Both views equal a recompute from
    their table's state."""
    from pyspark.sql import types as T

    from debezium_connector_cassandra_spark.model import TableSpec
    from debezium_connector_cassandra_spark.sources.generator import (
        gen_multi_table_log,
    )
    from debezium_connector_cassandra_spark.streaming.multi_table import (
        MultiTableRunner,
    )

    specs = [
        TableSpec(
            keyspace="ks1",
            table="transcripts",
            partition_key="conv_id",
            clustering_key="turn_idx",
            payload=(("role", T.StringType()), ("text", T.StringType())),
        ),
        TableSpec(
            keyspace="ks2",
            table="notes",
            partition_key="doc_id",
            clustering_key="rev",
            payload=(("body", T.StringType()),),
        ),
    ]
    log = gen_multi_table_log(
        spark, specs, n_events=2000, n_convs=20, max_turns=10,
        events_per_segment=500, n_log_partitions=2, seed=61,
    )
    write_mutation_log(log, str(tmp_path / "log"))
    r = MultiTableRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "root"),
        specs,
        segments_per_batch=2,
        n_buckets=4,
        maintain_assembly={
            "ks1.transcripts": {"role": "role", "text": "text"},
            "ks2.notes": {"role": None, "text": "body"},
        },
    )
    r.run()
    want_t = assemble_transcripts(
        r.targets["ks1.transcripts"].read_transcripts(), role_col="role", text_col="text"
    )
    assert _rows(r.read_assembly("ks1.transcripts")) == _rows(want_t)
    want_n = assemble_transcripts(
        r.targets["ks2.notes"].read_transcripts(), role_col=None, text_col="body"
    )
    assert _rows(r.read_assembly("ks2.notes")) == _rows(want_n)
    # bare-text lines really have no "role: " prefix
    sample = r.read_assembly("ks2.notes").collect()
    assert sample and all(": " not in t.transcript.split("\n")[0][:2] for t in sample)


def test_assembly_multi_table_validates_columns(spark, tmp_path):
    from pyspark.sql import types as T

    from debezium_connector_cassandra_spark.model import TableSpec
    from debezium_connector_cassandra_spark.streaming.multi_table import (
        MultiTableRunner,
    )
    import pytest

    spec = TableSpec(
        keyspace="ks2", table="notes", partition_key="doc_id",
        clustering_key="rev", payload=(("body", T.StringType()),),
    )
    with pytest.raises(ValueError, match="not in payload"):
        MultiTableRunner(
            spark, str(tmp_path / "log"), str(tmp_path / "root"), [spec],
            maintain_assembly={"ks2.notes": {"text": "missing_col"}},
        )
    with pytest.raises(ValueError, match="unknown table"):
        MultiTableRunner(
            spark, str(tmp_path / "log"), str(tmp_path / "root2"), [spec],
            maintain_assembly={"nope.nope": {"text": "body"}},
        )


def test_assembly_follows_snapshot_bootstrap(spark, tmp_path):
    """The snapshot path writes state too — the maintained view must pick
    up snapshot-inserted conversations before any log batch runs."""
    from pyspark.sql import Row

    from debezium_connector_cassandra_spark.sources.snapshot import (
        SnapshotMode,
        SnapshotProcessor,
    )

    log = gen_mutation_log(spark, 400, n_convs=10, events_per_segment=200, seed=54)
    write_mutation_log(log, str(tmp_path / "log"))
    r = CdcRunner(
        spark,
        str(tmp_path / "log"),
        str(tmp_path / "t"),
        n_buckets=8,
        maintain_assembly=True,
    )
    pre = spark.createDataFrame(
        [
            Row(conv_id="pre_1", turn_idx=0, role="user", text="hello", tool=None, ts=None),
            Row(conv_id="pre_1", turn_idx=1, role="assistant", text="hi", tool=None, ts=None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    SnapshotProcessor(r).take(pre, snapshot_writetime=1, mode=SnapshotMode.INITIAL)
    snap_view = {t[0]: t for t in _rows(r.read_assembly())}
    assert snap_view["pre_1"][4] == "user: hello\nassistant: hi"
    r.run()
    assert _rows(r.read_assembly()) == _rows(
        assemble_transcripts(r.target.read_transcripts())
    )
