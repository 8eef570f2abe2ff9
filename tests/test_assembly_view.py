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
