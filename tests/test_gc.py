"""Tombstone GC wired into the runner loop (gc_grace policy).

Cassandra keeps tombstones for gc_grace_seconds so a late out-of-order write
can still lose to an earlier-delivered delete with a higher writetime; past
the grace they are compacted away. Here the grace is derived from the
PRODUCER'S bounded writetime-inversion window
(sources.generator.writetime_inversion_window_us): the horizon trails the
max APPLIED writetime by that window, so a purged tombstone can never be
out-raced by an event that has not been applied yet — GC is observationally
invisible (asserted below against a no-GC twin run) while bounding the one
otherwise-unbounded relation in the design.
"""

import pandas as pd
from pyspark.sql import functions as F, types as T

from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
    writetime_inversion_window_us,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

from .test_apply import _manual_log


def _append_segments(spark, path, rows):
    _manual_log(spark, rows).write.mode("append").partitionBy("segment_id").parquet(path)


def test_gc_preserves_deletes_inside_grace_window(spark, tmp_path):
    """A young delete survives GC and still kills a later-delivered
    out-of-order upsert; an ancient tombstone below the horizon is purged."""
    log = str(tmp_path / "log")
    W = 10_000_000
    _append_segments(
        spark,
        log,
        [
            (0, 0, 0, "i", "c1", 1, W - 100, ("user", "doomed", None, None)),
            (0, 16, 0, "p", "c1", None, W, None),  # young partition delete
            (0, 32, 0, "d", "c9", 1, W - 9_000_000, None),  # ancient, purgeable
            (0, 48, 0, "i", "c2", 1, W - 50, ("user", "keep", None, None)),
        ],
    )
    r = CdcRunner(
        spark,
        log,
        str(tmp_path / "t"),
        n_buckets=4,
        segments_per_batch=1,
        gc_grace_us=5_000_000,
        gc_every_batches=1,
    )
    r.run()
    # GC ran after the batch with horizon = W - 5_000_000: the ancient 'd'
    # tombstone (wt = W - 9M) is purged, the young 'p' (wt = W) retained
    stored = r.target.tombstones.read().collect()
    assert {s["kind"] for s in stored} == {"p"}
    assert r.streaming_metrics()["n_tombstones_purged"] == 1

    # a late out-of-order upsert INSIDE the grace window still loses to the
    # retained tombstone — the correctness GC must never break
    _append_segments(
        spark, log, [(1, 0, 0, "u", "c1", 1, W - 1000, ("user", "zombie", None, None))]
    )
    r.run()
    got = {row["conv_id"]: row for row in r.target.read_transcripts().collect()}
    assert "c1" not in got
    assert got["c2"]["text"] == "keep"


def test_gc_disabled_raises_and_records_nothing(spark, tmp_path):
    log = str(tmp_path / "log")
    _append_segments(spark, log, [(0, 0, 0, "i", "c1", 1, 100, ("user", "x", None, None))])
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=2)
    r.run()
    assert r.gc_log is None
    assert r.streaming_metrics()["n_tombstones_purged"] == 0
    try:
        r.gc()
        raise AssertionError("gc() should require gc_grace_us")
    except ValueError:
        pass


def test_gc_bounds_store_over_long_run_state_identical(spark, tmp_path):
    """Across a 16-batch drain with GC every 2 batches: (a) the stored
    tombstone count stays bounded — every survivor is within grace of the
    final watermark; (b) the final state is IDENTICAL to a no-GC run."""
    log = str(tmp_path / "log")
    df = gen_mutation_log(
        spark, 4000, n_convs=40, events_per_segment=250, seed=9, wt_jitter_events=100
    )
    write_mutation_log(df, log)
    grace = writetime_inversion_window_us(100)

    r = CdcRunner(
        spark,
        log,
        str(tmp_path / "t"),
        n_buckets=4,
        segments_per_batch=1,
        gc_grace_us=grace,
        gc_every_batches=2,
    )
    r.run()

    n_tombs_total = df.where(F.col("op").isin("d", "p", "r")).count()
    store = r.target.tombstones.read()
    assert store.count() < n_tombs_total  # something was actually purged
    # bounded: no survivor below the final horizon
    horizon = r._max_writetime - grace
    assert store.where(F.col("wt") <= horizon).count() == 0
    assert r.streaming_metrics()["n_tombstones_purged"] > 0

    # GC is observationally invisible: state equals the no-GC twin
    r2 = CdcRunner(spark, log, str(tmp_path / "t2"), n_buckets=4, segments_per_batch=1)
    r2.run()

    def norm(d):
        p = d.toPandas()
        return p.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        norm(r.target.read_transcripts()), norm(r2.target.read_transcripts())
    )


def test_gc_between_batches_never_changes_state_property(spark):
    """Property (hypothesis): for ANY random mutation log split into two
    batches, purging tombstones below (min writetime of batch 2 - 1) between
    the applies yields EXACTLY the no-GC final state — the premise "no
    future event's writetime is at or below the horizon" holds by
    construction, so this pins the GC-safety argument itself, not just the
    generator's bounded-inversion instance of it."""
    import shutil
    import tempfile

    import pandas as pd
    from hypothesis import HealthCheck, assume, given, settings
    from hypothesis import strategies as st

    from debezium_connector_cassandra_spark.plans.apply import (
        CdcTarget,
        apply_batch,
        gc_tombstones,
    )

    from .test_property import LOG_SCHEMA, PAYLOAD, mutation_log

    payload = {c: T.StringType() for c in PAYLOAD}

    def final_state(rows_b1, rows_b2, with_gc):
        wd = tempfile.mkdtemp(prefix="gcprop_")
        try:
            tgt = CdcTarget.create(spark, f"{wd}/t", n_buckets=2, payload=payload)
            apply_batch(tgt, spark.createDataFrame(rows_b1, LOG_SCHEMA))
            if with_gc:
                horizon = min(r[5] for r in rows_b2) - 1
                gc_tombstones(tgt, horizon)
            apply_batch(tgt, spark.createDataFrame(rows_b2, LOG_SCHEMA))
            pdf = (
                tgt.read_transcripts()
                .toPandas()
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True)
            )
            # mask must be computed on the SAME (sorted, reindexed) frame:
            # .where aligns on index, so a mask from the unsorted frame nulls
            # arbitrary rows whenever Spark's output order varies
            return pdf.where(pd.notnull(pdf), None)
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(mutation_log(), st.integers(min_value=1, max_value=23))
    def check(log_rows, split):
        assume(0 < split < len(log_rows))
        b1, b2 = log_rows[:split], log_rows[split:]
        pd.testing.assert_frame_equal(
            final_state(b1, b2, with_gc=True),
            final_state(b1, b2, with_gc=False),
            check_dtype=False,
        )

    check()


def test_mt_runner_gc_sweeps_every_table(spark, tmp_path):
    from debezium_connector_cassandra_spark.model import TableSpec
    from debezium_connector_cassandra_spark.sources.generator import gen_multi_table_log
    from debezium_connector_cassandra_spark.streaming.multi_table import MultiTableRunner

    specs = [
        TableSpec(
            keyspace="ks1",
            table="a",
            partition_key="conv_id",
            clustering_key="turn_idx",
            payload=(("v", T.StringType()),),
        ),
        TableSpec(
            keyspace="ks1",
            table="b",
            partition_key="sid",
            clustering_key="seq",
            payload=(("w", T.IntegerType()),),
        ),
    ]
    log = str(tmp_path / "log")
    df = gen_multi_table_log(
        spark, specs, n_events=2400, n_convs=20, events_per_segment=300, seed=5,
        wt_jitter_events=100,
    )
    write_mutation_log(df, log)
    grace = writetime_inversion_window_us(100)
    r = MultiTableRunner(
        spark,
        log,
        str(tmp_path / "t"),
        specs,
        segments_per_batch=2,
        gc_grace_us=grace,
        gc_every_batches=2,
    )
    r.run()
    res = r.gc()  # explicit final sweep: audit rows cover every table
    assert set(res["tables"]) == {"ks1.a", "ks1.b"}
    horizon = r._max_writetime - grace
    for fqtn in ("ks1.a", "ks1.b"):
        assert (
            r.targets[fqtn].tombstones.read().where(F.col("wt") <= horizon).count() == 0
        )
    audit = r.gc_log.read().toPandas()
    assert set(audit["fqtn"]) == {"ks1.a", "ks1.b"}


def test_gc_skipped_while_segments_quarantined(spark, tmp_path):
    """GC must not purge while run(on_error='isolate') holds quarantined
    segments: their events (writetimes at/below a later horizon) are
    replayed by reprocess() AFTER the purge would have run, so a purged
    delete could be out-raced by the replayed upsert (deleted-row
    resurrection). The guard: gc() is a no-op until the quarantine clears,
    and the reprocess itself still converges to the full replay."""
    import os

    from .conftest import assert_state_equal
    from .oracle import replay

    log = gen_mutation_log(spark, 1200, n_convs=30, events_per_segment=300, seed=93)
    path = str(tmp_path / "log")
    write_mutation_log(log, path)
    bad = os.path.join(path, "segment_id=1", "zz-corrupt.parquet")
    with open(bad, "wb") as f:
        f.write(b"not parquet")
    r = CdcRunner(
        spark, path, str(tmp_path / "t"), n_buckets=4, segments_per_batch=2,
        gc_grace_us=0, gc_every_batches=1,  # grace 0: maximally eager purge
    )
    r.run(on_error="isolate")
    assert r.errored_segments() == {1}
    # the eager GC cadence ran, but every invocation was skipped
    assert r.gc() == {"n_purged": 0, "n_kept": 0, "horizon_wt": None}
    assert r.streaming_metrics()["n_tombstones_purged"] == 0

    os.remove(bad)
    r.reprocess([1])
    assert r.errored_segments() == set()
    assert_state_equal(r.target.read_transcripts(), replay(log.toPandas()))
    # quarantine cleared: GC resumes and the horizon is the applied max
    res = r.gc()
    assert res["horizon_wt"] is not None
