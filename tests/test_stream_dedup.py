"""Streaming duplicate elimination (dropDuplicatesWithinWatermark).

Pins the module contract of streaming/stream_dedup.py:
(1) the drained output equals the batch distinct of the log even when
    duplicates are REDELIVERED in later micro-batches (where a per-batch
    distinct cannot see them);
(2) the fixture genuinely redelivers across micro-batches (dup files carry
    later mtimes, the drain runs several batches, the noisy row count
    exceeds the clean one);
(3) no identity is emitted twice across the whole drain;
(4) delay-independence: a tight watermark (late-gate removes old
    redeliveries) and a generous one (identity state removes them) drain to
    the same relation.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.operators.dedup import EVENT_IDENTITY
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.stream_dedup import (
    drain_dedup_stream,
)
from debezium_connector_cassandra_spark.streaming.windowed import (
    stamp_redelivery,
    stamp_segment_order,
)

IDENT = [*EVENT_IDENTITY, "op"]


def _redelivered_log(spark, wd, seed=78, wt_jitter_events=500, lag=15):
    log = gen_mutation_log(
        spark, 1200, n_convs=30, events_per_segment=300, seed=seed,
        wt_jitter_events=wt_jitter_events,
    )
    write_mutation_log(log, f"{wd}/log")
    stamp_segment_order(f"{wd}/log")
    # ~25% of each segment re-shipped ~lag/10 segments later (crashed
    # reader); positions are multiples of 16, so mod 64 picks every 4th
    dups = log.where(F.pmod(F.col("position"), F.lit(64)) == 0)
    dups.write.mode("append").partitionBy("segment_id").parquet(f"{wd}/log")
    stamp_redelivery(f"{wd}/log", lag=lag)
    return log


@pytest.fixture(scope="module")
def drained(spark):
    wd = tempfile.mkdtemp(prefix="sdedup_")
    log = _redelivered_log(spark, wd)
    got = drain_dedup_stream(
        spark, f"{wd}/log", wd, watermark_delay="365 days", max_files_per_trigger=1
    ).toPandas()
    spool = spark.read.parquet(f"{wd}/dedup_spool").toPandas()
    noisy = spark.read.parquet(f"{wd}/log")
    expected = log.select(*IDENT).distinct().toPandas()
    yield got, spool, noisy, expected
    shutil.rmtree(wd, ignore_errors=True)


def _norm(pdf):
    # the log's segment_id partition column reads back as int32 — compare
    # values, not physical integer widths
    out = pdf[IDENT].astype({"segment_id": "int64"})
    return out.sort_values(IDENT).reset_index(drop=True)


def test_drain_equals_batch_distinct(drained):
    got, _, _, expected = drained
    assert _norm(got).equals(_norm(expected))


def test_fixture_redelivers_across_microbatches(drained):
    got, spool, noisy, _ = drained
    # duplicates exist in the raw directory...
    assert noisy.count() > len(got)
    # ...the drain ran as several micro-batches...
    assert spool["_bid"].nunique() > 1
    # ...and at least one duplicate FILE was delivered in a later batch than
    # its primary: with maxFilesPerTrigger=1, primaries of segment k drain
    # before its redelivery file (mtime k*10 < k*10+15), so dedup state had
    # to survive across batches for the counts to come out clean.
    first_bid = spool.groupby("segment_id")["_bid"].min()
    assert (first_bid.sort_index().diff().dropna() > 0).any()


def test_no_identity_emitted_twice(drained):
    _, spool, _, _ = drained
    assert not spool.duplicated(subset=IDENT).any()


def test_delay_independence(spark):
    # tight watermark: redeliveries (re-shipped 3.5 segments ≈ 1.1 s of
    # event time later, with the inversion window shrunk to ±2 ms so
    # primaries are never late behind a 100 ms watermark) fall BELOW the
    # watermark and are removed by the late gate instead of identity state
    # — same drained relation either way
    wd = tempfile.mkdtemp(prefix="sdedup_tight_")
    try:
        log = _redelivered_log(spark, wd, seed=79, wt_jitter_events=2, lag=35)
        got = drain_dedup_stream(
            spark, f"{wd}/log", wd, watermark_delay="100 milliseconds",
            max_files_per_trigger=1,
        ).toPandas()
        expected = log.select(*IDENT).distinct().toPandas()
        assert _norm(got).equals(_norm(expected))
    finally:
        shutil.rmtree(wd, ignore_errors=True)
