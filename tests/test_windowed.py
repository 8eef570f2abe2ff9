"""Watermarked event-time windowed change-rate aggregation.

Pins (1) update-mode drain parity with a batch groupBy when the watermark
covers the producer's bounded writetime inversion and segments arrive in
order — the no-data-loss claim windowed.py makes; (2) append-mode
exactly-once window emission: a strict prefix of the ground truth (open
windows unemitted), byte-equal where emitted; (3) the failure mode
stamp_segment_order exists for: unordered backfill delivery + a tight
watermark genuinely LOSES data (documented, measured), which is why the
CDC apply path never uses an event-time watermark pre-filter.
"""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
    writetime_inversion_window_us,
)
from debezium_connector_cassandra_spark.streaming.windowed import (
    drain_change_rate,
    stamp_segment_order,
)

WIN_US = 500_000


@pytest.fixture(scope="module")
def rate_fixture(spark):
    wd = tempfile.mkdtemp(prefix="windowed_")
    log = gen_mutation_log(
        spark, 4000, n_convs=40, events_per_segment=500, seed=11, wt_jitter_events=50
    )
    # one file per segment + ascending mtimes = in-order arrival
    write_mutation_log(log.repartition("segment_id"), f"{wd}/log")
    stamp_segment_order(f"{wd}/log")
    expected = (
        log.groupBy(
            (F.col("writetime") - F.pmod("writetime", F.lit(WIN_US))).alias(
                "window_start_us"
            ),
            "op",
        )
        .agg(F.count("*").alias("n"))
        .withColumn("window_end_us", F.col("window_start_us") + WIN_US)
        .toPandas()
    )
    yield wd, expected
    shutil.rmtree(wd, ignore_errors=True)


def _drain(spark, wd, mode):
    sub = tempfile.mkdtemp(prefix=mode, dir=wd)
    # watermark 200ms > the 104ms inversion bound for wt_jitter_events=50
    assert writetime_inversion_window_us(50) < 200_000
    return drain_change_rate(
        spark,
        f"{wd}/log",
        sub,
        window_duration="500 milliseconds",
        watermark_delay="200 milliseconds",
        output_mode=mode,
        max_files_per_trigger=1,
    ).toPandas()


def _canon(df):
    cols = ["window_start_us", "window_end_us", "op", "n"]
    return df[cols].sort_values(cols[:3]).reset_index(drop=True)


def test_update_mode_counts_match_batch_aggregate(spark, rate_fixture):
    wd, expected = rate_fixture
    got = _drain(spark, wd, "update")
    pd.testing.assert_frame_equal(_canon(got), _canon(expected), check_dtype=False)


def test_append_mode_emits_exact_closed_prefix(spark, rate_fixture):
    wd, expected = rate_fixture
    got = _drain(spark, wd, "append")
    e = _canon(expected)
    m = got.merge(e, on=["window_start_us", "op"], suffixes=("_got", "_exp"))
    # every emitted window is real and its count is final-exact
    assert len(m) == len(got)
    assert (m["n_got"] == m["n_exp"]).all()
    # watermark advanced across micro-batches: most windows closed and
    # emitted, but the trailing open windows are not (strict prefix)
    n_emitted = got["window_start_us"].nunique()
    n_total = e["window_start_us"].nunique()
    assert 1 <= n_emitted < n_total
    assert got["window_start_us"].max() < e["window_start_us"].max()


def test_unordered_backfill_with_tight_watermark_loses_data(spark, rate_fixture):
    """The negative result that justifies both stamp_segment_order and the
    apply path's no-watermark design: same log, mtimes tied (all-at-once
    backfill), single-file triggers — if the file source happens to deliver
    any late segment early, the watermark leaps ahead and earlier events
    are dropped as late. Assert only the one-sided contract (counted <=
    total, and exact parity is not guaranteed): delivery order is not ours
    to pin, but losing the parity guarantee is the point."""
    wd, expected = rate_fixture
    sub = tempfile.mkdtemp(prefix="unordered", dir=wd)
    import os

    for root, _, files in os.walk(f"{wd}/log"):
        for f in files:
            os.utime(os.path.join(root, f), (1_000_000_000, 1_000_000_000))
    got = drain_change_rate(
        spark,
        f"{wd}/log",
        sub,
        window_duration="500 milliseconds",
        watermark_delay="200 milliseconds",
        output_mode="update",
        max_files_per_trigger=1,
    ).toPandas()
    assert got["n"].sum() <= expected["n"].sum()
    stamp_segment_order(f"{wd}/log")  # restore for any later test


def test_session_window_tie_and_split_semantics(spark):
    """Pins the session boundary rule conversation_sessions relies on (and
    the cdc_conv_sessions oracle mirrors): a successor exactly ONE gap
    after its predecessor merges into the session; strictly beyond the gap
    starts a new one."""
    from debezium_connector_cassandra_spark.streaming.windowed import (
        conversation_sessions,
    )

    gap_us = 3_600_000_000
    rows = [
        ("c1", 0),
        ("c1", gap_us - 1),          # inside -> merges
        ("c1", 3 * gap_us - 1),      # diff 2*gap  -> splits
        ("c2", 0),
        ("c2", gap_us),              # diff == gap -> merges (the tie rule)
        ("c3", 5),                   # singleton session
    ]
    df = spark.createDataFrame(rows, "conv_id string, writetime long")
    got = (
        conversation_sessions(df, gap="1 hour")
        .orderBy("conv_id", "session_start_us")
        .collect()
    )
    assert [
        (r.conv_id, r.session_start_us, r.session_end_us, r.n_events) for r in got
    ] == [
        ("c1", 0, gap_us - 1, 2),
        ("c1", 3 * gap_us - 1, 3 * gap_us - 1, 1),
        ("c2", 0, gap_us, 2),
        ("c3", 5, 5, 1),
    ]
