"""applyInPandasWithState per-conversation progress operator.

Pins (1) final-state parity between the stateful streaming drain (forced
into many micro-batches with maxFilesPerTrigger=1) and a batch groupBy over
the same log — a different formulation, so a shared bug is unlikely; (2)
that state genuinely accumulates ACROSS micro-batches (multiple cumulative
emissions per conversation, monotone running totals); (3) restart-resilience
of the spool-then-struct-max final-state pick.
"""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.stateful import (
    drain_conversation_progress,
)


@pytest.fixture(scope="module")
def drained(spark):
    wd = tempfile.mkdtemp(prefix="stateful_")
    log = gen_mutation_log(spark, 1200, n_convs=30, events_per_segment=300, seed=77)
    write_mutation_log(log, f"{wd}/log")
    got = drain_conversation_progress(
        spark, f"{wd}/log", wd, max_files_per_trigger=1
    ).toPandas()
    spool = spark.read.parquet(f"{wd}/progress_spool").toPandas()
    expected = (
        log.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("op").isin("i", "u").cast("long")).alias("n_upserts"),
            F.sum((F.col("op") == "d").cast("long")).alias("n_row_deletes"),
            F.sum((F.col("op") == "p").cast("long")).alias("n_part_deletes"),
            F.sum((F.col("op") == "r").cast("long")).alias("n_markers"),
            F.max("writetime").alias("max_writetime"),
            F.max(F.when(F.col("op").isin("i", "u", "d"), F.col("turn_idx"))).alias(
                "max_turn"
            ),
            F.max("segment_id").alias("last_segment"),
        )
        .toPandas()
    )
    yield got, spool, expected
    shutil.rmtree(wd, ignore_errors=True)


def test_final_state_matches_batch_aggregate(drained):
    got, _, expected = drained
    g = got.sort_values("conv_id").reset_index(drop=True)
    e = (
        expected.sort_values("conv_id").reset_index(drop=True)[list(g.columns)]
    )
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_state_accumulates_across_microbatches(drained):
    _, spool, _ = drained
    # maxFilesPerTrigger=1 over 4 segments -> several micro-batches, and
    # every conversation is touched repeatedly (cumulative update-mode
    # emissions), proving engine-side state, not a single-batch aggregate
    assert spool["_bid"].nunique() > 1
    per_conv = spool.groupby("conv_id").size()
    assert (per_conv > 1).all()
    # running totals are monotone nondecreasing in batch order
    for conv, grp in spool.sort_values("_bid").groupby("conv_id"):
        assert grp["n_events"].is_monotonic_increasing
        assert grp["max_writetime"].is_monotonic_increasing


def test_latest_emission_equals_total(drained):
    got, spool, _ = drained
    last = (
        spool.sort_values("_bid")
        .groupby("conv_id")
        .tail(1)
        .drop(columns="_bid")
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    g = got.sort_values("conv_id").reset_index(drop=True)[list(last.columns)]
    pd.testing.assert_frame_equal(g, last, check_dtype=False)
