"""D2 on the streaming front-end: at-least-once redelivery collapsed in
flight with ``dropDuplicatesWithinWatermark``.

The batch path removes re-delivered mutations with a hash aggregation over
the event identity (operators/dedup.py — the set-oriented twin of the
reference's ``FileOffsetWriter.isOffsetProcessed:122-131`` offset
skip-check), and the offset high-watermark prunes whole already-processed
segments at scan time. Neither helps a LIVE tail when a crashed reader
re-ships rows it had already delivered: the offset store only advances at
batch boundaries, and a per-micro-batch distinct cannot see a duplicate that
arrives in a LATER micro-batch. This module is the streaming-native form:
keyed dedup state in the engine's state store, evicted by the event-time
watermark.

Correctness contract (pinned in tests/test_stream_dedup.py and the
``cdc_stream_dedup`` oracle row): under in-order segment delivery
(``windowed.stamp_segment_order``) a PRIMARY delivery is never late, so
every redelivered row is removed by exactly one of two mechanisms —
identity state (the redelivery arrives while the first copy's event time is
still above the watermark) or the late-data gate (it arrives below the
watermark). Either way the drained output is the batch distinct, for ANY
watermark delay; the delay only chooses which mechanism does the work.

Scale shape (100 TB story): dedup state is one fixed-width entry per
distinct identity within the watermark delay — O(events/delay-window), NOT
O(all events); the delay knob trades redelivery-lag tolerance against
state-store size. Input shuffles once on the identity hash (the same key
grain the LWW apply path shuffles on). The reference's offset check is O(1)
per table but segment-grain and in-order-only; this catches arbitrary
redelivery at event grain within the lag bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import EVENT_IDENTITY
from .stateful import log_stream, spool_drain_append


def dedup_stream(stream_df: DataFrame, watermark_delay: str = "3 days") -> DataFrame:
    """Attach streaming duplicate elimination to a mutation-log stream.

    Identity = the batch path's EVENT_IDENTITY plus ``op`` when present (the
    content column of the narrow log projection — see
    ``operators.dedup.dedup_events`` for why content joins the identity).
    Event time is ``timestamp_micros(writetime)``, the same clock the
    windowed operators use.
    """
    subset = [c for c in (*EVENT_IDENTITY, "op") if c in stream_df.columns]
    return (
        stream_df.withColumn("event_ts", F.timestamp_micros(F.col("writetime")))
        .withWatermark("event_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(subset)
        .drop("event_ts")
    )


def drain_dedup_stream(
    spark: SparkSession,
    log_path: str,
    work_dir: str,
    watermark_delay: str = "3 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a commit-log directory (availableNow) through the streaming
    dedup and return every emitted row — each surviving identity is emitted
    exactly once, in the micro-batch its first copy arrives, so the drained
    relation needs no latest-per-key fold."""
    src = log_stream(spark, log_path, max_files_per_trigger)
    return spool_drain_append(dedup_stream(src, watermark_delay), work_dir, name="dedup")
