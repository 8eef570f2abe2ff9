"""D2 — at-least-once duplicate elimination.

The reference tolerates duplicate delivery (at-least-once) and skips
re-delivered mutations via the per-table offset check
(``FileOffsetWriter.isOffsetProcessed:122-131`` over ``OffsetPosition``
ordering :48-57).  Set-oriented equivalent: a batch-level
``dropDuplicates`` on the event identity (key, segment, position) plus the
offset high-watermark filter applied at scan time (see sources.log_scan —
that filter is pushed down to the Parquet scan so already-processed segments
are pruned, the analog of skipping whole files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EVENT_IDENTITY = ["conv_id", "turn_idx", "segment_id", "position", "writetime"]


def dedup_events(df: DataFrame) -> DataFrame:
    """Drop exact duplicate deliveries of the same mutation.

    Identity = (key, segment, position, writetime): the reference's offset
    skip-check works at (mutation, commit-log position) grain; writetime
    joins the identity because a LOGGED BATCH explodes several changes at
    ONE shared position (handleMutation:255-272) — batch members touching
    the same key remain distinct by their explicit USING TIMESTAMP, while an
    exact duplicate delivery (same event, same writetime) still collapses.
    ``dropDuplicates`` is a hash aggregation with map-side partial combine —
    duplicates collapse before the shuffle, so a duplicate-heavy stream does
    not inflate shuffle volume.
    """
    return df.dropDuplicates(EVENT_IDENTITY)
