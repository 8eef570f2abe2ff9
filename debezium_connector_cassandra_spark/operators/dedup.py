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

from pyspark.sql import DataFrame, functions as F

EVENT_IDENTITY = ["conv_id", "turn_idx", "segment_id", "position", "writetime"]

# columns whose CONTENT distinguishes two batch members that share the full
# EVENT_IDENTITY (same key, same shared batch offset, both inheriting the
# batch default writetime — no explicit USING TIMESTAMP)
_CONTENT_COLS = ("op", "cells", "range_start", "range_end")


def _groupable(dtype) -> bool:
    """Spark can group by any type except maps (and containers holding
    them) — the same restriction as ordering."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _groupable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_groupable(f.dataType) for f in dtype.fields)
    return True


def dedup_events(df: DataFrame) -> DataFrame:
    """Drop exact duplicate deliveries of the same mutation.

    Identity = (key, segment, position, writetime) PLUS the content: the
    reference's offset skip-check works at (mutation, commit-log position)
    grain; writetime joins the identity because a LOGGED BATCH explodes
    several changes at ONE shared position (handleMutation:255-272) — batch
    members touching the same key remain distinct by their explicit USING
    TIMESTAMP. Two same-key members that BOTH inherit the batch default
    writetime are identity-equal while carrying different cell assignments
    (the reference merges their PartitionUpdates rather than dropping one),
    so the content keeps them apart; an exact duplicate delivery (identical
    row) still collapses. ``dropDuplicates`` is a hash aggregation with
    map-side partial combine — duplicates collapse before the shuffle, so a
    duplicate-heavy stream does not inflate shuffle volume.

    The content columns join the grouping key DIRECTLY when their types are
    groupable (collision-free, and no per-row JSON serialization — the
    md5(to_json) formulation measurably dominated this operator's runtime);
    map-typed payloads fall back to the hash, which is the only way to
    group them at all.
    """
    content_cols = [c for c in _CONTENT_COLS if c in df.columns]
    if all(_groupable(df.schema[c].dataType) for c in content_cols):
        return df.dropDuplicates(EVENT_IDENTITY + content_cols)
    content = F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols])))
    return (
        df.withColumn("_content", content)
        .dropDuplicates(EVENT_IDENTITY + ["_content"])
        .drop("_content")
    )
