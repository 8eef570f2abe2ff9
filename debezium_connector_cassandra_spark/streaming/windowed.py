"""Watermarked event-time windowed aggregation over the change stream.

The change-rate relation a CDC monitor charts: change events per event-time
window per mutation class, computed with Structured Streaming's windowed
groupBy + watermark — the late-data idiom the apply path deliberately does
NOT use (see stream.py's ordering caveat: dropping a late FILE loses data
permanently, so apply re-reads idempotently instead). Counting is different:
a late-arriving event only shifts a count, and the producer's writetime
inversion is BOUNDED (`generator.writetime_inversion_window_us`), so a
watermark at least that bound loses nothing — the same bounded-disorder
argument the tombstone GC horizon rests on. That claim is pinned in
tests/test_windowed.py: drained windowed counts equal the batch groupBy
exactly.

Scale shape: state is one count per (window, op) — bounded by
span/window x 5 op classes, independent of event count; the watermark lets
Spark drop window state once event time passes it, so a long-running tail
holds only ~watermark/window live windows per class. One shuffle on the
window key; counts partially aggregate map-side.

Emission modes:
- ``update`` (default): running counts re-emit as windows accumulate;
  latest emission per (window, op) is the final count — drain with
  ``spool_drain_latest``, total parity guaranteed for a finite drain.
- ``append``: a window emits ONCE, only after the watermark passes its end
  — exactly-once window emission for downstream consumers, but windows
  still open when a finite drain ends are never emitted (their state dies
  with the query). The pytest pins both: append emits a strict prefix of
  the ground truth, byte-equal where emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .stateful import log_stream, spool_drain_latest


def stamp_segment_order(log_path: str) -> None:
    """Stamp each ``segment_id=N/`` directory's files with mtimes ascending
    in segment id, emulating the in-order arrival a live commit-log tail
    sees (segments are created sequentially; FileStreamSource processes
    oldest-mtime-first). A pre-existing backfill written all at once has
    tied mtimes, so the file source may deliver segment 10 before segment 2
    — the event-time watermark then leaps to the stream's end and drops
    every earlier segment as late (the same unordered-delivery failure
    stream.py documents for the apply path, measured: 73% of events lost).
    With in-order segment delivery the watermark only needs to cover
    WITHIN-delivery-unit disorder: the producer's bounded writetime
    inversion, plus one segment span when a segment is split across files.

    Driver-side loop over segment directories — bounded by segment count,
    not event count."""
    import os
    import re

    base = 1_000_000_000  # epoch seconds; only relative order matters
    segs = []
    for name in os.listdir(log_path):
        m = re.fullmatch(r"segment_id=(\d+)", name)
        if m:
            segs.append((int(m.group(1)), os.path.join(log_path, name)))
    for seg_id, seg_dir in sorted(segs):
        ts = base + seg_id * 10
        for f in os.listdir(seg_dir):
            p = os.path.join(seg_dir, f)
            os.utime(p, (ts, ts))


def stamp_redelivery(log_path: str, lag: int = 15) -> None:
    """Stamp files appended AFTER ``stamp_segment_order`` as REDELIVERIES:
    segment k's fresh files (still carrying real-clock mtimes, far above the
    synthetic base) get mtime ``base + k*10 + lag`` — with the default lag
    they arrive between segments k+1 and k+2, the crashed-reader re-read
    pattern (a reader dies after shipping segment k, restarts from its
    pre-crash offset, re-ships rows the sink already saw). Run AFTER
    appending the redelivered rows to an already-stamped log directory.

    Driver-side loop over segment directories — bounded by segment count."""
    import os
    import re

    base = 1_000_000_000
    cutoff = base + 100_000_000  # stamped files sit at base+10*seg << cutoff
    for name in os.listdir(log_path):
        m = re.fullmatch(r"segment_id=(\d+)", name)
        if not m:
            continue
        seg_dir = os.path.join(log_path, name)
        ts = base + int(m.group(1)) * 10 + lag
        for f in os.listdir(seg_dir):
            p = os.path.join(seg_dir, f)
            if os.stat(p).st_mtime > cutoff:
                os.utime(p, (ts, ts))


def change_rate_stream(
    stream_df: DataFrame,
    window_duration: str = "1 day",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """(window_start_us, window_end_us, op, n) streaming relation: tumbling
    event-time windows over ``timestamp_micros(writetime)``. Window bounds
    are returned as epoch-microsecond bigints so the relation (and its
    DuckDB oracle) is timezone-free."""
    src = stream_df.withColumn("event_ts", F.timestamp_micros(F.col("writetime")))
    return (
        src.withWatermark("event_ts", watermark_delay)
        .groupBy(F.window("event_ts", window_duration).alias("w"), "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            "op",
            "n",
        )
    )


def conversation_sessions(
    df: DataFrame, gap: str = "6 hours"
) -> DataFrame:
    """Sessionize each conversation by event-time inactivity: consecutive
    events closer than ``gap`` belong to one session (`F.session_window`,
    the merging-window operator — works over batch AND streaming input).
    Returns (conv_id, session_start_us, session_end_us, n_events) with the
    bounds as the session's actual first/last event writetime (not the
    gap-padded window end), so the relation is gap-parameter-free on the
    way out and oracle-checkable with a lag()-based gaps-and-islands
    formulation.

    Scale shape: one shuffle on (conv_id, session_window); Spark merges
    session fragments in the aggregate (partial merge map-side), so hot
    conversations don't serialize through a single window function the way
    a lag()-over-conv_id formulation would — that per-key sort is exactly
    what the oracle uses and the operator avoids."""
    src = df.withColumn("event_ts", F.timestamp_micros(F.col("writetime")))
    return (
        src.groupBy(
            F.session_window("event_ts", gap).alias("w"), "conv_id"
        )
        .agg(
            F.min("writetime").alias("session_start_us"),
            F.max("writetime").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .select("conv_id", "session_start_us", "session_end_us", "n_events")
    )


def drain_change_rate(
    spark: SparkSession,
    log_path: str,
    work_dir: str,
    window_duration: str = "1 day",
    watermark_delay: str = "10 seconds",
    output_mode: str = "update",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a commit-log directory through the windowed aggregation and
    return the emitted per-window change-rate relation (for ``update``
    mode, the latest emission per (window, op) — the final counts)."""
    src = log_stream(spark, log_path, max_files_per_trigger)
    rel = change_rate_stream(src, window_duration, watermark_delay)
    return spool_drain_latest(
        rel, work_dir, ["window_start_us", "op"], output_mode=output_mode, name="rate"
    )
