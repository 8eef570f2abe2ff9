"""R1 ordered keyed routing — both of the reference's queue-index modes.

Reference: the commit-log read handler assigns every mutation to one of N
ordered processing queues (``getPartitionQueueIndex``,
cassandra-4/.../Cassandra4CommitLogReadHandlerImpl.java:672-685) keyed by a
configurable mode (core/.../CassandraConnectorConfig.java:246-288
EventOrderGuaranteeMode):

- COMMITLOG_FILE:     hash(commit-log file name) — every mutation of one
                      segment lands on one queue (per-file total order).
- PARTITION_VALUES:   hash(partition key values) — every mutation of one
                      Cassandra partition lands on one queue (per-key total
                      order across segments).

Spark formulation: the queue index is a pure column expression (the
deterministic md5-derived ``hash64`` so a DuckDB oracle computes the same
routes), and "queues" are shuffle partitions — ``route_df`` repartitions on
the queue index, giving the same co-location guarantee the reference's
in-memory queues give (all rows of a route in one task, orderable within the
partition by (segment_id, position)). The LWW reduction downstream is
order-insensitive, so either mode is semantically safe; the mode is an
observable routing/parallelism contract, not a correctness knob.

At 100 TB: PARTITION_VALUES is the scale default (route cardinality ~=
partition-key cardinality, smooth); COMMITLOG_FILE caps parallelism at the
number of live segments and skews toward big segments — same trade-offs the
reference documents for its queue modes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import hash64

PARTITION_VALUES = "partition_values"
COMMITLOG_FILE = "commitlog_file"
ROUTING_MODES = (PARTITION_VALUES, COMMITLOG_FILE)


def _segment_file(segment_col: Column) -> Column:
    """The commit-log file name this segment models (SourceInfo.file)."""
    return F.concat(
        F.lit("CommitLog-7-"), segment_col.cast("string"), F.lit(".log")
    )


def queue_index(
    mode: str,
    n_queues: int,
    key_col: str = "conv_id",
    segment_col: str = "segment_id",
) -> Column:
    """The queue a mutation routes to under ``mode`` — getPartitionQueueIndex
    analog as a deterministic column expression."""
    if mode == PARTITION_VALUES:
        key = F.col(key_col)
    elif mode == COMMITLOG_FILE:
        key = _segment_file(F.col(segment_col))
    else:
        raise ValueError(f"unknown routing mode {mode!r}; use one of {ROUTING_MODES}")
    return F.pmod(hash64(key), F.lit(n_queues)).cast("int")


def route_df(
    df: DataFrame,
    mode: str = PARTITION_VALUES,
    n_queues: int = 8,
    key_col: str = "conv_id",
) -> DataFrame:
    """Attach the queue index and co-locate each queue in one shuffle
    partition (the Spark analog of the reference's ordered queues)."""
    routed = df.withColumn("queue", queue_index(mode, n_queues, key_col=key_col))
    return routed.repartition(n_queues, "queue")


def routing_stats(
    df: DataFrame,
    mode: str = PARTITION_VALUES,
    n_queues: int = 8,
    key_col: str = "conv_id",
) -> DataFrame:
    """Per-queue occupancy — the observable routing contract: which keys /
    segments share a queue, and how many events each queue carries."""
    return (
        df.withColumn("queue", queue_index(mode, n_queues, key_col=key_col))
        .groupBy("queue")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(key_col).alias("n_keys"),
            F.countDistinct("segment_id").alias("n_segments"),
        )
    )
