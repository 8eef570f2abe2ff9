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


# probe cache: n_queues -> [probe_0 .. probe_{n-1}] where
# pmod(murmur3(probe_i), n) == i (see _queue_probes)
_PROBE_CACHE: dict[int, list[int]] = {}


def _queue_probes(spark, n_queues: int) -> list[int]:
    """For each shuffle-partition index i in [0, n): an int probe_i whose
    Murmur3 hash lands exactly on partition i under HashPartitioning(n).

    ``repartition(n, col)`` places a row at pmod(murmur3(col), n) — hashing
    the ALREADY-hashed queue index again, which collides queues into shared
    partitions and leaves others empty (the double-hash). Routing through a
    probe value inverts that second hash: queue i maps to probe_i, so queue
    i alone occupies partition i. Probes are found once per n_queues with
    one tiny Spark job over candidate ints (each index is missed by m
    candidates with probability (1-1/n)^m — vanishing) and cached."""
    cached = _PROBE_CACHE.get(n_queues)
    if cached is not None:
        return cached
    span = 64 * n_queues
    while True:
        rows = (
            spark.range(0, span)
            .select(
                F.col("id").cast("int").alias("p"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_queues)).alias("i"),
            )
            .collect()
        )
        first: dict[int, int] = {}
        for r in rows:
            first.setdefault(r["i"], r["p"])
        if len(first) == n_queues:
            probes = [first[i] for i in range(n_queues)]
            _PROBE_CACHE[n_queues] = probes
            return probes
        span *= 4


def route_df(
    df: DataFrame,
    mode: str = PARTITION_VALUES,
    n_queues: int = 8,
    key_col: str = "conv_id",
) -> DataFrame:
    """Attach the queue index and co-locate each queue in ITS OWN shuffle
    partition (the Spark analog of the reference's ordered queues): queue i
    occupies exactly partition i — n non-empty partitions for n occupied
    queues, not the collided subset a second hash of the queue index would
    produce."""
    routed = df.withColumn("queue", queue_index(mode, n_queues, key_col=key_col))
    probes = _queue_probes(df.sparkSession, n_queues)
    probe = F.element_at(
        F.array(*[F.lit(p).cast("int") for p in probes]), F.col("queue") + 1
    )
    return (
        routed.withColumn("_queue_probe", probe)
        .repartition(n_queues, "_queue_probe")
        .drop("_queue_probe")
    )


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
