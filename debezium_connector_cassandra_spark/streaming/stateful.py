"""Custom stateful streaming operator: per-conversation progress state via
``applyInPandasWithState``.

The foreachBatch front-ends (`stream.py`, `multi_table.py`) re-apply whole
micro-batches idempotently — the right lakehouse shape for exactly-once
table state, but it keeps all state IN the target table. This module is the
complementary Spark idiom: state that lives in the streaming engine's own
state store, keyed by conversation, updated incrementally as commit-log
events arrive (the per-partition "how far has this conversation progressed"
ledger a CDC monitor wants without querying the sink — the streaming analog
of the reference's per-table change counters, CassandraConnectorTask
metrics; reference grain: ProcessorGroup/CommitLogProcessorMetrics).

Semantics: for every conversation the state carries cumulative event counts
by mutation class, the high-water writetime/turn/segment. Emission is
cumulative in ``update`` output mode — each micro-batch that touches a
conversation emits that conversation's NEW running totals, so the latest
emission per key IS the aggregate over everything delivered so far.

Scale shape (the 100 TB story): state is a fixed-width tuple per distinct
conv_id — O(#conversations), no per-event growth; Spark shuffles each
micro-batch once on conv_id (the same key the LWW apply path shuffles on)
and the state store (HDFS/RocksDB-backed at cluster scale) holds the rest.
The per-group Python function sees Arrow-batched pandas frames and does
vectorized column reductions — no per-row work. Out-of-order file delivery
is harmless: every tracked statistic is an order-insensitive monotone
(count / max), the same insight the LWW reduction rests on.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# narrow input projection — keep the state op's shuffle thin
PROGRESS_INPUT_COLS = ["conv_id", "op", "turn_idx", "writetime", "segment_id"]

PROGRESS_OUTPUT_SCHEMA = (
    "conv_id string, n_events bigint, n_upserts bigint, n_row_deletes bigint, "
    "n_part_deletes bigint, n_markers bigint, max_writetime bigint, "
    "max_turn int, last_segment bigint"
)

# state tuple mirrors the output minus the key
PROGRESS_STATE_SCHEMA = (
    "n_events bigint, n_upserts bigint, n_row_deletes bigint, "
    "n_part_deletes bigint, n_markers bigint, max_writetime bigint, "
    "max_turn int, last_segment bigint"
)


def _nan_to_none(v):
    return None if v is None or pd.isna(v) else v


def _max(a, b):
    a, b = _nan_to_none(a), _nan_to_none(b)
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def _progress_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, nu, nd, np_, nm, mw, mt, ls = state.get
    else:
        n = nu = nd = np_ = nm = 0
        mw = mt = ls = None
    for pdf in pdfs:
        op = pdf["op"]
        n += len(pdf)
        nu += int(op.isin(("i", "u")).sum())
        nd += int((op == "d").sum())
        np_ += int((op == "p").sum())
        nm += int((op == "r").sum())
        mw = _max(mw, pdf["writetime"].max())
        mt = _max(mt, pdf["turn_idx"].max())
        ls = _max(ls, pdf["segment_id"].max())
    mt_i = None if mt is None else int(mt)
    state.update((n, nu, nd, np_, nm, _nan_to_none(mw), mt_i, _nan_to_none(ls)))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_events": n,
                "n_upserts": nu,
                "n_row_deletes": nd,
                "n_part_deletes": np_,
                "n_markers": nm,
                "max_writetime": _nan_to_none(mw),
                "max_turn": mt_i,
                "last_segment": _nan_to_none(ls),
            }
        ]
    )


def conversation_progress(stream_df: DataFrame) -> DataFrame:
    """Attach the stateful per-conversation progress operator to a streaming
    mutation-log DataFrame. Update-mode emission: one row per touched
    conversation per micro-batch, carrying running totals."""
    cols = [c for c in PROGRESS_INPUT_COLS if c in stream_df.columns]
    return (
        stream_df.select(*cols)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _progress_fn,
            PROGRESS_OUTPUT_SCHEMA,
            PROGRESS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def log_stream(
    spark: SparkSession, log_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source readStream over a parquet commit-log directory (schema
    probed from the static read, as the front-ends do)."""
    stream = spark.readStream.schema(spark.read.parquet(log_path).schema)
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    return stream.parquet(log_path)


def spool_drain_latest(
    rel: DataFrame,
    work_dir: str,
    key_cols: list[str],
    output_mode: str = "update",
    name: str = "spool",
) -> DataFrame:
    """Drain a streaming relation (availableNow) and return the LATEST
    emission per key. Every batch's emissions append to a parquet spool
    tagged with the micro-batch id; the final row per key is the one from
    its highest batch, picked with one struct-max aggregate — all
    distributed, no driver-side state. Correct whenever later emissions
    supersede earlier ones for the same key (update-mode cumulative state,
    windowed running counts)."""
    spark = rel.sparkSession
    spool = f"{work_dir}/{name}_spool"
    checkpoint = f"{work_dir}/{name}_checkpoint"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(spool)

    q = (
        rel.writeStream.outputMode(output_mode)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(spool)
    val_cols = [c for c in out.columns if c not in (*key_cols, "_bid")]
    latest = out.groupBy(*key_cols).agg(F.max(F.struct("_bid", *val_cols)).alias("w"))
    return latest.select(
        *key_cols, *[F.col(f"w.{c}").alias(c) for c in val_cols]
    )


def spool_drain_append(
    rel: DataFrame,
    work_dir: str,
    name: str = "spool",
) -> DataFrame:
    """Drain a streaming relation (availableNow, append output mode) into a
    parquet spool and return everything emitted. For operators that emit
    each logical row exactly once (streaming dedup, append-mode windows) —
    no latest-per-key fold needed. The per-batch ``_bid`` tag stays in the
    spool for tests but is dropped from the returned relation."""
    spark = rel.sparkSession
    spool = f"{work_dir}/{name}_spool"
    checkpoint = f"{work_dir}/{name}_checkpoint"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(spool)

    q = (
        rel.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(spool).drop("_bid")


def drain_conversation_progress(
    spark: SparkSession,
    log_path: str,
    work_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a commit-log directory through the stateful operator
    (availableNow) and return the FINAL per-conversation progress relation
    (running totals are cumulative, so latest emission per conv == total)."""
    src = log_stream(spark, log_path, max_files_per_trigger)
    return spool_drain_latest(
        conversation_progress(src), work_dir, ["conv_id"], name="progress"
    )
