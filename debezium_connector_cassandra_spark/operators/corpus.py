"""Corpus-assembly operators for training-data pipelines: sequence packing
and data-mix rebalancing.

These sit downstream of the dedup/quality stages (``operators/text_dedup``,
``functions/text``): once a corpus is cleaned, a pretraining pipeline (a)
packs documents into ~context-length shards so no GPU batch pads, and (b)
resamples the corpus toward a target group mix (by language / source /
domain).  Both are expressed as bucketed window + aggregate plans with
bit-identical DuckDB oracles.

Scale notes (100 TB):
- ``pack_sequences`` windows are partitioned by an explicit bucket key —
  there is NO global sort/cumsum; each bucket packs independently, so
  parallelism = n_buckets (set it to ~4x the executor-core count; packs are
  only ever read shard-at-a-time downstream, so cross-bucket boundaries are
  semantically free).
- ``rebalance_corpus`` ranks within each group via a deterministic hash
  order — one window per group partition, one broadcast of the (tiny)
  per-group target.  A skewed majority group ranks in parallel across its
  partitions after the shuffle; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import hash64, n_tokens


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 256,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy-contiguous sequence packing: assign each document to a pack of
    ~``budget_tokens`` whitespace tokens.  Documents never split; a pack may
    overflow by less than one document (the standard pretraining packing
    relaxation).  Deterministic: bucket = ``doc_id mod n_buckets``, docs
    packed in ``doc_id`` order within bucket, pack boundary at every
    ``budget_tokens`` of cumulative token mass.

    Returns one row per document: ``(doc_id, bucket, pack_id, n_tok,
    tok_before)`` where ``pack_id`` is the bucket-local pack ordinal and
    ``tok_before`` the cumulative tokens ahead of this doc in its bucket."""
    b = F.lit(budget_tokens)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        n_tokens(F.col(text_col)).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "bucket",
        (((cum - cum % b) / b).cast("long")).alias("pack_id"),
        "n_tok",
        cum.alias("tok_before"),
    )


def rebalance_corpus(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Downsample every group to the size of the smallest group (uniform
    target mix) by keeping each group's first ``target`` documents in a
    deterministic hash order — an exact-proportion, seedless sample (the
    data-mix rebalancing stage of a pretraining pipeline; hash-order keeps
    the selection stable under reruns and appends-at-the-tail).

    Returns the kept rows ``(id_col, group_col, *keep_cols)``."""
    target = (
        docs.groupBy(group_col)
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("target"))
    )
    order = hash64(F.concat(F.lit("mix_"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    ranked = docs.select(
        id_col, group_col, *keep_cols, F.row_number().over(w).alias("_rk")
    )
    return (
        ranked.join(F.broadcast(target))
        .where(F.col("_rk") <= F.col("target"))
        .select(id_col, group_col, *keep_cols)
    )
