"""As-of (temporal) join — the classic operator Spark's DataFrame API lacks
as a primitive, expressed as a composition of built-ins.

Semantics: for every left row, attach the LATEST right row of the same key
with ``right.ts <= left.ts`` (inclusive; a right version landing at exactly
the left row's timestamp is visible).  This is the slowly-changing-
dimension enrichment a CDC consumer runs constantly: join each change
event to the dimension version that was current at the event's time.

Spark-first formulation (no per-key Python, no range join): tag and union
the two sides, then one keyed window with ``last(..., ignorenulls=True)``
over ``ROWS UNBOUNDED PRECEDING..CURRENT ROW`` forward-fills the most
recent right payload into every left row.  The right payload rides as ONE
struct, so all its columns come atomically from the same right row.

Scale notes (100 TB): one shuffle on the key + a within-partition sort —
exactly the cost of the equivalent sort-merge join, with no explosion and
no broadcast requirement on either side.  Skewed keys behave like any
keyed window (salt the key upstream if one entity dominates).  Ordering is
``(ts, side, uid)`` with the right side first at timestamp ties, so the
result is deterministic under duplicate timestamps given a unique
``uid_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MATCH_COL = "_asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    uid_col: str,
) -> DataFrame:
    """Left rows with ``right_cols`` (renamed ``asof_<col>``) plus
    ``asof_ts`` from the latest right row at or before each left row's
    ``ts_col``; NULLs when no right version exists yet.

    ``uid_col`` must be present and unique on both sides — it makes the
    tie order total (monotonically_increasing_id is NOT deterministic
    across retries, so the caller supplies a real id)."""
    # reserved internal names: a caller column shadowing them would silently
    # corrupt the side filter / match struct instead of erroring
    reserved = {"_side", MATCH_COL}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserved column name(s) in input: {sorted(clash)}")
    if "ts" in right_cols:
        raise ValueError(
            "right_cols may not contain 'ts' — it would collide with the "
            "match struct's timestamp field (exported as asof_ts)"
        )
    match = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *on, ts_col, uid_col, F.lit(0).alias("_side"), match.alias(MATCH_COL)
    )
    # allowMissingColumns types the absent columns (left's payload on the
    # right side, the match struct on the left side) as NULLs of the
    # other side's exact type — no hand-built casts
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col(uid_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(MATCH_COL, F.last(MATCH_COL, ignorenulls=True).over(w))
    out_cols = [c for c in left.columns]
    return (
        filled.where(F.col("_side") == 1)
        .select(
            *out_cols,
            F.col(f"{MATCH_COL}.ts").alias("asof_ts"),
            *[F.col(f"{MATCH_COL}.{c}").alias(f"asof_{c}") for c in right_cols],
        )
    )
