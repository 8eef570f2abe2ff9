"""Range (interval-containment) join — the second operator Spark's
DataFrame API lacks as a primitive (the first is the as-of join,
``operators/asof.py``), expressed as a bucketed equi-join.

Semantics: pair every left row with every interval containing its
timestamp (``start <= ts <= end``, inclusive), optionally under extra
equality keys.  Without decomposition Spark plans a containment join as a
nested-loop over the two relations — the scale-killer.  The standard fix:
quantize the time axis into fixed buckets, explode each interval to the
buckets it covers, map each left row to its single bucket, and equi-join
on the bucket (+ keys) before verifying the exact containment predicate.

Correctness: a (row, interval) pair can only meet in the ONE bucket the
row's timestamp falls in, so the decomposition produces no duplicates —
no distinct pass needed.

Scale notes (100 TB): pick ``bucket_width_us`` near the typical interval
length — each interval then explodes to ≤2 buckets (cost factor ~2), and
the join is a plain shuffled equi-join on (keys…, bucket).  Time-clustered
data makes some buckets hot; salting the bucket key (or adding more
equality keys) splits them, and AQE skew-join handles the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_us: int,
    on: list[str] | None = None,
) -> DataFrame:
    """All (left row, interval) pairs with ``start <= ts <= end`` (micros
    longs), joined through bucket equi-keys.  Returns left columns +
    interval columns.  ``on`` adds equality keys to the bucket join."""
    on = on or []
    w = F.lit(int(bucket_width_us))
    l_b = left.withColumn(
        "_bucket", ((F.col(ts_col) - F.col(ts_col) % w) / w).cast("long")
    )
    i_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                ((F.col(start_col) - F.col(start_col) % w) / w).cast("long"),
                ((F.col(end_col) - F.col(end_col) % w) / w).cast("long"),
            )
        ),
    )
    joined = l_b.join(i_b, on + ["_bucket"])
    return joined.where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bucket")
