"""One-off attribution experiment (VERDICT r2 task 3): is the round-2
bounds-grain range pre-aggregation (operators/tombstones.py extract rng
groupBy) the cause of the cdc_full_state trend (11.0 -> 17.6 -> 19.6s)?

Protocol: interleaved A/B trials in ONE session at sf0.1 / local[32]
(BASELINE.md protocol — single trials are unusable on this host), medians
reported. A = current code (bounds-grain pre-agg), B = pre-agg removed.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.session import get_spark
import debezium_connector_cassandra_spark.operators.tombstones as TB
from debezium_connector_cassandra_spark.operators.tombstones import TombstoneSet
import __spark_entry__ as em

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="attr", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

_orig_extract = TB.extract_tombstones


def _extract_no_preagg(batch):
    """Round-1 shape: range tombstones NOT pre-aggregated at bounds grain."""
    s = _orig_extract(batch)
    rng = batch.where(F.col("op") == "r").select(
        "conv_id",
        F.col("range_start.turn_idx").alias("lo"),
        F.col("range_end.turn_idx").alias("hi"),
        (F.col("range_start.method") == "INCL_START_BOUND").alias("lo_incl"),
        (F.col("range_end.method") == "INCL_END_BOUND").alias("hi_incl"),
        F.col("writetime").alias("wt"),
    )
    return TombstoneSet(row=s.row, partition=s.partition, range=rng)


def run_once():
    df = em.queries()["cdc_full_state"](spark, SF_DIR)
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


# warm the derived-log cache once so neither arm pays it
run_once()

# __spark_entry__ binds extract_tombstones at import time — patch ITS name
a, b = [], []
for _ in range(TRIALS):
    em.extract_tombstones = _orig_extract
    a.append(run_once())
    em.extract_tombstones = _extract_no_preagg
    b.append(run_once())
em.extract_tombstones = _orig_extract

out = {
    "sf_dir": SF_DIR,
    "trials_with_bounds_preagg": a,
    "trials_without_preagg": b,
    "median_with": statistics.median(a),
    "median_without": statistics.median(b),
    "pair_ratios_with_over_without": [round(x / y, 3) for x, y in zip(a, b)],
}
print(json.dumps(out, indent=1))
