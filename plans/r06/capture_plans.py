#!/usr/bin/env python
"""Capture .explain('formatted') for the headline queries (guide §1/§7.2).

Usage: python plans/r06/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt. Plan-only — nothing is executed
except one-time fixture builds a query performs at construction.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:]

HEADLINE = [
    "cdc_full_state",
    "cdc_lww_upserts",
    "cdc_range_tombstones",
    "cdc_decode_envelope",
    "cdc_dedup_events",
    "cdc_schema_evolution",
    "cdc_snapshot_union",
    "cdc_offsets_checkpoint",
    "cdc_batch_mutations",
    "cdc_types_scalar",
    "cdc_conv_sessions",
    "cdc_state_asof",
    "cdc_transcript_assembly",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from debezium_connector_cassandra_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name="plan-capture")
    qs = em.queries()
    names = ONLY or HEADLINE
    outdir = os.path.join(os.path.dirname(__file__))
    # partition count of the cached derived log (scan parallelism)
    flat = em._flat_log(spark, sf_dir)
    print(f"flat log partitions: {flat.rdd.getNumPartitions()}")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{SUFFIX}.txt ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
