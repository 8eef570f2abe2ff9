"""R9 breadth — ALTER COLUMN TYPE (metadata-only widening) and table
CREATE/DROP lifecycle (reference Cassandra4SchemaChangeListener
onTableUpdated:220-260, onTableCreated:114-159, onTableDropped:162-217)."""

import pytest
from pyspark.sql import functions as F, types as T

from debezium_connector_cassandra_spark.model import TableSpec
from debezium_connector_cassandra_spark.plans.apply import CdcTarget, apply_batch
from debezium_connector_cassandra_spark.sources.generator import (
    gen_multi_table_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.multi_table import MultiTableRunner
from debezium_connector_cassandra_spark.streaming.schema_evolution import SchemaChange


# ---------------------------------------------------------------------------
# ALTER COLUMN TYPE
# ---------------------------------------------------------------------------

def test_schema_change_parse_alter_and_cassandra_types():
    op, name, dtype = SchemaChange(2, "ALTER COLUMN score long", 3).parse()
    assert (op, name, dtype) == ("alter", "score", T.LongType())
    op, name, dtype = SchemaChange(2, "ADD COLUMN tags set<text>", 3).parse()
    assert (op, name, dtype) == ("add", "tags", T.ArrayType(T.StringType(), True))
    with pytest.raises(ValueError):
        SchemaChange(2, "DROP COLUMN x", 3).parse()


def _mini_batch(spark, payload_t, rows):
    schema = T.StructType(
        [
            T.StructField("segment_id", T.LongType()),
            T.StructField("position", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("writetime", T.LongType()),
            T.StructField(
                "range_start",
                T.StructType([T.StructField("method", T.StringType()), T.StructField("turn_idx", T.IntegerType())]),
            ),
            T.StructField(
                "range_end",
                T.StructType([T.StructField("method", T.StringType()), T.StructField("turn_idx", T.IntegerType())]),
            ),
            T.StructField(
                "cells",
                T.StructType(
                    [
                        T.StructField(
                            "score",
                            T.StructType(
                                [
                                    T.StructField("value", payload_t, True),
                                    T.StructField("deletion_ts", T.LongType(), True),
                                    T.StructField("set", T.BooleanType(), False),
                                ]
                            ),
                        )
                    ]
                ),
            ),
        ]
    )
    data = [
        (seg, pos, "i", conv, turn, wt, None, None, ((v, None, True),))
        for seg, pos, conv, turn, wt, v in rows
    ]
    return spark.createDataFrame(data, schema)


def test_alter_type_widening_mid_stream(spark, tmp_path):
    """int cells applied, ALTER to long, then long cells — old files read
    under the widened schema without rewrite, LWW merges across the change."""
    tgt = CdcTarget.create(spark, str(tmp_path / "t"), n_buckets=2, payload={"score": T.IntegerType()})
    apply_batch(tgt, _mini_batch(spark, T.IntegerType(), [(0, 0, "c1", 1, 100, 7), (0, 1, "c2", 2, 100, 9)]))
    v_before = tgt.state.current_version()
    tgt.alter_payload_column("score", T.LongType())
    # metadata-only: no data files rewritten
    assert tgt.state.manifest()["buckets"] == tgt.state.manifest(v_before)["buckets"]
    assert tgt.state.schema()["score"].dataType == T.LongType()
    big = 5_000_000_000  # needs int64
    apply_batch(tgt, _mini_batch(spark, T.LongType(), [(1, 0, "c1", 1, 200, big)]))
    rows = {(r["conv_id"], r["turn_idx"]): r["score"] for r in tgt.read_transcripts().collect()}
    assert rows == {("c1", 1): big, ("c2", 2): 9}


def test_alter_type_rejects_narrowing(spark, tmp_path):
    tgt = CdcTarget.create(spark, str(tmp_path / "t"), n_buckets=2, payload={"score": T.LongType()})
    with pytest.raises(ValueError, match="unsupported type change"):
        tgt.alter_payload_column("score", T.IntegerType())


# ---------------------------------------------------------------------------
# table CREATE / DROP lifecycle
# ---------------------------------------------------------------------------

SPEC_A = TableSpec(keyspace="ks", table="alpha", payload=(("x", T.StringType()),))
SPEC_B = TableSpec(keyspace="ks", table="beta", payload=(("y", T.StringType()),))


def test_table_create_and_drop_mid_stream(spark, tmp_path):
    log_path = str(tmp_path / "log")
    log = gen_multi_table_log(
        spark, [SPEC_A, SPEC_B], 2000, n_convs=20, max_turns=10,
        events_per_segment=250, seed=13,
    )  # 8 segments
    write_mutation_log(log, log_path)
    runner = MultiTableRunner(
        spark, log_path, str(tmp_path / "t"),
        [SPEC_A],  # beta is NOT captured initially
        segments_per_batch=3,
        table_changes=[(3, "create", SPEC_B), (6, "drop", "ks.alpha")],
    )
    runner.run()
    # beta captured only from segment 3 on
    beta_segs = {
        r["segment_id"]
        for r in runner.lineage.read().where(
            (F.col("fqtn") == "ks.beta") & (F.col("log_partition") >= 0)
        ).collect()
    }
    assert beta_segs == {3, 4, 5, 6, 7}
    # alpha captured only before segment 6
    alpha_segs = {
        r["segment_id"]
        for r in runner.lineage.read().where(
            (F.col("fqtn") == "ks.alpha") & (F.col("log_partition") >= 0)
        ).collect()
    }
    assert alpha_segs == {0, 1, 2, 3, 4, 5}
    # alpha's materialized state is retained after the drop
    assert runner.read_table("ks.alpha").count() > 0
    assert runner.read_table("ks.beta").count() > 0
    # restart replays the ledger identically: nothing pending
    r2 = MultiTableRunner(
        spark, log_path, str(tmp_path / "t"), [SPEC_A],
        table_changes=[(3, "create", SPEC_B), (6, "drop", "ks.alpha")],
    )
    assert r2.pending_segments() == []
