"""S5 full form — the binary commit-log payload codec.

Parity contract: encode_payload_binary -> decode_payload_binary must
reproduce the original cells EXACTLY (round trip), and the binary pipeline
must produce the identical final state as the JSON-payload twin
(decode_payload_jvm) and as the plain typed-cells pipeline.
Reference: segment parsing boundary Cassandra4CommitLogSegmentReader.java:29-33."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.functions.binary_codec import (
    decode_payload_binary,
    encode_payload_binary,
)
from debezium_connector_cassandra_spark.functions.decode import (
    decode_payload_jvm,
    encode_payload,
)
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner


@pytest.fixture(scope="module")
def log(spark):
    return gen_mutation_log(
        spark, 2500, n_convs=30, max_turns=20, events_per_segment=1000,
        n_log_partitions=2, seed=13,
    ).cache()


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_binary_roundtrip_bit_exact(spark, log):
    orig = log.select("segment_id", "position", "op", "cells")
    back = decode_payload_binary(encode_payload_binary(orig))
    # same logical type (nullability flags may differ: F.struct fields are
    # nullable, matching what any decoder can promise)
    assert (
        back.schema["cells"].dataType.simpleString()
        == orig.schema["cells"].dataType.simpleString()
    )
    assert _sorted_rows(back.select("segment_id", "position", "cells")) == \
        _sorted_rows(orig.select("segment_id", "position", "cells"))


def test_binary_matches_json_twin(spark, log):
    jm = decode_payload_jvm(encode_payload(log))
    bn = decode_payload_binary(encode_payload_binary(log))
    assert _sorted_rows(jm.select("segment_id", "position", "cells")) == \
        _sorted_rows(bn.select("segment_id", "position", "cells"))


def test_binary_pipeline_state_equals_plain(spark, log, tmp_path):
    plain_path = str(tmp_path / "log_plain")
    bin_path = str(tmp_path / "log_bin")
    write_mutation_log(log, plain_path)
    write_mutation_log(encode_payload_binary(log), bin_path)

    r_plain = CdcRunner(spark, plain_path, str(tmp_path / "tp"), n_buckets=4)
    r_plain.run()
    r_bin = CdcRunner(
        spark, bin_path, str(tmp_path / "tb"), n_buckets=4,
        log_schema="infer", decode_binary=True, payload_format="binary",
    )
    r_bin.run()
    assert _sorted_rows(r_plain.target.read_transcripts()) == \
        _sorted_rows(r_bin.target.read_transcripts())


def test_null_payload_is_null_struct(spark, log):
    # tombstone ops carry no payload; decode must yield a NULL cells struct
    # (same as from_json(NULL)), not a struct of nulls
    enc = encode_payload_binary(log)
    dec = decode_payload_binary(enc)
    n_tomb = log.where(F.col("op").isin("d", "p", "r")).count()
    assert dec.where(F.col("cells").isNull()).count() == n_tomb


def test_deletion_ts_and_sparse_cells_survive(spark):
    # hand-built cells exercising every layout branch: unset cell, set-null
    # cell, deletion_ts with and without value, empty string, unicode
    rows = [
        (0, 0, "i", {"role": {"value": "user", "deletion_ts": None, "set": True},
                     "text": {"value": "", "deletion_ts": None, "set": True},
                     "tool": {"value": None, "deletion_ts": 123456789, "set": True},
                     "ts": {"value": None, "deletion_ts": None, "set": False}}),
        (0, 16, "u", {"role": {"value": None, "deletion_ts": None, "set": False},
                      "text": {"value": "émoji ☃ tail", "deletion_ts": 777, "set": True},
                      "tool": {"value": "t_1", "deletion_ts": None, "set": True},
                      "ts": {"value": None, "deletion_ts": None, "set": False}}),
    ]
    import pyspark.sql.types as T

    from debezium_connector_cassandra_spark.model import CELLS_TYPE

    schema = T.StructType(
        [
            T.StructField("segment_id", T.LongType()),
            T.StructField("position", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("cells", CELLS_TYPE),
        ]
    )
    spark_df = spark.createDataFrame(rows, schema)
    back = decode_payload_binary(encode_payload_binary(spark_df))
    assert _sorted_rows(back) == _sorted_rows(spark_df)
