"""D9 full form — unpaired range-tombstone bound markers paired per
partition in log order (reference RangeTombstoneContext.java:20-40)."""

from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.operators.tombstones import pair_range_markers
from debezium_connector_cassandra_spark.sources.generator import (
    gen_mutation_log,
    split_range_markers,
    write_mutation_log,
)
from debezium_connector_cassandra_spark.streaming.runner import CdcRunner

from .conftest import assert_state_equal
from .oracle import replay


def test_pairing_reconstructs_ranges(spark):
    log = gen_mutation_log(
        spark, 2000, n_convs=25, max_turns=20, events_per_segment=500, seed=21
    )
    split = split_range_markers(log)
    n_r = log.where(F.col("op") == "r").count()
    assert split.where(F.col("op") == "r").count() == 2 * n_r
    paired = pair_range_markers(split)
    # bit-identical range set modulo the end-marker position identity (+8)
    want = sorted(
        (r["conv_id"], r["writetime"], r["range_start"], r["range_end"])
        for r in log.where(F.col("op") == "r").collect()
    )
    got = sorted(
        (r["conv_id"], r["writetime"], r["range_start"], r["range_end"])
        for r in paired.where(F.col("op") == "r").collect()
    )
    assert got == want


def test_unpaired_markers_full_apply_matches_oracle(spark, tmp_path):
    """Runner over a marker-split log == sequential replay of the ORIGINAL
    paired log (markers arrive interleaved with other events, out of
    writetime order)."""
    log = gen_mutation_log(
        spark, 3000, n_convs=30, max_turns=20, events_per_segment=600, seed=31
    )
    split_path = str(tmp_path / "log")
    write_mutation_log(split_range_markers(log), split_path)
    runner = CdcRunner(
        spark, split_path, str(tmp_path / "t"), segments_per_batch=2,
        n_buckets=4, unpaired_range_markers=True,
    )
    runner.run()
    assert_state_equal(runner.target.read_transcripts(), replay(log.toPandas()))


def test_malformed_marker_streams_drop(spark):
    """Dangling start / orphan end markers drop instead of corrupting."""
    log = gen_mutation_log(
        spark, 500, n_convs=10, max_turns=20, events_per_segment=500, seed=41
    )
    split = split_range_markers(log)
    # drop every start marker -> all ends are orphans -> zero paired ranges
    only_ends = split.where(
        (F.col("op") != "r") | F.col("range_end").isNotNull()
    )
    paired = pair_range_markers(only_ends)
    assert paired.where(F.col("op") == "r").count() == 0
    # drop every end marker -> dangling starts -> zero paired ranges
    only_starts = split.where(
        (F.col("op") != "r") | F.col("range_start").isNotNull()
    )
    assert pair_range_markers(only_starts).where(F.col("op") == "r").count() == 0
