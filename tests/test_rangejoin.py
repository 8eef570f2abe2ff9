"""Bucketed interval-containment join semantics."""

from pyspark.sql import Row

from debezium_connector_cassandra_spark.operators.rangejoin import interval_join


def _left(spark, rows):
    return spark.createDataFrame(
        [Row(uid=u, ts_us=t) for u, t in rows], "uid long, ts_us long"
    )


def _iv(spark, rows):
    return spark.createDataFrame(
        [Row(iid=i, s=s, e=e) for i, s, e in rows], "iid long, s long, e long"
    )


def test_containment_inclusive_bounds_and_overlaps(spark):
    left = _left(spark, [(1, 5), (2, 10), (3, 15), (4, 20), (5, 25)])
    ivs = _iv(spark, [(100, 10, 20), (200, 18, 30)])  # overlapping windows
    out = {(r.uid, r.iid) for r in interval_join(left, ivs, "ts_us", "s", "e", 7).collect()}
    assert out == {
        (2, 100),  # start inclusive
        (3, 100),
        (4, 100),  # end inclusive
        (4, 200),  # overlap region pairs with BOTH windows
        (5, 200),
    }


def test_no_duplicate_pairs_across_buckets(spark):
    # interval spans many buckets (width 2, length 11) — every contained
    # row still pairs exactly once
    left = _left(spark, [(i, i) for i in range(20)])
    ivs = _iv(spark, [(1, 4, 15)])
    rows = interval_join(left, ivs, "ts_us", "s", "e", 2).collect()
    assert sorted(r.uid for r in rows) == list(range(4, 16))  # no dups


def test_matches_naive_theta_join(spark):
    """Seeded irregular case vs the direct containment join."""
    import random

    rng = random.Random(5)
    lrows = [(i, rng.randint(0, 1000)) for i in range(300)]
    irows = [(i, s := rng.randint(0, 950), s + rng.randint(0, 80)) for i in range(40)]
    left, ivs = _left(spark, lrows), _iv(spark, irows)
    got = {
        (r.uid, r.iid)
        for r in interval_join(left, ivs, "ts_us", "s", "e", 64).collect()
    }
    want = {
        (u, i)
        for u, t in lrows
        for i, s, e in irows
        if s <= t <= e
    }
    assert got == want and want  # non-degenerate fixture


def test_equality_keys_restrict_pairs(spark):
    left = spark.createDataFrame(
        [Row(uid=1, k="a", ts_us=10), Row(uid=2, k="b", ts_us=10)],
        "uid long, k string, ts_us long",
    )
    ivs = spark.createDataFrame(
        [Row(iid=100, k="a", s=0, e=20)], "iid long, k string, s long, e long"
    )
    out = interval_join(left, ivs, "ts_us", "s", "e", 16, on=["k"]).collect()
    assert [(r.uid, r.iid) for r in out] == [(1, 100)]
