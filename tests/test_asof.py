"""As-of join semantics: latest right version at-or-before each left ts."""

import datetime as dt

from pyspark.sql import Row

from debezium_connector_cassandra_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def _df(spark, rows, schema):
    return spark.createDataFrame([Row(**r) for r in rows], schema)


L = "event_id long, user_id long, ts timestamp"
R = "event_id long, user_id long, ts timestamp, v string"


def test_asof_basic_versions(spark):
    left = _df(
        spark,
        [
            dict(event_id=10, user_id=1, ts=_ts(5)),
            dict(event_id=11, user_id=1, ts=_ts(15)),
            dict(event_id=12, user_id=1, ts=_ts(25)),
            dict(event_id=13, user_id=2, ts=_ts(9)),
        ],
        L,
    )
    right = _df(
        spark,
        [
            dict(event_id=1, user_id=1, ts=_ts(10), v="v1"),
            dict(event_id=2, user_id=1, ts=_ts(20), v="v2"),
            dict(event_id=3, user_id=2, ts=_ts(30), v="other-user"),
        ],
        R,
    )
    out = {
        r.event_id: (r.asof_v, r.asof_ts)
        for r in asof_join(left, right, ["user_id"], "ts", ["v"], "event_id").collect()
    }
    assert out[10] == (None, None)  # before any version
    assert out[11] == ("v1", _ts(10))
    assert out[12] == ("v2", _ts(20))
    assert out[13] == (None, None)  # other user's version invisible


def test_asof_inclusive_and_tie_rules(spark):
    left = _df(spark, [dict(event_id=10, user_id=1, ts=_ts(10))], L)
    right = _df(
        spark,
        [
            dict(event_id=1, user_id=1, ts=_ts(10), v="same-instant"),
            dict(event_id=2, user_id=1, ts=_ts(11), v="later"),
        ],
        R,
    )
    out = asof_join(left, right, ["user_id"], "ts", ["v"], "event_id").collect()
    assert out[0].asof_v == "same-instant"  # inclusive: right at left's ts wins
    # two right versions at the SAME instant: highest uid wins (total order)
    right2 = _df(
        spark,
        [
            dict(event_id=1, user_id=1, ts=_ts(10), v="first"),
            dict(event_id=2, user_id=1, ts=_ts(10), v="second"),
        ],
        R,
    )
    out2 = asof_join(left, right2, ["user_id"], "ts", ["v"], "event_id").collect()
    assert out2[0].asof_v == "second"


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas.merge_asof on a seeded irregular stream."""
    import random

    import pandas as pd

    rng = random.Random(7)
    lrows = [
        dict(event_id=1000 + i, user_id=rng.randint(1, 5), ts=_ts(rng.randint(0, 59)))
        for i in range(120)
    ]
    rrows = [
        dict(event_id=i, user_id=rng.randint(1, 5), ts=_ts(rng.randint(0, 59)), v=f"v{i}")
        for i in range(40)
    ]
    got = (
        asof_join(_df(spark, lrows, L), _df(spark, rrows, R), ["user_id"], "ts", ["v"], "event_id")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows).sort_values(["ts", "event_id"])
    # pandas merge_asof needs a total order; emulate the uid tie rule by
    # keeping only the max-uid right row per (user, ts)
    rp = (
        pd.DataFrame(rrows)
        .sort_values(["user_id", "ts", "event_id"])
        .groupby(["user_id", "ts"], as_index=False)
        .last()
        .sort_values(["ts", "event_id"])
    )
    want = (
        pd.merge_asof(lp, rp[["user_id", "ts", "v"]], on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["asof_v"].fillna("-")) == list(want["v"].fillna("-"))


def test_asof_reserved_column_names_raise(spark):
    """Internal columns (_side, _asof_match) and the match struct's 'ts'
    field are reserved: a caller column shadowing them used to silently
    corrupt the side filter / duplicate a struct field."""
    import pytest
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 1, 10)], "uid long, k long, ts long")
    right = spark.createDataFrame([(2, 1, 5, 7.0)], "uid long, k long, ts long, v double")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumn("_side", F.lit(0)), right, ["k"], "ts", ["v"], "uid")
    with pytest.raises(ValueError, match="'ts'"):
        asof_join(left, right, ["k"], "ts", ["ts", "v"], "uid")
