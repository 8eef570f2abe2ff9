"""Corpus-assembly operators: sequence packing + mix rebalancing."""

from pyspark.sql import Row, functions as F

from debezium_connector_cassandra_spark.operators.corpus import (
    pack_sequences,
    rebalance_corpus,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=g) for i, t, g in rows],
        "doc_id long, text string, lang string",
    )


def test_pack_greedy_contiguous(spark):
    # one bucket, budget 5 tokens: docs of 3,3,4,6,2 tokens ->
    # cum-before 0,3,6,10,16 -> packs 0,0,1,2,3 (no doc ever splits; the
    # 6-token doc overflows its own pack; pack ids may skip)
    rows = [
        (0, "a b c", "en"),
        (16, "d e f", "en"),
        (32, "g h i j", "en"),
        (48, "k l m n o p", "en"),
        (64, "q r", "en"),
    ]
    out = {
        r.doc_id: r
        for r in pack_sequences(_docs(spark, rows), budget_tokens=5, n_buckets=16).collect()
    }
    assert all(out[i].bucket == 0 for i in out)
    assert [out[i].pack_id for i in (0, 16, 32, 48, 64)] == [0, 0, 1, 2, 3]
    assert [out[i].tok_before for i in (0, 16, 32, 48, 64)] == [0, 3, 6, 10, 16]


def test_pack_buckets_independent(spark):
    rows = [(i, "w " * 4, "en") for i in range(40)]
    out = pack_sequences(_docs(spark, rows), budget_tokens=8, n_buckets=4)
    # per bucket: 10 docs x 4 tokens (trim drops the trailing space), cum
    # resets per bucket: doc k-in-bucket has tok_before = 4k
    rows_out = out.collect()
    assert {r.bucket for r in rows_out} == {0, 1, 2, 3}
    for r in rows_out:
        k = r.doc_id // 4  # rank of this doc inside its bucket
        assert r.tok_before == 4 * k
        assert r.pack_id == (4 * k) // 8


def test_pack_deterministic(spark):
    rows = [(i, f"tok {'x ' * (i % 7)}", "en") for i in range(30)]
    a = sorted(map(tuple, pack_sequences(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, pack_sequences(_docs(spark, rows)).collect()))
    assert a == b


def test_rebalance_uniform_target(spark):
    rows = (
        [(i, f"en doc {i}", "en") for i in range(20)]
        + [(100 + i, f"fr doc {i}", "fr") for i in range(7)]
        + [(200 + i, f"de doc {i}", "de") for i in range(3)]
    )
    docs = _docs(spark, rows).withColumn("source", F.lit("s"))
    kept = rebalance_corpus(docs, group_col="lang").collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # every language downsampled to the smallest language's size
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 3, "fr": 3, "de": 3}
    # kept ids are a subset of the originals, and stable across runs
    again = {r.doc_id for r in rebalance_corpus(docs, group_col="lang").collect()}
    assert again == {i for s in by_lang.values() for i in s}


def test_pack_matches_pandas_reference(spark):
    """200 docs with irregular token counts vs an independent sequential
    pandas formulation of the same greedy-contiguous rule."""
    import random

    import pandas as pd

    rng = random.Random(99)
    rows = [(i, " ".join("t" * 1 for _ in range(rng.randint(1, 40))), "en") for i in range(200)]
    got = (
        pack_sequences(_docs(spark, rows), budget_tokens=64, n_buckets=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    ref = pd.DataFrame({"doc_id": [r[0] for r in rows], "n_tok": [len(r[1].split()) for r in rows]})
    ref["bucket"] = ref["doc_id"] % 8
    ref = ref.sort_values(["bucket", "doc_id"])
    ref["tok_before"] = ref.groupby("bucket")["n_tok"].cumsum() - ref["n_tok"]
    ref["pack_id"] = ref["tok_before"] // 64
    ref = ref.sort_values("doc_id").reset_index(drop=True)

    for col in ("bucket", "pack_id", "n_tok", "tok_before"):
        assert list(got[col]) == list(ref[col]), col
