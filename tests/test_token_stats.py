"""GPT-2 pretokenizer ("BPE-ish regex") token counting.

Pins (1) the piece stream itself against hand-derived GPT-2 pretokenization
on adversarial strings, (2) Spark (Java regex) vs DuckDB (RE2) piece-stream
equality — the cross-engine contract the docs_token_stats oracle relies on,
and (3) the token_stats class partition (every piece lands in exactly one of
word/num/contraction/punct).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.functions.text import (
    BPE_PIECE_RE,
    token_pieces,
    token_stats,
)

RICH = [
    "don't stop",
    "msg c123 t4 e567",
    "hello,world!! 4.5x",
    "  spaced   out  ",
    "café 42°",
    "IT'S",
    '{"k": 87}',
    "we've it's they'll I'm you're he'd can't",
    "",
]

# hand-derived GPT-2 pretokenization (leading space attached, contractions
# split, letter/digit boundaries split, punctuation runs whole)
EXPECTED = {
    "don't stop": ["don", "'t", " stop"],
    "msg c123 t4 e567": ["msg", " c", "123", " t", "4", " e", "567"],
    "hello,world!! 4.5x": ["hello", ",", "world", "!!", " 4", ".", "5", "x"],
    "  spaced   out  ": [" spaced", " out"],
    "café 42°": ["café", " 42", "°"],
    "IT'S": ["IT", "'", "S"],
    '{"k": 87}': ['{"', "k", '":', " 87", "}"],
    "": [],
}


def _spark_pieces(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", token_pieces(F.col("text")).alias("p")).orderBy("id").collect()
    return [r["p"] for r in rows]


def test_pieces_match_gpt2_semantics(spark):
    got = _spark_pieces(spark, list(EXPECTED))
    for text, pieces in zip(EXPECTED, got):
        assert pieces == EXPECTED[text], text


def test_pieces_spark_equals_duckdb(spark):
    got = _spark_pieces(spark, RICH)
    con = duckdb.connect()
    for text, pieces in zip(RICH, got):
        duck = con.execute(
            "select regexp_extract_all(?, ?)", [text, BPE_PIECE_RE]
        ).fetchone()[0]
        assert pieces == duck, text


def test_token_stats_classes_partition(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RICH)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in token_stats(df).collect()}
    for i, text in enumerate(RICH):
        r = rows[i]
        assert (
            r["n_word_pieces"]
            + r["n_num_pieces"]
            + r["n_contraction_pieces"]
            + r["n_punct_pieces"]
            == r["n_pieces"]
        ), text
    # spot-check the contraction-heavy doc: 7 contraction forms, all split
    r = rows[7]
    assert r["n_contraction_pieces"] == 7
    # fertility >1 where subword splitting fires
    assert rows[1]["n_pieces"] == 7 and rows[1]["n_words"] == 4
    assert rows[1]["fertility"] == pytest.approx(1.75)
