"""Frame sampling over the synthetic raw-video payload layout."""

import hashlib

from pyspark.sql import Row

from debezium_connector_cassandra_spark.operators.multimodal import (
    attach_payload,
    sample_frames,
)


def _media(spark, rows):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )
    return attach_payload(docs)


def test_sample_frames_offsets_and_ragged_tail(spark):
    text = "x" * 25  # frame_bytes=10, stride=2 -> frames 0,2 of 0,1,2
    out = {
        r.frame_idx: r
        for r in sample_frames(_media(spark, [(1, text)]), 10, 2).collect()
    }
    assert set(out) == {0, 2}
    assert (out[0].frame_off, out[0].frame_len) == (0, 10)
    assert (out[2].frame_off, out[2].frame_len) == (20, 5)  # ragged tail
    assert out[0].frame_hex == ("78" * 10)
    assert out[2].frame_hex == ("78" * 5)


def test_sample_frames_multibyte_slices_bytes_not_chars(spark):
    text = "héllo 世界!"  # 14 utf-8 bytes; frame_bytes=5 -> frames at 0,5,10
    b = text.encode()
    out = {
        r.frame_idx: r
        for r in sample_frames(_media(spark, [(1, text)]), 5, 1).collect()
    }
    assert set(out) == {0, 1, 2}
    for i in out:
        assert out[i].frame_hex == b[5 * i : 5 * i + 5].hex().upper()
    assert out[2].frame_len == len(b) - 10


def test_sample_frames_empty_payload_yields_no_frames(spark):
    out = sample_frames(_media(spark, [(1, ""), (2, "abc")]), 4, 1).collect()
    assert {r.doc_id for r in out} == {2}


def test_sample_frames_frame_zero_always_sampled(spark):
    # stride larger than the frame count still samples frame 0
    out = sample_frames(_media(spark, [(1, "abcdef")]), 4, 99).collect()
    assert [(r.doc_id, r.frame_idx) for r in out] == [(1, 0)]
    assert bytes.fromhex(out[0].frame_hex) == b"abcd"
    # and md5 over the recovered bytes matches a real decoder's view
    assert hashlib.md5(bytes.fromhex(out[0].frame_hex)).hexdigest() == hashlib.md5(b"abcd").hexdigest()
