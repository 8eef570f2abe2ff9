"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition-friendly layout, Arrow batch shape of
the decode UDFs) is real and tested. The actual media decode is STUBBED —
the decode libraries (Pillow/ffmpeg/...) are not in this container — behind
``decode_media``, which raises NotImplementedError for real codecs and
provides a deterministic fake for the 'synthetic' codec so the pipeline is
end-to-end testable.

Scale notes: binary payloads dominate row size — keep them OUT of shuffle
keys, project them away before joins/aggregations, and process them with
``mapInPandas`` (Arrow-batched, streaming iterator — no row-at-a-time
Python, no full-partition materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal layout from a text corpus: payload = utf-8 bytes
    (the stand-in for image/audio bytes), metadata struct alongside."""
    t = F.col(text_col)
    payload = F.encode(t, "utf-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.lit("synthetic").alias("codec"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
    ]
)


def decode_media(payload: bytes, codec: str) -> np.ndarray:
    """STUB for real media decode (image decode / audio PCM / video frame
    sample). Real codecs are unavailable in this environment; the
    'synthetic' codec returns the raw byte array so the downstream feature
    path is exercised end-to-end."""
    if codec == "synthetic":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: media decoding requires external libraries "
        "(Pillow/ffmpeg) not present in this environment"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    one Python invocation per Arrow batch, streaming).

    Fully vectorized per batch: payloads concatenate into one buffer and a
    SINGLE ``np.bincount`` over ``row_idx * 256 + byte`` keys yields the
    whole batch's per-row byte histograms at once — no per-row Python loop
    over histogram/mean/entropy (decode itself stays per-row: it is the
    codec boundary). Sums of byte values are exact integers in float64, so
    mean_byte is bit-identical to the per-row formulation; entropy terms are
    identical per (row, byte) and summed along a fixed 256-wide axis."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        byte_vals = np.arange(256, dtype=np.float64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=[f.name for f in FEATURE_SCHEMA.fields])
                continue
            arrs = [
                decode_media(bytes(p), m["codec"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            total = int(lens.sum())
            concat = (
                np.concatenate(arrs) if total else np.empty(0, dtype=np.uint8)
            )
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            counts = np.bincount(
                row_idx * 256 + concat.astype(np.int64), minlength=n * 256
            ).reshape(n, 256).astype(np.float64)
            tot = np.maximum(lens, 1).astype(np.float64)
            mean = counts @ byte_vals / tot
            p = counts / tot[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                terms = np.where(counts > 0, p * np.log2(p), 0.0)
            entropy = -terms.sum(axis=1)
            empty = lens == 0
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": lens,
                    "mean_byte": np.where(empty, np.nan, mean),
                    "byte_entropy": np.where(empty, np.nan, entropy),
                }
            )
            yield out

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling over a synthetic raw-video layout: the payload is a
    sequence of fixed-size ``frame_bytes`` frames (the last one ragged);
    emit every ``stride``-th frame as ``(doc_id, frame_idx, frame_off,
    frame_len, frame_hex)``.

    Entirely JVM-side Catalyst — ``sequence``+``explode`` generates the
    sampled indices and ``substr`` slices the binary payload, so sampling
    runs at scan speed with no Python. Real container formats (mp4/mkv)
    need a demuxer and go through the ``decode_media`` stub boundary
    instead; this operator is the Spark-side plumbing either path shares
    (explode shape, offset arithmetic, ragged tail handling).

    ``frame_hex`` is the frame's hex projection — the cross-engine
    comparable form (and a stand-in for the per-frame tensor a real decode
    would emit)."""
    fb = F.lit(frame_bytes).cast("long")
    nb = F.col("meta.n_bytes")
    padded = nb + fb - 1
    nframes = ((padded - padded % fb) / fb).cast("long")
    idxs = F.when(
        nframes > 0,
        F.sequence(
            F.lit(0).cast("long"),
            nframes - 1,
            F.lit(int(stride)).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    f = media.select(
        "doc_id", "payload", nb.alias("nb"), F.explode(idxs).alias("frame_idx")
    )
    off = F.col("frame_idx") * frame_bytes
    flen = F.least(fb, F.col("nb") - off)
    return f.select(
        "doc_id",
        "frame_idx",
        off.alias("frame_off"),
        flen.alias("frame_len"),
        F.hex(F.col("payload").substr(off + 1, flen)).alias("frame_hex"),
    )


def resize_stub(media: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Image-resize plumbing: partition-preserving mapInPandas whose body
    would call the resize kernel; stubbed to a deterministic passthrough
    that records the requested geometry (the Spark-side contract — schema,
    batching, partitioning — is the tested surface)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target[0],
                    "height": target[1],
                    "resized": pdf["payload"],  # passthrough stub
                }
            )

    return media.mapInPandas(do, out_schema)
