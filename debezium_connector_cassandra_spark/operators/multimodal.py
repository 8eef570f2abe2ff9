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
    one Python invocation per Arrow batch, streaming)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                arr = decode_media(bytes(payload), meta["codec"])
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / max(len(arr), 1)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(arr),
                        "mean_byte": float(arr.mean()) if len(arr) else None,
                        "byte_entropy": float(-(p * np.log2(p)).sum()) if len(arr) else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


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
