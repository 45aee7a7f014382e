"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas``. The decode libraries (PIL/ffmpeg/…) are
not in this container, so the decode step is a deterministic fake (or a
clearly-marked NotImplementedError for the real codecs) — the Spark-side
contract (schema, batching, partition independence) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: (width, height) derived from payload size.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    PIL is not available here, so the fake keeps the pipeline testable
    while preserving the exact UDF shape. Swap the body, not the plumbing.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def sample_frames(payload: bytes) -> int:
    """Deterministic fake frame count (video path stub)."""
    return len(payload) % 30 + 1


def extract_features(blobs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(id, payload: binary) → typed feature rows, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode_image(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_frames": [
                        sample_frames(p if p is not None else b"") for p in payloads
                    ],
                }
            )

    return blobs.select(id_col, payload_col).mapInPandas(run, schema=FEATURES_SCHEMA)
