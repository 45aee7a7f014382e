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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: real body would decode, resample, and
    re-encode (PIL). The fake emits a payload whose length encodes the
    target dims so tests can assert the batch plumbing end-to-end."""
    return bytes([width % 256, height % 256]) + payload[: width * height % 97]


def decode_audio(payload: bytes) -> tuple[int, float]:
    """Deterministic fake audio decode → (sample_rate, duration_s).

    Real implementation: soundfile/ffprobe. Raising path for genuinely
    unsupported codecs stays explicit:
    ``raise NotImplementedError("codec X: install ffmpeg build")``.
    """
    n = len(payload)
    rate = 8000 * (1 + n % 6)  # 8k..48k
    # unrounded: single IEEE division is engine-identical; consumers round
    # in their final projection (oracle-parity discipline).
    return rate, n / float(rate)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)


def _with_id(schema: T.StructType, blobs: DataFrame, id_col: str) -> T.StructType:
    """Output schema with the CALLER's id field (name + dtype) in place
    of the default first field: the fixed 'doc_id long' schemas crashed
    on string ids (forced astype('int64')) and silently renamed
    non-default id columns, breaking downstream joins (r10 review)."""
    return T.StructType([blobs.schema[id_col]] + list(schema.fields[1:]))


def resize_images(
    blobs: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary → binary transform (the resize shape): payload in, payload
    out, target dims as typed metadata columns. Arrow moves the bytes;
    nothing is ever a Python row loop over the whole partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [
                        resize_image(p if p is not None else b"", width, height)
                        for p in payloads
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return blobs.select(id_col, payload_col).mapInPandas(run, schema=_with_id(RESIZED_SCHEMA, blobs, id_col))


def extract_audio_features(
    blobs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload) → (id, sample_rate, duration_s) via the audio stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_audio(p if p is not None else b"") for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [r for r, _ in decoded],
                    "duration_s": [d for _, d in decoded],
                }
            )

    return blobs.select(id_col, payload_col).mapInPandas(run, schema=_with_id(AUDIO_SCHEMA, blobs, id_col))


def extract_features(blobs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(id, payload: binary) → typed feature rows, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode_image(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_frames": [
                        sample_frames(p if p is not None else b"") for p in payloads
                    ],
                }
            )

    return blobs.select(id_col, payload_col).mapInPandas(run, schema=_with_id(FEATURES_SCHEMA, blobs, id_col))
