"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB training-data pipeline: media (image/audio/video) rides
in a ``binary`` column next to typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
bytes never leave the executor as pickled rows and each Python worker sees
whole Arrow record batches.

The actual codecs (Pillow/ffmpeg/librosa) are NOT present in this
environment, so the decode kernels are STUBBED (clearly marked below):
``decode_image_stub`` derives deterministic fake dimensions from the bytes.
Everything around the stub — schema, batch iteration, partitioning-safe
signatures, metadata extraction — is real and tested; swapping the stub for
a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder — deterministic fake of an image header read.

    A real deployment replaces this body with e.g. ``PIL.Image.open`` over
    ``io.BytesIO(payload)``. The fake derives (width, height, format) purely
    from the payload bytes so tests and oracles are reproducible:
    width = 1 + n % 640, height = 1 + n // 640 % 480, format by first byte.
    """
    n = len(payload)
    width = 1 + n % 640
    height = 1 + (n // 640) % 480
    fmt = "png" if (payload[:1] or b"\x00")[0] % 2 == 0 else "jpeg"
    return width, height, fmt


def extract_media_meta(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas metadata extraction over a binary media column.

    Preserves partitioning (narrow transformation); each Arrow batch is
    processed column-wise, the per-item decode is the stubbed kernel.
    """
    import hashlib

    id_src, payload_src = id_col, payload_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_src]
            dims = [decode_image_stub(p or b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_src].astype("int64"),
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                    "sha": payloads.map(lambda p: hashlib.sha256(p or b"").hexdigest()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "format": [d[2] for d in dims],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, MEDIA_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    every: int = 30,
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode a deterministic frame
    index plan (every Nth frame) WITHOUT decoding — (media_id, frame_idx).
    The decode of each sampled frame would be another mapInPandas stage.
    Pure JVM: sequence + explode, no Python."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
