"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB training-data pipeline: media (image/audio/video) rides
in a ``binary`` column next to typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
bytes never leave the executor as pickled rows and each Python worker sees
whole Arrow record batches.

Two tiers of decode (round 2):

- REAL codecs, pure struct+numpy: 24-bit BI_RGB **BMP** (pixel-data
  offset, bottom-up rows, 4-byte row padding) and PCM16 **WAV** (RIFF
  chunk walk, word alignment, little-endian samples) —
  ``decode_bmp``/``decode_wav`` + the ``extract_media_features``
  mapInPandas stage, validated by handcrafted-byte tests AND an
  encode→decode roundtrip query whose DuckDB oracle recomputes the
  features straight from the source bytes (queries.py).
- STUB for formats whose codecs genuinely aren't in this sandbox
  (jpeg/png/video): ``decode_image_stub`` derives deterministic fake
  dimensions; everything around it — schema, batch iteration,
  partitioning-safe signatures — is real, and swapping in Pillow/ffmpeg
  is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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


# ---------------------------------------------------------------------------
# REAL codecs (round 2): BMP (24-bit BI_RGB) and WAV (PCM16) need no
# external libraries — headers, bottom-up rows, 4-byte row padding, RIFF
# chunk walking and little-endian samples are all parsed for real with
# struct + numpy. The stub above remains only for formats whose codecs
# genuinely aren't in this sandbox (jpeg/png/video).
# ---------------------------------------------------------------------------


def encode_bmp(pixels_bgr: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit uncompressed BI_RGB BMP: 54-byte header, bottom-up
    rows, rows padded to 4 bytes. ``pixels_bgr`` is top-down B,G,R."""
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    data = bytearray()
    for y in range(height - 1, -1, -1):
        start = y * row
        data += pixels_bgr[start : start + row] + b"\x00" * pad
    size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + bytes(data)


def decode_bmp(payload: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_b, mean_g, mean_r) from a 24-bit BI_RGB BMP —
    honors the pixel-data offset, per-row padding, and bottom-up storage."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    h = abs(height)
    row = width * 3
    stride = (row + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8, offset=off, count=stride * h)
    arr = arr.reshape(h, stride)[:, :row].reshape(h, width, 3)
    if height > 0:
        arr = arr[::-1]  # bottom-up file rows -> top-down image
    means = arr.reshape(-1, 3).astype(np.float64).mean(axis=0)
    return width, h, float(means[0]), float(means[1]), float(means[2])


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE container around little-endian PCM16 mono."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, float]:
    """(n_samples, sample_rate, rms) from a PCM16 WAV — walks the RIFF
    chunk list (unknown chunks skipped, odd sizes padded per spec)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean())) if len(samples) else 0.0
    return len(samples), int(rate), rms


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_b", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_r", DoubleType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def extract_media_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas REAL-decode stage: dispatch on magic bytes (BM -> BMP,
    RIFF..WAVE -> WAV), decode with the numpy codecs above, emit typed
    per-kind features (unused columns null). Unknown formats yield
    kind='unknown' with nulls — a crawler-grade decoder never throws."""

    id_src, payload_src = id_col, payload_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_src], pdf[payload_src]):
                p = p or b""
                row = {
                    "media_id": int(mid),
                    "kind": "unknown",
                    "width": None,
                    "height": None,
                    "mean_b": None,
                    "mean_g": None,
                    "mean_r": None,
                    "n_samples": None,
                    "sample_rate": None,
                    "rms": None,
                }
                try:
                    if p[:2] == b"BM":
                        w, h, mb, mg, mr = decode_bmp(p)
                        row.update(
                            kind="bmp", width=w, height=h,
                            mean_b=mb, mean_g=mg, mean_r=mr,
                        )
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        n, rate, rms = decode_wav(p)
                        row.update(
                            kind="wav", n_samples=n, sample_rate=rate, rms=rms
                        )
                except Exception:  # malformed/truncated container:
                    pass  # kind stays 'unknown' — decoders never throw
                rows.append(row)
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["n_samples"] = out["n_samples"].astype("Int64")
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            yield out[[f.name for f in MEDIA_FEATURES_SCHEMA.fields]]

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )
