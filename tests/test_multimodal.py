"""Multimodal plumbing: mapInPandas metadata extraction over binary
payloads and the JVM-only frame-sampling plan."""

import hashlib

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.multimodal import (
    decode_image_stub,
    extract_media_meta,
    frame_sample_plan,
)


def test_extract_media_meta_roundtrip(spark):
    payloads = [b"", b"\x89PNG fake", b"\xff\xd8jpeg-ish" * 100, bytes(range(256))]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in extract_media_meta(df).collect()}
    assert len(rows) == len(payloads)
    for i, p in enumerate(payloads):
        r = rows[i]
        assert r["n_bytes"] == len(p)
        assert r["sha"] == hashlib.sha256(p).hexdigest()
        assert (r["width"], r["height"], r["format"]) == decode_image_stub(p)


def test_extract_media_meta_is_arrow(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    plan = extract_media_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 95), (2, 0), (3, 30)], "media_id long, n_frames int"
    )
    got = sorted(
        (r["media_id"], r["frame_idx"])
        for r in frame_sample_plan(df, every=30).collect()
    )
    assert got == [(1, 0), (1, 30), (1, 60), (1, 90), (2, 0), (3, 0)]
    plan = frame_sample_plan(df, every=30)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure JVM explode


# ---------------------------------------------------------------------------
# REAL codecs (round 2): handcrafted bytes, known answers
# ---------------------------------------------------------------------------


def test_bmp_decode_handcrafted():
    """2×2 24-bit BMP built by hand: bottom-up rows, 2-byte row padding
    (row = 6 bytes), known pixel values."""
    import struct

    from spacetime_crawler4_spark.operators.multimodal import decode_bmp

    # image (top-down): row0 = [(B=1,G=2,R=3), (4,5,6)], row1 = [(7,8,9), (10,11,12)]
    file_rows = bytes([7, 8, 9, 10, 11, 12, 0, 0,  # bottom row first + pad
                       1, 2, 3, 4, 5, 6, 0, 0])
    header = struct.pack("<2sIHHI", b"BM", 54 + len(file_rows), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(file_rows), 2835, 2835, 0, 0
    )
    w, h, mb, mg, mr = decode_bmp(header + file_rows)
    assert (w, h) == (2, 2)
    assert mb == (1 + 4 + 7 + 10) / 4
    assert mg == (2 + 5 + 8 + 11) / 4
    assert mr == (3 + 6 + 9 + 12) / 4


def test_bmp_encode_decode_roundtrip():
    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for w, hgt in ((1, 1), (2, 3), (5, 4), (10, 10)):
        pix = bytes(rng.integers(0, 256, size=w * hgt * 3, dtype=np.uint8))
        ww, hh, mb, mg, mr = decode_bmp(encode_bmp(pix, w, hgt))
        arr = np.frombuffer(pix, dtype=np.uint8).reshape(-1, 3).astype(float)
        assert (ww, hh) == (w, hgt)
        assert (mb, mg, mr) == (arr[:, 0].mean(), arr[:, 1].mean(), arr[:, 2].mean())


def test_wav_decode_handcrafted_with_extra_chunk():
    """RIFF chunk walking: an unknown LIST chunk (odd size -> word-aligned)
    before data must be skipped, not break parsing."""
    import struct

    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import decode_wav

    samples = np.array([0, 1000, -1000, 32767, -32768], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 44100, 88200, 2, 16)
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # odd size + pad
    body = fmt + junk + struct.pack("<4sI", b"data", len(data)) + data
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    n, rate, rms = decode_wav(payload)
    assert (n, rate) == (5, 44100)
    assert rms == float(np.sqrt((samples.astype(np.float64) ** 2).mean()))


def test_wav_encode_decode_roundtrip():
    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    t = np.arange(800)
    samples = (np.sin(t / 10.0) * 12000).astype("<i2")
    n, rate, rms = decode_wav(encode_wav_pcm16(samples, 16000))
    assert (n, rate) == (800, 16000)
    assert rms == float(np.sqrt((samples.astype(np.float64) ** 2).mean()))


def test_media_features_dispatch(spark):
    """extract_media_features routes by magic bytes and never throws on
    garbage (kind='unknown')."""
    from spacetime_crawler4_spark.operators.multimodal import (
        encode_bmp,
        encode_wav_pcm16,
        extract_media_features,
    )

    bmp = encode_bmp(bytes(range(12)), 2, 2)
    wav = encode_wav_pcm16([100, -100, 200], 8000)
    rows = [(1, bmp), (2, wav), (3, b"\x00garbage"), (4, b"BMnot-really")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in extract_media_features(df).collect()}
    assert got[1]["kind"] == "bmp" and (got[1]["width"], got[1]["height"]) == (2, 2)
    assert got[2]["kind"] == "wav" and got[2]["n_samples"] == 3
    assert got[3]["kind"] == "unknown"
    assert got[4]["kind"] == "unknown"  # truncated/malformed BMP recovers
