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


def test_jpeg_constant_blocks_exact():
    """Constant 8x8 blocks at quant 16 with even levels decode to the
    ORIGINAL pixel values exactly (DC-only algebra: pixel = q*DC/8 + 128)."""
    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(7)
    vals = (2 * (rng.randint(0, 256, size=(3, 5)) % 128)).astype(np.int32)
    blocks = np.zeros((3, 5, 8, 8), np.int32)
    blocks[:, :, 0, 0] = (vals - 128) // 2
    w, h, px = decode_jpeg_gray(encode_jpeg_gray(blocks, 40, 24))
    assert (w, h) == (40, 24)
    assert np.array_equal(px, np.repeat(np.repeat(vals, 8, 0), 8, 1))


def test_jpeg_general_coefficients_match_reference_idct():
    """Arbitrary quantized coefficients (exercising AC run-length, ZRL,
    EOB, negative amplitudes, a non-flat quant table) must decode to the
    same pixels as an independent textbook IDCT of the same coefficients."""
    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    co = rng.randint(-30, 31, size=(2, 3, 8, 8)).astype(np.int32)
    co[0, 1, :, :] = 0  # all-zero block: DC size-0 + immediate EOB
    co[1, 0, 7, 7] = 3  # block with no EOB (last zigzag index nonzero)
    co[1, 2, :, :] = 0
    co[1, 2, 7, 0] = -9  # long zero run -> ZRL path
    q = np.arange(1, 65).reshape(8, 8)
    w, h, px = decode_jpeg_gray(encode_jpeg_gray(co, 24, 16, qtable=q.reshape(64)))

    # independent reference: direct IDCT-II double loop (no shared code)
    def idct_ref(F_):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F_[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s / 4
        return out

    ref = np.empty((16, 24), np.uint8)
    for by in range(2):
        for bx in range(3):
            blk = idct_ref((co[by, bx] * q).astype(float)) + 128
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(blk), 0, 255
            )
    assert (w, h) == (24, 16)
    assert np.array_equal(px, ref)


def test_jpeg_crop_and_dispatch(spark):
    """Non-multiple-of-8 dims crop the padded MCU grid; the mapInPandas
    dispatch routes FFD8 payloads to the real decoder and truncated JPEG
    bytes degrade to kind='unknown' without throwing."""
    import numpy as np

    from spacetime_crawler4_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        extract_media_features,
    )

    blocks = np.zeros((2, 2, 8, 8), np.int32)
    blocks[:, :, 0, 0] = [[-10, 20], [30, -40]]
    jpg = encode_jpeg_gray(blocks, 13, 11)
    w, h, px = decode_jpeg_gray(jpg)
    assert (w, h, px.shape) == (13, 11, (11, 13))

    df = spark.createDataFrame(
        [(1, jpg), (2, jpg[:30])], "media_id long, payload binary"
    )
    got = {r["media_id"]: r.asDict() for r in extract_media_features(df).collect()}
    assert got[1]["kind"] == "jpeg" and (got[1]["width"], got[1]["height"]) == (13, 11)
    assert abs(got[1]["mean_g"] - float(px.mean())) < 1e-9
    assert got[2]["kind"] == "unknown"
