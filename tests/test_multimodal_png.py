"""Round-4 real codecs: 8-bit PNG (all five filter types, CRC-verified
chunk walk, stdlib-zlib inflate) and AVI container metadata (RIFF walk to
the avih main header). Pure-python tests — no Spark session needed — plus
one Spark test for the mapInPandas video-meta stage."""

import struct
import zlib

import numpy as np
import pytest

from spacetime_crawler4_spark.operators.multimodal import (
    _paeth,
    decode_png,
    encode_avi_header,
    encode_png,
    parse_avi_meta,
)


def test_paeth_predictor_ties():
    # RFC 2083 §6.6: ties break left, then up, then up-left
    assert _paeth(1, 1, 1) == 1  # all equal -> left
    assert _paeth(10, 10, 0) == 10  # pa == pb -> left
    assert _paeth(0, 5, 5) == 0  # p = 0; pa=0 smallest -> left
    assert _paeth(100, 50, 25) == 100  # p=125: pa=25, pb=75, pc=100 -> left
    assert _paeth(2, 4, 6) == 2  # p=0: pa=2 pb=4 pc=6 -> left
    assert _paeth(6, 4, 2) == 6  # p=8: pa=2 pb=4 pc=6 -> left


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(color_type, channels, filter_type):
    rng = np.random.RandomState(13 * (color_type + 1) + filter_type)
    w, h = 9, 6
    pix = rng.randint(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    payload = encode_png(pix, w, h, color_type=color_type, filters=[filter_type] * h)
    ww, hh, ch, img = decode_png(payload)
    assert (ww, hh, ch) == (w, h, channels)
    assert img.tobytes() == pix


def test_png_roundtrip_mixed_filter_plan():
    # the row-y filter plan cycling all five types exercises every
    # unfilter branch against the PRIOR row produced by a different filter
    rng = np.random.RandomState(99)
    w, h = 16, 10
    pix = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    payload = encode_png(pix, w, h, color_type=2, filters=[y % 5 for y in range(h)])
    assert decode_png(payload)[3].tobytes() == pix


def test_png_single_pixel_and_single_column():
    # first-column edges: a=0, c=0 in Sub/Average/Paeth
    for w, h in ((1, 1), (1, 7), (5, 1)):
        pix = bytes((37 * j + 11) % 256 for j in range(w * h * 3))
        payload = encode_png(pix, w, h, color_type=2, filters=[4] * h)
        assert decode_png(payload)[3].tobytes() == pix


def test_png_rejects_bad_crc():
    payload = bytearray(encode_png(b"\x01" * 30, 10, 1, color_type=2))
    # flip a byte inside the IDAT data (after the 8-byte sig + 25-byte IHDR
    # chunk + 8-byte IDAT header) so the CRC check must fire
    payload[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_rejects_non_png_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"BM not a png")
    with pytest.raises(ValueError):
        decode_png(encode_png(b"\x01" * 30, 10, 1, color_type=2)[:20])


def test_png_rejects_16bit_and_interlace():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_png_multiple_idat_chunks():
    # IDAT may be split arbitrarily; the decoder must concatenate
    pix = bytes(j % 256 for j in range(12 * 4 * 3))
    payload = encode_png(pix, 12, 4, color_type=2, filters=[0, 1, 2, 3])
    sig_ihdr = payload[: 8 + 25]
    idat_len = struct.unpack_from(">I", payload, 8 + 25)[0]
    idat_data = payload[8 + 25 + 8 : 8 + 25 + 8 + idat_len]
    iend = payload[8 + 25 + 12 + idat_len :]

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    split = sig_ihdr + chunk(b"IDAT", idat_data[:7]) + chunk(b"IDAT", idat_data[7:]) + iend
    assert decode_png(split)[3].tobytes() == pix


def test_avi_meta_roundtrip_and_alignment():
    assert parse_avi_meta(encode_avi_header(240, 640, 480, 40000)) == (
        240, 640, 480, 25.0,
    )
    # word alignment: an odd-sized junk chunk before the hdrl LIST must be
    # skipped with its pad byte
    hdr = encode_avi_header(7, 320, 240, 33333)
    junk = struct.pack("<4sI", b"JUNK", 3) + b"abc" + b"\x00"
    spliced = hdr[:12] + junk + hdr[12:]
    spliced = struct.pack("<4sI", b"RIFF", len(spliced) - 8) + spliced[8:]
    n, w, h, fps = parse_avi_meta(spliced)
    assert (n, w, h) == (7, 320, 240)
    assert abs(fps - 1e6 / 33333) < 1e-9


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        parse_avi_meta(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi_meta(b"")


def test_extract_video_meta_spark(spark):
    from spacetime_crawler4_spark.operators.multimodal import extract_video_meta

    rows = [
        (1, encode_avi_header(90, 320, 240, 40000)),
        (2, b"not a video"),
        (3, encode_avi_header(1, 64, 64, 1000000)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_video_meta(df).collect()}
    assert got[1]["n_frames"] == 90 and got[1]["fps"] == 25.0
    assert got[2]["n_frames"] is None and got[2]["fps"] is None
    assert got[3]["width"] == 64 and got[3]["fps"] == 1.0


def test_extract_media_features_png_dispatch(spark):
    from spacetime_crawler4_spark.operators.multimodal import extract_media_features

    gray = encode_png(bytes([10, 20, 30, 40]), 2, 2, color_type=0, filters=[1, 4])
    rgb = encode_png(bytes(range(2 * 2 * 3)), 2, 2, color_type=2, filters=[3, 2])
    df = spark.createDataFrame(
        [(1, gray), (2, rgb)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["kind"] == "png" and got[1]["width"] == 2
    assert got[1]["mean_r"] == got[1]["mean_b"] == (10 + 20 + 30 + 40) / 4.0
    assert got[2]["kind"] == "png"
    assert got[2]["mean_r"] == (0 + 3 + 6 + 9) / 4.0  # R bytes at stride 3
    assert got[2]["mean_g"] == (1 + 4 + 7 + 10) / 4.0
