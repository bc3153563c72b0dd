"""CRC-32 (ISO-HDLC) and CRC-64/XZ.

Reference parity surfaces (check values from reference test/test_crc32.py:6-17
and test/test_crc64.py:6-15):

- crc32(b"123456789") == 0xCBF43926 — this is the zlib/ISO-HDLC polynomial,
  identical to BOTH stdlib ``zlib.crc32`` and the Spark SQL built-in
  ``crc32``; the engine therefore never computes crc32 in Python on the hot
  path (reference helpers/crc32.py is a table-driven reimplementation of the
  same algorithm).
- crc64(b"123456789") == 0x995DC9BBDF1939FA — CRC-64/XZ (reversed poly
  0xC96C5795D7870F42), no Spark built-in. Used only per *unique token* for
  simhash (reference helpers/simhash.py:17), so the pandas UDF memoizes by
  token; the table-driven kernel below is numpy-vectorized over the bytes of
  one token.
"""

from __future__ import annotations

import zlib

import numpy as np

_CRC64_POLY = np.uint64(0xC96C5795D7870F42)


def _build_crc64_table() -> np.ndarray:
    tbl = np.arange(256, dtype=np.uint64)
    one = np.uint64(1)
    for _ in range(8):
        lsb_set = (tbl & one).astype(bool)
        tbl = tbl >> one
        tbl[lsb_set] ^= _CRC64_POLY
    return tbl


_CRC64_TABLE = _build_crc64_table()
_MASK64 = 0xFFFFFFFFFFFFFFFF


def crc32(data: bytes) -> int:
    """CRC-32/ISO-HDLC — delegate to zlib (same algorithm as the reference's
    table loop and Spark's built-in ``crc32``)."""
    return zlib.crc32(data) & 0xFFFFFFFF


def crc64(data: bytes) -> int:
    """CRC-64/XZ of ``data`` as an unsigned 64-bit int."""
    crc = _MASK64
    tbl = _CRC64_TABLE
    for b in data:
        crc = int(tbl[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ _MASK64


def crc64_batch(items: list[bytes]) -> np.ndarray:
    """CRC-64/XZ over a batch of byte strings -> uint64 array.

    Processes column-wise across the batch (one table lookup per byte
    position over all strings of equal remaining length) so the Python-level
    loop is O(max_len), not O(total_bytes).
    """
    n = len(items)
    out = np.full(n, _MASK64, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return out ^ np.uint64(_MASK64)
    # pad into a matrix of byte values
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(items):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    eight = np.uint64(8)
    for pos in range(maxlen):
        active = lens > pos
        cur = out[active]
        idx = ((cur ^ mat[active, pos].astype(np.uint64)) & np.uint64(0xFF)).astype(np.int64)
        out[active] = _CRC64_TABLE[idx] ^ (cur >> eight)
    return out ^ np.uint64(_MASK64)
