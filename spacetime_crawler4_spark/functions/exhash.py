"""Exact-duplicate hash: hex(le32(crc32(content)) ++ le32(len(content))).

Reference helpers/exhash.py:11-24 — 16 lowercase hex chars. Two forms:

- ``exhash(content)`` — plain Python, used by the sequential oracle and
  inside parse batches.
- ``exhash_col(binary_col)`` — a pure JVM column expression built on the
  Spark ``crc32`` built-in (same polynomial as the reference's table loop),
  with the little-endian byte order expressed as hex-nibble-pair swaps. No
  Python crosses the boundary for exact-dedup at scale.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def exhash(content: bytes, size: int | None = None) -> str:
    if size is None:
        size = len(content)
    crc = zlib.crc32(content) & 0xFFFFFFFF
    return (crc.to_bytes(4, "little") + size.to_bytes(4, "little")).hex()


def _le_hex(col: Column) -> Column:
    """uint32 column -> 8 lowercase hex chars, little-endian byte order."""
    be = F.lpad(F.hex(col), 8, "0")
    return F.lower(
        F.concat(
            F.substring(be, 7, 2),
            F.substring(be, 5, 2),
            F.substring(be, 3, 2),
            F.substring(be, 1, 2),
        )
    )


def exhash_col(content: Column) -> Column:
    """Column expression equal to ``exhash(content)`` (16 hex chars)."""
    return F.concat(_le_hex(F.crc32(content)), _le_hex(F.length(content)))
