"""Minimal CBOR codec (RFC 8949 subset) — stdlib-only, from scratch.

The reference crawler fetches through a cache server that answers with
CBOR-encoded response dicts (reference utils/download.py:7-21:
``cbor.loads(resp.content)``). No cbor package ships in this sandbox, so
the transport (crawl/fetch.py ``cache_server_transport``) uses this
codec. Supported types — everything the cache-server payload shape needs
and nothing more: unsigned/negative integers, byte strings, text
strings, arrays, maps, false/true/null, and float64. Indefinite-length
items and tags are NOT supported (the reference payloads never use
them); encountering one raises ValueError rather than guessing.
"""

from __future__ import annotations

import struct


def _encode_head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return bytes([(major << 5) | 25]) + arg.to_bytes(2, "big")
    if arg < 0x100000000:
        return bytes([(major << 5) | 26]) + arg.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + arg.to_bytes(8, "big")


def dumps(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _encode(obj, out: bytearray) -> None:
    if obj is False:
        out += b"\xf4"
    elif obj is True:
        out += b"\xf5"
    elif obj is None:
        out += b"\xf6"
    elif isinstance(obj, int):
        if obj >= 0:
            out += _encode_head(0, obj)
        else:
            out += _encode_head(1, -1 - obj)
    elif isinstance(obj, float):
        out += b"\xfb" + struct.pack(">d", obj)
    elif isinstance(obj, bytes):
        out += _encode_head(2, len(obj)) + obj
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += _encode_head(3, len(b)) + b
    elif isinstance(obj, (list, tuple)):
        out += _encode_head(4, len(obj))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        out += _encode_head(5, len(obj))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise TypeError(f"cbor: unsupported type {type(obj).__name__}")


def loads(data: bytes):
    obj, pos = _decode(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"cbor: {len(data) - pos} trailing bytes")
    return obj


def _decode_arg(buf: memoryview, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        return buf[pos], pos + 1
    if info == 25:
        return int.from_bytes(buf[pos : pos + 2], "big"), pos + 2
    if info == 26:
        return int.from_bytes(buf[pos : pos + 4], "big"), pos + 4
    if info == 27:
        return int.from_bytes(buf[pos : pos + 8], "big"), pos + 8
    raise ValueError(f"cbor: indefinite/reserved additional info {info}")


def _decode(buf: memoryview, pos: int):
    if pos >= len(buf):
        raise ValueError("cbor: truncated input")
    ib = buf[pos]
    major, info = ib >> 5, ib & 0x1F
    pos += 1
    if major == 0:
        return _decode_arg(buf, pos, info)
    if major == 1:
        n, pos = _decode_arg(buf, pos, info)
        return -1 - n, pos
    if major == 2:
        n, pos = _decode_arg(buf, pos, info)
        if pos + n > len(buf):
            raise ValueError("cbor: truncated byte string")
        return bytes(buf[pos : pos + n]), pos + n
    if major == 3:
        n, pos = _decode_arg(buf, pos, info)
        if pos + n > len(buf):
            raise ValueError("cbor: truncated text string")
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if major == 4:
        n, pos = _decode_arg(buf, pos, info)
        items = []
        for _ in range(n):
            v, pos = _decode(buf, pos)
            items.append(v)
        return items, pos
    if major == 5:
        n, pos = _decode_arg(buf, pos, info)
        d = {}
        for _ in range(n):
            k, pos = _decode(buf, pos)
            v, pos = _decode(buf, pos)
            d[k] = v
        return d, pos
    if major == 7:
        if info == 20:
            return False, pos
        if info == 21:
            return True, pos
        if info in (22, 23):
            return None, pos
        if info == 26:
            return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
        if info == 27:
            return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
        raise ValueError(f"cbor: unsupported simple value {info}")
    raise ValueError(f"cbor: unsupported major type {major} (tag?)")
