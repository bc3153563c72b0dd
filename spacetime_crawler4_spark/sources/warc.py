"""WARC source — Common-Crawl's native archive format as a pages table.

The graft's input hint is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html, text, lang); the crawl data itself ships as WARC
(ISO 28500: length-prefixed records of WARC headers + payload, usually
one gzip member per record). This connector turns a directory of
.warc / .warc.gz files into exactly that table, Spark-first:

- ``spark.read.format("binaryFile")`` lists the archive files — ONE task
  per WARC file, which is precisely Common Crawl's unit of parallelism
  (each crawl segment is ~1 GB, independently decompressible);
- record splitting + HTTP-response parsing run inside ``mapInPandas``
  (Arrow-batched, no per-row Python UDF), so a 1000-file directory fans
  out to 1000 independent decode tasks with zero shuffle;
- the result is the (url, warc_ts, html, ...) frame the crawl engine's
  fetch join and the text plane consume directly.

Parsing is from scratch (stdlib only) off the public spec:
record = "WARC/1.0\\r\\n" headers CRLF CRLF payload[Content-Length]
CRLF CRLF. Multi-member gzip is handled by decompressing members in a
loop (Python's gzip reads concatenated members natively). 'response'
records carry an HTTP/1.x response as payload; the body after the HTTP
header block is the page's html bytes. 'conversion' records (WET) carry
extracted text. Malformed records are skipped, counted, never fatal —
a crawler's reader meets garbage.
"""

from __future__ import annotations

import gzip
import io
from email.utils import parsedate_to_datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("record_id", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

PAGES_SCHEMA_COLS = ("url", "warc_ts", "html", "text", "lang")

_CRLF = b"\r\n"


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes pass
    through untouched."""
    if not blob.startswith(b"\x1f\x8b"):
        return blob
    return gzip.GzipFile(fileobj=io.BytesIO(blob)).read()


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def split_warc_records(blob: bytes):
    """Yield (warc_headers: dict, payload: bytes) per well-formed record;
    malformed tails are dropped (never raised)."""
    data = _gunzip_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated record
        yield headers, data[body_start:body_end]
        pos = body_end


def parse_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP/1.x response payload;
    (None, None, payload) when it is not an HTTP response."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, None, payload
    head = payload[:sep]
    status_line = head.split(_CRLF, 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, None, payload
    headers = _parse_headers(head.split(_CRLF, 1)[1] if _CRLF in head else b"")
    return status, headers.get("content-type"), payload[sep + 4 :]


def _warc_ts(headers: dict[str, str]):
    raw = headers.get("warc-date")
    if not raw:
        return None
    try:
        # WARC dates are ISO-8601 Zulu
        from datetime import datetime

        return datetime.fromisoformat(raw.replace("Z", "+00:00")).replace(
            tzinfo=None
        )
    except ValueError:
        try:
            return parsedate_to_datetime(raw).replace(tzinfo=None)
        except (TypeError, ValueError):
            return None


def warc_records(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` (.warc / .warc.gz), one row per
    record — one decode task per archive file, no shuffle."""
    files = spark.read.format("binaryFile").load(path)

    def _decode(batches):
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                for headers, payload in split_warc_records(bytes(blob)):
                    status, http_ct, _body = parse_http_response(payload)
                    rows.append(
                        {
                            "source_file": fname,
                            "warc_type": headers.get("warc-type"),
                            "target_uri": headers.get("warc-target-uri"),
                            "warc_ts": _warc_ts(headers),
                            "record_id": headers.get("warc-record-id"),
                            "content_type": headers.get("content-type"),
                            "http_status": status,
                            "http_content_type": http_ct,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        _decode, schema=WARC_RECORD_SCHEMA
    )


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """The input-hint pages table (url, warc_ts, html, text, lang) from a
    WARC directory: 'response' records contribute html bytes; 'conversion'
    (WET) records for the same URI contribute extracted text. lang is NULL
    at ingest (the text plane's langid fills it downstream)."""
    from pyspark.sql import functions as F

    recs = warc_records(spark, path)
    resp = recs.filter(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"), "warc_ts", "payload", "http_status"
    )
    # body extraction in python (payload is binary; HTTP head length
    # varies) — reuse the record parser's split inside one more Arrow pass
    def _bodies(batches):
        for pdf in batches:
            out = {
                "url": [],
                "warc_ts": [],
                "html": [],
                "status": [],
            }
            for u, ts, payload, st in zip(
                pdf["url"], pdf["warc_ts"], pdf["payload"], pdf["http_status"]
            ):
                _s, _ct, body = parse_http_response(bytes(payload))
                out["url"].append(u)
                out["warc_ts"].append(ts)
                out["html"].append(body)
                out["status"].append(st)
            yield pd.DataFrame(out)

    body_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("status", IntegerType()),
        ]
    )
    pages = resp.select("url", "warc_ts", "payload", "http_status").mapInPandas(
        _bodies, schema=body_schema
    )
    wet = (
        recs.filter(F.col("warc_type") == "conversion")
        .select(
            F.col("target_uri").alias("url"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
    )
    return (
        pages.join(wet, "url", "left")
        .select(
            "url",
            "warc_ts",
            "html",
            "text",
            F.lit(None).cast("string").alias("lang"),
            "status",
        )
    )


# ---------------------------------------------------------------- writer


def build_warc(records: list[dict]) -> bytes:
    """Serialize records ({type, uri, date, payload, http_status,
    http_content_type}) to WARC/1.0 bytes — the test fixture generator
    (and the shape a archiving sink would emit)."""
    out = bytearray()
    for i, r in enumerate(records):
        if r.get("http_status") is not None:
            payload = (
                f"HTTP/1.1 {r['http_status']} X\r\n"
                f"Content-Type: {r.get('http_content_type', 'text/html')}\r\n"
                f"\r\n"
            ).encode() + r["payload"]
        else:
            payload = r["payload"]
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {r['type']}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            + (f"WARC-Target-URI: {r['uri']}\r\n" if r.get("uri") else "")
            + f"Content-Type: {r.get('content_type', 'application/http')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        out += head + payload + _CRLF + _CRLF
    return bytes(out)


def write_warc_dir(
    pages: DataFrame,
    out_dir: str,
    http_status_col: str = "status",
) -> int:
    """Archive a pages frame (url, warc_ts, html[, status]) as a WARC
    directory — the sink side of this connector: one ``part-NNNNN.warc``
    per partition, written inside ``mapInPandas`` (the standard
    embarrassingly-parallel archive layout: each output file is an
    independent unit of future read parallelism, like Common Crawl's
    segment files). Returns the number of records written.

    Determinism note: record order inside a part follows partition row
    order and part assignment follows the input partitioning — stable
    given a stable upstream sort+repartition, which the caller owns.
    """
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StructField, StructType

    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", "warc_ts", "html"] + (
        [http_status_col] if http_status_col in pages.columns else []
    )

    def _write(batches):
        import uuid

        recs = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                ts = d.get("warc_ts")
                recs.append(
                    {
                        "type": "response",
                        "uri": d["url"],
                        "date": (
                            ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                            if ts is not None
                            else "1970-01-01T00:00:00Z"
                        ),
                        "payload": bytes(d["html"] or b""),
                        "http_status": int(d.get(http_status_col) or 200),
                    }
                )
        if recs:
            # one file per task; uuid4 in the name mirrors Spark's own
            # task-output naming (no two tasks collide, retries overwrite
            # nothing — the driver-side count is the commit signal)
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc")
            with open(path, "wb") as f:
                f.write(build_warc(recs))
        yield pd.DataFrame({"n": [len(recs)]})

    schema = StructType([StructField("n", IntegerType())])
    counts = pages.select(*cols).mapInPandas(_write, schema=schema).collect()
    return int(sum(r["n"] for r in counts))
