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


def _decode_header_value(raw: bytes) -> str:
    # ISO 28500 §4: WARC header content is UTF-8; fall back to latin-1 so
    # a garbage byte degrades one value instead of dropping the record
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = _decode_header_value(
                v.strip()
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


# ------------------------------------------------- deterministic WET layout
#
# Common Crawl ships extracted text as WET archives (conversion records)
# and publishes a CDX index mapping each capture to (file, offset, length)
# so a reader can fetch ONE record with a ranged GET. The layout below is
# that shape made fully deterministic — file assignment, within-file order,
# and every byte offset are pure functions of (url, text), so the whole
# manifest is computable RELATIONALLY (window cumsum over record lengths)
# before a single byte is written, and the physical writer can be checked
# against the predicted manifest byte-for-byte (tests/test_warc_sink.py).
#
# Reference tie-in: the reference crawler persists page text only inside
# its msgpack nap (crawler2/nap.py:238-291); an archive/export surface does
# not exist there — this is the Common-Crawl-native export a Spark crawl
# at scale needs (one file per bucket = one unit of future read
# parallelism, exactly like warc_records' one-task-per-file ingest).

WET_DATE = "2026-01-01T00:00:00Z"  # fixed capture date: layout stays pure


def _wet_record_id(uri: str) -> str:
    """Deterministic urn:uuid record id: md5(url) formatted 8-4-4-4-12.
    Only its FIXED 36-char length matters for the relational length
    formula; md5 keeps it engine-portable and collision-safe enough for
    an archive id."""
    import hashlib

    h = hashlib.md5(uri.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def wet_record_bytes(uri: str, payload: bytes, date: str = WET_DATE) -> bytes:
    """Canonical WET 'conversion' record: header block + payload + CRLF
    CRLF separator. Field order and spelling are FROZEN — the relational
    manifest predicts len() of this exact serialization."""
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{_wet_record_id(uri)}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF + _CRLF


# fixed per-record byte overhead: everything except the url bytes, the
# payload bytes, and the decimal digits of Content-Length. Derived from
# the serializer itself so the formula can never drift from the bytes.
WET_FIXED_OVERHEAD = len(wet_record_bytes("", b"")) - 1  # "0" is 1 digit


def wet_manifest(pages: DataFrame, n_files: int) -> DataFrame:
    """The predicted CDX manifest for ``write_wet_archive`` — PURE
    relational plan (no UDF, no I/O): per url its archive file, byte
    offset, record length, payload length, and content digest.

    Plan shape at scale: one map-side projection (md5 / octet_length /
    conv are JVM built-ins) + ONE shuffle on file_id for the window
    cumsum — the same shuffle the physical writer needs anyway, so the
    manifest is free. Ordered (filename, offset) as the output contract.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    text = F.coalesce(F.col("text"), F.lit(""))
    plen = F.octet_length(text)
    m = pages.select(
        F.col("url"),
        plen.alias("payload_len"),
        F.md5(text).alias("digest"),
        (
            F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10).cast("long")
            % n_files
        ).alias("file_id"),
    ).withColumn(
        "rec_len",
        F.lit(WET_FIXED_OVERHEAD)
        + F.octet_length(F.col("url"))
        + F.length(F.col("payload_len").cast("string"))
        + F.col("payload_len"),
    )
    w = (
        Window.partitionBy("file_id")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        m.withColumn("offset", F.sum("rec_len").over(w) - F.col("rec_len"))
        .select(
            F.format_string("wet-%05d.warc", F.col("file_id")).alias("filename"),
            "url",
            "offset",
            "rec_len",
            "payload_len",
            "digest",
        )
        .orderBy("filename", "offset")
    )


def wet_manifest_sql(pagetext_parquet: str, n_files: int) -> str:
    """DuckDB twin of ``wet_manifest`` — identical bucket hash (md5 hex
    prefix), identical length formula, identical cumsum."""
    return f"""
WITH p AS (SELECT url, coalesce(text, '') AS text
           FROM '{pagetext_parquet}'),
m AS (SELECT url,
             octet_length(encode(text)) AS payload_len,
             md5(text) AS digest,
             CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % {n_files}
               AS file_id
      FROM p),
r AS (SELECT *,
             {WET_FIXED_OVERHEAD} + octet_length(encode(url))
               + length(CAST(payload_len AS VARCHAR)) + payload_len AS rec_len
      FROM m)
SELECT printf('wet-%05d.warc', file_id) AS filename,
       url,
       sum(rec_len) OVER (PARTITION BY file_id ORDER BY url
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - rec_len AS "offset",
       rec_len,
       payload_len,
       digest
FROM r
ORDER BY filename, "offset"
"""


def write_wet_archive(
    pages: DataFrame,
    out_dir: str,
    n_files: int,
    compress: bool = False,
) -> DataFrame:
    """Write (url, text) as a deterministic WET archive: ``n_files``
    buckets, one ``wet-NNNNN.warc`` each (``.gz`` with one gzip member
    per record when ``compress`` — Common Crawl's record-granular
    layout, so a ranged GET + single-member gunzip yields one record).

    Returns the MEASURED manifest (same schema as ``wet_manifest``;
    offsets/lengths are compressed sizes when ``compress``). Execution:
    one shuffle (repartition on file_id), each task serializes its
    bucket(s) sorted by url and writes them — bucket content is a pure
    function of the data, never of task placement. On a real cluster
    ``out_dir`` must be shared storage (same contract as any
    foreachPartition file sink)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    os.makedirs(out_dir, exist_ok=True)
    gz = ".gz" if compress else ""
    src = pages.select(
        "url",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        (
            F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10).cast("long")
            % n_files
        ).alias("file_id"),
    ).repartition(n_files, "file_id")

    def _write(batches):
        import gzip as _gzip
        import hashlib

        rows: dict[int, list[tuple[str, str]]] = {}
        for pdf in batches:
            for u, t, fid in zip(pdf["url"], pdf["text"], pdf["file_id"]):
                rows.setdefault(int(fid), []).append((u, t))
        out = {
            "filename": [],
            "url": [],
            "offset": [],
            "rec_len": [],
            "payload_len": [],
            "digest": [],
        }
        for fid in sorted(rows):
            fname = f"wet-{fid:05d}.warc{gz}"
            blob = bytearray()
            for u, t in sorted(rows[fid]):
                payload = t.encode("utf-8")
                rec = wet_record_bytes(u, payload)
                if compress:
                    rec = _gzip.compress(rec, mtime=0)
                out["filename"].append(fname)
                out["url"].append(u)
                out["offset"].append(len(blob))
                out["rec_len"].append(len(rec))
                out["payload_len"].append(len(payload))
                out["digest"].append(hashlib.md5(payload).hexdigest())
                blob += rec
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(bytes(blob))
        yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("filename", StringType()),
            StructField("url", StringType()),
            StructField("offset", LongType()),
            StructField("rec_len", LongType()),
            StructField("payload_len", LongType()),
            StructField("digest", StringType()),
        ]
    )
    return src.mapInPandas(_write, schema=schema).orderBy("filename", "offset")


def read_wet_records(
    spark: SparkSession, archive_dir: str, manifest: DataFrame
) -> DataFrame:
    """Ranged record fetch: (url, text) for EXACTLY the manifest rows
    (filename, url, offset, rec_len) — the CDX consumer pattern. Each
    task seeks into its files at the manifest offsets instead of
    scanning archives, so cost is O(records wanted), not O(archive):
    at Common-Crawl scale this is the difference between ranged GETs
    for a 100-URL sample and decompressing a 100 TB crawl.

    Rows are re-sorted by (filename, offset) inside each task for
    sequential access; gzip members (compress=True archives) decompress
    individually. Repartitioning the manifest by filename upstream
    groups reads per archive file — do that when fetching many records."""

    def _fetch(batches):
        import os

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"url": [], "text": []}
            pdf = pdf.sort_values(["filename", "offset"])
            fname_open, fh = None, None
            try:
                for fname, url, off, rlen in zip(
                    pdf["filename"], pdf["url"], pdf["offset"], pdf["rec_len"]
                ):
                    if fname != fname_open:
                        if fh is not None:
                            fh.close()
                        fh = open(os.path.join(archive_dir, fname), "rb")
                        fname_open = fname
                    fh.seek(int(off))
                    rec = fh.read(int(rlen))
                    if fname.endswith(".gz"):
                        rec = gzip.decompress(rec)
                    recs = list(split_warc_records(rec))
                    if len(recs) != 1 or recs[0][0].get("warc-target-uri") != url:
                        raise ValueError(
                            f"manifest out of sync with {fname}@{off}: "
                            f"expected {url!r}"
                        )
                    out["url"].append(url)
                    out["text"].append(recs[0][1].decode("utf-8"))
            finally:
                if fh is not None:
                    fh.close()
            yield pd.DataFrame(out)

    return manifest.select("filename", "url", "offset", "rec_len").mapInPandas(
        _fetch, schema="url string, text string"
    )
