"""Deterministic WET archive sink + relational CDX manifest.

The claim under test: ``wet_manifest`` (pure DataFrame plan — window
cumsum over a frozen record-length formula) predicts the PHYSICAL bytes
``write_wet_archive`` emits, byte-for-byte — file assignment, within-file
order, every offset and length. That makes the archive index a query,
which is the Common-Crawl CDX shape (capture -> file/offset/length for
ranged GETs).

Reference tie-in: the reference has no archive/export surface (its only
persistence is the msgpack nap, crawler2/nap.py:238-291); this is the
export a Spark crawl needs to hand pages to a training pipeline.
"""

import gzip
import hashlib
import os

import pytest

from spacetime_crawler4_spark.sources.warc import (
    WET_FIXED_OVERHEAD,
    split_warc_records,
    warc_records,
    wet_manifest,
    wet_record_bytes,
    write_wet_archive,
)

PAGES = [
    # ordinary
    ("http://a.test/one", "alpha beta gamma"),
    ("http://a.test/two", "delta epsilon"),
    # empty text (Content-Length: 0 path)
    ("http://a.test/empty", ""),
    # NULL text (coalesced to '')
    ("http://a.test/null", None),
    # multi-byte UTF-8 payload AND url (octet_length != char length)
    ("http://b.test/café", "résumé 日本語 text"),
    # long-ish payload so Content-Length has >1 digit transitions
    ("http://b.test/long", "word " * 500),
    # CRLF / WARC/-lookalike bytes inside the payload must not confuse
    # the reader (length-prefixed framing, not sentinel scanning)
    ("http://c.test/tricky", "line1\r\n\r\nWARC/1.0 fake\r\nline2"),
]
N_FILES = 3


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "url string, text string")


def test_record_length_formula_is_exact():
    for url, text in PAGES:
        payload = (text or "").encode("utf-8")
        rec = wet_record_bytes(url, payload)
        assert len(rec) == (
            WET_FIXED_OVERHEAD
            + len(url.encode("utf-8"))
            + len(str(len(payload)))
            + len(payload)
        )


def test_manifest_matches_physical_bytes(spark, pages_df, tmp_path):
    out = str(tmp_path / "wet")
    predicted = wet_manifest(pages_df, N_FILES).collect()
    measured = write_wet_archive(pages_df, out, N_FILES).collect()
    assert [tuple(r) for r in predicted] == [tuple(r) for r in measured]

    # per-file: size on disk == sum of predicted record lengths
    by_file = {}
    for r in predicted:
        by_file.setdefault(r.filename, []).append(r)
    assert len(by_file) >= 2  # bucketing actually spread the pages
    for fname, rows in by_file.items():
        path = os.path.join(out, fname)
        assert os.path.getsize(path) == sum(r.rec_len for r in rows)
        blob = open(path, "rb").read()
        for r in rows:
            # a ranged read at the PREDICTED offset yields exactly that
            # url's record, with the digest the manifest promised
            rec = blob[r.offset : r.offset + r.rec_len]
            [(headers, payload)] = list(split_warc_records(rec))
            assert headers["warc-target-uri"] == r.url
            assert headers["warc-type"] == "conversion"
            assert int(headers["content-length"]) == r.payload_len
            assert hashlib.md5(payload).hexdigest() == r.digest


def test_archive_roundtrips_through_the_reader(spark, pages_df, tmp_path):
    out = str(tmp_path / "wet_rt")
    write_wet_archive(pages_df, out, N_FILES).collect()
    got = {
        r.target_uri: bytes(r.payload).decode("utf-8")
        for r in warc_records(spark, out).collect()
    }
    want = {u: (t or "") for u, t in PAGES}
    assert got == want


def test_compressed_members_are_individually_readable(
    spark, pages_df, tmp_path
):
    out = str(tmp_path / "wet_gz")
    measured = write_wet_archive(
        pages_df, out, N_FILES, compress=True
    ).collect()
    # measured offsets index into the COMPRESSED file: one gzip member per
    # record, so offset+rec_len slices to a self-contained member
    for r in measured:
        blob = open(os.path.join(out, r.filename), "rb").read()
        member = blob[r.offset : r.offset + r.rec_len]
        rec = gzip.decompress(member)
        [(headers, payload)] = list(split_warc_records(rec))
        assert headers["warc-target-uri"] == r.url
        assert hashlib.md5(payload).hexdigest() == r.digest
    # and the stock reader consumes the whole multi-member archive
    got = {r.target_uri for r in warc_records(spark, out).collect()}
    assert got == {u for u, _ in PAGES}


def test_layout_is_placement_invariant(spark, pages_df, tmp_path):
    """Bucket content is a pure function of the data: writing with a
    different upstream partitioning produces identical files."""
    a, b = str(tmp_path / "wa"), str(tmp_path / "wb")
    write_wet_archive(pages_df, a, N_FILES).collect()
    write_wet_archive(pages_df.repartition(7), b, N_FILES).collect()
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))
    for f in os.listdir(a):
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        )


@pytest.mark.parametrize("compress", [False, True])
def test_ranged_reads_fetch_exactly_the_manifest(
    spark, pages_df, tmp_path, compress
):
    """The CDX consumer: a subset manifest fetches exactly those records
    by seek+read — never scanning the archive."""
    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.sources.warc import read_wet_records

    out = str(tmp_path / f"wet_r_{compress}")
    manifest = write_wet_archive(pages_df, out, N_FILES, compress=compress)
    subset = manifest.filter(F.crc32(F.col("url")) % 2 == 0)
    got = {r.url: r.text for r in read_wet_records(spark, out, subset).collect()}
    want = {
        u: (t or "")
        for u, t in PAGES
        if __import__("zlib").crc32(u.encode()) % 2 == 0
    }
    assert want  # the subset is non-empty
    assert got == want


def test_ranged_read_detects_stale_manifest(spark, pages_df, tmp_path):
    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.sources.warc import read_wet_records

    out = str(tmp_path / "wet_stale")
    manifest = write_wet_archive(pages_df, out, N_FILES)
    skewed = manifest.withColumn("offset", F.col("offset") + 1)
    with pytest.raises(Exception, match="out of sync|PythonException"):
        read_wet_records(spark, out, skewed).collect()
