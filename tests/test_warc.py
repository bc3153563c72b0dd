"""WARC source: roundtrip, gzip members, HTTP parsing, garbage tolerance,
and the crawl-engine handoff (WARC dir -> pages table -> fetch join)."""

import gzip

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.sources.warc import (
    build_warc,
    parse_http_response,
    split_warc_records,
    warc_pages,
    warc_records,
)


def _sample_records():
    return [
        {
            "type": "warcinfo",
            "uri": None,
            "payload": b"software: test\r\n",
            "content_type": "application/warc-fields",
        },
        {
            "type": "response",
            "uri": "http://w.test/a",
            "date": "2024-03-01T10:00:00Z",
            "payload": b"<html><body>Alpha &amp; beta</body></html>",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
        },
        {
            "type": "response",
            "uri": "http://w.test/redir",
            "date": "2024-03-01T10:00:05Z",
            "payload": b"",
            "http_status": 301,
        },
        {
            "type": "conversion",
            "uri": "http://w.test/a",
            "payload": "Alpha & beta".encode(),
            "content_type": "text/plain",
        },
    ]


def test_split_roundtrip_plain_and_gzip(tmp_path):
    blob = build_warc(_sample_records())
    got_plain = list(split_warc_records(blob))
    # one gzip member per record (the Common Crawl layout) must also parse
    members = b"".join(
        gzip.compress(build_warc([r])) for r in _sample_records()
    )
    got_gz = list(split_warc_records(members))
    for got in (got_plain, got_gz):
        assert len(got) == 4
        types = [h["warc-type"] for h, _ in got]
        assert types == ["warcinfo", "response", "response", "conversion"]
        # payload lengths honored exactly
        assert got[1][1].endswith(b"</body></html>")


def test_http_parse_and_garbage_tolerance():
    status, ct, body = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    )
    assert (status, ct, body) == (200, "text/html", b"<p>x</p>")
    assert parse_http_response(b"not http")[0] is None
    # truncated record tail is dropped, earlier records survive
    blob = build_warc(_sample_records())
    assert len(list(split_warc_records(blob[: len(blob) - 30]))) == 3
    # arbitrary garbage yields nothing, never raises
    assert list(split_warc_records(b"\x00\x01garbage" * 50)) == []


def test_warc_records_dataframe(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(build_warc(_sample_records()))
    (d / "seg-1.warc.gz").write_bytes(gzip.compress(build_warc(_sample_records())))
    recs = warc_records(spark, str(d)).collect()
    assert len(recs) == 8  # 4 per file
    by_type = {r["warc_type"] for r in recs}
    assert by_type == {"warcinfo", "response", "conversion"}
    resp = [r for r in recs if r["warc_type"] == "response" and r["http_status"] == 200]
    assert all(r["http_content_type"].startswith("text/html") for r in resp)
    assert all(r["warc_ts"] is not None for r in resp)


def test_warc_pages_table_shape(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(build_warc(_sample_records()))
    pages = warc_pages(spark, str(d))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang", "status"]
    rows = {r["url"]: r for r in pages.collect()}
    assert rows["http://w.test/a"]["html"] == b"<html><body>Alpha &amp; beta</body></html>"
    # WET conversion text joined onto the response row
    assert rows["http://w.test/a"]["text"] == "Alpha & beta"
    assert rows["http://w.test/redir"]["status"] == 301
    assert rows["http://w.test/a"]["lang"] is None


def test_warc_pages_feed_the_text_plane(spark, tmp_path):
    """End-to-end handoff: WARC -> pages table -> the engine's fused
    parse/tokenize UDF produces the extractor's byte-exact text."""
    from spacetime_crawler4_spark.functions.htmltext import extract_page
    from spacetime_crawler4_spark.operators.textplane import crawl_features_udf

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(build_warc(_sample_records()))
    pages = warc_pages(spark, str(d)).filter(F.col("status") == 200)
    feat = pages.select(
        "url",
        crawl_features_udf(
            F.col("url"), F.col("html"), F.lit("text/html")
        ).alias("f"),
    ).collect()
    assert len(feat) == 1
    exp = extract_page(
        "http://w.test/a", b"<html><body>Alpha &amp; beta</body></html>"
    )
    assert feat[0]["f"]["text"] == exp.text == "Alpha & beta"


def test_warc_sink_roundtrip(spark, tmp_path):
    """pages -> write_warc_dir -> warc_pages reads back byte-identical
    html for every archived url (the archive sink closes the loop)."""
    import datetime

    src = spark.createDataFrame(
        [
            (f"http://w.test/p{i}", datetime.datetime(2024, 3, 1, 10, 0, i),
             f"<html><body>doc {i}</body></html>".encode(), 200)
            for i in range(25)
        ],
        "url string, warc_ts timestamp, html binary, status int",
    ).repartition(4)
    out = tmp_path / "archive"
    from spacetime_crawler4_spark.sources.warc import warc_pages, write_warc_dir

    n = write_warc_dir(src, str(out))
    assert n == 25
    assert 1 <= len(list(out.glob("part-*.warc"))) <= 4
    back = {r["url"]: r for r in warc_pages(spark, str(out)).collect()}
    assert len(back) == 25
    for i in range(25):
        u = f"http://w.test/p{i}"
        assert back[u]["html"] == f"<html><body>doc {i}</body></html>".encode()
        assert back[u]["status"] == 200
        assert back[u]["warc_ts"].second == i


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abc/:.-", min_size=1, max_size=30),
                  st.binary(max_size=200),
                  st.integers(min_value=100, max_value=606)),
        min_size=1,
        max_size=6,
    )
)
def test_warc_roundtrip_property(recs):
    """Arbitrary payload bytes (including CRLFs and 'WARC/' lookalikes
    inside bodies) survive the length-prefixed framing exactly."""
    records = [
        {"type": "response", "uri": f"http://t.test/{i}-{u}",
         "payload": body, "http_status": status}
        for i, (u, body, status) in enumerate(recs)
    ]
    got = list(split_warc_records(build_warc(records)))
    assert len(got) == len(records)
    for (hdr, payload), rec in zip(got, records):
        assert hdr["warc-target-uri"] == rec["uri"]
        status, _ct, body = parse_http_response(payload)
        assert status == rec["http_status"]
        assert body == rec["payload"]
