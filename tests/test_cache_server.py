"""Cache-server transport: the reference's CBOR wire protocol end to end
against an in-process HTTP server, driven through the engine's fetch
seam — the crawl result must equal the corpus-join crawl row for row."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow.parquet as pq
import pytest

from spacetime_crawler4_spark.functions import cbor
from spacetime_crawler4_spark.crawl.fetch import (
    cache_server_transport,
    make_http_fetcher,
)


@pytest.fixture(scope="module")
def cache_server(corpus_dir):
    """Serve the fixture pages corpus over the reference's protocol:
    GET /?q=<url>&u=<agent> -> CBOR {url, status, content, ...}."""
    pages = {
        r["url"]: r
        for r in pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    }
    seen_agents = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            url = q.get("q", [""])[0]
            seen_agents.extend(q.get("u", []))
            r = pages.get(url)
            if r is None:
                # the spacetime cache server signals cache misses with its
                # 6xx range (the engine classifies 600-606 as CACHE_ERROR,
                # same as a page absent from the corpus join)
                payload = {"url": url, "status": 600, "error": "not cached",
                           "content": None, "content_type": None,
                           "redirect_to": None, "retry_after": 0}
            else:
                payload = {
                    "url": url,
                    "status": r["status"],
                    "content": r["html"],
                    "content_type": r["content_type"],
                    "redirect_to": r["redirect_to"],
                    "retry_after": int(r["retry_after"] or 0),
                }
            body = cbor.dumps(payload)
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, seen_agents
    srv.shutdown()


def test_transport_speaks_the_protocol(cache_server, corpus_dir):
    (host, port), seen_agents = cache_server
    pages = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    some = [r for r in pages if r["status"] == 200][:3]
    t = cache_server_transport(host, port, user_agent="IR US24 12345678")
    rows = t([r["url"] for r in some] + ["http://nowhere.test/x"])
    for r, exp in zip(rows, some):
        assert r["page_status"] == exp["status"]
        assert r["html"] == exp["html"]
        assert r["content_type"] == exp["content_type"]
    assert rows[-1]["page_status"] == 600  # cache miss -> spacetime 6xx
    # the reference protocol carries the user agent as the 'u' param
    assert "IR US24 12345678" in seen_agents


@pytest.mark.slow
def test_cache_server_crawl_equals_corpus_join(spark, corpus_dir, cache_server):
    """Full engine crawl fetching ONLY through the cache server == the
    default corpus-join crawl (same frontier rows, same finish codes)."""
    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.sources.fixture import (
        FIXTURE_WHITELIST,
        SEED_URLS,
    )

    (host, port), _ = cache_server
    cfg = CrawlConfig(whitelist=FIXTURE_WHITELIST)

    def run(fetcher):
        eng = CrawlEngine(
            spark,
            f"{corpus_dir}/pages.parquet",
            f"{corpus_dir}/robots.parquet",
            list(SEED_URLS),
            cfg,
            fetcher=fetcher,
        )
        fr = eng.run()
        return {
            r["urlhash"]: (r["status"], r["finish"], r["absdepth"])
            for r in fr.collect()
        }

    via_server = run(
        make_http_fetcher(cache_server_transport(host, port))
    )
    via_join = run(None)
    assert via_server == via_join


def test_cbor_rejects_what_it_does_not_speak():
    with pytest.raises(ValueError):
        cbor.loads(bytes.fromhex("5f42010243030405ff"))  # indefinite bytes
    with pytest.raises(ValueError):
        cbor.loads(bytes.fromhex("c074"))  # tag 0
    with pytest.raises(ValueError):
        cbor.loads(cbor.dumps({"a": 1})[:-1])  # truncated


# ---------------------------------------------------------------------------
# property: cbor roundtrip over arbitrary nested payloads of the supported
# type universe — any server payload the transport can see must survive
# encode/decode bit-exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.binary(max_size=64),
    st.text(max_size=64),
)
_payloads = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=6),
        st.dictionaries(st.text(max_size=12), inner, max_size=6),
    ),
    max_leaves=20,
)


@settings(max_examples=300, deadline=None)
@given(_payloads)
def test_cbor_roundtrip_property(v):
    assert cbor.loads(cbor.dumps(v)) == v
