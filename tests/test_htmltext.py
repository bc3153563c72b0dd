"""HTML/sitemap extraction contract tests (the extractor defines the
byte-identical text spec; bs4/lxml are unavailable in this environment)."""

from spacetime_crawler4_spark.functions.htmltext import (
    extract_page,
    extract_sitemap_urls,
)

HTML = b"""<html><head><title>My Title</title>
<script>var x = 1;</script><style>.a { color: red }</style></head>
<body>
<!-- a comment that must NOT appear -->
<h1>Hello &amp; Welcome</h1>
<p>Para <b>bold</b> tail.</p>
<a href="/rel/path">rel</a>
<a href="sub.html">sub</a>
<a href="http://other.test/abs/">abs</a>
<a href="#frag-only">self</a>
<a href="/rel/path#with-frag">fragged</a>
<a name="no-href">skip me</a>
<p>   </p>
<div>trailing</div>
</body></html>"""


def test_extract_html_text_and_links():
    res = extract_page("http://a.test/dir/page.html", HTML)
    assert not res.sitemap
    # script/style contents are EXCLUDED: bs4>=4.9 stores them in
    # Script/Stylesheet string containers that stripped_strings skips
    # (the reference pins no bs4 version — modern semantics apply)
    assert res.text_fragments == [
        "My Title",
        "Hello & Welcome",
        "Para",
        "bold",
        "tail.",
        "rel",
        "sub",
        "abs",
        "self",
        "fragged",
        "skip me",
        "trailing",
    ]
    assert res.text == "\n".join(res.text_fragments)
    # defragged, normalized (trailing / stripped), absolutized, deduped, sorted
    assert res.links == [
        "http://a.test/dir/page.html",  # #frag-only -> self, defragged
        "http://a.test/dir/sub.html",
        "http://a.test/rel/path",  # /rel/path and /rel/path#with-frag collapse
        "http://other.test/abs",  # trailing slash normalized away
    ]


SITEMAP_INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.test/sitemap1.xml</loc></sitemap>
  <sitemap><loc>/sitemap2.xml</loc></sitemap>
</sitemapindex>"""

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.test/page1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://a.test/page2/</loc></url>
</urlset>"""


def test_sitemap_index():
    res = extract_page("http://a.test/sitemap.xml", SITEMAP_INDEX, "application/xml")
    assert res.sitemap
    assert res.text_fragments == []
    assert res.links == ["http://a.test/sitemap1.xml", "http://a.test/sitemap2.xml"]


def test_urlset_no_normalization():
    res = extract_page("http://a.test/sitemap1.xml", URLSET, "text/xml; charset=utf-8")
    assert res.sitemap
    # sitemap links are absolutized only — trailing slash KEPT (parser.py:129-131)
    assert res.links == ["http://a.test/page1", "http://a.test/page2/"]


def test_non_protocol_xml():
    res = extract_page("http://a.test/feed.xml", b"<rss><item/></rss>", "text/xml")
    assert not res.sitemap
    assert res.links == [] and res.text_fragments == []
    assert extract_sitemap_urls(b"not xml at all") is None


def test_html_content_type_with_charset():
    res = extract_page("http://a.test/", b"<p>hi</p>", "text/html; charset=utf-8")
    assert res.text_fragments == ["hi"]
