"""HTML / sitemap-XML text+link extraction (stdlib, dependency-free).

Re-implements the behavior of reference helpers/parser.py:74-163 which used
BeautifulSoup('lxml'):

- text  = every text node in document order, ``.strip()``-ed, non-empty —
  bs4's ``stripped_strings``. Script/style/title contents are text nodes and
  are therefore INCLUDED (as bs4-lxml does); comments are excluded; character
  references are decoded. The canonical single-string serialization of a page
  is ``"\\n".join(fragments)`` — this is the per-row byte-identical invariant
  the engine must reproduce from ``html`` (BASELINE.json input_hint).
- links = every ``<a href>`` value, absolutized against the page URL with
  RFC-3986 ``urljoin``, fragment-stripped (``urldefrag``), trailing-slash
  normalized, de-duplicated (parser.py:142-150). The reference keeps links in
  an unordered ``set``; we define the canonical order as ``sorted()`` so the
  crawl expansion is deterministic (SURVEY.md §2.5 W3).
- sitemap XML (content-type application/xml or text/xml): ``<sitemapindex>``
  -> <sitemap><loc> entries, ``<urlset>`` -> <url><loc> entries, absolutized
  but NOT defragged/normalized (parser.py:109-136 does exactly this); a
  non-protocol XML yields an empty non-sitemap result.

This module is pure Python and only runs inside Arrow-batched pandas UDFs.
(bs4/lxml are not available in this environment; this extractor defines the
byte-identical contract and the fixture generator is built against it.)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from typing import NamedTuple
from urllib.parse import urldefrag, urljoin

from spacetime_crawler4_spark.functions.urls import normalize_url


class PageExtract(NamedTuple):
    links: list[str]  # sorted, deduped, absolutized
    text_fragments: list[str]  # stripped non-empty text nodes, document order
    sitemap: bool

    @property
    def text(self) -> str:
        return "\n".join(self.text_fragments)


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.fragments: list[str] = []
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break

    def handle_data(self, data: str) -> None:
        s = data.strip()
        if s:
            self.fragments.append(s)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def extract_sitemap_urls(xml_bytes: bytes) -> list[str] | None:
    """Raw <loc> URLs from a sitemap index or urlset; None if not protocol."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return None
    urls: list[str] = []
    name = _local(root.tag)
    if name == "sitemapindex":
        child_name = "sitemap"
    elif name == "urlset":
        child_name = "url"
    else:
        return None
    for el in root.iter():
        if _local(el.tag) != child_name:
            continue
        for loc in el:
            if _local(loc.tag) == "loc" and loc.text:
                urls.append(loc.text)
                break
    return urls


def extract_page(url: str, content: bytes, content_type: str = "text/html") -> PageExtract:
    """Extract (links, text fragments, sitemap flag) from one fetched page."""
    if "application/xml" in content_type or "text/xml" in content_type:
        locs = extract_sitemap_urls(content)
        if locs is None:
            return PageExtract([], [], False)
        # sitemap links: absolutized only (reference parser.py:129-131)
        return PageExtract(sorted({urljoin(url, u) for u in locs}), [], True)

    parser = _Collector()
    parser.feed(content.decode("utf-8", errors="replace"))
    parser.close()
    links = {
        normalize_url(urldefrag(urljoin(url, href)).url) for href in parser.hrefs
    }
    return PageExtract(sorted(links), parser.fragments, False)
