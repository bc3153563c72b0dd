"""HTML / sitemap-XML text+link extraction (stdlib, dependency-free).

Re-implements the behavior of reference helpers/parser.py:74-163 which used
``BeautifulSoup(content, 'lxml').stripped_strings`` with an UNPINNED
beautifulsoup4 (reference packages/requirements.txt) — i.e. modern bs4
(>=4.9) + libxml2 semantics:

- text  = every text node in document order, ``.strip()``-ed, non-empty —
  bs4's ``stripped_strings``. Since bs4 4.9, ``<script>``/``<style>``/
  ``<template>`` contents are stored in Script/Stylesheet/TemplateString
  string containers and are EXCLUDED from ``.strings`` (the iterator keeps
  only exact-type NavigableString); comments, CDATA-as-comment, doctypes
  are excluded the same way. ``<title>`` text is a plain text node —
  included. The canonical single-string serialization of a page is
  ``"\\n".join(fragments)`` — the per-row byte-identical invariant the
  engine must reproduce from ``html`` (BASELINE.json input_hint).
- character references are decoded the way libxml2's HTML parser does it,
  NOT the way html5 specifies: named entities come from the HTML 4.01
  table only (libxml2 htmlEntityLookup; Python's ``name2codepoint`` is the
  same 252-entry set) and require a terminating ``;`` — ``&star;``
  (html5-only) and ``&amp`` (no semicolon) stay literal, where Python's
  ``HTMLParser(convert_charrefs=True)`` would decode both. Numeric refs
  (dec/hex) are decoded. Implemented by masking ``&`` before the
  tokenizer and running our own decoder over text/href values, so the
  stdlib parser's html5 entity rules never apply.
- bytes are decoded like bs4's UnicodeDammit resolves them in the common
  cases: BOM first, else a ``charset=`` declaration in the head, else
  UTF-8 with replacement.
- links = every ``<a href>`` value, absolutized against the page URL with
  RFC-3986 ``urljoin``, fragment-stripped (``urldefrag``), trailing-slash
  normalized, de-duplicated (parser.py:142-150). The reference keeps links
  in an unordered ``set``; we define the canonical order as ``sorted()``
  so the crawl expansion is deterministic (SURVEY.md §2.5 W3).
- sitemap XML (content-type application/xml or text/xml): ``<sitemapindex>``
  -> <sitemap><loc> entries, ``<urlset>`` -> <url><loc> entries, absolutized
  but NOT defragged/normalized (parser.py:109-136 does exactly this); a
  non-protocol XML yields an empty non-sitemap result.

bs4/lxml are not installed in this sandbox; the divergences above are
encoded as committed golden vectors (tests/golden_html.py) and the
differential test against REAL bs4+lxml (tests/test_golden_html.py)
runs automatically wherever those packages exist.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html.entities import name2codepoint
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


# '&' is masked to this sentinel before tokenizing so the stdlib parser's
# html5 charref handling never fires; our libxml2-style decoder runs on
# the reassembled text instead. NUL never survives an HTML parse anyway
# (libxml2 drops it), so it is a safe mask character.
_AMP_MASK = "\x00"

# libxml2 named-entity semantics: HTML 4.01 table, ';' REQUIRED.
# numeric refs decode with or without the trailing ';' (libxml2 emits the
# char and reports a recoverable error when it is missing).
_ENT_RE = re.compile(r"&(?:([a-zA-Z][a-zA-Z0-9]*);|#([0-9]+);?|#[xX]([0-9a-fA-F]+);?)")


def _decode_entities(s: str) -> str:
    if "&" not in s:
        return s

    def _sub(m: re.Match) -> str:
        name = m.group(1)
        if name is not None:
            cp = name2codepoint.get(name)  # case-sensitive, HTML4 only
            return chr(cp) if cp is not None else m.group(0)
        num = m.group(2) or m.group(3)
        try:
            v = int(num, 10 if m.group(2) else 16)
        except ValueError:
            return m.group(0)
        if 0 < v <= 0x10FFFF and not (0xD800 <= v <= 0xDFFF):
            return chr(v)
        return m.group(0)

    return _ENT_RE.sub(_sub, s)


def _unmask(s: str) -> str:
    return s.replace(_AMP_MASK, "&")


# bs4>=4.9 string containers (Script/Stylesheet/TemplateString): a text
# node whose IMMEDIATE parent is one of these is excluded from .strings —
# note <template><p>x</p></template> keeps "x" (its parent is the <p>)
_EXCLUDED_PARENT = ("script", "style", "template")

# html5 void elements: never produce end tags, must not stay on the stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.fragments: list[str] = []
        self.hrefs: list[str] = []
        self._stack: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(_decode_entities(_unmask(value)))
                    break
        if tag not in _VOID:
            self._stack.append(tag)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)
        if self._stack and self._stack[-1] == tag:
            self._stack.pop()

    def handle_endtag(self, tag: str) -> None:
        # pop to the matching open tag (recovery for misnested inline tags);
        # a stray end tag with no opener is ignored
        if tag in self._stack:
            while self._stack:
                if self._stack.pop() == tag:
                    break

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1] in _EXCLUDED_PARENT:
            return
        s = _decode_entities(_unmask(data)).strip()
        if s:
            self.fragments.append(s)


_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)


def _decode_html(content: bytes) -> str:
    """bs4-UnicodeDammit's common path: BOM, then declared charset (meta /
    xml decl in the first 2 KiB), then UTF-8 with replacement."""
    for bom, codec in _BOMS:
        if content.startswith(bom):
            return content.decode(codec, errors="replace")
    m = _CHARSET_RE.search(content[:2048])
    if m:
        try:
            return content.decode(m.group(1).decode("ascii"), errors="replace")
        except (LookupError, UnicodeDecodeError):
            pass
    return content.decode("utf-8", errors="replace")


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
    text = _decode_html(content)
    # NUL never survives libxml2; it doubles as our '&' mask
    parser.feed(text.replace(_AMP_MASK, "").replace("&", _AMP_MASK))
    parser.close()
    links = {
        normalize_url(urldefrag(urljoin(url, href)).url) for href in parser.hrefs
    }
    return PageExtract(sorted(links), parser.fragments, False)
