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
    # (dst_url, anchor_text) per <a href> in document order; dst normalized
    # like links, text = space-joined visible fragments inside the anchor.
    # Additive surface for the anchor-text link graph (operators/linkgraph) —
    # the reference collects outlinks but discards anchor text
    # (scraper.py extract_next_links), so this field has no parity contract.
    anchors: tuple = ()

    @property
    def text(self) -> str:
        return "\n".join(self.text_fragments)


# '&' is masked to this sentinel before tokenizing so the stdlib parser's
# html5 charref handling never fires; our libxml2-style decoder runs on
# the reassembled text instead. libxml2 rejects the non-whitespace C0
# controls in char data (IS_CHAR excludes them), so \x00 and \x01 are
# stripped from input up front and \x01 becomes the mask. \x01
# specifically because CPython's html.parser special-cases \x00 inside
# tag markup (an html5 rule libxml2 does not share) — masking with NUL
# made `<b&>x` parse as text where libxml2 recovers a <b> tag.
_AMP_MASK = "\x01"

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

# libxml2 htmlParseHTMLName: letters/digits and : . _ - (tag + attr names)
_HNAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:._-]*")
_HNAME_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789:._-"
)
_WS = " \t\n\r\f"


def _parse_tag_attrs(s: str) -> list[tuple[str, str | None]]:
    """Start-tag attribute text -> [(name, value|None)] with libxml2's
    recovery: a bogus character where an attribute name should begin is
    skipped (libxml2 SKIP(1)) and parsing continues — so '<a ]href=x>'
    still yields the href. Values: quoted to the matching quote
    (unterminated never reaches here — the end scan refuses to close
    such a tag), else up to whitespace."""
    attrs: list[tuple[str, str | None]] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] in _WS or s[i] == "/":
            i += 1
            continue
        m = _HNAME_RE.match(s, i)
        if not m:
            i += 1  # bogus byte between attributes: skip, keep parsing
            continue
        name = m.group(0).lower()
        i = m.end()
        while i < n and s[i] in _WS:
            i += 1
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in _WS:
                i += 1
            if i < n and s[i] in "\"'":
                q = s[i]
                j = s.find(q, i + 1)
                if j < 0:
                    j = n
                attrs.append((name, s[i + 1 : j]))
                i = j + 1
            else:
                j = i
                while j < n and s[j] not in _WS:
                    j += 1
                attrs.append((name, s[i:j]))
                i = j
        else:
            attrs.append((name, None))
    return attrs


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.fragments: list[str] = []
        self.hrefs: list[str] = []
        self.anchors: list[tuple[str, str]] = []  # (href, visible text)
        self._a_href: str | None = None
        self._a_start = 0
        self._stack: list[str] = []

    def _close_anchor(self) -> None:
        if self._a_href is not None:
            self.anchors.append(
                (self._a_href, " ".join(self.fragments[self._a_start :]))
            )
            self._a_href = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            # a new <a> implicitly closes an open one (html tree building);
            # anchor text = the visible fragments emitted while it was open
            self._close_anchor()
            for name, value in attrs:
                if name == "href" and value is not None:
                    href = _decode_entities(_unmask(value))
                    self.hrefs.append(href)
                    self._a_href = href
                    self._a_start = len(self.fragments)
                    break
        if tag not in _VOID:
            self._stack.append(tag)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)
        if tag == "a":
            self._close_anchor()  # <a href=x/>: empty anchor text
        if self._stack and self._stack[-1] == tag:
            self._stack.pop()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close_anchor()
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

    def check_for_whole_start_tag(self, i: int) -> int:
        # libxml2-faithful start-tag end scan, replacing the stdlib one
        # (whose quote rules diverge: it honors name="v but not the
        # spaced name = "v, arms quotes in non-value junk differently,
        # and flushes malformed tags back out as text). A quote opens a
        # value span ONLY right after NAME= (whitespace allowed around
        # '='); a '>' inside such a span does not close the tag; a tag
        # with no closing '>' — including an unterminated quoted value —
        # returns -1 so it stays buffered and is dropped at EOF.
        rawdata = self.rawdata
        n = len(rawdata)
        # the tag NAME is not an attribute name: '<p="v>' must not arm a
        # value quote, so the armed/prev_name state starts after it
        m = _HNAME_RE.match(rawdata, i + 1)
        j = m.end() if m else i + 1
        in_q, armed, prev_name = None, False, False
        while j < n:
            c = rawdata[j]
            if in_q:
                if c == in_q:
                    in_q = None
            elif c == ">":
                return j + 1
            elif c in "\"'":
                if armed:
                    in_q = c
                armed = prev_name = False
            elif c == "=":
                armed, prev_name = prev_name, False
            elif c not in _WS:
                prev_name, armed = c in _HNAME_CHARS, False
            j += 1
        return -1

    def parse_starttag(self, i: int) -> int:
        # libxml2-faithful start-tag grammar (stdlib parse_starttag is
        # regex-tolerant in ways libxml2 is not, and emits malformed
        # tags back out as text where libxml2 recovers a tag). Only
        # called by goahead() on '<[a-zA-Z]', so the name match holds.
        endpos = self.check_for_whole_start_tag(i)
        if endpos < 0:
            return -1
        rawdata = self.rawdata
        m = _HNAME_RE.match(rawdata, i + 1)
        tag = m.group(0).lower()
        inner = rawdata[m.end() : endpos - 1]
        attrs = _parse_tag_attrs(inner)
        if inner.rstrip().endswith("/"):
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return endpos

    def parse_endtag(self, i: int) -> int:
        # libxml2-faithful end tag (htmlParseEndTag), replacing the stdlib
        # one whose html5 name rule runs to whitespace/'>' — '</a</i>' is
        # endtag 'a<' to the stdlib but endtag 'a' (junk skipped to the
        # first '>') to libxml2, which mis-keys every tag == 'x' check.
        # Grammar: '</' + NAME, then skip blindly to the first '>' (end
        # tags have no quote awareness); '</>' or '</3' consume to '>'
        # and emit nothing; no '>' before EOF leaves the construct
        # buffered (dropped at EOF like every unterminated construct).
        rawdata = self.rawdata
        if self.cdata_elem is not None:
            # raw-text (script/style) closes ONLY on '</name[ws]*>' — a
            # candidate like '</scriptx>' or '</ script>' stays content
            m = re.compile(rf"</{re.escape(self.cdata_elem)}\s*>", re.I).match(
                rawdata, i
            )
            if not m:
                self.handle_data(rawdata[i : i + 2])
                return i + 2
            tag = self.cdata_elem
            self.clear_cdata_mode()
            self.handle_endtag(tag)
            return m.end()
        gtpos = rawdata.find(">", i + 2)
        if gtpos < 0:
            return -1  # unterminated: buffered, dropped at EOF
        m = _HNAME_RE.match(rawdata, i + 2)
        if m:
            self.handle_endtag(m.group(0).lower())
        return gtpos + 1

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        # '<![...': libxml2 (and html5's bogus-comment rule) skips to the
        # FIRST '>' — '<![CDATA[a>b]]>c' leaves 'b]]>c' as text. The
        # stdlib implementation instead consumes to ']]>' and raises
        # AssertionError outright on junk like '<![>'. Nothing emitted.
        end = self.rawdata.find(">", i + 3)
        if end < 0:
            return -1  # unterminated: buffered, dropped at EOF
        return end + 1


# markup-construct starts whose unterminated tail libxml2 discards at
# EOF: start tag, end tag, declaration/comment, processing instruction.
# '<' followed by anything else (digit, space, EOF) is text on both sides.
_UNTERMINATED_RE = re.compile(r"<(?:[a-zA-Z]|/|!|\?)")

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
    # strip the libxml2-rejected controls (incl. the mask char), then mask
    parser.feed(
        text.replace("\x00", "").replace(_AMP_MASK, "").replace("&", _AMP_MASK)
    )
    # libxml2 recovery DROPS a tag/end-tag/comment/PI/declaration left
    # open at EOF (it swallows to end-of-input and emits nothing), while
    # HTMLParser.close() would flush the unconsumed buffer back out as
    # text ('<a' at EOF -> fragments ['<','a']). The buffer is exactly
    # the unterminated construct (feed() already consumed everything
    # terminated, honoring attribute quoting), so discard it when it
    # starts like markup; a lone '<' before EOF stays text on both.
    if parser.rawdata and _UNTERMINATED_RE.match(parser.rawdata):
        parser.rawdata = ""
    parser.close()
    parser._close_anchor()  # anchor still open at EOF keeps its text
    links = {
        normalize_url(urldefrag(urljoin(url, href)).url) for href in parser.hrefs
    }
    anchors = tuple(
        (normalize_url(urldefrag(urljoin(url, href)).url), text)
        for href, text in parser.anchors
    )
    return PageExtract(sorted(links), parser.fragments, False, anchors)
