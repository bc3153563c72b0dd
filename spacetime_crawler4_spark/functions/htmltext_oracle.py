"""Independent re-implementation of the extractor spec — differential oracle.

The production extractor (functions/htmltext.py) targets the reference's
``BeautifulSoup(content, 'lxml').stripped_strings`` semantics but is built
on stdlib ``html.parser`` — so a bug inherited from html.parser's
tokenizer quirks would be invisible to tests that only exercise that one
implementation. This module re-implements the SAME documented spec
(module docstring of htmltext.py: bs4>=4.9 string containers, libxml2
HTML-4.01 entity rules, raw-text script/style, void elements, stray-end-
tag recovery) from scratch: a hand-written state-machine tokenizer over
the decoded text, sharing NO parsing code with the production path.

tests/test_golden_html.py runs both implementations over the golden
vectors, the fixture corpus, and randomized adversarial HTML and asserts
byte-identical fragments and links. Agreement of two independent
implementations is the strongest parity evidence available in a sandbox
without bs4/lxml; where the REAL stack is importable the same test file
also checks both against it, and tools/capture_bs4_golden.py can freeze
real-stack outputs into a committed capture for this suite to verify
against (VERDICT r3 next-round #3).

What this oracle intentionally shares with production (data, not logic):
- ``html.entities.name2codepoint`` — it IS the HTML 4.01 entity table
  both sides must use;
- the URL pipeline (urljoin/urldefrag/normalize) — link post-processing
  is not under test here, tokenization and text-node selection are.
"""

from __future__ import annotations

import re
from html.entities import name2codepoint
from urllib.parse import urldefrag, urljoin

from spacetime_crawler4_spark.functions.urls import normalize_url

_RAWTEXT = ("script", "style")  # libxml2 CDATA-content elements
_EXCLUDED_PARENT = ("script", "style", "template")
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_\-.]*")
_NAME_CHAR_RE = re.compile(r"[a-zA-Z0-9:_\-.]")
_ENT_RE = re.compile(r"&(?:([a-zA-Z][a-zA-Z0-9]*);|#([0-9]+);?|#[xX]([0-9a-fA-F]+);?)")


def _decode(s: str) -> str:
    """libxml2 entity semantics, implemented independently of the
    production decoder: HTML-4.01 names require ';'; numeric decimal/hex
    decode with or without it; everything else stays literal."""

    out: list[str] = []
    pos = 0
    while True:
        m = _ENT_RE.search(s, pos)
        if m is None:
            out.append(s[pos:])
            return "".join(out)
        out.append(s[pos : m.start()])
        if m.group(1) is not None:
            cp = name2codepoint.get(m.group(1))
            out.append(chr(cp) if cp is not None else m.group(0))
        else:
            num = m.group(2) or m.group(3)
            try:
                v = int(num, 10 if m.group(2) else 16)
            except ValueError:
                v = -1
            if 0 < v <= 0x10FFFF and not (0xD800 <= v <= 0xDFFF):
                out.append(chr(v))
            else:
                out.append(m.group(0))
        pos = m.end()


def _parse_attrs(s: str) -> list[tuple[str, str | None]]:
    """Attribute substring of a start tag -> [(name, value|None)]."""
    attrs: list[tuple[str, str | None]] = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\n\r\f/":
            i += 1
        m = _NAME_RE.match(s, i)
        if not m:
            i += 1  # libxml2 SKIP(1): bogus byte, keep parsing attrs
            continue
        name = m.group(0).lower()
        i = m.end()
        while i < n and s[i] in " \t\n\r\f":
            i += 1
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in " \t\n\r\f":
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
                while j < n and s[j] not in " \t\n\r\f":
                    j += 1
                attrs.append((name, s[i:j]))
                i = j
        else:
            attrs.append((name, None))
    return attrs


def _tokenize(text: str):
    """Yield ('start', tag, attrs, selfclosing) | ('end', tag) | ('data', s)
    events from raw HTML text — a from-scratch tokenizer with libxml2's
    relevant behaviors: comments/doctypes/PIs skipped, raw-text script/
    style content taken verbatim to the matching close tag, unterminated
    constructs swallowed to EOF."""
    i, n = 0, len(text)
    while i < n:
        lt = text.find("<", i)
        if lt < 0:
            yield ("data", text[i:])
            return
        if lt > i:
            yield ("data", text[i:lt])
        if text.startswith("<!--", lt):
            end = text.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if text.startswith("<!", lt) or text.startswith("<?", lt):
            end = text.find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        if text.startswith("</", lt):
            m = _NAME_RE.match(text, lt + 2)
            end = text.find(">", lt + 2)
            if m and end >= 0:
                yield ("end", m.group(0).lower())
                i = end + 1
            elif end >= 0:
                i = end + 1  # </> or </3 — dropped
            else:
                i = n
            continue
        m = _NAME_RE.match(text, lt + 1)
        if not m:
            # bare '<' in text: literal character data
            yield ("data", "<")
            i = lt + 1
            continue
        tag = m.group(0).lower()
        # find tag close, honoring quoted attribute VALUES that contain
        # '>'. A quote opens a span only in value position — after
        # NAME= (whitespace allowed around '=') — matching libxml2,
        # where htmlParseAttValue runs only after an attribute NAME and
        # '='; a stray quote among junk, or after a bare '=', is skipped
        # as a bogus character and never quotes. The tag name itself is
        # not an attribute name, so state starts cold after it.
        j = m.end()
        in_q: str | None = None
        val_next = False  # an armed '=' was seen: a quote here quotes
        was_name = False  # last non-space char was an attr-name char
        while j < n:
            c = text[j]
            if in_q is not None:
                if c == in_q:
                    in_q = None
                j += 1
                continue
            if c == ">":
                break
            if c in "\"'":
                if val_next:
                    in_q = c
                val_next = was_name = False
            elif c == "=":
                val_next, was_name = was_name, False
            elif c not in " \t\n\r\f":
                was_name = bool(_NAME_CHAR_RE.match(c))
                val_next = False
            j += 1
        if j >= n:
            return  # unterminated tag swallows to EOF
        inner = text[m.end() : j]
        selfclosing = inner.rstrip().endswith("/")
        yield ("start", tag, _parse_attrs(inner), selfclosing)
        i = j + 1
        if tag in _RAWTEXT and not selfclosing:
            # raw text until the matching close tag (case-insensitive)
            close = re.compile(rf"</{tag}\s*>", re.I)
            mm = close.search(text, i)
            if mm is None:
                # unterminated raw text swallows to EOF; content excluded
                return
            # content intentionally dropped (excluded parents anyway)
            yield ("end", tag)
            i = mm.end()


def oracle_extract_full(
    url: str, content_text: str
) -> tuple[list[str], list[str], list[tuple[str, str]]]:
    """(sorted links, stripped text fragments, anchors) per the documented
    spec — the independent twin of htmltext.extract_page's HTML branch.
    Takes already-decoded text so byte-decoding (shared, table-driven)
    stays out of the differential. Anchor spec (mirrored independently):
    a new ``<a>`` implicitly closes an open one; ``</a>`` and EOF close
    keeping the text; the text is the space-join of the visible fragments
    emitted while the anchor was open; only ``<a>`` carrying an href
    opens one; a self-closed ``<a href=x/>`` yields empty text."""
    # libxml2 rejects \x00/\x01 in char data (IS_CHAR); the production
    # extractor strips them pre-parse (\x01 doubles as its '&' mask), and
    # the twin must make the identical up-front decision
    content_text = content_text.replace("\x00", "").replace("\x01", "")
    fragments: list[str] = []
    hrefs: list[str] = []
    anchors: list[tuple[str, str]] = []
    a_href: str | None = None
    a_start = 0
    stack: list[str] = []

    def close_anchor() -> None:
        nonlocal a_href
        if a_href is not None:
            anchors.append((a_href, " ".join(fragments[a_start:])))
            a_href = None

    for ev in _tokenize(content_text):
        kind = ev[0]
        if kind == "start":
            _, tag, attrs, selfclosing = ev
            if tag == "a":
                close_anchor()
                for name, value in attrs:
                    if name == "href" and value is not None:
                        h = _decode(value)
                        hrefs.append(h)
                        a_href = h
                        a_start = len(fragments)
                        break
                if selfclosing:
                    close_anchor()
            if tag not in _VOID and not selfclosing:
                stack.append(tag)
        elif kind == "end":
            tag = ev[1]
            if tag == "a":
                close_anchor()
            if tag in stack:
                while stack:
                    if stack.pop() == tag:
                        break
        else:
            if stack and stack[-1] in _EXCLUDED_PARENT:
                continue
            s = _decode(ev[1]).strip()
            if s:
                fragments.append(s)
    close_anchor()  # anchor open at EOF keeps its text
    links = {normalize_url(urldefrag(urljoin(url, h)).url) for h in hrefs}
    resolved = [
        (normalize_url(urldefrag(urljoin(url, h)).url), t) for h, t in anchors
    ]
    return sorted(links), fragments, resolved


def oracle_extract(url: str, content_text: str) -> tuple[list[str], list[str]]:
    """Two-tuple compatibility wrapper around oracle_extract_full."""
    links, fragments, _ = oracle_extract_full(url, content_text)
    return links, fragments
