"""Golden adversarial-HTML vectors for the byte-identical text invariant.

Each vector encodes the expected output of the REFERENCE extractor —
``BeautifulSoup(content, 'lxml').stripped_strings`` under modern bs4
(>=4.9, the reference's requirements.txt pins no version) plus the
reference link pipeline (helpers/parser.py:139-163) — on HTML that is
deliberately malformed or entity-heavy, i.e. exactly where a naive
stdlib reimplementation diverges.

bs4/lxml are not installed in this sandbox, so the expectations are
derived from the documented/source behavior of bs4 string containers
(>=4.9: script/style excluded, template direct-text excluded, comments/
CDATA/doctype excluded) and libxml2's HTML entity handling (HTML 4.01
named-entity table, ';' required; numeric refs decoded). Every vector
carries a confidence note; tests/test_golden_html.py ALSO runs the whole
set differentially against real bs4+lxml whenever those packages are
importable, so any environment with the real stack re-validates these
expectations automatically.

Vector = (name, url, html_bytes, expected_fragments, expected_links).
"""

URL = "http://g.test/dir/page.html"

VECTORS: list[tuple[str, str, bytes, list[str], list[str]]] = [
    (
        # high confidence: bs4>=4.9 Script/Stylesheet containers + comment
        # + doctype exclusion; title is a plain text node and stays
        "script_style_comment_doctype",
        URL,
        b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = 1; if (a < b) { s = "<div>"; }</script>
<style>.c { color: red }</style></head>
<body><!-- invisible -->text<script type="text/javascript">more()</script>after</body></html>""",
        ["T", "text", "after"],
        [],
    ),
    (
        # high confidence: HTML4 named entities with ';' decode; numeric
        # dec/hex decode
        "entities_html4_and_numeric",
        URL,
        b"<p>Fish &amp; chips &lt;now&gt; caf&eacute; &Agrave; &#72;&#105; &#x21;</p>",
        ["Fish & chips <now> café À Hi !"],
        [],
    ),
    (
        # medium-high confidence: libxml2 knows only the HTML4 entity
        # table — html5-only names stay literal (HTMLParser's html5 rules
        # would decode &star; and the &not prefix of &notanentity;)
        "entities_html5_only_stay_literal",
        URL,
        b"<p>a &star; b &notanentity; c</p>",
        ["a &star; b &notanentity; c"],
        [],
    ),
    (
        # medium confidence: no trailing ';' => libxml2 leaves the raw
        # text (html5/HTMLParser would decode the legacy prefix &amp)
        "entity_without_semicolon_stays_literal",
        URL,
        b"<p>fish &amp chips</p>",
        ["fish &amp chips"],
        [],
    ),
    (
        # high confidence: misnested inline tags — text nodes in document
        # order, one fragment per node, regardless of tree recovery
        "misnested_inline",
        URL,
        b"<p><b>bo<i>ld</b>ita</i>tail</p>",
        ["bo", "ld", "ita", "tail"],
        [],
    ),
    (
        # high confidence: unclosed <p> chain (implied end tags)
        "unclosed_paragraphs",
        URL,
        b"<p>one<p>two<p>three",
        ["one", "two", "three"],
        [],
    ),
    (
        # high confidence: document order is stable across table recovery
        "table_text",
        URL,
        b"<table><tr><td>cell</td></tr></table>after",
        ["cell", "after"],
        [],
    ),
    (
        # medium-high confidence: CDATA in text/html is a bogus comment to
        # both libxml2 and HTMLParser — excluded, splits the text node
        "cdata_is_comment",
        URL,
        b"<p>x<![CDATA[ hidden ]]>z</p>",
        ["x", "z"],
        [],
    ),
    (
        # high confidence: comment splits one text run into two nodes
        "comment_splits_text",
        URL,
        b"<p>a<!-- c -->b</p>",
        ["a", "b"],
        [],
    ),
    (
        # medium-high confidence: bs4 TemplateString applies to DIRECT
        # text children of <template> only; text nested deeper has another
        # parent and stays
        "template_direct_text_only",
        URL,
        b"<template>direct<p>nested</p></template>shown",
        ["nested", "shown"],
        [],
    ),
    (
        # high confidence: whitespace-only and &nbsp;-only nodes strip to
        # empty and are dropped by stripped_strings
        "whitespace_and_nbsp_dropped",
        URL,
        b"<p>   </p><p>&nbsp;</p><p>kept</p>",
        ["kept"],
        [],
    ),
    (
        # high confidence: meta-declared legacy charset decodes (bs4
        # UnicodeDammit honors the declaration); 0xE9 is e-acute in 8859-1
        "meta_charset_latin1",
        URL,
        b'<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>',
        ["café"],
        [],
    ),
    (
        # high confidence: UTF-8 BOM consumed, not part of the text
        "utf8_bom",
        URL,
        b"\xef\xbb\xbf<p>x</p>",
        ["x"],
        [],
    ),
    (
        # high confidence: links — entity-decoded hrefs, absolutization,
        # defrag, trailing-slash normalization, dedup, uppercase tags
        "links_pipeline",
        URL,
        b"""<body>
<A HREF="/q?a=1&amp;b=2">one</A>
<a href="sub.html#frag">two</a>
<a href="http://other.test/abs/">three</a>
<a href="/q?a=1&amp;b=2">dup</a>
<a name="nohref">four</a>
</body>""",
        ["one", "two", "three", "dup", "four"],
        [
            "http://g.test/dir/sub.html",
            "http://g.test/q?a=1&b=2",
            "http://other.test/abs",
        ],
    ),
    (
        # high confidence: void elements split nothing and do not corrupt
        # parent tracking; <br> splits a text run into two nodes
        "void_elements",
        URL,
        b"<p>line1<br>line2<img src=x>line3</p>",
        ["line1", "line2", "line3"],
        [],
    ),
    (
        # high confidence: script closed with whitespace-y end tag; CDATA
        # content model runs to the real end tag
        "script_end_tag_variants",
        URL,
        b"<script>a</b>still script</script >ok",
        ["ok"],
        [],
    ),
]
