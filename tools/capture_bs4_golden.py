#!/usr/bin/env python
"""Freeze REAL bs4+lxml extractor outputs into committed test data.

Run this in any environment where beautifulsoup4 and lxml are installed
(they are not installable in the build sandbox):

    python tools/capture_bs4_golden.py

It executes the reference pipeline — ``BeautifulSoup(content, 'lxml')``
``.stripped_strings`` plus the link pipeline of reference
helpers/parser.py:139-163 — over every golden vector
(tests/golden_html.py) and writes tests/bs4_golden_capture.json with the
observed fragments/links and the exact bs4/lxml/libxml2 versions.

Committing that file turns tests/test_golden_html.py::
test_vectors_match_committed_real_stack_capture from a skip into a hard
gate: the production extractor is then checked against CAPTURED REALITY,
not derived expectations (VERDICT r3 next-round #3).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

OUT = Path(__file__).resolve().parent.parent / "tests" / "bs4_golden_capture.json"


def main() -> None:
    import bs4
    import lxml.etree
    from bs4 import BeautifulSoup

    from golden_html import VECTORS
    from spacetime_crawler4_spark.functions.urls import normalize_url
    from urllib.parse import urldefrag, urljoin

    vectors = {}
    for name, url, html, _f, _l in VECTORS:
        soup = BeautifulSoup(html, "lxml")
        fragments = list(soup.stripped_strings)
        hrefs = [
            a.get("href") for a in soup.find_all("a") if a.get("href") is not None
        ]
        links = sorted(
            {normalize_url(urldefrag(urljoin(url, h)).url) for h in hrefs}
        )
        vectors[name] = {"fragments": fragments, "links": links}

    OUT.write_text(
        json.dumps(
            {
                "bs4_version": bs4.__version__,
                "lxml_version": lxml.etree.LXML_VERSION,
                "libxml2_version": lxml.etree.LIBXML_VERSION,
                "vectors": vectors,
            },
            indent=1,
            ensure_ascii=False,
        )
    )
    print(f"wrote {OUT} ({len(vectors)} vectors)")


if __name__ == "__main__":
    main()
