#!/usr/bin/env python
"""Extractor differential soak: production (functions/htmltext.extract_page)
vs the independent twin (functions/htmltext_oracle.oracle_extract_full) on
millions of adversarial random documents — fragments, links, AND anchors
must agree byte-for-byte. The generator leans into the constructs where
HTML parsers genuinely diverge: malformed start tags, quote/value
positioning, unterminated everything, marked sections, entity soup,
nested/implicit-close anchors, C0 controls, and the '&' mask character.

Usage: python tools/soak_extractor.py [n_docs] [seeds...]
Prints one JSON line; exits non-zero on the first divergence (with the
offending document repr'd for triage).
"""

import json
import random
import sys
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEXT_ATOMS = [
    "a", "b c", "x&y", "&amp;", "&lt;b&gt;", "&#60;", "&#x3c;", "&eacute;",
    "&bogus;", "&#", "&", "&;", "word", "é ü", "1<2", "..", "", " ", "\t\n",
    "\x00ctl", "\x01mask", "star&#42done", "&ampx", "q&quot", "\x7f", "]]>",
]
TAGS = ["p", "div", "span", "b", "i", "a", "title", "br", "img", "x-y", "q1"]
ATTR_JUNK = ["", " ", " /", " ]", " =", ' ="v"', " n", " n=", " n=v", ' n="v"',
             " n = 'v'", ' n="a>b"', " n='", ' n="', " 'q'", ' "q"', " n=v w=u",
             " href=/r1", ' href="/r2"', " HREF='/r3'", " href", " hr ef=/bad",
             " ]href=/rec", " n==v", " = = ", " a=b=c"]


def _rand_doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 40)):
        k = rng.random()
        if k < 0.30:
            parts.append(rng.choice(TEXT_ATOMS))
        elif k < 0.55:
            t = rng.choice(TAGS)
            a = rng.choice(ATTR_JUNK) + rng.choice(ATTR_JUNK)
            close = rng.choice([">", "/>", ">", ""])  # '' = unterminated
            parts.append(f"<{t}{a}{close}")
        elif k < 0.70:
            parts.append(f"</{rng.choice(TAGS)}{rng.choice(['>', '', ' >'])}")
        elif k < 0.78:
            body = rng.choice(TEXT_ATOMS).replace("-", "")
            parts.append(rng.choice([f"<!--{body}-->", f"<!--{body}", f"<!{body}>",
                                     f"<![CDATA[{body}]]>", f"<![{body}",
                                     f"<?{body}?>", f"<?{body}"]))
        elif k < 0.90:
            href = rng.choice(["/l1", "l2?q=1#f", "HTTP://H.TEST/UP", "&amp;x", ""])
            inner = rng.choice(TEXT_ATOMS)
            shape = rng.random()
            if shape < 0.4:
                parts.append(f'<a href="{href}">{inner}</a>')
            elif shape < 0.7:
                parts.append(f"<a href={href}>{inner}")  # implicit close
            else:
                parts.append(f"<a>{inner}</a>")  # no href
        else:
            body = rng.choice(TEXT_ATOMS)
            parts.append(rng.choice([f"<script>{body}</script>",
                                     f"<style>{body}</style>",
                                     f"<script>{body}"]))
    return "".join(parts)


def _run_shard(args: tuple) -> dict:
    seed, n = args
    from spacetime_crawler4_spark.functions.htmltext import (
        _decode_html,
        extract_page,
    )
    from spacetime_crawler4_spark.functions.htmltext_oracle import (
        oracle_extract_full,
    )

    rng = random.Random(seed)
    url = "http://soak.test/d/p.html"
    n_anchors = 0
    for i in range(n):
        doc = _rand_doc(rng)
        payload = doc.encode("utf-8", "surrogatepass")
        prod = extract_page(url, payload)
        links, frags, anchors = oracle_extract_full(url, _decode_html(payload))
        if (
            prod.text_fragments != frags
            or prod.links != links
            or list(prod.anchors) != anchors
        ):
            return {"seed": seed, "i": i, "doc": repr(doc),
                    "prod": (prod.text_fragments, prod.links, list(prod.anchors)),
                    "twin": (frags, links, anchors)}
        n_anchors += len(anchors)
    return {"seed": seed, "ok": n, "anchors": n_anchors}


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    seeds = [int(s) for s in sys.argv[2:]] or [1, 2, 3, 4]
    workers = 16
    per_shard = max(1, n_docs // (len(seeds) * workers))
    shards = [(s * 10_000 + w, per_shard) for s in seeds for w in range(workers)]
    with Pool(workers) as pool:
        results = pool.map(_run_shard, shards)
    bad = [r for r in results if "ok" not in r]
    if bad:
        print(json.dumps({"divergence": bad[0]}, default=str))
        return 1
    print(json.dumps({
        "docs_checked": sum(r["ok"] for r in results),
        "anchors_compared": sum(r["anchors"] for r in results),
        "seeds": seeds,
        "divergences": 0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
