"""Deterministic synthetic web corpus (pages + robots + seeds parquet).

Shape mandated by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
plus auxiliary metadata the engine may read (FIXTURES.md §1 allows extras):
    status int, content_type string, redirect_to string, retry_after int

The ``text`` column is the expected byte-identical extraction: the generator
assembles every page from an explicit fragment list and renders HTML around
those fragments, so ``extract_page(html).text == text`` is a real invariant,
not a tautology (tests/test_fixture.py asserts it via the extractor).

Embedded structures and the reference behavior each one exercises:
  - BFS tree + cross links (frontier ordering)
  - /chain/{1..12}         absdepth > 8 sift          (workerpipe.py:33,50)
  - deep ladder /lad/...   reldepth > 2 sift          (nurl.py:208-230)
  - skip ladder /mono/...  monodepth > 3 sift
  - /list?page={1..6}      dupdepth > 1 sift (query family trap)
  - /exact/{0..2} + ctrl   byte-identical dup family  (workerpipe.py:198-218)
  - /near/{0..4} + ctrl    simhash hamming<=5 family  (workerpipe.py:257-277)
  - tiny / huge / sparse   LOWINFO_PRE / LOWINFO_POST (workerpipe.py:30-40)
  - ftp: / .pdf / off-whitelist links                 (scraper2.py:76-101)
  - /redir/* chains incl. redirect->seen              (workerpipe.py:163-186)
  - http/https twin links  scheme-less urlhash        (utils/__init__.py:25-30)
  - robots: Disallow, Crawl-delay, Sitemap, 403-disallow-all, 404-allow-all
  - /retry/1               5xx-then-200 backoff       (workerpipe.py:26,110-127)
  - status 600 page        CACHE_ERROR                (workerpipe.py:153-156)
  - mega host holding most pages (domain skew / politeness budget)

Everything is seeded (seed=42); no wall clock, no network.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from spacetime_crawler4_spark.functions.simhash import hamming32, simhash32
from spacetime_crawler4_spark.functions.tokenizer import tokenize, word_count

SEED = 42
EPOCH = datetime(2024, 1, 1)

A = "http://www.example-a.test"
DEEP = "http://deep.example-a.test"
B = "http://www.example-b.test"
MEGA = "http://mega.example-a.test"
BLOCKED = "http://blocked.example-b.test"
NOROBOTS = "http://norobots.example-a.test"
OFF = "http://off.example-x.test"
MIRROR = "http://mirror.example-b.test"

# crawl whitelist for the fixture corpus (engine config, not hardcoded)
FIXTURE_WHITELIST = (".example-a.test", ".example-b.test")
SEED_URLS = [A, B, f"{MEGA}/hub"]

_VOCAB = [f"spark{i:03d}" for i in range(120)] + [
    "frontier", "crawler", "politeness", "shuffle", "partition", "broadcast",
    "iceberg", "parquet", "tungsten", "catalyst", "arrow", "vector",
    "lineage", "snapshot", "bloom", "cuckoo", "replica", "executor",
]


@dataclass
class Page:
    url: str
    fragments: list[str] = field(default_factory=list)
    hrefs: list[str] = field(default_factory=list)  # raw href values, in order
    anchors: list[str] = field(default_factory=list)
    status: int = 200
    content_type: str = "text/html"
    redirect_to: str | None = None
    retry_after: int = 0
    raw_html: bytes | None = None  # override (exact-dup family, sitemaps)
    lang: str = "en"

    def html(self) -> bytes:
        if self.raw_html is not None:
            return self.raw_html
        parts = ["<html><head><title>", _esc(self.fragments[0]), "</title></head><body>"]
        for frag in self.fragments[1 : len(self.fragments) - len(self.anchors)]:
            parts.append(f"<p>{_esc(frag)}</p>")
        for href, anchor in zip(self.hrefs, self.anchors):
            parts.append(f'<a href="{_esc(href)}">{_esc(anchor)}</a>')
        parts.append("</body></html>")
        return "".join(parts).encode("utf-8")

    def text(self) -> str:
        return "\n".join(self.fragments)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _para(rng: random.Random, nwords: int = 28) -> str:
    words = [rng.choice(_VOCAB) for _ in range(nwords)]
    words += words[:4]  # guarantee max word count >= 2
    return " ".join(words)


def _page(
    rng: random.Random,
    url: str,
    title: str,
    links: list[tuple[str, str]],
    extra_paras: int = 1,
    **kw,
) -> Page:
    frags = [title] + [_para(rng) for _ in range(1 + extra_paras)]
    hrefs = [h for h, _ in links]
    anchors = [a for _, a in links]
    frags += anchors
    return Page(url=url, fragments=frags, hrefs=hrefs, anchors=anchors, **kw)


def _wordbag_page(url: str, title: str, bag: dict[str, int], links: list[tuple[str, str]]) -> Page:
    """Page whose tokenized word-count equals ``bag`` + title/anchor tokens."""
    body = " ".join(w for word, c in sorted(bag.items()) for w in [word] * c)
    hrefs = [h for h, _ in links]
    anchors = [a for _, a in links]
    return Page(url=url, fragments=[title, body] + anchors, hrefs=hrefs, anchors=anchors)


def _near_dup_family(rng: random.Random, n: int, extras: dict[str, int]) -> list[dict[str, int]]:
    """n word bags whose FULL page bags (bag + title/anchor ``extras``) are
    within simhash hamming<=4 of family head + 1 control bag (>5)."""

    def full_hash(bag: dict[str, int]) -> int:
        full = dict(bag)
        for w, c in extras.items():
            full[w] = full.get(w, 0) + c
        return simhash32(full)

    base = {rng.choice(_VOCAB): rng.randint(2, 6) for _ in range(40)}
    fams = [dict(base)]
    h0 = full_hash(base)
    salt = 0
    while len(fams) < n:
        cand = dict(base)
        salt += 1
        # perturb: tweak counts of a few words deterministically
        for w in list(cand.keys())[salt % 7 :: 11]:
            cand[w] = max(1, cand[w] + (salt % 3) - 1)
        cand[f"variant{salt:03d}"] = 1
        d = hamming32(h0, full_hash(cand))
        if 0 < d <= 4:  # margin below threshold 5
            fams.append(cand)
        if salt > 2000:
            raise AssertionError("near-dup search did not converge")
    # control: deterministically search for a bag beyond the threshold
    for ctrl_salt in range(1000):
        ctrl = {rng.choice(_VOCAB[::-1]): rng.randint(1, 9) for _ in range(40)}
        ctrl["controlword"] = 3 + ctrl_salt
        if hamming32(full_hash(ctrl), h0) > 5:
            fams.append(ctrl)
            return fams
    raise AssertionError("near-dup control search did not converge")


def build_corpus(scale: int = 1) -> tuple[list[Page], list[dict], list[str]]:
    """Returns (pages, robots_rows, seed_urls). ``scale`` multiplies the
    mega-host item count (bench uses scale>>1; tests use scale=1)."""
    rng = random.Random(SEED)
    pages: list[Page] = []

    # ---- site A: BFS tree -------------------------------------------------
    root_links = [(f"/p{i}", f"section p{i}") for i in range(10)]
    root_links += [
        ("/chain/1", "chain start"),
        ("/dup-root", "dup root"),
        (f"{DEEP}/lad", "deep ladder"),
        (f"{DEEP}/mono", "mono ladder"),
        (f"{DEEP}/private/page", "private page"),
        ("/exact/0", "exact zero"),
        ("/exact/1", "exact one"),
        ("/exact/2", "exact two"),
        ("/exact/ctrl", "exact control"),
        ("/lowinfo/tiny", "tiny page"),
        ("/lowinfo/huge", "huge page"),
        ("/lowinfo/sparse", "sparse page"),
        ("/redir/1", "redirect one"),
        ("/redir/3", "redirect three"),
        ("/retry/1", "retry page"),
        ("/cache/err", "cache error page"),
        ("/missing/nowhere", "dead link"),
        ("ftp://www.example-a.test/ftp-thing", "ftp link"),
        ("/paper.pdf", "pdf link"),
        (f"{OFF}/page", "off whitelist"),
        (f"https://www.example-a.test/p0", "https twin of p0"),
        (f"{NOROBOTS}/solo", "norobots page"),
        (f"{BLOCKED}/never", "blocked page"),
    ]
    pages.append(_page(rng, A, "Example A home", root_links, extra_paras=2))

    for i in range(10):
        links = [(f"/p{i}/s{j}", f"leaf s{j}") for j in range(4)]
        links.append((f"/p{(i + 1) % 10}", "next section"))
        pages.append(_page(rng, f"{A}/p{i}", f"Section {i} of A", links))
        for j in range(4):
            back = [("/", "home"), (f"/p{i}", "up")]
            pages.append(_page(rng, f"{A}/p{i}/s{j}", f"Leaf {i}.{j}", back))

    # absdepth chain: /chain/k links /chain/k+1; sift fires past absdepth 8
    for k in range(1, 13):
        pages.append(_page(rng, f"{A}/chain/{k}", f"Chain {k}", [(f"/chain/{k + 1}", "deeper")]))

    # near-dup family (engineered on the full page word bag:
    # title "near page" + anchor "home" tokens ride along on every member)
    extras = word_count(tokenize("near page home"))
    bags = _near_dup_family(rng, 5, extras)
    near_links = [(f"/near/{i}", f"near {i}") for i in range(len(bags) - 1)] + [
        ("/near/ctrl", "near control")
    ]
    pages.append(_page(rng, f"{A}/dup-root", "Dup root", near_links))
    for i, bag in enumerate(bags[:-1]):
        pages.append(_wordbag_page(f"{A}/near/{i}", "near page", bag, [("/", "home")]))
    pages.append(_wordbag_page(f"{A}/near/ctrl", "near page", bags[-1], [("/", "home")]))

    # exact-dup family: byte-identical html at 3 urls + one control
    # (same fragments + relative hrefs -> identical bytes at different urls)
    proto = _page(rng, f"{A}/exact/0", "Exact family", [("/p0", "home p0")], extra_paras=1)
    pages.append(proto)
    for name in ("1", "2"):
        pages.append(Page(url=f"{A}/exact/{name}", fragments=list(proto.fragments),
                          hrefs=list(proto.hrefs), anchors=list(proto.anchors)))
    ctrl = _page(rng, f"{A}/exact/ctrl", "Exact control", [("/p0", "home p0")])
    pages.append(ctrl)

    # low-info rows
    pages.append(Page(url=f"{A}/lowinfo/tiny", raw_html=b"<html><body><p>tiny</p></body></html>",
                      fragments=["tiny"]))
    huge = b"<html><body><p>huge</p>" + b"<!-- pad -->" * 90000 + b"</body></html>"
    pages.append(Page(url=f"{A}/lowinfo/huge", raw_html=huge, fragments=["huge"]))
    sparse = b"<html><body><p>few words here</p><!--" + b"x" * 300 + b"--></body></html>"
    pages.append(Page(url=f"{A}/lowinfo/sparse", raw_html=sparse, fragments=["few words here"]))

    # redirects: 1 -> 2 -> p1 (seen), 3 -> target (new)
    pages.append(Page(url=f"{A}/redir/1", status=301, redirect_to=f"{A}/redir/2",
                      raw_html=b"", fragments=[]))
    pages.append(Page(url=f"{A}/redir/2", status=302, redirect_to=f"{A}/p1",
                      raw_html=b"", fragments=[]))
    pages.append(Page(url=f"{A}/redir/3", status=308, redirect_to=f"{A}/redir/target",
                      raw_html=b"", fragments=[]))
    pages.append(_page(rng, f"{A}/redir/target", "Redirect target", [("/", "home")]))

    # retry + cache error
    pages.append(_page(rng, f"{A}/retry/1", "Retry page", [("/", "home")], retry_after=2))
    pages.append(Page(url=f"{A}/cache/err", status=600, raw_html=b"", fragments=[]))

    # ---- deep ladders ------------------------------------------------------
    lad = "/lad"
    for d in range(6):
        nxt = lad + "/" + "abcdef"[d]
        pages.append(_page(rng, f"{DEEP}{lad}", f"Ladder {d}", [(f"{DEEP}{nxt}", "down")]))
        lad = nxt
    pages.append(_page(rng, f"{DEEP}{lad}", "Ladder end", [("/", "deep home")]))
    mono = "/mono"
    for d in range(5):
        nxt = mono + f"/x{d}/y{d}"
        pages.append(_page(rng, f"{DEEP}{mono}", f"Mono {d}", [(f"{DEEP}{nxt}", "skip down")]))
        mono = nxt
    pages.append(_page(rng, f"{DEEP}{mono}", "Mono end", []))
    pages.append(_page(rng, f"{DEEP}/private/page", "Private", [("/", "home")]))

    # ---- site B: query-family traps + sitemap ------------------------------
    b_links = [("/list?page=1", "list start")] + [(f"/b{i}", f"b page {i}") for i in range(6)]
    # web-scale artifacts (round-4 extension; pages appended at the END of
    # build_corpus so the rng draw sequence for every pre-existing page is
    # untouched): a mirror host serving byte-identical copies, tracking-
    # param URL aliases, and a soft-404 family (200-status error template)
    b_links += [
        (f"{MIRROR}/", "mirror of example b"),
        ("/b2?utm_source=feed&utm_medium=rss", "b2 via feed"),
        ("/b2?utm_source=newsletter", "b2 via newsletter"),
        ("/b3?fbclid=share123abc", "b3 shared link"),
        ("/b4?gclid=ad456&utm_campaign=q1", "b4 via ad"),
        ("/gone/catalog", "old catalog"),
    ]
    pages.append(_page(rng, B, "Example B home", b_links, extra_paras=2))
    for i in range(6):
        pages.append(_page(rng, f"{B}/b{i}", f"B page {i}", [("/", "home")]))
    for p in range(1, 7):
        pages.append(_page(rng, f"{B}/list?page={p}", f"List page {p}",
                           [(f"/list?page={p + 1}", "next page")]))
    # sitemap-only pages (reached exclusively via the sitemap protocol)
    smap_urls = [f"{B}/sm/{i}" for i in range(6)]
    for u in smap_urls:
        pages.append(_page(rng, u, f"Sitemap page {u[-1]}", [("/", "home")]))
    idx = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(f"<sitemap><loc>{B}/sitemap-{k}.xml</loc></sitemap>" for k in (1, 2))
        + "</sitemapindex>"
    ).encode()
    pages.append(Page(url=f"{B}/sitemap-index.xml", raw_html=idx, fragments=[],
                      content_type="application/xml"))
    for k in (1, 2):
        us = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(f"<url><loc>{u}</loc></url>" for u in smap_urls[(k - 1) * 3 : k * 3])
            + "</urlset>"
        ).encode()
        pages.append(Page(url=f"{B}/sitemap-{k}.xml", raw_html=us, fragments=[],
                          content_type="text/xml"))

    # ---- mega host (skew) --------------------------------------------------
    n_items = 120 * scale
    hub_links = [(f"/item/{i}", f"item {i}") for i in range(0, n_items, 1)]
    pages.append(_page(rng, f"{MEGA}/hub", "Mega hub", hub_links[:200], extra_paras=1))
    for i in range(n_items):
        links = [("/hub", "hub")]
        if i + 1 < n_items:
            links.append((f"/item/{i + 1}", "next item"))
        pages.append(_page(rng, f"{MEGA}/item/{i}", f"Item {i}", links))
    # items beyond the hub's 200 direct links are reached via the i->i+1 chain;
    # absdepth sift (>8) will bound that chain — intended trap behavior.

    # ---- stragglers ---------------------------------------------------------
    pages.append(_page(rng, f"{NOROBOTS}/solo", "No robots solo", [("/", "home")]))
    pages.append(_page(rng, f"{BLOCKED}/never", "Should never fetch", []))
    pages.append(_page(rng, f"{OFF}/page", "Off whitelist", []))

    # ---- web-scale artifacts (mirror / aliases / soft-404) ------------------
    # Appended after every pre-existing page so the rng draw sequence above
    # is byte-stable; copies reuse the already-built fragment lists.
    by_url = {p.url: p for p in pages}

    # mirror host: its own hub (distinct content, so its links ARE scraped)
    # pointing at byte-identical copies of B's /b{i} pages. The engine marks
    # each copy TOO_EXACT against the master fetched from B — the cross-
    # domain exhash overlap is the mirror-detection signal.
    mirror_links = [(f"/b{i}", f"mirror b{i}") for i in range(6)]
    pages.append(_page(rng, MIRROR, "Mirror of Example B", mirror_links))
    for i in range(6):
        src = by_url[f"{B}/b{i}"]
        pages.append(
            Page(url=f"{MIRROR}/b{i}", fragments=list(src.fragments),
                 hrefs=list(src.hrefs), anchors=list(src.anchors))
        )

    # tracking-param aliases: same path + marketing query params, byte-
    # identical body (servers ignore the params). Exact dedup catches them;
    # the alias-canonicalization query mines them from frontier state.
    for alias_path, base_path in [
        ("/b2?utm_source=feed&utm_medium=rss", "/b2"),
        ("/b2?utm_source=newsletter", "/b2"),
        ("/b3?fbclid=share123abc", "/b3"),
        ("/b4?gclid=ad456&utm_campaign=q1", "/b4"),
    ]:
        src = by_url[f"{B}{base_path}"]
        pages.append(
            Page(url=f"{B}{alias_path}", fragments=list(src.fragments),
                 hrefs=list(src.hrefs), anchors=list(src.anchors))
        )

    # soft-404 family: HTTP 200 pages sharing a "page not found" template,
    # differing only in an error-reference token engineered (like the /near
    # family) to stay within simhash hamming<=4 of the family head — the
    # engine elects one master and marks the rest TOO_SIMILAR, and every row
    # keeps its word bag for the boilerplate-share detector. One legit page
    # under the same /gone/ prefix is the detector's negative control.
    gone_links = [(f"/gone/item-{i}", f"catalog item {i}") for i in range(5)]
    gone_links.append(("/gone/legit", "archived page"))
    pages.append(_page(rng, f"{B}/gone/catalog", "Old catalog", gone_links))

    def _soft404(url: str, ref_token: str) -> Page:
        body = (
            "sorry the page you requested could not be found the item may "
            "have been moved or deleted from the catalog please check the "
            "address for errors and try the search again or return to the "
            f"catalog home page error reference {ref_token}"
        )
        return Page(url=url, fragments=["Page not found", body, "home"],
                    hrefs=["/"], anchors=["home"])

    def _soft404_hash(ref_token: str) -> int:
        probe = _soft404("probe", ref_token)
        return simhash32(word_count(tokenize(probe.text())))

    h0 = _soft404_hash("err0")
    ref_tokens = ["err0"]
    salt = 0
    while len(ref_tokens) < 5:
        salt += 1
        cand = f"err{salt}"
        if 0 < hamming32(_soft404_hash(cand), h0) <= 4:
            ref_tokens.append(cand)
        if salt > 2000:
            raise AssertionError("soft-404 family search did not converge")
    for i, tok in enumerate(ref_tokens):
        pages.append(_soft404(f"{B}/gone/item-{i}", tok))
    pages.append(_page(rng, f"{B}/gone/legit", "Archived catalog page",
                       [("/", "home")]))

    robots_rows = [
        {"domain": A, "status": 200, "body": "User-agent: *\nDisallow: /secret\n"},
        {"domain": DEEP, "status": 200, "body": "User-agent: *\nDisallow: /private\n"},
        {"domain": B, "status": 200,
         "body": f"User-agent: *\nCrawl-delay: 2\nSitemap: {B}/sitemap-index.xml\n"},
        {"domain": MEGA, "status": 200, "body": "User-agent: *\nCrawl-delay: 1\n"},
        {"domain": BLOCKED, "status": 403, "body": ""},
        # NOROBOTS intentionally absent -> 404 -> allow all
    ]
    return pages, robots_rows, list(SEED_URLS)


def write_corpus(out_dir: str, scale: int = 1) -> dict[str, int]:
    pages, robots_rows, seeds = build_corpus(scale)
    return write_tables(out_dir, pages, robots_rows, seeds)


def write_tables(
    out_dir: str, pages: list[Page], robots_rows: list[dict], seeds: list[str]
) -> dict[str, int]:
    """Write any (pages, robots, seeds) triple in the corpus parquet shape —
    shared by the fixed fixture corpus above and the randomized corpora of
    tools/soak_crawl.py."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    dedup: dict[str, Page] = {}
    for p in pages:
        assert p.url not in dedup, f"duplicate fixture url {p.url}"
        dedup[p.url] = p

    rows = {
        "url": [], "warc_ts": [], "html": [], "text": [], "lang": [],
        "status": [], "content_type": [], "redirect_to": [], "retry_after": [],
    }
    for i, p in enumerate(pages):
        rows["url"].append(p.url)
        rows["warc_ts"].append(EPOCH + timedelta(minutes=i))
        rows["html"].append(p.html())
        rows["text"].append(p.text())
        rows["lang"].append(p.lang)
        rows["status"].append(p.status)
        rows["content_type"].append(p.content_type)
        rows["redirect_to"].append(p.redirect_to)
        rows["retry_after"].append(p.retry_after)
    schema = pa.schema(
        [
            ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
            ("status", pa.int32()), ("content_type", pa.string()),
            ("redirect_to", pa.string()), ("retry_after", pa.int32()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), f"{out_dir}/pages.parquet")

    pq.write_table(
        pa.table(
            {
                "domain": [r["domain"] for r in robots_rows],
                "status": [r["status"] for r in robots_rows],
                "body": [r["body"] for r in robots_rows],
            },
            schema=pa.schema([("domain", pa.string()), ("status", pa.int32()), ("body", pa.string())]),
        ),
        f"{out_dir}/robots.parquet",
    )
    pq.write_table(
        pa.table(
            {"url": seeds, "seq": list(range(len(seeds)))},
            schema=pa.schema([("url", pa.string()), ("seq", pa.int32())]),
        ),
        f"{out_dir}/seeds.parquet",
    )
    return {"pages": len(pages), "robots": len(robots_rows), "seeds": len(seeds)}
