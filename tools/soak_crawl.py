#!/usr/bin/env python
"""Crawl-parity soak: the Spark wave engine vs the sequential
reference-semantics oracle (crawl/seqoracle.py) on RANDOMIZED corpora —
the north rule's core invariant (same seeds + politeness budget ⇒ same
crawl ordering and same final URL-seen row state) checked beyond the
fixed fixture corpus.

Each seed builds a random web corpus exercising every engine branch:
random link topologies (trees + cross/back/self links), depth-10+ chains
(absdepth sift), query-string ladders (dupdepth), invalid schemes and
blacklisted extensions, offsite + non-whitelisted domains, robots
(allow/disallow/404/403/crawl-delay), redirects (incl. chains and
redirect-to-seen), HTTP 4xx/5xx with retries, empty/oversized bodies,
low-info pages, exact-dup families (identical bytes), near-dup families
(small token edits), sitemap XML + sitemap pointers, dangling links to
URLs absent from the corpus (cache-error path), and adversarial HTML
payloads from the extractor-soak grammar flowing through the full
pipeline (word maps, simhash, link expansion).

Usage: python tools/soak_crawl.py [seeds...]   (default: 3 seeds)
Prints one JSON line per seed + a summary; non-zero exit on the first
row-state divergence.
"""

import json
import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from spacetime_crawler4_spark.sources.fixture import Page, write_tables  # noqa: E402

WL_A = ".rnd-a.test"
WL_B = ".rnd-b.test"
WHITELIST = (WL_A, WL_B)

_WORDS = [f"tok{i:04d}" for i in range(4000)] + ["frontier", "crawl", "spark"]


def _para(rng: random.Random, n: int = 20, topic: int = 0) -> str:
    # topic-sliced vocabulary: pages draw from distinct 400-word slices so
    # 32-bit simhash fingerprints genuinely diverge (a shared tiny vocab
    # collapses the whole corpus into one near-dup family)
    lo = (topic * 397) % 3600
    ws = [_WORDS[lo + rng.randint(0, 399)] for _ in range(n)]
    return " ".join(ws + ws[:3])  # max word count >= 2 (low-info gate)


def build_random_corpus(seed: int, with_retries: bool = True):
    rng = random.Random(seed)
    n_dom = rng.randint(3, 5)
    domains = []
    for i in range(n_dom):
        suffix = WL_A if i % 2 == 0 else WL_B
        domains.append(f"http://h{i}{suffix}")
    offsite = "http://off.other.test"

    from spacetime_crawler4_spark.functions.urls import normalize_url

    pages: list[Page] = []
    urls: list[str] = []

    def add(p: Page) -> str:
        # corpus rows are keyed by the NORMALIZED url (the form the
        # frontier's fetch join probes with)
        p.url = normalize_url(p.url)
        if p.url in set(urls):
            return p.url
        pages.append(p)
        urls.append(p.url)
        return p.url

    # per-domain random trees with assorted hazards
    for d, dom in enumerate(domains):
        n_pages = rng.randint(15, 45)
        dom_urls = [f"{dom}/"]
        for i in range(n_pages):
            parent = rng.choice(dom_urls)
            base = parent.rstrip("/")
            kind = rng.random()
            if kind < 0.12:
                u = f"{base}/q{i}?page={rng.randint(1, 12)}"  # query ladder
            elif kind < 0.2:
                u = f"{dom}/deep/" + "/".join(f"d{j}" for j in range(rng.randint(6, 14))) + f"/p{i}.html"
            else:
                u = f"{base}/c{i}.html"
            dom_urls.append(u)
        for i, u in enumerate(dom_urls):
            hrefs = []
            # children + random cross/back/self/hazard links
            for v in rng.sample(dom_urls, min(len(dom_urls), rng.randint(2, 7))):
                hrefs.append(v)
            if rng.random() < 0.5:
                hrefs.append(rng.choice(domains) + "/")  # cross-domain
            if rng.random() < 0.3:
                hrefs.append(offsite + f"/x{i}")  # not whitelisted
            if rng.random() < 0.3:
                hrefs.append("mailto:a@b.test")  # invalid scheme
            if rng.random() < 0.3:
                hrefs.append(f"{u}#frag")  # self via fragment
            if rng.random() < 0.25:
                hrefs.append(f"{dom}/doc{i}.pdf")  # blacklisted extension
            if rng.random() < 0.25:
                hrefs.append(f"{dom}/missing/m{i}.html")  # dangling (cache error)
            if rng.random() < 0.2:
                hrefs.append("  " + rng.choice(dom_urls))  # messy href
            status, redirect_to, retry_after = 200, None, 0
            r = rng.random()
            if i > 0:
                if r < 0.06:
                    status = 404
                elif r < 0.10:
                    status = 403
                elif r < 0.16:
                    # consume the draws either way so with_retries=False
                    # keeps the identical topology (only statuses differ)
                    s5, ra = rng.choice([500, 503]), rng.randint(0, 2)
                    if with_retries:
                        status, retry_after = s5, ra
                elif r < 0.24:
                    status = rng.choice([301, 302])
                    redirect_to = rng.choice(dom_urls + [f"{dom}/redir-new{i}.html"])
            # Page.html() renders the LAST len(anchors) fragments as the
            # anchor texts — keep paragraphs ahead of them
            anchors = [f"anchor {j} link{j % 3}" for j in range(len(hrefs))]
            frags = (
                [f"title {d}-{i} unique{d}x{i}"]
                + [_para(rng, n=40, topic=d * 37 + i) for i2 in range(rng.randint(2, 5))]
                + anchors
            )
            add(
                Page(
                    url=u,
                    fragments=frags,
                    hrefs=hrefs,
                    anchors=anchors,
                    status=status,
                    redirect_to=redirect_to,
                    retry_after=retry_after,
                )
            )
        # hazards: low-info, empty, exact-dup family, near-dup family, sitemap
        add(Page(url=f"{dom}/lowinfo.html", fragments=["tiny"], hrefs=[]))
        add(Page(url=f"{dom}/empty.html", fragments=[], hrefs=[], raw_html=b""))
        dup_html = f"<html><body><p>{_para(rng, 40, topic=d + 50)}</p></body></html>".encode()
        for k in range(rng.randint(2, 4)):
            add(Page(url=f"{dom}/dup{k}.html", raw_html=dup_html))
        near_base = [_para(rng, 30, topic=d + 70) for _ in range(4)]
        for k in range(rng.randint(2, 3)):
            frags = list(near_base)
            frags[0] = near_base[0] + f" tweak{k}"
            add(Page(url=f"{dom}/near{k}.html", fragments=["near family"] + frags, hrefs=[]))
        if rng.random() < 0.6:
            locs = "".join(
                f"<url><loc>{v}</loc></url>" for v in rng.sample(dom_urls, min(5, len(dom_urls)))
            )
            add(
                Page(
                    url=f"{dom}/sitemap.xml",
                    raw_html=f'<?xml version="1.0"?><urlset>{locs}</urlset>'.encode(),
                    content_type="application/xml",
                )
            )
        # adversarial HTML payload through the full pipeline
        try:
            from soak_extractor import _rand_doc

            add(
                Page(
                    url=f"{dom}/adversarial.html",
                    raw_html=_rand_doc(rng).encode("utf-8", "surrogatepass"),
                )
            )
        except ImportError:
            pass

    # offsite page exists but must never be fetched (whitelist gate)
    add(Page(url=offsite + "/", fragments=["offsite", _para(rng)], hrefs=[]))

    robots_rows = []
    for i, dom in enumerate(domains):
        r = rng.random()
        if r < 0.25:
            body, status = "User-agent: *\nDisallow:\n", 200
        elif r < 0.5:
            body, status = f"User-agent: *\nDisallow: /c{rng.randint(1, 9)}\n", 200
        elif r < 0.65:
            body, status = "", 404
        elif r < 0.75:
            body, status = "", 403
        else:
            body, status = "User-agent: *\nCrawl-delay: 1\n", 200
        if rng.random() < 0.4:
            body += f"Sitemap: {dom}/sitemap.xml\n"
        robots_rows.append({"domain": dom, "status": status, "body": body})

    # seeds in normalized form: the engine stores the seed url verbatim and
    # probes the corpus with it, while discovered links arrive normalized —
    # the corpus is keyed by the normalized form throughout
    seeds = [normalize_url(domains[0] + "/")] + (
        [normalize_url(domains[1] + "/")]
        if rng.random() < 0.7 and len(domains) > 1
        else []
    )
    return pages, robots_rows, seeds


def run_seed(
    spark, seed: int, with_retries: bool, scheduling: dict | None = None
) -> dict:
    """One corpus, one engine run, one oracle run, full row-state compare.

    Oracle mode follows the scheduling contract (see seqoracle.py
    docstring, retry-order quirk): retry-free corpora must match the
    reference FIFO discipline exactly; corpora with 5xx retries must
    match the wave-mode oracle (the engine's next-wave retry loopback
    shifts WHEN a retried page's dedup decision happens, which can flip
    near-dup master elections relative to single-threaded in-slot
    retries — found by this soak, pinned in test_crawl_parity).

    ``scheduling`` (optional) = extra CrawlConfig knobs — randomized
    politeness budgets + a frontier priority policy; forces wave-mode
    oracle (budgeted selection is inherently wave-shaped)."""
    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.crawl.seqoracle import SeqCrawler

    pages, robots_rows, seeds = build_random_corpus(seed, with_retries)
    out = tempfile.mkdtemp(prefix=f"soakcrawl{seed}_")
    write_tables(out, pages, robots_rows, seeds)
    sched = scheduling or {}
    cfg = CrawlConfig(whitelist=WHITELIST, **sched)
    eng = CrawlEngine(
        spark, f"{out}/pages.parquet", f"{out}/robots.parquet", seeds, cfg
    )
    engine_state = {r["urlhash"]: r.asDict() for r in eng.run().collect()}
    ora = SeqCrawler(
        f"{out}/pages.parquet", f"{out}/robots.parquet", seeds,
        CrawlConfig(whitelist=WHITELIST, **sched),
        mode="fifo" if not (with_retries or sched) else "wave",
    )
    ora.run()
    oracle_state = ora.state()

    if engine_state.keys() != oracle_state.keys():
        return {
            "seed": seed, "ok": False,
            "engine_only": sorted(set(engine_state) - set(oracle_state))[:5],
            "oracle_only": sorted(set(oracle_state) - set(engine_state))[:5],
        }
    for h in sorted(engine_state):
        e, o = dict(engine_state[h]), dict(oracle_state[h])
        e["words"] = dict(e["words"] or {})
        e.pop("retries", None)
        o.pop("retries", None)
        if e != o:
            return {"seed": seed, "ok": False, "url": o["url"],
                    "engine": {k: v for k, v in e.items() if e[k] != o.get(k)},
                    "oracle": {k: o[k] for k in e if e[k] != o.get(k)}}
    return {"seed": seed, "retries": with_retries, "ok": True,
            "pages": len(pages), "frontier_rows": len(engine_state),
            **({"scheduling": {k: v for k, v in sched.items()}} if sched else {})}


def _rand_scheduling(seed: int) -> dict:
    """Randomized budgeted-scheduler knobs: priority policy + politeness
    budgets drawn per seed (the priority-queue parity surface)."""
    rng = random.Random(seed * 7919 + 13)
    sched: dict = {
        "frontier_policy": rng.choice(["fifo", "shallow", "deep"]),
        "wave_seconds": rng.choice([2.5, 5.0, 10.0]),
        "default_delay": 0.5,
        "max_waves": 256,  # tight budgets need more waves to drain
    }
    if rng.random() < 0.6:
        sched["global_budget"] = rng.randint(8, 25)
    return sched


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or [101, 202, 303]
    from spacetime_crawler4_spark.session import get_spark

    spark = get_spark("soak-crawl", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for s in seeds:
        for with_retries, sched in (
            (False, None),
            (True, None),
            (True, _rand_scheduling(s)),
        ):
            r = run_seed(spark, s, with_retries, sched)
            print(json.dumps(r))
            results.append(r)
            if not r["ok"]:
                return 1
    print(json.dumps({"seeds_checked": len(results),
                      "total_frontier_rows": sum(r["frontier_rows"] for r in results),
                      "divergences": 0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
