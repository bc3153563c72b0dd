"""Deterministic throughput-bench corpus: a wide, trap-free web.

Unlike the correctness fixture (sources/fixture.py — small, dense with
edge cases), this corpus exists to measure frontier throughput: D domains
× (root → F sections → F·G leaves), every page reachable in ≤2 hops, all
pages distinct (no dup families), ~W words each. The crawl over it is
3 content waves whose cost is dominated by the parallel per-page work
(fetch join, parse, tokenize, simhash) — the right regime for measuring
scaling efficiency across parallelism levels.

Seeded (seed=7); no wall clock, no network.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 7
EPOCH = datetime(2024, 6, 1)
_VOCAB = [f"w{i:04d}" for i in range(5000)]

BENCH_WHITELIST = (".example-a.test",)


def bench_params(n_domains: int = 8, fanout: int = 25, leaves: int = 120) -> dict:
    return {
        "n_domains": n_domains,
        "fanout": fanout,
        "leaves": leaves,
        "pages": n_domains * (1 + fanout + fanout * leaves),
    }


def write_bench_corpus(
    out_dir: str,
    n_domains: int = 8,
    fanout: int = 25,
    leaves: int = 120,
    words_per_page: int = 150,
    dup_frac: float = 0.0,
) -> dict:
    """``dup_frac`` > 0 makes the corpus DENSE in near-duplicates: within
    each section, that fraction of leaves reuses leaf 0's body with 1-2
    word substitutions — a family of pages within a few simhash bits of
    each other, so the within-wave LSH self-join and the dup-master
    election have real work (the default corpus is all-distinct)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(SEED)
    urls, htmls, texts = [], [], []

    def page(url: str, links: list[str], nwords: int, body: list[str] | None = None) -> list[str]:
        raw_words = list(body) if body is not None else rng.choices(_VOCAB, k=nwords)
        body_words = raw_words + raw_words[:4]  # keep max word count >= 2
        text = " ".join(body_words)
        anchors = "".join(f'<a href="{l}">x{i}</a>' for i, l in enumerate(links))
        html = f"<html><head><title>{text.split()[0]}</title></head><body><p>{text}</p>{anchors}</body></html>"
        urls.append(url)
        htmls.append(html.encode())
        # canonical extracted text: title fragment, body fragment, anchors
        frags = [text.split()[0], text] + [f"x{i}" for i in range(len(links))]
        texts.append("\n".join(frags))
        return raw_words

    domains = [f"http://bench{i}.example-a.test" for i in range(n_domains)]
    for d in domains:
        page(d, [f"/s{j}" for j in range(fanout)], words_per_page)
        for j in range(fanout):
            page(
                f"{d}/s{j}",
                [f"/s{j}/l{k}" for k in range(leaves)],
                words_per_page,
            )
            n_dup = int(leaves * dup_frac)
            template: list[str] | None = None
            for k in range(leaves):
                body = None
                if template is not None and 1 <= k <= n_dup:
                    # family member: 1-2 substitutions, never position 0
                    # (the title fragment) so only a few simhash bits move
                    body = list(template)
                    for _ in range(1 + k % 2):
                        body[rng.randrange(1, len(body))] = rng.choice(_VOCAB)
                written = page(f"{d}/s{j}/l{k}", ["/"], words_per_page, body=body)
                if k == 0 and n_dup:
                    template = written

    n = len(urls)
    tbl = pa.table(
        {
            "url": urls,
            "warc_ts": [EPOCH + timedelta(seconds=i) for i in range(n)],
            "html": htmls,
            "text": texts,
            "lang": ["en"] * n,
            "status": pa.array([200] * n, pa.int32()),
            "content_type": ["text/html"] * n,
            "redirect_to": pa.array([None] * n, pa.string()),
            "retry_after": pa.array([0] * n, pa.int32()),
        }
    )
    # small row groups keep the file scan-splittable (a single row group
    # would force the whole corpus through one task)
    pq.write_table(tbl, f"{out_dir}/pages.parquet", row_group_size=2048)
    pq.write_table(
        pa.table(
            {
                "domain": pa.array([], pa.string()),
                "status": pa.array([], pa.int32()),
                "body": pa.array([], pa.string()),
            }
        ),
        f"{out_dir}/robots.parquet",
    )
    pq.write_table(
        pa.table(
            {"url": domains, "seq": pa.array(range(len(domains)), pa.int32())}
        ),
        f"{out_dir}/seeds.parquet",
    )
    return {"pages": n, "seeds": len(domains)}
