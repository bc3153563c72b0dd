#!/usr/bin/env python
"""Compute the committed crawl-order digest for the LARGE bench corpus.

Round 4 certified crawl-order parity (engine == sequential reference-
semantics oracle) on the 24k-URL bench corpus; the 95k-URL large corpus
only ever checked throughput. This tool runs the SeqCrawler (FIFO mode —
the reference's BFS-with-politeness discipline) over the deterministic
large corpus ONCE and prints the digest of its processing order plus
seen-set summary stats. The digest is committed in
tests/data/large_order_digest.json; tests/test_crawl_parity.py (slow
marker) re-runs the ENGINE on the same corpus and asserts its (gen, seq)
order hashes to the same value — large-scale order parity without paying
the sequential oracle's wall time per test run.

Usage: python tools/large_order_digest.py [--write]
"""

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIGEST_PATH = Path(__file__).resolve().parent.parent / "tests" / "data" / (
    "large_order_digest.json"
)
LARGE_CORPUS = "/tmp/stc4_large_corpus_v1"


def ensure_corpus() -> None:
    import os

    from spacetime_crawler4_spark.sources.benchgen import write_bench_corpus

    if not os.path.exists(f"{LARGE_CORPUS}/pages.parquet"):
        write_bench_corpus(LARGE_CORPUS, n_domains=8, fanout=25, leaves=480)


def order_digest(urls: list[str]) -> str:
    h = hashlib.sha256()
    for u in urls:
        h.update(u.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--write", action="store_true", help="write the digest file")
    ns = ap.parse_args()

    import pyarrow.parquet as pq

    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.crawl.seqoracle import SeqCrawler
    from spacetime_crawler4_spark.sources.benchgen import BENCH_WHITELIST

    ensure_corpus()
    seeds = [
        r["url"]
        for r in sorted(
            pq.read_table(f"{LARGE_CORPUS}/seeds.parquet").to_pylist(),
            key=lambda r: r["seq"],
        )
    ]
    t0 = time.time()
    ora = SeqCrawler(
        f"{LARGE_CORPUS}/pages.parquet",
        f"{LARGE_CORPUS}/robots.parquet",
        seeds,
        CrawlConfig(whitelist=BENCH_WHITELIST),
        mode="fifo",
    )
    ora.run()
    wall = time.time() - t0
    fifo_urls = [u for _, _, u in ora.visit_log]
    state = ora.state()
    out = {
        "corpus": LARGE_CORPUS,
        "n_seeds": len(seeds),
        "n_visited": len(fifo_urls),
        "n_state_rows": len(state),
        "order_sha256": order_digest(fifo_urls),
        "seen_urlhash_xor": f"{_xor_hashes(state):016x}",
        "oracle_wall_s": round(wall, 1),
    }
    print(json.dumps(out, indent=1))
    if ns.write:
        DIGEST_PATH.parent.mkdir(parents=True, exist_ok=True)
        rec = {k: v for k, v in out.items() if k != "oracle_wall_s"}
        DIGEST_PATH.write_text(json.dumps(rec, indent=1) + "\n")
        print(f"wrote {DIGEST_PATH}")
    return 0


def _xor_hashes(state: dict) -> int:
    """Order-insensitive 64-bit fold of the final URL-seen set
    (keys are sha256-hex urlhashes)."""
    acc = 0
    for h in state:
        acc ^= int(h[:16], 16)
    return acc


if __name__ == "__main__":
    raise SystemExit(main())
