"""Report parity (SURVEY.md §5.5): the six report aggregates computed by
crawl/report.py over the engine's final frontier must equal the same
aggregates computed in plain Python from the sequential oracle's state
(mirroring reference report/report.py:21-98)."""

from collections import Counter

import pytest

from spacetime_crawler4_spark.crawl import report as R
from spacetime_crawler4_spark.crawl.engine import CrawlEngine
from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS, CrawlConfig
from spacetime_crawler4_spark.crawl.seqoracle import SeqCrawler
from spacetime_crawler4_spark.sources.fixture import FIXTURE_WHITELIST, SEED_URLS


@pytest.fixture(scope="module")
def crawled(engine_frontier, corpus_dir):
    _eng, frontier = engine_frontier
    ora = SeqCrawler(
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        SEED_URLS,
        CrawlConfig(whitelist=FIXTURE_WHITELIST),
        mode="fifo",
    )
    ora.run()
    return frontier, ora.state()


def test_top_words_parity(crawled):
    frontier, ostate = crawled
    got = [(r["word"], r["total"]) for r in R.top_words(frontier, 50).collect()]
    cnt = Counter()
    for n in ostate.values():
        for w, c in n["words"].items():
            if len(w) >= 3 and any(ch.isalpha() for ch in w):
                cnt[w] += c
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == exp


def test_longest_page_parity(crawled):
    # reference report.py:48-54 counts only is_valid_word words (len>=3,
    # has a letter, not manually filtered) when electing the longest page
    frontier, ostate = crawled

    def _valid_total(words):
        return sum(
            c
            for w, c in words.items()
            if len(w) >= 3 and any(ch.isalpha() for ch in w)
        )

    row = R.longest_page(frontier).collect()[0]
    exp_url, exp_total = min(
        ((n["url"], _valid_total(n["words"])) for n in ostate.values()),
        key=lambda t: (-t[1], t[0]),
    )
    assert (row["url"], row["total_words"]) == (exp_url, exp_total)


def test_subdomain_counts_parity(crawled):
    frontier, ostate = crawled
    got = [(r["hostname"], r["count"]) for r in R.subdomain_counts(frontier, ".example-a.test").collect()]
    cnt = Counter()
    for n in ostate.values():
        from urllib.parse import urlparse

        host = urlparse(n["url"]).netloc
        if host.endswith(".example-a.test"):
            cnt[host] += 1
    assert got == sorted(cnt.items())


def test_totals_and_tallies_parity(crawled):
    frontier, ostate = crawled
    t = R.totals(frontier).collect()[0]
    assert t["unique_urls"] == len(ostate)
    assert t["downloads"] == sum(1 for n in ostate.values() if n["status"] == STATUS.IS_DOWN)
    assert t["too_similar"] == sum(1 for n in ostate.values() if n["finish"] == FINISH.TOO_SIMILAR)
    assert t["too_exact"] == sum(1 for n in ostate.values() if n["finish"] == FINISH.TOO_EXACT)
    assert t["errors"] == sum(
        1
        for n in ostate.values()
        if n["finish"] in (FINISH.BAD, FINISH.NOT_ALLOWED, FINISH.CACHE_ERROR)
    )
    tallies = {
        (r["status"], r["finish"]): r["count"] for r in R.finish_tallies(frontier).collect()
    }
    exp = Counter((n["status"], n["finish"]) for n in ostate.values())
    assert tallies == dict(exp)


def test_depth_histogram_parity(crawled):
    # reference scripts/depthcnt.sh: per-value counts of the four depth
    # counters over the nap dump; both paths must agree counter-for-counter
    frontier, ostate = crawled
    got = {
        (r["kind"], r["depth"]): r["count"]
        for r in R.depth_histogram(frontier).collect()
    }
    exp = Counter()
    for n in ostate.values():
        for kind in ("absdepth", "reldepth", "monodepth", "dupdepth"):
            exp[(kind, n[kind])] += 1
    assert got == dict(exp)
    # and the max_depth cut mirrors depthcnt.sh's <max_count> argument
    cut = {
        (r["kind"], r["depth"]): r["count"]
        for r in R.depth_histogram(frontier, max_depth=1).collect()
    }
    assert cut == {k: v for k, v in exp.items() if k[1] <= 1}
