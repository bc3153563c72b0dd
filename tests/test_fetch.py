"""Live-fetch stage (crawl/fetch.py): the engine driven through the
mapInPandas HTTP fetcher with a corpus-backed mock transport must produce
the exact same crawl — every finish code, every row — as the corpus
equi-join engine (reference crawler2/download.py:22-40 surface)."""

import pytest

from spacetime_crawler4_spark.crawl.engine import CrawlEngine
from spacetime_crawler4_spark.crawl.fetch import corpus_transport, make_http_fetcher
from spacetime_crawler4_spark.crawl.schema import CrawlConfig
from spacetime_crawler4_spark.sources.fixture import FIXTURE_WHITELIST, SEED_URLS


@pytest.mark.slow
def test_http_fetcher_matches_corpus_join(spark, corpus_dir, engine_frontier):
    fetcher = make_http_fetcher(corpus_transport(f"{corpus_dir}/pages.parquet"))
    eng = CrawlEngine(
        spark,
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        SEED_URLS,
        CrawlConfig(whitelist=FIXTURE_WHITELIST),
        fetcher=fetcher,
    )
    http_state = {r["urlhash"]: r.asDict() for r in eng.run().collect()}
    _e, frontier = engine_frontier
    join_state = {r["urlhash"]: r.asDict() for r in frontier.collect()}
    assert http_state.keys() == join_state.keys()
    for h in join_state:
        a, b = dict(http_state[h]), dict(join_state[h])
        a["words"], b["words"] = dict(a["words"] or {}), dict(b["words"] or {})
        assert a == b, b["url"]
