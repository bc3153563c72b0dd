"""The broadcast-bloom seen-set prefilter must not change crawl results:
engine with seen_bloom_fpp on == the plain-anti-join engine, row for row."""

from spacetime_crawler4_spark.crawl.engine import CrawlEngine
from spacetime_crawler4_spark.crawl.schema import CrawlConfig
from spacetime_crawler4_spark.sources.fixture import FIXTURE_WHITELIST, SEED_URLS


def test_bloom_prefilter_is_transparent(spark, corpus_dir, engine_frontier):
    eng = CrawlEngine(
        spark,
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        SEED_URLS,
        CrawlConfig(whitelist=FIXTURE_WHITELIST, seen_bloom_fpp=0.03),
    )
    bloom_state = {r["urlhash"]: r.asDict() for r in eng.run().collect()}
    _e, frontier = engine_frontier
    plain_state = {r["urlhash"]: r.asDict() for r in frontier.collect()}
    assert bloom_state.keys() == plain_state.keys()
    for h in plain_state:
        b, p = dict(bloom_state[h]), dict(plain_state[h])
        b["words"], p["words"] = dict(b["words"] or {}), dict(p["words"] or {})
        assert b == p, p["url"]
