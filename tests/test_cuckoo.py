"""Cuckoo-filter upgrade path for the URL-seen set: no false negatives,
sane false-positive rate, deletion support (the capability bloom lacks),
distributed sharded build, and engine-level transparency (cuckoo crawl ==
plain anti-join crawl row-for-row)."""

import numpy as np
import pytest

from spacetime_crawler4_spark.functions.cuckoo import (
    CuckooFilter,
    build_cuckoo_partitioned,
    cuckoo_might_contain_udf,
)


def test_no_false_negatives_and_low_fp_rate():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    keys = np.unique(keys)
    cf = CuckooFilter.with_capacity(len(keys))
    cf.insert_many(keys)
    assert cf.might_contain(keys).all()  # no false negatives, ever
    probe = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    probe = np.setdiff1d(probe, keys)
    fp_rate = cf.might_contain(probe).mean()
    assert fp_rate < 0.01, fp_rate  # 16-bit fingerprints: ~0.07% expected


def test_delete_then_absent():
    keys = np.arange(1000, dtype=np.int64) * 7919 + 3
    cf = CuckooFilter.with_capacity(len(keys))
    cf.insert_many(keys)
    for k in keys[:100]:
        assert cf.delete(int(k))
    # remaining keys still present (no collateral false negatives)
    assert cf.might_contain(keys[100:]).all()
    # deleted keys are (almost certainly) gone; allow shard-level fp noise
    assert cf.might_contain(keys[:100]).mean() < 0.05


def test_serialization_roundtrip():
    keys = np.arange(500, dtype=np.int64) * 104729
    cf = CuckooFilter.with_capacity(len(keys))
    cf.insert_many(keys)
    back = CuckooFilter.from_bytes(cf.to_bytes())
    assert back.might_contain(keys).all()
    assert back.nbuckets == cf.nbuckets


def test_partitioned_build_and_udf_probe(spark):
    from pyspark.sql import functions as F

    df = spark.range(30_000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("k")
    )
    shards = build_cuckoo_partitioned(df, "k", expected=30_000, nparts=8)
    assert len(shards) == 8
    probe = cuckoo_might_contain_udf(shards)
    hits = df.select(probe(F.col("k")).alias("m")).agg(F.sum(F.col("m").cast("long"))).collect()[0][0]
    assert hits == 30_000  # every inserted key found through the UDF
    # disjoint probe set: low fp rate
    other = spark.range(30_000, 60_000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("k")
    )
    fps = other.select(probe(F.col("k")).alias("m")).agg(F.sum(F.col("m").cast("long"))).collect()[0][0]
    assert fps < 300


@pytest.mark.slow
@pytest.mark.usefixtures("spark")
def test_cuckoo_crawl_matches_plain(spark, tmp_path):
    from test_bloom_crawl import _TWIN_HOST, _write_twin_corpus

    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig

    out = str(tmp_path)
    _write_twin_corpus(out)

    def run(**kw):
        eng = CrawlEngine(
            spark,
            f"{out}/pages.parquet",
            f"{out}/robots.parquet",
            [f"http://{_TWIN_HOST}/"],
            CrawlConfig(whitelist=(".t.test",), **kw),
        )
        return {r["urlhash"]: r.asDict() for r in eng.run().collect()}

    cuckoo = run(seen_bloom_fpp=0.03, seen_filter="cuckoo")
    plain = run()
    assert cuckoo.keys() == plain.keys()
    for h in plain:
        a, b = dict(cuckoo[h]), dict(plain[h])
        a["words"], b["words"] = dict(a["words"] or {}), dict(b["words"] or {})
        assert a == b, b["url"]
