"""Domain-skew evidence for the salted two-phase politeness selection.

The north-rule scenario: a few mega-hosts dominate the frontier. The
engine's wave selection ranks within (domain, salt) first so a
mega-host's pending rows split across SALTS window tasks instead of
serializing into one; phase 2 ranks only the <= SALTS x budget
survivors. These tests prove (a) the selection is EXACTLY the unsalted
single-window selection on a violently skewed frontier, and (b) the
physical plan really partitions phase 1 by (domain, _salt)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spacetime_crawler4_spark.crawl.engine import CrawlConfig, CrawlEngine

SEEDS = ["http://a.example-a.test/"]


def _engine(spark, corpus_dir, wave_seconds=10.0):
    # the session-scoped corpus_dir fixture, not a pre-generated .fixtures
    # dir — these tests must pass in a fresh checkout with no setup step
    cfg = CrawlConfig(wave_seconds=wave_seconds, default_delay=0.5)
    eng = CrawlEngine(
        spark,
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        SEEDS,
        cfg,
    )
    eng.init_state()
    return eng


def _skewed_pending(spark, mega_rows=50_000, small_domains=5, small_rows=7):
    rows = [
        (f"h{m:06d}", f"http://mega.test/{m}", "mega.test", 1, f"{m:08d}")
        for m in range(mega_rows)
    ]
    for d in range(small_domains):
        rows += [
            (f"s{d}_{i}", f"http://d{d}.test/{i}", f"d{d}.test", 1, f"{i:08d}")
            for i in range(small_rows)
        ]
    return spark.createDataFrame(
        rows, "urlhash string, url string, domain string, gen int, seq string"
    )


def test_salted_selection_equals_unsalted_oracle_on_mega_host(spark, corpus_dir):
    eng = _engine(spark, corpus_dir, wave_seconds=10.0)  # budget = 10/0.5 = 20
    pending = _skewed_pending(spark)
    got = eng._select_wave(pending)

    budget = int(10.0 / 0.5)
    w = Window.partitionBy("domain").orderBy("gen", "seq")
    want = (
        pending.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= budget)
        .drop("_rn")
    )
    got_set = {(r.urlhash, r.domain) for r in got.collect()}
    want_set = {(r.urlhash, r.domain) for r in want.collect()}
    assert got_set == want_set
    # mega host capped at its budget; every small domain fully selected
    assert sum(1 for _, d in got_set if d == "mega.test") == budget
    for d in range(5):
        assert sum(1 for _, dd in got_set if dd == f"d{d}.test") == 7


def test_selection_plan_partitions_by_domain_and_salt(spark, corpus_dir):
    eng = _engine(spark, corpus_dir)
    plan = (
        eng._select_wave(_skewed_pending(spark, mega_rows=100))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase 1's exchange must key on (domain, _salt) — the mega-host
    # split; phase 2 keys on domain over the already-capped survivors.
    # Without the engine's explicit repartition, Catalyst satisfies both
    # stacked windows from ONE hashpartitioning(domain) exchange and the
    # mega-host serializes into a single task.
    import re

    assert re.search(r"hashpartitioning\(domain#\d+, _salt", plan), plan[:2000]
    assert re.search(r"hashpartitioning\(domain#\d+, \d+\)", plan)
