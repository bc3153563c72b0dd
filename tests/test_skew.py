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


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """Runtime AQE skew-join evidence (the north rule names AQE skew
    handling alongside salting): a violently skewed join key must make
    AQE split the hot partition — the executed SortMergeJoin carries
    the ``skew=true`` marker — instead of serializing the mega-key into
    one straggler task. This is the safety net UNDER the engine's
    explicit salting: even an unsalted hot key cannot pin a task."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # non-foldable fat payload: Catalyst would constant-fold (and
        # prune) a literal pad, leaving the hot partition under the skew
        # threshold — sha2(id) varies per row and survives into the join
        pad = F.concat(
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 4),
        )
        # 60k rows, ~90% on domain 0 — one mega-host frontier partition
        left = spark.range(60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("domain_id"),
            pad.alias("payload"),
        )
        right = spark.range(97).select(
            F.col("id").alias("domain_id"), F.lit(0.5).alias("delay")
        )
        # keep the fat column alive through the join (column pruning would
        # otherwise shrink the hot partition below the skew threshold) and
        # finish with a GLOBAL aggregate — a same-key groupBy downstream
        # would legitimately block the split (it needs co-partitioning)
        joined = left.join(right, "domain_id").agg(
            F.sum(F.length("payload") * F.col("delay")).alias("mass")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
