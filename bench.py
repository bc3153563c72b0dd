"""Benchmark harness — prints ONE JSON line.

Three sections:
1. headline analytics queries (queries.py registry subset) at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
   local[$SPARK_GRAFT_CPUS]
2. crawl-engine throughput over the deterministic bench corpus
   (sources/benchgen.py, cached under /tmp) — frontier URLs processed/sec
3. scaling-efficiency evidence for the north rule: the SAME job (the
   crawl's per-wave inner computation: fetch-join + parse + tokenize +
   simhash + LSH self-join + aggregate) over the SAME input, run at
   local[N_LO] and local[N_HI]; efficiency = (thr_hi/thr_lo)/(hi/lo).
   (A real multi-executor cluster is unavailable in this sandbox; two
   parallelism levels on identical input is the sanctioned stand-in.)

Output: {"metric": "...", "value": <total_sec>, "unit": "sec",
         "queries": {...}, "sf": ..., "crawl": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
LO = max(2, CPUS // 4)
BENCH_CORPUS = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/stc4_bench_corpus_v1")

HEADLINE = [
    "report_top50_words",
    "crawl_top50_parity_tokens",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "text_quality",
    "ann_bruteforce",
    "ann_ivf",
    "events_sessionize",
    "tpch_pricing",
    "tpch_top_customers",
]


def _mk_spark(cores: int):
    from spacetime_crawler4_spark.session import get_spark

    spark = get_spark(
        f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "32MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _ensure_corpus() -> None:
    from spacetime_crawler4_spark.sources.benchgen import write_bench_corpus

    marker = os.path.join(BENCH_CORPUS, "pages.parquet")
    if not os.path.exists(marker):
        write_bench_corpus(BENCH_CORPUS)


def _kernel_job(spark) -> int:
    """The crawl wave's inner computation as one job over the bench corpus:
    pages scan -> exhash -> parse UDF -> tokenize UDF -> simhash UDF ->
    banded LSH self-join -> near-pair count + token aggregate."""
    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.operators.dedup import simhash_near_pairs
    from spacetime_crawler4_spark.operators.textplane import with_text_plane

    pages = spark.read.parquet(f"{BENCH_CORPUS}/pages.parquet")
    planed = with_text_plane(pages).select(
        "url", "exhash", F.col("tok.n_total").alias("n_total"), "smhash"
    )
    planed = planed.persist()
    try:
        sim = planed.select(F.col("url").alias("id"), "smhash")
        n_pairs = simhash_near_pairs(sim, threshold=5).count()
        n_rows = planed.agg(F.sum("n_total")).collect()[0][0]
    finally:
        planed.unpersist()
    return int(n_rows) + n_pairs


def run_queries(spark) -> dict[str, float]:
    from spacetime_crawler4_spark.queries import registry

    reg = registry()
    out = {}
    for name in HEADLINE:
        fn, _ = reg[name]
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def run_crawl(spark) -> dict:
    import pyarrow.parquet as pq

    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.sources.benchgen import BENCH_WHITELIST

    seeds = [
        r["url"]
        for r in sorted(
            pq.read_table(f"{BENCH_CORPUS}/seeds.parquet").to_pylist(),
            key=lambda r: r["seq"],
        )
    ]
    eng = CrawlEngine(
        spark,
        f"{BENCH_CORPUS}/pages.parquet",
        f"{BENCH_CORPUS}/robots.parquet",
        seeds,
        CrawlConfig(whitelist=BENCH_WHITELIST),
    )
    t0 = time.time()
    frontier = eng.run()
    n = frontier.count()
    wall = time.time() - t0
    return {
        "frontier_urls": n,
        "waves": eng.wave_no,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n / wall, 1),
    }


def run_scaling() -> dict:
    out = {}
    for cores in (LO, CPUS):
        spark = _mk_spark(cores)
        try:
            _kernel_job(spark)  # warm (JIT, file listing, UDF workers)
            t0 = time.time()
            _kernel_job(spark)
            wall = time.time() - t0
        finally:
            spark.stop()
        out[f"local[{cores}]"] = round(wall, 2)
    thr_lo = 1.0 / out[f"local[{LO}]"]
    thr_hi = 1.0 / out[f"local[{CPUS}]"]
    out["speedup"] = round(thr_hi / thr_lo, 2)
    out["cores_ratio"] = CPUS / LO
    out["efficiency"] = round((thr_hi / thr_lo) / (CPUS / LO), 3)
    return out


def main() -> None:
    total0 = time.time()
    _ensure_corpus()

    spark = _mk_spark(CPUS)
    try:
        queries = run_queries(spark)
        crawl = run_crawl(spark)
    finally:
        spark.stop()

    scaling = run_scaling()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = SF_DIR
    result = {
        "metric": "frontier_urls_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
