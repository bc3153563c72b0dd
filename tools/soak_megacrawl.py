#!/usr/bin/env python
"""Mega-crawl scaling soak: the FULL crawl engine at a ~10^6-URL frontier,
measured at two parallelism levels (N and 4N cores).

Why this exists (BASELINE.md "Full-crawl scaling decomposition"): the
bench's always-on scaling gate measures the wave KERNEL (the parallel
per-page work), because at the standard 24k/96k corpora the full crawl is
dominated by a constant ~15-20 s/wave serial floor (sketch build, robots
gate, election rounds, frontier checkpoint) and two-level efficiency reads
0.29-0.34 — an Amdahl artifact of tiny waves, argued (not measured) to
vanish at north-rule wave sizes. This tool measures it: at ~10^6 URLs the
waves are 10x-40x bigger while the per-wave floor stays constant, so the
full-engine efficiency should converge toward the kernel bound (>=0.8).
One run is ~25-40 min of machine time — a recorded one-off soak
(BASELINE.md), deliberately NOT part of the driver's per-round bench
budget (SPARK_GRAFT_BENCH_BUDGET_S=450).

Usage:
    python tools/soak_megacrawl.py [--pages 1000000] [--lo 4] [--hi 16]
                                   [--hi-only] [--corpus DIR]

Prints one JSON line: per-level wall/URLs-per-sec, scaling efficiency,
wave count, and host loadavg before each measurement.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench helpers: _crawl_once, _stop)

MEGA_CORPUS = os.environ.get("SPARK_GRAFT_MEGA_CORPUS", "/tmp/stc4_mega_corpus_v1")


def _mk_spark(cores: int):
    """Like bench._mk_spark but sized for 10^6-row waves: a bigger JVM heap
    (the per-wave localCheckpoint materializes the frontier; the 8g default
    OOMed at wave 2), and a FIXED shuffle-partition count at both levels —
    shuffle_partitions=cores (the kernel bench's choice) puts ~250k rows in
    every shuffle/window task at local[4], and on a real two-size cluster
    the partitioning would not change with executor count either. Same
    plan, same splits, different cores: the clean scaling comparison."""
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from spacetime_crawler4_spark.session import get_spark

    spark = get_spark(
        f"megacrawl-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_MEGA_SHUFFLE", "64")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.autoBroadcastJoinThreshold": "32MB",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    spark.sparkContext.setLogLevel("FATAL")
    return spark


def _shape_for(target_pages: int) -> dict:
    """Corpus shape: per domain 1 + fanout*(1+leaves) pages. Fix
    n_domains=16 / fanout=50 (wave-2 = 800 section pages, plenty of
    politeness-window keys) and solve leaves for the page target, so the
    frontier mass lands in wave 3 — one genuinely mega wave."""
    n_domains, fanout = 16, 50
    leaves = max(1, round((target_pages / n_domains - 1) / fanout) - 1)
    return {"n_domains": n_domains, "fanout": fanout, "leaves": leaves}


def _ensure_corpus(target_pages: int) -> dict:
    from spacetime_crawler4_spark.sources.benchgen import write_bench_corpus

    shape = _shape_for(target_pages)
    meta_path = os.path.join(MEGA_CORPUS, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("shape") == shape:
            return meta
    t0 = time.time()
    stats = write_bench_corpus(MEGA_CORPUS, **shape)
    meta = {"shape": shape, "gen_s": round(time.time() - t0, 1), **stats}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def _loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--lo", type=int, default=bench.LO)
    ap.add_argument("--hi", type=int, default=bench.HI)
    ap.add_argument(
        "--hi-only",
        action="store_true",
        help="throughput-only run at --hi cores (skip the scaling pair)",
    )
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()
    if args.corpus:
        global MEGA_CORPUS
        MEGA_CORPUS = args.corpus

    out: dict = {"corpus": _ensure_corpus(args.pages)}
    levels = [args.hi] if args.hi_only else [args.lo, args.hi]
    walls: dict[int, float] = {}
    for cores in levels:
        out[f"local[{cores}]_loadavg_1m"] = _loadavg()
        spark = _mk_spark(cores)
        try:
            # production dedup plane: the reference-parity 32-bit simhash is
            # refused by the engine's quadratic guard at mega waves (927k
            # rows >> simhash32_banded_max — exactly the cliff the guard
            # exists for), and a 10^6-URL deployment runs the 64-bit
            # fingerprint (same LSH plan shape, linear candidate volume).
            # The wave here also exceeds simhash_numpy_cap, so this
            # exercises the fully-distributed banded self-join + election.
            stats, eng = bench._crawl_once(spark, MEGA_CORPUS, {"simhash_bits": 64})
        finally:
            bench._stop(spark)
        stats.pop("too_similar", None)
        stats["waves"] = eng.wave_no
        stats["seen_sketch"] = dict(eng.sketch_stats)
        stats["wave_walls"] = [
            {
                k: m[k]
                for k in ("n_wave", "wall_select_s", "wall_run_s", "wall_post_s")
                if k in m
            }
            for m in eng.metrics
        ]
        out[f"local[{cores}]"] = stats
        walls[cores] = stats["wall_s"]
    if not args.hi_only:
        out["cores_ratio"] = args.hi / args.lo
        out["efficiency"] = round(
            (walls[args.lo] / walls[args.hi]) / (args.hi / args.lo), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
