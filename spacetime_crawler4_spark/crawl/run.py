"""CLI: run a crawl end-to-end over a pages/robots/seeds parquet corpus.

    python -m spacetime_crawler4_spark.crawl.run \
        --pages .fixtures/pages.parquet --robots .fixtures/robots.parquet \
        --seeds .fixtures/seeds.parquet --state /tmp/crawlstate \
        --master 'local[8]' [--resume] [--wave-seconds 4.0] [--report]

Submission shape on a real cluster: spark-submit --py-files of this package
with --master yarn/k8s; the engine itself is master-agnostic.
"""

from __future__ import annotations

import argparse
import json
import time

import pyarrow.parquet as pq

from spacetime_crawler4_spark.crawl.engine import CrawlEngine
from spacetime_crawler4_spark.crawl.schema import CrawlConfig
from spacetime_crawler4_spark.session import get_spark


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--state", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--wave-seconds", type=float, default=None)
    ap.add_argument("--global-budget", type=int, default=None)
    ap.add_argument("--max-waves", type=int, default=64)
    ap.add_argument("--whitelist", default=".example-a.test,.example-b.test")
    ap.add_argument("--report", action="store_true")
    ap.add_argument(
        "--dump",
        default=None,
        metavar="N",
        type=int,
        help="print the first N frontier rows (reference print_nap.py analogue)",
    )
    ap.add_argument(
        "--at-wave",
        default=None,
        metavar="W",
        type=int,
        help="time-travel: report/dump the state as of snapshot wave W "
        "(Iceberg VERSION AS OF) instead of crawling — requires --state; "
        "only waves still in the retained base+delta chain are readable",
    )
    ap.add_argument(
        "--links-out",
        default=None,
        metavar="DIR",
        help="append the admitted pages' anchor-text edges (src_url, "
        "src_domain, pos, dst_url, dst_domain, anchor_text, wave) as "
        "parquet under DIR — the crawl-time anchor index "
        "(operators/linkgraph consumes this shape)",
    )
    ap.add_argument(
        "--policy",
        default="fifo",
        choices=["fifo", "shallow", "deep", "domain_rank"],
        help="frontier priority-queue policy under politeness budgets "
        "(CrawlConfig.frontier_policy): fifo = reference discovery order; "
        "shallow/deep = depth best-first; domain_rank = host-authority-"
        "first (needs --priority-table)",
    )
    ap.add_argument(
        "--priority-table",
        default=None,
        metavar="PARQUET",
        help="(domain, rank) parquet for --policy domain_rank — the "
        "crawl_state_host_rank / linkgraph host-PageRank output shape",
    )
    ap.add_argument(
        "--step",
        action="store_true",
        help="manual step mode (reference launchman.py / crawlerman): run "
        "exactly ONE wave against the snapshot store, print every row the "
        "wave touched, and exit — re-invoke with --step --resume to "
        "advance wave by wave",
    )
    args = ap.parse_args(argv)
    if args.step and not args.state:
        ap.error("--step requires --state (waves advance through the store)")

    seeds_tbl = pq.read_table(args.seeds).to_pylist()
    seeds = [r["url"] for r in sorted(seeds_tbl, key=lambda r: r["seq"])]
    whitelist = tuple(s for s in args.whitelist.split(",") if s) or None

    spark = get_spark("crawl", master=args.master)

    if args.at_wave is not None:
        if not args.state:
            ap.error("--at-wave requires --state")
        from spacetime_crawler4_spark.crawl.store import SnapshotStore

        store = SnapshotStore(args.state)
        try:
            wave, tables, metrics = store.load_at(spark, args.at_wave)
        except KeyError as e:
            retained = [(s["wave"], s["kind"]) for s in store.snapshots()]
            print(json.dumps({"error": str(e), "retained": retained}))
            return {"error": str(e)}
        frontier = tables["frontier"]
        out = {"wave": wave, "frontier_urls": frontier.count()}
        if args.report:
            from spacetime_crawler4_spark.crawl import report as R

            out["totals"] = R.totals(frontier).collect()[0].asDict()
            out["top_words"] = [
                (r["word"], r["total"])
                for r in R.top_words(frontier, 10).collect()
            ]
        if args.dump:
            frontier.orderBy("gen", "seq").drop("words").show(
                args.dump, truncate=60
            )
        print(json.dumps(out))
        return out

    cfg = CrawlConfig(
        whitelist=whitelist,
        wave_seconds=args.wave_seconds,
        global_budget=args.global_budget,
        max_waves=1 if args.step else args.max_waves,
        links_out=args.links_out,
        frontier_policy=args.policy,
        priority_table=args.priority_table,
    )
    eng = CrawlEngine(spark, args.pages, args.robots, seeds, cfg, state_dir=args.state)
    t0 = time.time()
    frontier = eng.run(resume=args.resume)
    if args.step and eng.last_wave is not None:
        # step-mode debugging dump (launchman.py semantics: one manual
        # step, inspect, repeat): the processed wave's rows with their NEW
        # state, in FIFO order, plus the wave counters
        touched = frontier.join(
            eng.last_wave.select("urlhash"), "urlhash", "left_semi"
        )
        touched.orderBy("gen", "seq").drop("words", "links").show(
            1000, truncate=50
        )
        print("wave counters:", json.dumps(eng.metrics[-1] if eng.metrics else {}))
    n = frontier.count()
    wall = time.time() - t0
    out = {
        "frontier_urls": n,
        "waves": eng.wave_no,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n / wall, 2) if wall > 0 else None,
    }
    if args.report:
        from spacetime_crawler4_spark.crawl import report as R

        out["totals"] = R.totals(frontier).collect()[0].asDict()
        out["top_words"] = [
            (r["word"], r["total"]) for r in R.top_words(frontier, 10).collect()
        ]
    if args.dump:
        frontier.orderBy("gen", "seq").drop("words").show(args.dump, truncate=60)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
