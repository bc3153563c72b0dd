#!/usr/bin/env python
"""Materialize the committed crawl-state fixture (VERDICT r3 #7).

Runs the deterministic fixture crawl (sources/fixture.py, seed=42) to
quiescence and writes the final frontier's SCALAR columns — sorted by
(gen, seq) and written via pyarrow as one file — to
spacetime_crawler4_spark/resources/crawl_state/frontier.parquet.

That parquet is committed test data: the registry's crawl_state_*
queries (and their DuckDB oracles) read it, giving the driver's
correctness harness green rows over REAL crawl-engine output (robots
gate, depth sift, status/redirect/length filters, dedup verdicts,
politeness domains) instead of only the local test suite.
tests/test_crawl_state_queries.py re-crawls and asserts the committed
file still matches the engine, so the fixture cannot drift.

Usage: python tools/gen_crawl_state.py  (rewrites the committed parquet)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = (
    Path(__file__).resolve().parent.parent
    / "spacetime_crawler4_spark"
    / "resources"
    / "crawl_state"
    / "frontier.parquet"
)
LINKS_OUT = OUT.parent / "links.parquet"
WORDSTATS_OUT = OUT.parent / "wordstats.parquet"
PAGETEXT_OUT = OUT.parent / "pagetext.parquet"
WAVE1_OUT = OUT.parent / "frontier_wave1.parquet"


def crawl_state_tables(spark, corpus_dir: str):
    """One fixture crawl -> (frontier scalars, wordstats) pyarrow tables.

    frontier: the final frontier's scalar columns (maps/arrays dropped;
    words/links kept as counts), sorted by (gen, seq) for byte-stable output.
    wordstats: the same frontier's word bags exploded to one (url, domain,
    finish, word, cnt) row per distinct token — the committed signal table
    for content-mining queries (soft-404 boilerplate share) whose DuckDB
    oracles need word-level access the scalar table drops. Sorted
    (url, word)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.sources.fixture import (
        FIXTURE_WHITELIST,
        SEED_URLS,
    )

    eng = CrawlEngine(
        spark,
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        list(SEED_URLS),
        CrawlConfig(whitelist=FIXTURE_WHITELIST),
    )
    frontier = eng.run()
    scalars = _frontier_scalars(frontier)

    ws_rows = (
        frontier.filter(
            F.size(F.map_keys(F.coalesce("words", F.create_map()))) > 0
        )
        .select("url", "domain", "finish", F.explode("words").alias("word", "cnt"))
        .orderBy("url", "word")
        .collect()
    )
    ws_cols = ws_rows[0].asDict().keys() if ws_rows else []
    wordstats = pa.table({c: [r[c] for r in ws_rows] for c in ws_cols})
    return scalars, wordstats


def _frontier_scalars(frontier):
    """Frontier scalar columns as a pyarrow table, (gen, seq)-sorted for
    byte-stable committed output (maps/arrays reduced to counts)."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    rows = (
        frontier.select(
            "urlhash",
            "url",
            "parent",
            "status",
            "finish",
            "absdepth",
            "reldepth",
            "monodepth",
            "dupdepth",
            F.size(F.map_keys(F.coalesce("words", F.create_map()))).alias(
                "n_words"
            ),
            F.size(F.coalesce("links", F.array())).alias("n_links"),
            "exhash",
            "smhash",
            "gen",
            "seq",
            "domain",
            "retries",
        )
        .orderBy("gen", "seq")
        .collect()
    )
    cols = rows[0].asDict().keys() if rows else []
    return pa.table({c: [r[c] for r in rows] for c in cols})


def wave1_table(spark, corpus_dir: str):
    """The frontier AFTER EXACTLY ONE WAVE (max_waves=1) — the committed
    mid-crawl snapshot. Paired with the final frontier it makes the
    store's time-travel surface driver-checkable: crawl_snapshot_delta
    diffs the two exactly like an Iceberg incremental read between
    snapshot commits (crawl/store.py commits once per wave)."""
    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.sources.fixture import (
        FIXTURE_WHITELIST,
        SEED_URLS,
    )

    eng = CrawlEngine(
        spark,
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        list(SEED_URLS),
        CrawlConfig(whitelist=FIXTURE_WHITELIST, max_waves=1),
    )
    return _frontier_scalars(eng.run())


def crawl_state_table(spark, corpus_dir: str):
    """Back-compat wrapper: the frontier scalar table only."""
    return crawl_state_tables(spark, corpus_dir)[0]


def links_table(spark, corpus_dir: str, frontier_tbl):
    """Anchor-text edges of the fixture crawl's OK pages, via the production
    ``anchor_edges`` operator (operators/linkgraph.py) — so the committed
    fixture IS the operator's output, not a parallel reimplementation.
    Sources = frontier rows with status=2 (downloaded) & finish=0 (admitted),
    joined back to the corpus html. Sorted (src_url, pos) for byte-stable
    output."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.operators.linkgraph import anchor_edges

    ok = {
        u
        for u, s, f in zip(
            frontier_tbl["url"].to_pylist(),
            frontier_tbl["status"].to_pylist(),
            frontier_tbl["finish"].to_pylist(),
        )
        if s == 2 and f == 0
    }
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").filter(
        F.col("url").isin(sorted(ok))
    )
    rows = anchor_edges(pages).orderBy("src_url", "pos").collect()
    cols = rows[0].asDict().keys() if rows else []
    return pa.table({c: [r[c] for r in rows] for c in cols})


def pagetext_table(spark, corpus_dir: str, frontier_tbl):
    """(url, domain, text) for the fixture crawl's admitted pages via the
    PRODUCTION parse UDF (operators/textplane.parse_page_udf) — text is
    the canonical newline-joined fragment serialization, so the committed
    fixture carries the exact line granularity the line-dedup operators
    (operators/dedup.line_dedup) consume. Sorted by url for byte-stable
    output."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.operators.textplane import parse_page_udf

    ok = {
        u
        for u, s, f in zip(
            frontier_tbl["url"].to_pylist(),
            frontier_tbl["status"].to_pylist(),
            frontier_tbl["finish"].to_pylist(),
        )
        if s == 2 and f == 0
    }
    rows = (
        spark.read.parquet(f"{corpus_dir}/pages.parquet")
        .filter(F.col("url").isin(sorted(ok)))
        .select(
            "url",
            parse_page_udf(
                F.col("url"), F.col("html"), F.lit("text/html")
            ).alias("p"),
        )
        .select("url", F.col("p.text").alias("text"))
        .orderBy("url")
        .collect()
    )
    from spacetime_crawler4_spark.crawl.schema import domain_of

    return pa.table(
        {
            "url": [r["url"] for r in rows],
            "domain": [domain_of(r["url"]) for r in rows],
            "text": [r["text"] for r in rows],
        }
    )


def main() -> None:
    import pyarrow.parquet as pq

    from spacetime_crawler4_spark.session import get_spark
    from spacetime_crawler4_spark.sources.fixture import write_corpus

    spark = get_spark(
        "gen-crawl-state",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as td:
        write_corpus(td)
        tbl, wordstats = crawl_state_tables(spark, td)
        links = links_table(spark, td, tbl)
        pagetext = pagetext_table(spark, td, tbl)
        wave1 = wave1_table(spark, td)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {OUT} rows={tbl.num_rows}")
    pq.write_table(links, LINKS_OUT, compression="zstd")
    print(f"wrote {LINKS_OUT} rows={links.num_rows}")
    pq.write_table(wordstats, WORDSTATS_OUT, compression="zstd")
    print(f"wrote {WORDSTATS_OUT} rows={wordstats.num_rows}")
    pq.write_table(pagetext, PAGETEXT_OUT, compression="zstd")
    print(f"wrote {PAGETEXT_OUT} rows={pagetext.num_rows}")
    pq.write_table(wave1, WAVE1_OUT, compression="zstd")
    print(f"wrote {WAVE1_OUT} rows={wave1.num_rows}")


if __name__ == "__main__":
    main()
