"""Crawl → WET export end-to-end: `--wet-out` archives exactly the
admitted pages' canonical extracted text, and the manifest parquet is a
working CDX (ranged reads reproduce every record)."""

import pytest
import duckdb

from spacetime_crawler4_spark.queries import _CRAWL_PAGETEXT_PARQUET


@pytest.mark.slow
def test_crawl_cli_wet_export_matches_committed_pagetext(
    spark, corpus_dir, tmp_path
):
    from spacetime_crawler4_spark.crawl import run as crawl_run
    from spacetime_crawler4_spark.sources.warc import read_wet_records

    wet_dir = str(tmp_path / "wet")
    out = crawl_run.main(
        [
            "--pages",
            f"{corpus_dir}/pages.parquet",
            "--robots",
            f"{corpus_dir}/robots.parquet",
            "--seeds",
            f"{corpus_dir}/seeds.parquet",
            "--wet-out",
            wet_dir,
            "--wet-files",
            "4",
        ]
    )
    # the fixture crawl's admitted set IS the committed pagetext fixture —
    # so the archive must contain exactly those (url, text) rows
    want = {
        u: t
        for u, t in duckdb.sql(
            f"SELECT url, text FROM '{_CRAWL_PAGETEXT_PARQUET}'"
        ).fetchall()
    }
    assert out["wet"]["records"] == len(want) == 206
    manifest = spark.read.parquet(f"{wet_dir}/cdx.parquet")
    got = {
        r.url: r.text
        for r in read_wet_records(spark, wet_dir, manifest).collect()
    }
    assert got == want
