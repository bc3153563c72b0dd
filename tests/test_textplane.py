"""Spark text-plane operators vs the pure-Python functions, row-for-row.

This is the differential test that makes the pandas-UDF layer trustworthy:
whatever `extract_page`/`tokenize`/`simhash32`/`exhash` say for a page, the
Spark plane must reproduce for every row of the fixture corpus — including
the byte-identical `text` column (BASELINE.json input_hint invariant).
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.functions.exhash import exhash
from spacetime_crawler4_spark.functions.htmltext import extract_page
from spacetime_crawler4_spark.functions.simhash import simhash32
from spacetime_crawler4_spark.functions.tokenizer import tokenize, word_count
from spacetime_crawler4_spark.operators.textplane import with_text_plane


@pytest.fixture(scope="module")
def planed(spark, corpus_dir):
    df = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    out = with_text_plane(df).select(
        "url", "html", "content_type", "exhash", "parsed.*",
        "tok.tokens", "tok.words", "tok.n_unique", "tok.n_total", "tok.max_count",
        "smhash",
    )
    return {r["url"]: r.asDict() for r in out.collect()}


def test_text_and_links_parity(planed, corpus_dir):
    rows = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    assert len(planed) == len(rows)
    for r in rows:
        got = planed[r["url"]]
        exp = extract_page(r["url"], r["html"], r["content_type"])
        assert got["text"] == r["text"], r["url"]          # byte-identical invariant
        assert got["links"] == exp.links, r["url"]
        assert got["sitemap"] == exp.sitemap, r["url"]


def test_token_simhash_exhash_parity(planed, corpus_dir):
    rows = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    for r in rows:
        got = planed[r["url"]]
        toks = tokenize(r["text"])
        words = word_count(toks)
        assert got["tokens"] == toks, r["url"]
        assert dict(got["words"] or {}) == words, r["url"]
        assert got["n_unique"] == len(words)
        assert got["n_total"] == len(toks)
        assert got["max_count"] == (max(words.values()) if words else 0)
        assert got["smhash"] == simhash32(words), r["url"]
        assert got["exhash"] == exhash(r["html"]), r["url"]


def test_plan_is_arrow_not_rowwise(spark, corpus_dir):
    """UDFs must run as ArrowEvalPython (vectorized), never BatchEvalPython
    (pickled row-at-a-time) — the no-per-row-Python contract."""
    df = with_text_plane(spark.read.parquet(f"{corpus_dir}/pages.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_exhash_is_pure_jvm(spark, corpus_dir):
    """exhash alone must not invoke Python at all (crc32 is a JVM built-in)."""
    from spacetime_crawler4_spark.functions.exhash import exhash_col

    df = spark.read.parquet(f"{corpus_dir}/pages.parquet").select(exhash_col(F.col("html")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
