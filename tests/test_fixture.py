"""Fixture corpus invariants — most importantly the byte-identical text
contract: for EVERY page, extract_page(html) reproduces the text column."""

import pyarrow.parquet as pq
import pytest

from spacetime_crawler4_spark.functions.exhash import exhash
from spacetime_crawler4_spark.functions.htmltext import extract_page
from spacetime_crawler4_spark.functions.simhash import hamming32, simhash32
from spacetime_crawler4_spark.functions.tokenizer import tokenize, word_count
from spacetime_crawler4_spark.sources.fixture import write_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixtures")
    counts = write_corpus(str(out))
    return out, counts


def test_counts_and_determinism(corpus, tmp_path):
    out, counts = corpus
    assert counts["pages"] > 150 and counts["robots"] == 5 and counts["seeds"] == 3
    # regenerate -> byte-identical text/html columns
    write_corpus(str(tmp_path / "again"))
    t1 = pq.read_table(str(out / "pages.parquet"))
    t2 = pq.read_table(str(tmp_path / "again" / "pages.parquet"))
    assert t1.equals(t2)


def test_byte_identical_text_invariant(corpus):
    out, _ = corpus
    t = pq.read_table(str(out / "pages.parquet")).to_pylist()
    assert len(t) > 0
    for row in t:
        got = extract_page(row["url"], row["html"], row["content_type"])
        assert got.text == row["text"], row["url"]


def test_exact_family_identical_bytes(corpus):
    out, _ = corpus
    t = pq.read_table(str(out / "pages.parquet")).to_pylist()
    by_url = {r["url"]: r for r in t}
    h0 = exhash(by_url["http://www.example-a.test/exact/0"]["html"])
    assert h0 == exhash(by_url["http://www.example-a.test/exact/1"]["html"])
    assert h0 == exhash(by_url["http://www.example-a.test/exact/2"]["html"])
    assert h0 != exhash(by_url["http://www.example-a.test/exact/ctrl"]["html"])


def test_near_family_hamming(corpus):
    out, _ = corpus
    t = pq.read_table(str(out / "pages.parquet")).to_pylist()
    by_url = {r["url"]: r for r in t}

    def sh(url):
        return simhash32(word_count(tokenize(by_url[url]["text"])))

    base = sh("http://www.example-a.test/near/0")
    for i in range(1, 5):
        assert hamming32(base, sh(f"http://www.example-a.test/near/{i}")) <= 5
    assert hamming32(base, sh("http://www.example-a.test/near/ctrl")) > 5


def test_trap_structures_present(corpus):
    out, _ = corpus
    urls = set(pq.read_table(str(out / "pages.parquet")).column("url").to_pylist())
    assert "http://www.example-a.test/chain/12" in urls
    assert "http://www.example-b.test/list?page=6" in urls
    assert "http://www.example-b.test/sitemap-index.xml" in urls
    assert "http://mega.example-a.test/item/119" in urls
