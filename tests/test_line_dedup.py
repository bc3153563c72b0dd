"""Cross-document line dedup (operators/dedup.line_dedup / dup_line_stats).

Semantics pinned here, differentially vs a pure-Python reimplementation on
randomized corpora and directly on hand-built edge cases:

- a line occurrence is kept iff it is blank, occurs in < min_docs distinct
  docs, or is the globally FIRST occurrence (lexicographic (id, pos));
- same-document repeats of a cross-document duplicate are dropped too;
- within-one-document-only repeats are NOT deduped (n_docs == 1);
- blank/whitespace lines never participate and always survive;
- cleaned text preserves original order and original (untrimmed) bytes.
"""

import random

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import (
    dup_line_stats,
    line_dedup,
)


def _py_line_dedup(docs: dict[str, str], min_docs: int = 2):
    """Reference implementation: dict id -> text, returns id -> kept lines."""
    occ = []  # (id, pos, line, key)
    for i in sorted(docs):
        for p, ln in enumerate(docs[i].split("\n")):
            occ.append((i, p, ln, ln.strip() or None))
    ndocs: dict[str, set] = {}
    first: dict[str, tuple] = {}
    for i, p, ln, k in occ:
        if k is None:
            continue
        ndocs.setdefault(k, set()).add(i)
        if k not in first or (i, p) < first[k]:
            first[k] = (i, p)
    out = {}
    for i in docs:
        kept = []
        for p, ln in enumerate(docs[i].split("\n")):
            k = ln.strip() or None
            if k is None or len(ndocs[k]) < min_docs or first[k] == (i, p):
                kept.append(ln)
        out[i] = kept
    return out


def _run(spark, docs: dict[str, str], min_docs: int = 2):
    df = spark.createDataFrame(
        [(i, t) for i, t in sorted(docs.items())], "id string, text string"
    )
    return {
        r["id"]: r.asDict()
        for r in line_dedup(df, "id", "text", min_docs=min_docs).collect()
    }


def test_keep_first_and_same_doc_repeats(spark):
    docs = {
        "a": "hub\nbody a\nhub",  # first 'hub' global; own repeat dropped
        "b": "hub\nbody b",  # later doc's 'hub' dropped
    }
    got = _run(spark, docs)
    assert got["a"]["cleaned"] == "hub\nbody a"
    assert got["a"]["n_lines"] == 3 and got["a"]["n_dropped"] == 1
    assert got["b"]["cleaned"] == "body b"
    assert got["b"]["n_kept"] == 1


def test_within_doc_only_repeats_survive(spark):
    docs = {"a": "x\nx\nx", "b": "y"}
    got = _run(spark, docs)
    assert got["a"]["cleaned"] == "x\nx\nx"  # n_docs == 1: not boilerplate
    assert got["a"]["n_dropped"] == 0


def test_blank_and_whitespace_lines_always_kept(spark):
    docs = {"a": "hub\n\n  \nend a", "b": "hub\n\nend b"}
    got = _run(spark, docs)
    assert got["a"]["cleaned"] == "hub\n\n  \nend a"
    assert got["b"]["cleaned"] == "\nend b"  # blank kept, 'hub' deduped


def test_trim_only_keying_preserves_original_bytes(spark):
    # '  hub' and 'hub' share a key; the survivor keeps ITS original bytes
    docs = {"a": "  hub\nalpha", "b": "hub\nbeta"}
    got = _run(spark, docs)
    assert got["a"]["cleaned"] == "  hub\nalpha"
    assert got["b"]["cleaned"] == "beta"


def test_min_docs_threshold(spark):
    docs = {"a": "hub\np", "b": "hub\nq", "c": "hub\nr"}
    # min_docs=4: nothing is duplicated enough
    got = _run(spark, docs, min_docs=4)
    assert all(v["n_dropped"] == 0 for v in got.values())


def test_empty_text_row(spark):
    docs = {"a": "", "b": "z"}
    got = _run(spark, docs)
    assert got["a"]["cleaned"] == "" and got["a"]["n_lines"] == 1
    assert got["a"]["n_dropped"] == 0


def test_dup_line_stats_counts_and_first(spark):
    docs = {
        "a": "hub\nnext item",
        "b": "next item\nhub\nnext item",
        "c": "solo",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in sorted(docs.items())], "id string, text string"
    )
    rows = {r["line"]: r for r in dup_line_stats(df, "id", "text").collect()}
    assert set(rows) == {"hub", "next item"}
    assert rows["hub"]["n_docs"] == 2 and rows["hub"]["n_occ"] == 2
    assert rows["next item"]["n_occ"] == 3
    assert rows["next item"]["first_id"] == "a"
    assert rows["next item"]["first_pos"] == 1
    # ordering: n_docs desc, n_occ desc, line
    ordered = [r["line"] for r in dup_line_stats(df, "id", "text").collect()]
    assert ordered == ["next item", "hub"]


def test_randomized_differential(spark):
    rng = random.Random(2026)
    vocab = ["hub", "home", "next", "alpha", "beta", "gamma", " pad", ""]
    for trial in range(3):
        docs = {
            f"d{j:02d}": "\n".join(
                rng.choice(vocab) + (f" {j}-{k}" if rng.random() < 0.5 else "")
                for k in range(rng.randint(1, 12))
            )
            for j in range(rng.randint(2, 14))
        }
        expect = _py_line_dedup(docs)
        got = _run(spark, docs)
        for i in docs:
            assert got[i]["cleaned"] == "\n".join(expect[i]), (trial, i)
            assert got[i]["n_kept"] == len(expect[i])
            assert got[i]["n_lines"] == len(docs[i].split("\n"))
