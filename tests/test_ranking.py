"""BM25 / conjunctive retrieval semantics (operators/ranking.py)."""

import math

from spacetime_crawler4_spark.operators.ranking import (
    bm25_scores,
    conjunctive_search,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "join filter merge join"),  # all three terms, join twice
            (2, "join filter something else entirely here"),  # two terms
            (3, "merge merge merge merge"),  # one term, high tf
            (4, "nothing relevant at all"),
        ],
        "doc_id int, text string",
    )


def test_bm25_hand_computed(spark):
    df = _corpus(spark)
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, ("join",)).collect()}
    # N=4 docs, df(join)=2, dl: 4,6,4,4 -> avgdl=4.5
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / 4.5))

    assert set(got) == {1, 2}
    assert abs(got[1] - s(2, 4)) < 1e-9
    assert abs(got[2] - s(1, 6)) < 1e-9


def test_conjunctive_requires_every_term(spark):
    df = _corpus(spark)
    rows = conjunctive_search(df, ("join", "filter", "merge")).collect()
    assert [r.doc_id for r in rows] == [1]  # only doc 1 has all three


def test_conjunctive_ranking_and_topk(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + "pad " * 20),
            (2, "alpha alpha beta beta"),  # higher tf, shorter doc
            (3, "alpha beta"),
            (4, "alpha only here"),
        ],
        "doc_id int, text string",
    )
    rows = conjunctive_search(df, ("alpha", "beta"), top_k=2).collect()
    assert len(rows) == 2
    assert rows[0].doc_id in (2, 3)  # short, term-dense docs outrank padded
    assert all(r.doc_id != 4 for r in rows)
    assert rows[0].bm25 >= rows[1].bm25


def test_phrase_search_exact_sequence(spark):
    from spacetime_crawler4_spark.operators.ranking import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "hash join beats sort merge join"),  # one 'hash join'
            (2, "hash join and hash join again"),  # two matches
            (3, "join hash"),  # reversed: no match
            (4, "hash x join"),  # gap: no match
            (5, "the hash join"),  # match at pos 1
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ("hash", "join")).collect()
    }
    assert got == {1: (1, 0), 2: (2, 0), 5: (1, 1)}


def test_phrase_search_trigram_and_overlap(spark):
    from spacetime_crawler4_spark.operators.ranking import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),  # overlapping 'a a a' at pos 0 and 1
            (2, "a a b a a a"),  # one match at pos 3
            (3, "a a"),  # too short
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ("a", "a", "a")).collect()
    }
    assert got == {1: (2, 0), 2: (1, 3)}


def test_phrase_search_single_term_and_tokenizer(spark):
    from spacetime_crawler4_spark.operators.ranking import phrase_search

    docs = spark.createDataFrame(
        [(1, "Hash-Join, HASH join!"), (2, "nothing")],
        "doc_id int, text string",
    )
    # sql_tokens lowercases and splits on non-[a-z0-9']: "hash-join, hash
    # join!" -> hash join hash join => two 'hash join' matches
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, ("hash", "join")).collect()
    }
    assert got == {1: 2}
    single = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, ("hash",)).collect()
    }
    assert single == {1: 2}
