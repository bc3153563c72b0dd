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
