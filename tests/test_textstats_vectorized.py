"""The mapInPandas winnow/rabin production paths must be row-identical to
the relational (oracle-mirror) forms — including md5 hex strings, the
full-window filter, and the short/empty-text edge cases the SQL semantics
imply (docs with no full window / empty text are ABSENT from the output).
"""

import pytest

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def edge_docs(spark):
    # lengths around every boundary: empty, < k, == k-1, == k, == k+w-2
    # (no full window), == k+w-1 (exactly one), repeated text (memo path)
    texts = [
        "",
        "ab",
        "abcdefg",
        "abcdefgh",
        "abcdefghij",
        "abcdefghijk",
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaa",
        "abcabcabcabcabcabc",
        "MiXeD CaSe TeXt with UPPER and lower 0123456789",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_vectorized_matches_relational_sf001(spark):
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_fingerprints_vectorized,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rel = _rows(winnow_fingerprints(docs, k=8, w=4))
    vec = _rows(winnow_fingerprints_vectorized(docs, k=8, w=4))
    assert vec == rel
    assert len(vec) > 0


def test_winnow_vectorized_edge_cases(spark, edge_docs):
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_fingerprints_vectorized,
    )

    rel = _rows(winnow_fingerprints(edge_docs, k=8, w=4))
    vec = _rows(winnow_fingerprints_vectorized(edge_docs, k=8, w=4))
    assert vec == rel
    # docs shorter than k+w-1 chars have no full window and must be absent
    present = {r[0] for r in vec}
    assert 0 not in present and 1 not in present and 3 not in present
    assert 5 in present


def test_rabin_vectorized_matches_relational_sf001(spark):
    from spacetime_crawler4_spark.operators.textstats import (
        rabin_fingerprints,
        rabin_fingerprints_vectorized,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rel = _rows(rabin_fingerprints(docs, k=8))
    vec = _rows(rabin_fingerprints_vectorized(docs, k=8))
    assert vec == rel
    assert len(vec) > 0


def test_rabin_vectorized_edge_cases(spark, edge_docs):
    from spacetime_crawler4_spark.operators.textstats import (
        rabin_fingerprints,
        rabin_fingerprints_vectorized,
    )

    rel = _rows(rabin_fingerprints(edge_docs, k=8))
    vec = _rows(rabin_fingerprints_vectorized(edge_docs, k=8))
    assert vec == rel
    # empty text absent; a short (< k) text yields exactly one window
    ids = {r[0]: r for r in vec}
    assert 0 not in ids
    assert ids[1][1] == 1


# ---------------------------------------------------------------------------
# unigram-LM bits-per-token
# ---------------------------------------------------------------------------

import math as _math

from spacetime_crawler4_spark.operators.textstats import (  # noqa: E402
    UNIGRAM_SMOOTH_K,
    unigram_bits_per_token,
)


def test_unigram_bits_match_hand_model(spark):
    # corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, N=5, V=3
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id int, text string"
    )
    out = {r.id: r for r in unigram_bits_per_token(df).collect()}
    k = UNIGRAM_SMOOTH_K
    denom = 5 + k * 3
    p = {"a": (3 + k) / denom, "b": (1 + k) / denom, "c": (1 + k) / denom}
    want1 = -(2 * _math.log2(p["a"]) + _math.log2(p["b"])) / 3
    want2 = -(_math.log2(p["a"]) + _math.log2(p["c"])) / 2
    assert out[1].n_toks == 3 and out[2].n_toks == 2
    assert abs(out[1].bits_per_token - want1) < 1e-4
    assert abs(out[2].bits_per_token - want2) < 1e-4
    assert out[1].ppx_bucket == int(out[1].bits_per_token)


def test_unigram_rare_text_scores_higher(spark):
    common = "the cat sat on the mat " * 10
    df = spark.createDataFrame(
        [(i, common) for i in range(5)]
        + [(99, "zyx wvu tsr qpo nml kji")],
        "doc_id int, text string",
    )
    out = {r.id: r.bits_per_token for r in unigram_bits_per_token(df).collect()}
    assert out[99] > out[0] + 1.0  # rare tokens cost strictly more bits


# ---------------------------------------------------------------------------
# bigram Stupid Backoff
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.textstats import (  # noqa: E402
    BACKOFF_ALPHA,
    bigram_bits_per_token,
)


def test_bigram_backoff_hand_model(spark):
    # corpus: doc1 "a b a b", doc2 "a c"
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1; unigrams a=3,b=2,c=1, N=6, V=3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id int, text string"
    )
    out = {r.id: r for r in bigram_bits_per_token(df).collect()}
    k = 0.5
    # doc1 scored: b|a = 2/3, a|b = 1/2, b|a = 2/3 -> no backoff
    want1 = -(2 * _math.log2(2 / 3) + _math.log2(1 / 2)) / 3
    assert out[1].n_scored == 3
    assert out[1].backoff_rate == 0.0
    assert abs(out[1].bits_per_token - want1) < 1e-4
    # doc2 scored: c|a seen once -> 1/3 -> no backoff either
    assert out[2].n_scored == 1
    assert out[2].backoff_rate == 0.0
    assert abs(out[2].bits_per_token - (-_math.log2(1 / 3))) < 1e-4


def test_bigram_unseen_pair_backs_off(spark):
    # the model is trained WITHOUT doc 3, whose "b c" bigram is then
    # unseen and must back off to alpha * p_uni(c)
    train = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id int, text string"
    )
    score = train.unionByName(
        spark.createDataFrame([(3, "b c")], "doc_id int, text string")
    )
    out = {r.id: r for r in bigram_bits_per_token(score, train).collect()}
    assert out[3].backoff_rate == 1.0
    k = 0.5
    # train unigrams: a=2, b=1, c=1 -> N=4, V=3; c is the backed-off token
    p = BACKOFF_ALPHA * (1 + k) / (4 + k * 3)
    assert abs(out[3].bits_per_token - (-_math.log2(p))) < 1e-4
    # docs 1-2 score their own training bigrams - never back off
    assert out[1].backoff_rate == 0.0 and out[2].backoff_rate == 0.0


def test_bigram_self_train_never_backs_off(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "z q"), (3, "totally novel words")],
        "doc_id int, text string",
    )
    out = bigram_bits_per_token(df).collect()
    assert all(r.backoff_rate == 0.0 for r in out)
