"""DSIR importance resampling (operators/dsir.py, Xie et al. 2023):
hashed unigram+bigram log importance weights and deterministic top-k
selection. Semantics pinned against a transparent numpy re-derivation on
a handcrafted corpus — not against the Spark plan itself."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dsir import (
    DSIR_ALPHA,
    DSIR_BUCKETS,
    dsir_logweights,
    dsir_select_topk,
)

DOCS = [
    # target-like docs: heavy on 'spark join' language
    (0, "spark join shuffle join spark", "en"),
    (1, "spark join spark join broadcast", "en"),
    # off-target docs
    (2, "tortilla queso salsa verde", "es"),
    (3, "tortilla salsa picante roja", "es"),
    # a doc that mixes both vocabularies
    (4, "spark tortilla join salsa", "fr"),
    # empty text: produces no grams, must simply vanish
    (5, "", "en"),
]


def _bucket(gram: str) -> int:
    return int(hashlib.md5(f"dsir{gram}".encode()).hexdigest()[:6], 16) % DSIR_BUCKETS


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _expected_weights(target_langs=("en",)):
    per_doc, ct, cs = {}, {}, {}
    for doc_id, text, lang in DOCS:
        counts = {}
        for g in _grams(text):
            b = _bucket(g)
            counts[b] = counts.get(b, 0) + 1
            cs[b] = cs.get(b, 0) + 1
            if lang in target_langs:
                ct[b] = ct.get(b, 0) + 1
        if counts:
            per_doc[doc_id] = counts
    nt, ns = sum(ct.values()), sum(cs.values())
    a, B = DSIR_ALPHA, DSIR_BUCKETS
    out = {}
    for doc_id, counts in per_doc.items():
        w = sum(
            c
            * (
                math.log((ct.get(b, 0) + a) / (nt + a * B))
                - math.log((cs[b] + a) / (ns + a * B))
            )
            for b, c in counts.items()
        )
        out[doc_id] = (sum(counts.values()), w)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_dsir_logweights_match_rederivation(docs_df):
    got = {
        r["id"]: (r["n_grams"], r["dsir_logw"])
        for r in dsir_logweights(docs_df, F.col("lang") == "en").collect()
    }
    want = _expected_weights()
    assert set(got) == set(want)  # doc 5 (empty) absent from both
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(w, rel=1e-12)


def test_dsir_ranks_target_like_docs_first(docs_df):
    ranked = [
        r["doc_id"]
        for r in dsir_select_topk(docs_df, F.col("lang") == "en", k=5).collect()
    ]
    # pure-target docs outrank the mixed doc, which outranks pure-off-target
    assert set(ranked[:2]) == {0, 1}
    assert ranked[2] == 4
    assert set(ranked[3:]) == {2, 3}


def test_dsir_topk_is_deterministic_and_bounded(docs_df):
    a = dsir_select_topk(docs_df, F.col("lang") == "en", k=3).collect()
    b = dsir_select_topk(docs_df, F.col("lang") == "en", k=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 3


def test_dsir_empty_target_slice_still_defined(docs_df):
    # no doc matches the target: p collapses to the uniform smoothing mass,
    # every weight is finite, and the mixed/common-bucket docs don't NaN
    rows = dsir_logweights(docs_df, F.col("lang") == "xx").collect()
    assert len(rows) == 5
    assert all(math.isfinite(r["dsir_logw"]) for r in rows)
