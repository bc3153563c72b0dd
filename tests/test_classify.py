"""Naive Bayes classifier (operators/classify.py) and Zipf fit
(operators/textstats.zipf_fit) semantics on hand-computable corpora."""

import math

import numpy as np

from spacetime_crawler4_spark.operators.classify import nb_classify, nb_scores
from spacetime_crawler4_spark.operators.textstats import zipf_fit


def _corpus(spark):
    # two classes, vocab {aa, bb, cc}: 'en' docs dominated by aa, 'de' by bb
    return spark.createDataFrame(
        [
            (1, "aa aa bb", "en"),
            (2, "aa aa aa cc", "en"),
            (3, "bb bb aa", "de"),
            (4, "bb bb bb cc", "de"),
            (5, "aa bb", "en"),
        ],
        "doc_id int, text string, lang string",
    )


def _hand_nb(doc_tokens: dict[str, int]) -> dict[str, float]:
    """Reference computation straight from the textbook formula."""
    counts = {
        "en": {"aa": 6, "bb": 2, "cc": 1},  # docs 1, 2, 5
        "de": {"aa": 1, "bb": 5, "cc": 1},  # docs 3, 4
    }
    priors = {"en": 3 / 5, "de": 2 / 5}
    vocab = 3
    out = {}
    for c in counts:
        tot = sum(counts[c].values())
        s = math.log(priors[c])
        for w, n in doc_tokens.items():
            s += n * math.log((counts[c].get(w, 0) + 1) / (tot + vocab))
        out[c] = s
    return out


def test_nb_scores_match_textbook_formula(spark):
    got = {
        (r.doc_id, r.label): r.score
        for r in nb_scores(_corpus(spark), label_col="lang").collect()
    }
    docs = {
        1: {"aa": 2, "bb": 1},
        2: {"aa": 3, "cc": 1},
        3: {"bb": 2, "aa": 1},
        4: {"bb": 3, "cc": 1},
        5: {"aa": 1, "bb": 1},
    }
    assert len(got) == 10  # 5 docs x 2 classes
    for d, toks in docs.items():
        want = _hand_nb(toks)
        for c, s in want.items():
            assert abs(got[(d, c)] - s) < 1e-9, (d, c)


def test_nb_classify_argmax_and_margin(spark):
    rows = {r.doc_id: r for r in nb_classify(_corpus(spark)).collect()}
    for d in (1, 2, 5):
        assert rows[d].pred_label == "en"
    for d in (3, 4):
        assert rows[d].pred_label == "de"
    assert all(r.correct == 1 for r in rows.values())
    want = _hand_nb({"aa": 2, "bb": 1})
    assert abs(rows[1].margin - round(want["en"] - want["de"], 6)) < 1e-9
    assert all(r.margin > 0 for r in rows.values())


def test_nb_empty_doc_scores_on_priors(spark):
    df = spark.createDataFrame(
        [(1, "aa aa", "en"), (2, "bb", "de"), (3, "en", "en"), (4, "", "en")],
        "doc_id int, text string, lang string",
    )
    got = {
        (r.doc_id, r.label): r.score
        for r in nb_scores(df, label_col="lang").collect()
    }
    # doc 4 has no tokens: score == ln(prior) exactly
    assert abs(got[(4, "en")] - math.log(3 / 4)) < 1e-12
    assert abs(got[(4, "de")] - math.log(1 / 4)) < 1e-12
    pred = {r.doc_id: r.pred_label for r in nb_classify(df).collect()}
    assert pred[4] == "en"  # majority prior wins the empty doc


def test_zipf_fit_matches_numpy_ols(spark):
    # deterministic token stream: word w_i appears (20 - i) times
    words = [f"w{i:02d}" for i in range(12)]
    text = " ".join(" ".join([w] * (20 - i)) for i, w in enumerate(words))
    df = spark.createDataFrame([(1, text, "en")], "doc_id int, text string, lang string")
    row = zipf_fit(df, group_col="lang").collect()[0]
    x = np.log(np.arange(1, 13, dtype=float))
    y = np.log(np.array([20.0 - i for i in range(12)]))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n_ranks == 12
    assert abs(row.slope - round(float(slope), 6)) < 2e-6
    assert abs(row.intercept - round(float(intercept), 6)) < 2e-6
    assert abs(row.r2 - round(float(r * r), 6)) < 2e-6


def test_zipf_rank_window_caps_and_groups(spark):
    # two langs; one has > top_ranks distinct words, fit must cap at 3
    rows = []
    for i in range(10):
        rows.append((i, f"a{i} " * (i + 1), "en"))
    rows.append((100, "x x x y y z", "de"))
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    got = {r.lang: r for r in zipf_fit(df, top_ranks=3).collect()}
    assert got["en"].n_ranks == 3
    assert got["de"].n_ranks == 3
    # de counts: x=3, y=2, z=1 -> perfect ordering, slope < 0, r2 in (0, 1]
    assert got["de"].slope < 0
    assert 0.0 < got["de"].r2 <= 1.0
