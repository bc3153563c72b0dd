"""Webtext quality-filter semantics (operators/webfilter.py) on crafted
documents — each Gopher/C4 rule must trip on exactly the pathology it
names — plus plan gates: the per-doc passes are map-only (no Exchange)
and the repetition counters keep the word-count aggregate topology.
"""

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.webfilter import (
    c4_clean_lines,
    gopher_quality,
    repetition_stats,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs off to be "
    "with the other foxes that have found a den of rabbits near the hill "
    "and they all settle down for the evening with a fine meal of berries "
    "and roots that the youngest fox dug up from the soft ground by the "
    "river bank where the water runs clear and cold all year round here"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(spark, text):
    return gopher_quality(_df(spark, [(1, text)])).collect()[0]


def test_gopher_good_doc_keeps(spark):
    r = _flags(spark, GOOD)
    assert r.gopher_keep and r.n_words >= 50 and r.n_stop_hits >= 2


def test_gopher_short_doc_fails_word_count(spark):
    r = _flags(spark, "too short to keep")
    assert not r.flag_word_count and not r.gopher_keep


def test_gopher_symbol_ratio_trips(spark):
    r = _flags(spark, GOOD + " " + "# " * 20)
    assert r.symbol_ratio > 0.1 and not r.flag_symbol_ratio


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join("- item %d" % i for i in range(10))
    r = _flags(spark, bullets)
    assert r.frac_bullet_lines == 1.0 and not r.flag_bullet
    dots = "\n".join("trailing off..." for _ in range(10))
    r = _flags(spark, dots)
    assert r.frac_ellipsis_lines == 1.0 and not r.flag_ellipsis


def test_gopher_stopword_rule(spark):
    # 60 words, none from the required-stopword list
    r = _flags(spark, "word " * 60)
    assert r.n_stop_hits == 0 and not r.flag_stopwords


def test_gopher_alpha_rule(spark):
    r = _flags(spark, " ".join(str(i) for i in range(60)))
    assert r.frac_alpha_words == 0.0 and not r.flag_alpha


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This line ends with a period and has many words.",  # kept
            "No terminal punctuation here so it is dropped",  # dropped: punct
            "Too short.",  # dropped: <3 words
            "Enable JavaScript to view this page.",  # dropped: javascript
            'He said "stop right there."',  # kept (quote end)
        ]
    )
    r = c4_clean_lines(_df(spark, [(1, text)])).collect()[0]
    assert r.n_lines == 5 and r.n_kept_lines == 2 and r.c4_keep


def test_c4_doc_level_drop(spark):
    r = c4_clean_lines(_df(spark, [(1, "Lorem ipsum dolor sit amet.")])).collect()[0]
    assert not r.c4_keep
    r = c4_clean_lines(_df(spark, [(1, "var x = { a: 1 };")])).collect()[0]
    assert not r.c4_keep


def test_repetition_dup_lines_exact(spark):
    # 3 lines of 10 chars each, one duplicated: dup fraction = 20/30
    text = "aaaaaaaaaa\nbbbbbbbbbb\naaaaaaaaaa"
    r = repetition_stats(_df(spark, [(1, text)])).collect()[0]
    assert r.frac_dup_line_chars == round(20 / 30, 6)


def test_repetition_top_bigram_exact(spark):
    # words: x y x y x -> bigrams: 'x y' (x2), 'y x' (x2); tie on cnt=2,
    # equal coverage 2*3=6; word chars = 5 -> fraction 6/5 capped? no cap:
    # coverage counts gram chars, can exceed 1.0 by construction
    r = repetition_stats(_df(spark, [(1, "x y x y x")])).collect()[0]
    assert r.frac_top_bigram_chars == round(6 / 5, 6)


def test_gopher_and_c4_plans_are_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for df in (gopher_quality(docs), c4_clean_lines(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


def test_repetition_plan_is_aggregate_shaped(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # two-phase hash aggregates, no windows, no Python
    assert "HashAggregate" in plan
    assert "Window" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# host reputation
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.webfilter import (  # noqa: E402
    host_reputation,
)


def test_host_reputation_blocks_junk_host_and_counts_collateral(spark):
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& !!!! ???? ;;;; ::::"
    rows = (
        # goodhost: 3 high-quality docs
        [(i, GOOD, "en", "goodhost", len(GOOD)) for i in range(3)]
        # junkhost: 2 junk docs + 1 individually-good doc (the collateral)
        + [(10 + i, junk, "en", "junkhost", len(junk)) for i in range(2)]
        + [(12, GOOD, "en", "junkhost", len(GOOD))]
    )
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, n_chars int"
    )
    rep = {r.source: r for r in host_reputation(df).collect()}
    assert not rep["goodhost"].host_blocked
    assert rep["goodhost"].n_good_docs_lost == 0
    assert rep["junkhost"].host_blocked
    assert rep["junkhost"].n_good_docs_lost == 1
    assert rep["junkhost"].mean_rules < rep["goodhost"].mean_rules


def test_host_reputation_is_map_only_plus_one_aggregate(spark):
    df = spark.createDataFrame(
        [(1, GOOD, "en", "h", 10)],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    plan = (
        host_reputation(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg, nothing else
