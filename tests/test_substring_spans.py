"""Exact-substring span dedup (operators/dedup.py duplicated_span_stats):
hand-computed spans, run-length merge correctness, invariants."""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import (
    duplicated_span_stats,
    word_windows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_word_windows_positions_and_count(spark):
    df = _docs(spark, [(1, "a b c d e")])
    rows = sorted(
        (r.pos for r in word_windows(df, "doc_id", "text", 3).collect())
    )
    # 5 tokens, n=3 -> positions 1..3
    assert rows == [1, 2, 3]
    # doc shorter than the window -> no rows
    short = _docs(spark, [(2, "a b")])
    assert word_windows(short, "doc_id", "text", 3).count() == 0


def test_shared_span_merges_to_one_maximal_run(spark):
    # docs 1 and 2 share the 6-word run "c d e f g h"; with n=3 that is
    # 4 consecutive duplicated windows -> ONE span of 4 + 2 = 6 words
    df = _docs(
        spark,
        [
            (1, "x y c d e f g h p q"),
            (2, "u v c d e f g h w z"),
        ],
    )
    rows = {r.id: r for r in duplicated_span_stats(df, "doc_id", "text", 3).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.n_spans == 1
        assert r.dup_words == 6
        assert r.n_words == 10
        assert r.dup_frac == 0.6


def test_two_disjoint_spans_stay_separate(spark):
    # shared runs "a b c" and "x y z" separated by unique middles
    df = _docs(
        spark,
        [
            (1, "a b c m1 m2 m3 x y z"),
            (2, "a b c k1 k2 k3 x y z"),
        ],
    )
    rows = {r.id: r for r in duplicated_span_stats(df, "doc_id", "text", 3).collect()}
    for r in rows.values():
        assert r.n_spans == 2
        assert r.dup_words == 6  # two spans of exactly n words each


def test_within_doc_repeat_counts(spark):
    # a single doc repeating its own phrase is duplicated too (Lee et al.
    # dedups within documents as well as across)
    df = _docs(spark, [(1, "p q r s p q r s")])
    rows = duplicated_span_stats(df, "doc_id", "text", 4).collect()
    assert len(rows) == 1
    assert rows[0].n_spans >= 1 and rows[0].dup_words >= 4


def test_identical_docs_fully_duplicated(spark):
    df = _docs(spark, [(1, "one two three four five six"), (2, "one two three four five six")])
    rows = {r.id: r for r in duplicated_span_stats(df, "doc_id", "text", 3).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.dup_frac == 1.0 and r.dup_words == r.n_words


def test_unique_docs_absent_and_frac_bounded(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words here entirely friend"),
            (3, "alpha beta gamma delta epsilon zeta"),
        ],
    )
    out = duplicated_span_stats(df, "doc_id", "text", 3)
    got = {r.id for r in out.collect()}
    assert got == {1, 3}
    assert out.filter((F.col("dup_frac") > 1.0) | (F.col("dup_frac") <= 0)).count() == 0


# ---------------------------------------------------------------------------
# duplicated-span REMOVAL (keep-first semantics)
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.dedup import (  # noqa: E402
    remove_duplicated_spans,
)


def test_removal_keeps_first_occurrence_only(spark):
    # identical docs: doc 1 (first by id) keeps everything, doc 2 loses all
    txt = "one two three four five six"
    df = _docs(spark, [(1, txt), (2, txt)])
    rows = {r.id: r for r in remove_duplicated_spans(df, "doc_id", "text", 3).collect()}
    assert rows[1].cleaned == txt and rows[1].kept_words == 6
    assert rows[2].cleaned == "" and rows[2].kept_words == 0


def test_removal_cuts_exact_span_coverage(spark):
    # docs share exactly "c d e" (n=3, one window); doc 2's copy is cut,
    # surrounding unique words survive
    df = _docs(spark, [(1, "c d e x1 x2 x3"), (2, "y1 y2 c d e y3")])
    rows = {r.id: r for r in remove_duplicated_spans(df, "doc_id", "text", 3).collect()}
    assert rows[1].cleaned == "c d e x1 x2 x3"
    assert rows[2].cleaned == "y1 y2 y3"
    assert rows[2].kept_words == 3


def test_removal_within_doc_repeat(spark):
    df = _docs(spark, [(1, "p q r z1 z2 p q r")])
    rows = remove_duplicated_spans(df, "doc_id", "text", 3).collect()
    assert rows[0].cleaned == "p q r z1 z2"


def test_removal_idempotent(spark):
    df = _docs(
        spark,
        [(1, "a b c d e f g"), (2, "x y a b c d e w"), (3, "c d e f g h i")],
    )
    once = remove_duplicated_spans(df, "doc_id", "text", 3).select(
        F.col("id").alias("doc_id"), F.col("cleaned").alias("text")
    )
    twice = remove_duplicated_spans(once, "doc_id", "text", 3)
    again = {r.id: r for r in twice.collect()}
    for r in once.collect():
        got = again[r.doc_id]
        assert got.cleaned == r.text, r.doc_id


def _py_remove_spans(docs, n):
    """Pure-python keep-first reference: global first occurrence of each
    duplicated n-gram window survives; later occurrences' covered tokens
    are cut."""
    toks = {i: t.lower().split() for i, t in docs}
    occ = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    dup_starts = {}
    for _g, locs in occ.items():
        for i, p in locs[1:] if len(locs) > 1 else []:
            dup_starts.setdefault(i, set()).add(p)
    out = {}
    for i in sorted(toks):
        ts = toks[i]
        covered = set()
        for p in dup_starts.get(i, ()):
            covered.update(range(p, p + n))
        out[i] = " ".join(t for j, t in enumerate(ts) if j not in covered)
    return out


def test_removal_random_differential(spark):
    import random

    rng = random.Random(17)
    vocab = [f"w{j}" for j in range(30)]
    docs = []
    for i in range(1, 25):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        # splice in a shared phrase sometimes to force cross-doc dups
        if rng.random() < 0.5:
            pos = rng.randint(0, max(0, len(words) - 1))
            words[pos:pos] = ["shared", "phrase", "alpha", "beta", "gamma"]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.id: r.cleaned
        for r in remove_duplicated_spans(df, "doc_id", "text", 4).collect()
    }
    want = _py_remove_spans(docs, 4)
    # operator only emits docs with >=4 tokens (shorter ones have no
    # windows and pass through unscored); compare on its domain
    for i, txt in docs:
        if len(txt.split()) == 0:
            continue
        assert got[i] == want[i], i
