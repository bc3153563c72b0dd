"""Asymmetric shingle containment: engulfed docs detected, Jaccard-blind."""

from spacetime_crawler4_spark.operators.dedup import (
    containment_pairs,
    word_shingles,
)


def test_engulfed_doc_has_high_containment_low_jaccard(spark):
    short = "the quick brown fox jumps over the lazy dog"
    long = (
        "intro words here before anything else happens now " + short + " "
        + "and then a very long tail of unrelated filler content follows "
        + "with many more words stretching the document out considerably "
        + "so the union is much larger than the small set"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely unrelated text about ships")],
        "doc_id int, text string",
    )
    sh = word_shingles(df, "doc_id", "text", 3)
    rows = containment_pairs(sh, min_containment=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_small == 1.0  # every shingle of the short doc is inside
    assert r.jaccard < 0.5  # symmetric measure would have missed it


def test_df_cap_drops_universal_shingles(spark):
    # a shingle present in every doc is dropped by the cap, so it cannot
    # manufacture containment between otherwise-unrelated docs
    boiler = "copyright footer boilerplate"
    df = spark.createDataFrame(
        [(i, f"unique words {i} alpha{i} beta{i} " + boiler) for i in range(1, 6)],
        "doc_id int, text string",
    )
    sh = word_shingles(df, "doc_id", "text", 3)
    capped = containment_pairs(sh, min_containment=0.5, max_df=2)
    assert capped.count() == 0
