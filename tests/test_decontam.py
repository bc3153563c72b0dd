"""Decontamination + incremental dedup: behavioral contracts and the
broadcast/plan guarantees the 100 TB cost model depends on."""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.decontam import (
    decontaminate,
    incremental_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontam_flags_known_overlap(spark):
    # corpus doc 1 shares an exact 5-gram run with bench doc 100 twice
    # (two distinct overlapping grams); doc 2 shares nothing.
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta unrelated tail"),
            (2, "one two three four five six seven"),
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    out = {
        r.id: r
        for r in decontaminate(
            corpus, bench, "doc_id", "text", n=5, min_hits=2
        ).collect()
    }
    assert out[1].contaminated and out[1].n_hit == 2
    assert not out[2].contaminated and out[2].n_hit == 0
    assert out[2].n_grams == 3  # 7 words -> 3 distinct 5-grams


def test_decontam_probe_is_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    plan = (
        decontaminate(corpus, bench, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_drop_and_keep(spark):
    base = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different base content about spark and shuffles"),
        ],
    )
    batch = _docs(
        spark,
        [
            # exact copy of base doc 1 -> jaccard 1.0, dropped
            (10, "the quick brown fox jumps over the lazy dog again today"),
            # novel -> kept
            (11, "nothing here resembles anything in the existing corpus set"),
        ],
    )
    out = {
        r.batch_id: r
        for r in incremental_dedup(
            base, batch, "doc_id", "text", min_jaccard=0.5
        ).collect()
    }
    assert not out[10].keep and out[10].dup_of == 1 and out[10].jaccard == 1.0
    assert out[11].keep and out[11].dup_of is None and out[11].jaccard is None


def test_incremental_best_match_is_highest_jaccard_lowest_id(spark):
    # batch doc matches base 1 exactly and base 2 partially -> dup_of = 1
    base = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h zz yy"),
        ],
    )
    batch = _docs(spark, [(10, "a b c d e f g h i j")])
    row = incremental_dedup(
        base, batch, "doc_id", "text", min_jaccard=0.3
    ).collect()[0]
    assert row.dup_of == 1 and row.jaccard == 1.0 and not row.keep


def test_incremental_never_self_joins_base(spark):
    # plan-level: candidates come from ONE join between two band sides;
    # the base side must appear once, so near-dup pairs *inside* the base
    # never surface (base docs 1/2 are near-dups of each other here).
    base = _docs(
        spark,
        [
            (1, "x y z w v u t s r q"),
            (2, "x y z w v u t s r qq"),
        ],
    )
    batch = _docs(spark, [(10, "totally fresh words only here now ok")])
    rows = incremental_dedup(base, batch, "doc_id", "text").collect()
    assert [r.batch_id for r in rows] == [10]
    assert rows[0].keep
