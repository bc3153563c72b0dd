"""Physical-plan quality gates: the optimizations we rely on at scale must
actually appear in the executed plans — pushdown, pruning, broadcast
strategy, Arrow (never row-wise) Python, whole-stage codegen."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    plan = _plan(df)
    scan_schema = plan.split("ReadSchema")[1][:200]
    assert "doc_id" in scan_schema and "lang" in scan_schema
    assert "text" not in scan_schema  # the wide column must not be read


def test_dim_joins_broadcast(spark):
    from spacetime_crawler4_spark.queries import q_tpch_region_revenue

    plan = _plan(q_tpch_region_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims must broadcast


def test_no_rowwise_python_in_any_query(spark):
    from spacetime_crawler4_spark.queries import registry

    for name, (fn, _sql) in registry().items():
        plan = _plan(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-wise Python"


def test_jvm_only_queries_have_no_python_at_all(spark):
    """The SQL-expressible analytics plane must run fully JVM-side."""
    from spacetime_crawler4_spark.queries import registry

    jvm_only = [
        "report_top50_words", "report_longest_doc", "tpch_pricing",
        "events_sessionize", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "ann_bruteforce", "text_quality", "text_fingerprint",
    ]
    reg = registry()
    for name in jvm_only:
        plan = _plan(reg[name][0](spark, SF))
        assert "EvalPython" not in plan, f"{name} unexpectedly invokes Python"


def test_whole_stage_codegen_active(spark):
    from spacetime_crawler4_spark.queries import q_tpch_pricing

    df = q_tpch_pricing(spark, SF)
    df.collect()  # AQE only finalizes codegen spans in the executed plan
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan and "isFinalPlan=true" in plan
    # and the aggregate must be two-phase (map-side partial)
    assert "partial_sum" in plan


def test_topk_uses_take_ordered(spark):
    """orderBy().limit() must plan as TakeOrderedAndProject, not a full
    global sort (SURVEY.md §2.5 W1)."""
    from spacetime_crawler4_spark.queries import q_report_top50_words

    assert "TakeOrderedAndProject" in _plan(q_report_top50_words(spark, SF))


def test_ivf_assign_has_no_exchange(spark):
    """Nearest-centroid assignment must be a pure per-row projection over
    the scan — the codebook is inlined, so there is NO shuffle of the
    embedding vectors (round-1 shuffled every vector through a
    groupBy(vec_id); at 100 TB of vectors that shuffle is the whole job)."""
    from spacetime_crawler4_spark.operators.similarity import ivf_assign
    from spacetime_crawler4_spark.queries import _centroids_df

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(ivf_assign(emb, _centroids_df(spark, emb)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_pq_encode_has_no_exchange(spark):
    """PQ encode must also be a pure per-row projection (inline
    sub-codebooks): no shuffle, no Python — the whole corpus compresses
    inside the scan stage."""
    from spacetime_crawler4_spark.operators.pq import pq_encode
    from spacetime_crawler4_spark.queries import _pq_codebooks

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(pq_encode(emb, _pq_codebooks(spark, emb)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
