"""Bucketed co-located join: the shuffle-elimination evidence behind the
Iceberg scale story (crawl/iceberg.py documents `bucket(N, urlhash)`
partition specs; this test proves the Spark runtime actually exploits
them).

At 10^10 frontier rows the frontier⋈fetch-result join is the crawl
loop's recurring cost. Persisting both sides bucketed on the join key
means every wave's join reads co-located buckets and skips the shuffle
entirely — the plan must contain ZERO Exchange on the bucketed columns,
vs the plain-parquet twin whose SortMergeJoin shuffles both sides.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    n = 5_000
    frontier = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("urlhash"),
        (F.col("id") % 97).alias("domain_id"),
        F.lit(1).alias("status"),
    )
    fetched = spark.range(0, n, 2).select(
        F.md5(F.col("id").cast("string")).alias("urlhash"),
        (F.col("id") * 31 % 1000).alias("n_words"),
    )
    spark.sql("DROP TABLE IF EXISTS t_frontier_b")
    spark.sql("DROP TABLE IF EXISTS t_fetched_b")
    (
        frontier.write.bucketBy(8, "urlhash")
        .sortBy("urlhash")
        .format("parquet")
        .saveAsTable("t_frontier_b")
    )
    (
        fetched.write.bucketBy(8, "urlhash")
        .sortBy("urlhash")
        .format("parquet")
        .saveAsTable("t_fetched_b")
    )
    yield "t_frontier_b", "t_fetched_b"
    spark.sql("DROP TABLE IF EXISTS t_frontier_b")
    spark.sql("DROP TABLE IF EXISTS t_fetched_b")


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the real join strategy is visible
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_runs_shuffle_free(spark, bucketed_tables):
    ft, fe = bucketed_tables
    # SMJ between same-bucketing tables; keep broadcast out of the way so
    # the strategy under test is the bucket co-location itself
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        joined = (
            spark.table(ft)
            .join(spark.table(fe), "urlhash")
            .select("urlhash", "domain_id", "n_words")
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must not shuffle either side:\n" + plan
        )
        # the per-bucket files are pre-sorted, so the SMJ needs no Sort
        assert joined.count() == 2_500
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_unbucketed_twin_shuffles_both_sides(spark, bucketed_tables, tmp_path):
    ft, fe = bucketed_tables
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    spark.table(ft).write.parquet(a_path)
    spark.table(fe).write.parquet(b_path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.read.parquet(a_path)
            .join(spark.read.parquet(b_path), "urlhash")
            .select("urlhash", "domain_id", "n_words")
        )
        plan = _executed_plan(joined)
        assert "Exchange hashpartitioning(urlhash" in plan, (
            "control: the plain-parquet twin is expected to shuffle:\n" + plan
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_aggregate_skips_the_shuffle_too(spark, bucketed_tables):
    """groupBy on the bucketing key reuses the table's distribution —
    the second shuffle-elimination bucketing buys (per-key dedup,
    per-url latest-state election at the store layer)."""
    ft, _ = bucketed_tables
    agg = spark.table(ft).groupBy("urlhash").agg(F.count("*").alias("n"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
