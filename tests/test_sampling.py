"""Deterministic-sampling invariants (operators/sampling.py).

The properties a 100 TB training pipeline relies on and ``df.sample()``
does not give: retry/run determinism, incremental nesting (a smaller rate
is a subset of a larger one under the same salt), salt decorrelation,
exhaustive+disjoint splits, and a map-only physical plan (no Exchange —
the sample must compose with parquet pruning, not cost a shuffle).
"""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.sampling import (
    HASH_BUCKETS,
    hash_sample,
    sample_bucket,
    stratified_sample,
    train_test_split,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_is_deterministic(spark):
    docs = _docs(spark)
    a = _ids(hash_sample(docs, "doc_id", 0.10, salt="s1"))
    b = _ids(hash_sample(docs, "doc_id", 0.10, salt="s1"))
    assert a == b and 0 < len(a) < docs.count()


def test_smaller_rate_nests_inside_larger(spark):
    # incremental pipelines rely on this: yesterday's 5% ⊆ today's 10%
    docs = _docs(spark)
    small = _ids(hash_sample(docs, "doc_id", 0.05, salt="s1"))
    large = _ids(hash_sample(docs, "doc_id", 0.10, salt="s1"))
    assert small <= large


def test_salt_decorrelates(spark):
    docs = _docs(spark)
    a = _ids(hash_sample(docs, "doc_id", 0.30, salt="s1"))
    b = _ids(hash_sample(docs, "doc_id", 0.30, salt="s2"))
    assert a != b  # independent draws, not nested aliases


def test_rate_is_realized(spark):
    # md5 buckets are uniform: 10% of 500 docs ± binomial noise (4σ ≈ 27)
    docs = _docs(spark)
    n = docs.count()
    kept = hash_sample(docs, "doc_id", 0.10, salt="s1").count()
    assert abs(kept - 0.10 * n) < 30


def test_bucket_range(spark):
    docs = _docs(spark)
    row = docs.select(
        F.min(sample_bucket(F.col("doc_id"))).alias("lo"),
        F.max(sample_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= row.lo and row.hi < HASH_BUCKETS


def test_stratified_rate_one_keeps_stratum_whole(spark):
    docs = _docs(spark)
    kept = stratified_sample(
        docs, "doc_id", "lang", {"zh": 1.0}, default_rate=0.0, salt="mix"
    )
    assert _ids(kept) == _ids(docs.filter(F.col("lang") == "zh"))


def test_split_disjoint_and_exhaustive(spark):
    docs = _docs(spark)
    split = train_test_split(docs, "doc_id", 0.2)
    tallies = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(tallies) == {"train", "test"}
    assert sum(tallies.values()) == docs.count()
    # stable across runs
    again = {r.split: r.n for r in train_test_split(docs, "doc_id", 0.2)
             .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert tallies == again


def test_sample_plan_is_map_only(spark):
    docs = _docs(spark)
    plan = (
        hash_sample(docs, "doc_id", 0.10, salt="s1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure filter: no shuffle at any scale
    assert "BatchEvalPython" not in plan  # JVM md5, no Python in the path


def test_sample_preserves_column_pruning(spark):
    df = hash_sample(_docs(spark), "doc_id", 0.10, salt="s1").select("doc_id", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in scan_schema  # the wide column still not read


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from spacetime_crawler4_spark.operators.sampling import (  # noqa: E402
    weighted_sample,
)


def test_weighted_sample_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], "id int, w double"
    )
    a = sorted(r.id for r in weighted_sample(df, "id", "w", 40).collect())
    b = sorted(r.id for r in weighted_sample(df.repartition(16), "id", "w", 40).collect())
    assert len(a) == 40
    assert a == b  # partitioning-invariant


def test_weighted_sample_favors_heavy_rows(spark):
    # two weight classes 10:1 — across many salts the heavy class must
    # dominate the sample (probability proportional to weight)
    rows = [(i, 10.0 if i < 100 else 1.0) for i in range(600)]
    df = spark.createDataFrame(rows, "id int, w double")
    heavy = 0
    total = 0
    for salt in ("s1", "s2", "s3"):
        got = weighted_sample(df, "id", "w", 60, salt=salt).collect()
        heavy += sum(1 for r in got if r.id < 100)
        total += len(got)
    # heavy ids are 1/6 of rows but 10/15 of total weight; expect far
    # more than the uniform share (10/60 per draw)
    assert heavy / total > 0.4, (heavy, total)


def test_weighted_sample_changes_with_salt(spark):
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(300)], "id int, w double"
    )
    a = {r.id for r in weighted_sample(df, "id", "w", 30, salt="a").collect()}
    b = {r.id for r in weighted_sample(df, "id", "w", 30, salt="b").collect()}
    assert a != b
