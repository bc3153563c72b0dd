"""Portable HLL: accuracy envelope, merge-by-max property, plan shape."""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.sketch import (
    HLL_HEX_CHARS,
    hll_estimate,
    hll_register_expr,
)


def test_hll_accuracy_envelope(spark):
    # m=256 -> standard error 1.04/sqrt(256) = 6.5%; assert within 4 SE
    for n in (100, 2_000, 50_000):
        df = spark.range(n).select(F.col("id").cast("string").alias("k"))
        est = hll_estimate(df, "k").collect()[0].hll_estimate
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_registers_merge_by_max(spark):
    # sketch(A ∪ B) == per-bucket max of sketch(A), sketch(B) — the
    # property that makes per-partition sketches union for free
    a = spark.range(0, 3_000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2_000, 6_000).select(F.col("id").cast("string").alias("k"))

    def regs(df):
        bucket, rho = hll_register_expr(F.col("k"))
        return {
            r.bucket: r.r
            for r in df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("r"))
            .collect()
        }

    ra, rb, ru = regs(a), regs(b), regs(a.unionByName(b))
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru


def test_hll_duplicates_do_not_move_estimate(spark):
    df = spark.range(1_000).select(F.col("id").cast("string").alias("k"))
    dup = df.unionByName(df).unionByName(df)
    e1 = hll_estimate(df, "k").collect()[0].hll_estimate
    e3 = hll_estimate(dup, "k").collect()[0].hll_estimate
    assert e1 == e3


def test_hll_plan_single_register_shuffle(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    plan = (
        hll_estimate(df, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash shuffle on bucket (plus the final single-partition fold);
    # map-side partial max must be present, no Python anywhere
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan
    assert 16 ** HLL_HEX_CHARS == 256
