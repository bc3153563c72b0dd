"""Portable HLL: accuracy envelope, merge-by-max property, plan shape."""

import math

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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.sketch import (  # noqa: E402
    CMS_DEPTH,
    CMS_WIDTH,
    cms_point_estimates,
    cms_registers,
)


def _zipf_stream(spark, n=20_000, keys=400):
    # deterministic skewed stream: key k appears ~ n/(k+1) times
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("k"),
                F.floor(
                    F.pow(F.lit(float(keys)), F.col("id") / F.lit(float(n)))
                ).cast("int").cast("string"),
            ).alias("k")
        )
    )


def test_cms_never_underestimates(spark):
    df = _zipf_stream(spark)
    regs = cms_registers(df, "k")
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    est = cms_point_estimates(regs, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert joined, "empty join"
    assert all(r.cms_estimate >= r.n for r in joined)


def test_cms_row_sums_equal_stream_weight(spark):
    df = _zipf_stream(spark, n=5_000)
    total = df.count()
    rows = (
        cms_registers(df, "k")
        .groupBy("row")
        .agg(F.sum("c").alias("s"))
        .collect()
    )
    assert len(rows) == CMS_DEPTH
    assert all(r.s == total for r in rows)


def test_cms_heavy_hitters_near_exact(spark):
    # with 400 keys into 1024 buckets x 3 rows, the top keys' estimates
    # should be exact or within the e/w bound on this stream
    df = _zipf_stream(spark)
    total = df.count()
    regs = cms_registers(df, "k")
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    top = exact.orderBy(F.desc("n")).limit(10)
    est = cms_point_estimates(regs, top.select("k"), "k")
    bound = math.e / CMS_WIDTH * total  # CM guarantee at eps = e/w
    for r in top.join(est, "k").collect():
        assert r.cms_estimate - r.n <= bound


def test_cms_plan_one_shuffle_broadcast_probe(spark):
    df = _zipf_stream(spark, n=2_000)
    regs = cms_registers(df, "k")
    cand = df.distinct().limit(5)
    plan = (
        cms_point_estimates(regs, cand, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_hll_empty_input_estimates_zero(spark):
    """Empty input: zero registers -> linear counting -> exactly 0, not
    NULL (ADVICE r3: NULL sum over zero rows poisoned rel_err math)."""
    from spacetime_crawler4_spark.operators.sketch import hll_estimate

    empty = spark.createDataFrame([], "k string")
    row = hll_estimate(empty, "k").collect()[0]
    assert row["hll_estimate"] == 0
