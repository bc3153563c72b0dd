"""As-of join: inclusive semantics, null-before-first, one-shuffle plan."""

from datetime import datetime

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:10"), "r10"),
            (1, _ts("2024-01-01T00:00:20"), "r20"),
            (2, _ts("2024-01-01T00:00:15"), "s15"),
        ],
        "k long, ts timestamp, tag string",
    )
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:05")),   # before first right -> NULL
            (1, _ts("2024-01-01T00:00:10")),   # equal ts -> inclusive match
            (1, _ts("2024-01-01T00:00:19")),   # between -> r10
            (1, _ts("2024-01-01T00:00:25")),   # after last -> r20
            (2, _ts("2024-01-01T00:00:16")),   # other key isolated -> s15
            (3, _ts("2024-01-01T00:00:30")),   # key with no right rows
        ],
        "k long, ts timestamp",
    )
    out = asof_join(left, right, "k", "ts", right_payload=["tag"])
    got = {
        (r.k, r.ts.isoformat()): (r.asof.tag if r.asof else None)
        for r in out.collect()
    }
    assert got[(1, "2024-01-01T00:00:05")] is None
    assert got[(1, "2024-01-01T00:00:10")] == "r10"
    assert got[(1, "2024-01-01T00:00:19")] == "r10"
    assert got[(1, "2024-01-01T00:00:25")] == "r20"
    assert got[(2, "2024-01-01T00:00:16")] == "s15"
    assert got[(3, "2024-01-01T00:00:30")] is None


def test_asof_preserves_left_rowcount_and_columns(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(clicks, views, "user_id", "ts", ["event_id", "value"],
                    seq_col="event_id")
    assert out.count() == clicks.count()
    assert out.columns == ["event_id", "user_id", "ts", "asof"]


def test_asof_plan_is_single_shuffle(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    plan = (
        asof_join(clicks, views, "user_id", "ts", ["event_id"], "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Exchange (hashpartitioning on the key), no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_asof_rejects_colliding_left_columns(spark):
    """A left frame already holding an `asof` (or reserved temp) column
    must fail loudly up front, not produce a duplicate-name output
    (ADVICE r3)."""
    import pytest

    from spacetime_crawler4_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "x")], "k int, ts int, asof string")
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="asof"):
        asof_join(left, right, "k", "ts", ["v"])
    # renaming the output avoids the clash
    out = asof_join(left, right, "k", "ts", ["v"], out_col="prior")
    assert out.columns == ["k", "ts", "asof", "prior"]
    assert out.collect()[0]["prior"]["v"] == 1.0
