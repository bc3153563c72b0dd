"""Recrawl-scheduling operator (operators/freshness.py): the Cho–
Garcia-Molina estimator against hand-computed values, finiteness at the
all-changed boundary (the paper's +0.5 correction), and determinism of
the synthetic fetch log the oracle re-derives."""

import collections
import math

from pyspark.sql import Row

from spacetime_crawler4_spark.operators.freshness import (
    change_rate,
    synthetic_fetch_log,
)


def test_estimator_hand_values(spark):
    # n=4 observations at tau=2 days, X=1 change
    rows = [
        Row(id=1, tau_days=2, obs_idx=i, changed=c)
        for i, c in enumerate([1, 0, 0, 0], start=1)
    ]
    out = change_rate(spark.createDataFrame(rows), horizon_days=7.0).collect()[0]
    lam = -math.log((4 - 1 + 0.5) / (4 + 0.5)) / 2
    assert out.n_obs == 4
    assert out.n_changed == 1
    assert out.lambda_day == round(lam, 6)
    assert out.p_stale == round(1.0 - math.exp(-lam * 7.0), 6)


def test_all_changed_stays_finite(spark):
    # X == n would send the naive -ln(1 - X/n) to infinity; the +0.5
    # correction keeps it finite.
    rows = [Row(id=1, tau_days=1, obs_idx=i, changed=1) for i in (1, 2, 3)]
    out = change_rate(spark.createDataFrame(rows)).collect()[0]
    lam = -math.log(0.5 / 3.5)
    assert out.lambda_day == round(lam, 6)
    assert 0.0 < out.p_stale < 1.0


def test_never_changed_rate_positive_but_tiny(spark):
    rows = [Row(id=1, tau_days=3, obs_idx=i, changed=0) for i in (1, 2)]
    out = change_rate(spark.createDataFrame(rows)).collect()[0]
    lam = -math.log(2.5 / 2.5) / 3  # exactly 0
    assert out.lambda_day == round(lam, 6) == 0.0
    assert out.p_stale == 0.0


def test_synthetic_log_deterministic_and_bounded(spark):
    docs = spark.range(50).withColumnRenamed("id", "doc_id")
    log1 = [tuple(r) for r in synthetic_fetch_log(docs).collect()]
    log2 = [tuple(r) for r in synthetic_fetch_log(docs).collect()]
    assert sorted(log1) == sorted(log2)

    per = collections.Counter(r[0] for r in log1)
    assert set(per) == set(range(50))
    assert all(3 <= n <= 7 for n in per.values())
    assert all(1 <= r[1] <= 7 for r in log1)  # tau_days bounds
    assert all(r[3] in (0, 1) for r in log1)  # changed is a flag
