"""k-means|| seeding (operators/similarity.kmeans_parallel_init).

The operator's contract is engine-portable determinism: the candidate
set is a pure function of (ids, vectors, l, rounds, salt) — no RNG
state, no partition-order dependence — because every keep/drop decision
routes through md5-uniform draws against scaled-integer distances. The
DuckDB twin (oracle ann_kmeanspp_init, tests/test_oracle_parity.py)
checks cross-engine equality; these tests pin the algebraic invariants.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.similarity import (
    kmeans_parallel_init,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 vectors in 4 well-separated blobs of 10 (deterministic lattice)
    rows = []
    for i in range(40):
        blob = i % 4
        base = [100.0 * blob, -50.0 * blob, 7.0 * blob, 0.0]
        jit = [((i * 13 + d * 7) % 11) * 0.25 for d in range(4)]
        rows.append((i, [b + j for b, j in zip(base, jit)]))
    return _emb(spark, rows)


def test_first_center_is_min_md5_id(spark, corpus):
    out = kmeans_parallel_init(corpus, l=4, rounds=2).collect()
    seeds = [r for r in out if r.round_added == 0]
    assert len(seeds) == 1
    ids = [r.vec_id for r in corpus.select("vec_id").collect()]
    expect = min(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert seeds[0].center_id == expect


def test_weights_partition_the_corpus(spark, corpus):
    out = kmeans_parallel_init(corpus, l=4, rounds=2).collect()
    n = corpus.count()
    assert sum(r.weight for r in out) == n
    assert all(r.weight >= 0 for r in out)
    assert all(r.round_added in (0, 1, 2) for r in out)
    # every center captures itself unless an identical twin with a lower
    # id exists (none in this lattice corpus)
    assert all(r.weight >= 1 for r in out)


def test_partition_order_invariance(spark, corpus):
    a = kmeans_parallel_init(corpus, l=4, rounds=2).collect()
    b = kmeans_parallel_init(corpus.repartition(7, "vec_id"), l=4, rounds=2).collect()
    c = kmeans_parallel_init(corpus.coalesce(1), l=4, rounds=2).collect()
    key = lambda rows: [(r.center_id, r.round_added, r.weight) for r in rows]
    assert key(a) == key(b) == key(c)


def test_exact_duplicates_of_a_center_never_sampled(spark):
    # every vector identical: d2 == 0 everywhere after the seed, so phi
    # is 0 and the loop stops with the single seed center owning all mass
    dup = _emb(spark, [(i, [1.0, 2.0, 3.0]) for i in range(10)])
    out = kmeans_parallel_init(dup, l=8, rounds=3).collect()
    assert len(out) == 1
    assert out[0].round_added == 0
    assert out[0].weight == 10


def test_oversampling_scales_with_l(spark, corpus):
    small = kmeans_parallel_init(corpus, l=2, rounds=2).collect()
    big = kmeans_parallel_init(corpus, l=16, rounds=2).collect()
    # expectation per round is l; with md5-uniform draws the realized
    # counts differ but the ordering must hold at this separation
    assert len(big) > len(small)


def test_salt_changes_the_draw_but_not_the_seed(spark, corpus):
    a = kmeans_parallel_init(corpus, l=4, rounds=2, salt="kmpp").collect()
    b = kmeans_parallel_init(corpus, l=4, rounds=2, salt="other").collect()
    seed_a = [r.center_id for r in a if r.round_added == 0]
    seed_b = [r.center_id for r in b if r.round_added == 0]
    assert seed_a == seed_b  # the seed pick is salt-free (min-md5 id)
