"""Session-14 operators: KMV theta-sketch set algebra, one-permutation
MinHash with densification, one-pass LSH dedup election, OPIC page
importance."""

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# KMV theta sketch
# ----------------------------------------------------------------------


def _kmv_frames(spark, items):
    """items: dict grp -> iterable of keys."""
    rows = [(g, k) for g, ks in items.items() for k in ks]
    return spark.createDataFrame(rows, ["grp", "key"])


def test_kmv_exact_below_k(spark):
    """Groups smaller than k produce EXACT set algebra (n_kept < k routes
    every estimate to the true counts)."""
    from spacetime_crawler4_spark.operators.sketch import (
        kmv_hashes,
        kmv_pair_setops,
        kmv_sketch,
    )

    a = {f"x{i}" for i in range(40)}
    b = {f"x{i}" for i in range(20, 60)}  # |A∪B|=60, |A∩B|=20
    df = _kmv_frames(spark, {"A": a, "B": b})
    sk = kmv_sketch(kmv_hashes(df, "grp", "key"), k=128)
    row = kmv_pair_setops(sk, k=128).collect()[0]
    assert row["n_kept"] == 60
    assert row["union_est"] == 60.0
    assert row["inter_est"] == 20.0
    assert abs(row["jaccard_est"] - round(20 / 60, 6)) < 1e-12


def test_kmv_estimator_accuracy(spark):
    """At n >> k the union estimate lands within ~3 standard errors
    (se ≈ U/sqrt(k-2)) and the Jaccard estimate within 3*sqrt(J(1-J)/k)."""
    from spacetime_crawler4_spark.operators.sketch import (
        kmv_hashes,
        kmv_pair_setops,
        kmv_sketch,
    )

    n, overlap = 5000, 2500
    a = {f"k{i}" for i in range(n)}
    b = {f"k{i}" for i in range(n - overlap, 2 * n - overlap)}
    union, inter = len(a | b), len(a & b)
    df = _kmv_frames(spark, {"A": a, "B": b})
    k = 128
    row = kmv_pair_setops(kmv_sketch(kmv_hashes(df, "grp", "key"), k), k).collect()[0]
    se_u = union / (k - 2) ** 0.5
    assert abs(row["union_est"] - union) < 3 * se_u
    j = inter / union
    se_j = (j * (1 - j) / k) ** 0.5
    assert abs(row["jaccard_est"] - j) < 3 * se_j


def test_kmv_sketch_merge_lossless(spark):
    """Merging two shard sketches (union + re-rank) equals sketching the
    concatenated shards — the property that lets 100-TB shards keep
    per-shard sketch state and still answer global overlap."""
    from spacetime_crawler4_spark.operators.sketch import kmv_hashes, kmv_sketch

    s1 = {f"a{i}" for i in range(700)}
    s2 = {f"b{i}" for i in range(700)}
    k = 64
    d1 = _kmv_frames(spark, {"G": s1})
    d2 = _kmv_frames(spark, {"G": s2})
    dall = _kmv_frames(spark, {"G": s1 | s2})
    sk1 = kmv_sketch(kmv_hashes(d1, "grp", "key"), k)
    sk2 = kmv_sketch(kmv_hashes(d2, "grp", "key"), k)
    merged = kmv_sketch(sk1.unionByName(sk2).distinct(), k)
    direct = kmv_sketch(kmv_hashes(dall, "grp", "key"), k)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_pair_partition_invariance(spark):
    """Estimates are independent of input partitioning (selection is by
    integer hash order, never by physical row order)."""
    from spacetime_crawler4_spark.operators.sketch import (
        kmv_hashes,
        kmv_pair_setops,
        kmv_sketch,
    )

    items = {
        "A": {f"k{i}" for i in range(1500)},
        "B": {f"k{i}" for i in range(800, 2300)},
    }
    df1 = _kmv_frames(spark, items).repartition(1)
    df2 = _kmv_frames(spark, items).repartition(32)
    r1 = kmv_pair_setops(kmv_sketch(kmv_hashes(df1, "grp", "key"))).collect()
    r2 = kmv_pair_setops(kmv_sketch(kmv_hashes(df2, "grp", "key"))).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
