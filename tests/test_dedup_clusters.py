"""Connected-components dup clustering (operators/dedup.connected_components).

Differential vs a pure-Python union-find on random graphs, plus the
adversarial shape that motivates pointer jumping: a long path graph must
converge in O(log n) rounds, not O(n).
"""

import random

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import (
    connected_components,
    dup_cluster_stats,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    touched = {v for e in edges for v in e}
    for v in touched:
        out[v] = find(v)
    return out


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 40))
            }
        )
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long"
        )
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(pairs).collect()
        }
        want = set(_uf_components(n, edges).items())
        assert got == want, f"trial {trial}: {sorted(got ^ want)[:5]}"


def test_path_graph_converges_logarithmically(spark):
    # a 256-node path is the worst case for plain label propagation
    # (O(n) rounds); pointer jumping must collapse it in ~log2(n) rounds.
    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = connected_components(pairs, max_rounds=12)
    rows = comp.collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {0}


def test_cluster_stats(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    stats = {
        (r["cluster_id"], r["n_members"], r["n_dropped"])
        for r in dup_cluster_stats(connected_components(pairs)).collect()
    }
    assert stats == {(1, 3, 2), (10, 2, 1), (20, 4, 3)}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
