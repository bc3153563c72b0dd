"""PageRank: differential vs a pure-python power iteration, invariants."""

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.graph import pagerank


def _py_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        acc = {v: 0.0 for v in nodes}
        for s, t in edges:
            acc[t] += r[s] / out[s]
        r = {
            v: (1.0 - d) / n + d * (acc[v] + dang / n) for v in nodes
        }
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "a"), ("e", "c"),
    # f is dangling (appears only as a destination)
    ("a", "f"), ("b", "f"),
]


def test_pagerank_matches_pure_python(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.id: r.rank for r in pagerank(df, iterations=5).collect()}
    want = _py_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_pagerank_mass_conserved_and_dangling_flows(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = pagerank(df, iterations=8).collect()
    total = sum(r.rank for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    ranks = {r.id: r.rank for r in rows}
    # ranking order matches the reference implementation; the dangling
    # node keeps a nonzero rank strictly above the never-linked floor
    want = _py_pagerank(EDGES, iters=8)
    assert sorted(ranks, key=ranks.get) == sorted(want, key=want.get)
    assert ranks["f"] > (1 - 0.85) / len(ranks)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.graph import hits  # noqa: E402


def _py_hits(edges, iters=5):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    a = {v: 1.0 / n for v in nodes}
    h = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        hr = {v: 0.0 for v in nodes}
        for s, t in edges:
            hr[s] += a[t]
        tot = sum(hr.values())
        h = {v: hr[v] / tot for v in nodes}
        ar = {v: 0.0 for v in nodes}
        for s, t in edges:
            ar[t] += h[s]
        tot = sum(ar.values())
        a = {v: ar[v] / tot for v in nodes}
    return h, a


def test_hits_matches_pure_python(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = hits(df, iterations=5).collect()
    wh, wa = _py_hits(EDGES)
    assert {r.id for r in rows} == set(wh)
    for r in rows:
        assert r.hub == pytest.approx(wh[r.id], abs=1e-12), ("hub", r.id)
        assert r.authority == pytest.approx(wa[r.id], abs=1e-12), ("auth", r.id)


def test_hits_l1_normalized_and_sink_source_zeroes(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = hits(df, iterations=7).collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.authority for r in rows) == pytest.approx(1.0, abs=1e-9)
    by = {r.id: r for r in rows}
    # f has no out-edges -> zero hub; d and e are never linked-to -> zero
    # authority
    assert by["f"].hub == 0.0
    assert by["d"].authority == 0.0 and by["e"].authority == 0.0


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

from spacetime_crawler4_spark.operators.graph import triangle_count  # noqa: E402


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; edges given in mixed direction with a duplicate
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("b", "d"), ("d", "c"),
        ("b", "a"),  # reverse duplicate must not double-count
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_count(df).collect()[0].n_triangles == 4


def test_triangle_count_triangle_free(spark):
    # a bipartite (star) graph has none
    edges = [("hub", f"leaf{i}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_count(df).collect()[0].n_triangles == 0


def test_triangle_count_self_loops_ignored(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_count(df).collect()[0].n_triangles == 1
