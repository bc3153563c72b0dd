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


# ---------------------------------------------------------------------------
# TrustRank + spam mass
# ---------------------------------------------------------------------------


def _py_trustrank(edges, seeds, iters=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    seeds = sorted(set(seeds) & set(nodes))
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    sv = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    r = dict(sv)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        acc = {v: 0.0 for v in nodes}
        for s, t in edges:
            acc[t] += r[s] / out[s]
        r = {v: (1.0 - d) * sv[v] + d * (acc[v] + dang * sv[v]) for v in nodes}
    return r


# seed cluster a/b/c plus a disconnected "spam farm" x/y/z that links
# only within itself — reachable by PageRank's uniform teleport, never
# by seed-biased trust
TRUST_EDGES = EDGES + [("x", "y"), ("y", "z"), ("z", "x")]


def test_trustrank_matches_pure_python(spark):
    from spacetime_crawler4_spark.operators.graph import trustrank

    df = spark.createDataFrame(TRUST_EDGES, "src string, dst string")
    sd = spark.createDataFrame([("a",), ("e",)], "id string")
    got = {r.id: r.trust for r in trustrank(df, sd, iterations=5).collect()}
    want = _py_trustrank(TRUST_EDGES, ["a", "e"])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_trustrank_spam_farm_gets_zero_trust_full_mass(spark):
    from spacetime_crawler4_spark.operators.graph import (
        pagerank,
        spam_mass,
        trustrank,
    )

    df = spark.createDataFrame(TRUST_EDGES, "src string, dst string")
    sd = spark.createDataFrame([("a",)], "id string")
    tr = trustrank(df, sd, iterations=6)
    rows = {r.id: r.trust for r in tr.collect()}
    # trust is conserved (dangling mass re-enters via seeds) ...
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    # ... and never reaches the disconnected farm
    for v in ("x", "y", "z"):
        assert rows[v] == 0.0
    m = {
        r.id: r.spam_mass
        for r in spam_mass(pagerank(df, iterations=6), tr).collect()
    }
    for v in ("x", "y", "z"):
        assert m[v] == pytest.approx(1.0, abs=1e-12)  # all rank untrusted
    assert m["a"] < 0.5  # the seed's rank is trust-backed


def test_trustrank_unknown_seeds_ignored_and_empty_raises(spark):
    from spacetime_crawler4_spark.operators.graph import trustrank

    df = spark.createDataFrame(TRUST_EDGES, "src string, dst string")
    both = spark.createDataFrame([("a",), ("nope",)], "id string")
    only_a = spark.createDataFrame([("a",)], "id string")
    got = {r.id: r.trust for r in trustrank(df, both, iterations=3).collect()}
    want = {
        r.id: r.trust for r in trustrank(df, only_a, iterations=3).collect()
    }
    assert got == want  # the absent seed contributes nothing
    with pytest.raises(ValueError, match="no seed"):
        trustrank(df, spark.createDataFrame([("ghost",)], "id string"))


def test_pagerank_and_trustrank_randomized_differential(spark):
    """Seeded random digraphs (with danglers, self-loops excluded by
    construction, parallel edges deduped by the caller contract) — the
    Spark operators must match the pure-python power iterations to
    1e-10 on every node."""
    import random

    from spacetime_crawler4_spark.operators.graph import pagerank, trustrank

    rng = random.Random(99)
    for trial in range(4):
        n = rng.randint(5, 14)
        nodes = [f"n{i}" for i in range(n)]
        edges = sorted(
            {
                (a, b)
                for a in nodes
                for b in rng.sample(nodes, rng.randint(0, 3))
                if a != b
            }
        )
        if not edges:
            continue
        seeds = rng.sample(sorted({u for e in edges for u in e}), 2)
        df = spark.createDataFrame(edges, "src string, dst string")
        got_pr = {r.id: r.rank for r in pagerank(df, iterations=4).collect()}
        want_pr = _py_pagerank(edges, iters=4)
        got_tr = {
            r.id: r.trust
            for r in trustrank(
                df,
                spark.createDataFrame([(s,) for s in seeds], "id string"),
                iterations=4,
            ).collect()
        }
        want_tr = _py_trustrank(edges, seeds, iters=4)
        assert set(got_pr) == set(want_pr) and set(got_tr) == set(want_tr)
        for v in want_pr:
            assert got_pr[v] == pytest.approx(want_pr[v], abs=1e-10), (trial, v)
            assert got_tr[v] == pytest.approx(want_tr[v], abs=1e-10), (trial, v)
