"""Session-13 operators: Misra-Gries heavy hitters, label propagation,
mojibake detect/repair, deterministic logistic regression, sliding windows."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# Misra-Gries
# ----------------------------------------------------------------------


def test_mg_heavy_hitters_exact_vs_groupby(spark):
    """On a zipf-ish stream split over many partitions with aggressive
    per-partition pruning (k=5, 60 distinct keys), the MG two-pass result
    equals the exact >n/k answer."""
    from spacetime_crawler4_spark.operators.sketch import mg_heavy_hitters

    rows = []
    for i in range(60):
        rows += [(f"k{i:02d}",)] * (1 if i >= 5 else 400 - 70 * i)
    df = spark.createDataFrame(rows, ["key"]).repartition(16)
    k = 5
    got = {
        (r["key"], r["n_exact"], r["n_total"])
        for r in mg_heavy_hitters(df, "key", k).collect()
    }
    n = len(rows)
    exact = {
        (r["key"], r["cnt"], n)
        for r in df.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }
    assert got == exact and len(exact) >= 2


def test_mg_candidates_bounded_and_guarantee(spark):
    """The candidate union is small (<= k+1 rows incl. sentinel per
    partition) and contains every key with count > n/k."""
    from spacetime_crawler4_spark.operators.sketch import mg_candidates

    rows = [("hot",)] * 5000 + [(f"c{i}", ) for i in range(2000)]
    df = spark.createDataFrame(rows, ["key"]).repartition(8)
    k = 4
    summ = mg_candidates(df, "key", k).collect()
    per_part_bound = 8 * (k + 1)
    assert len(summ) <= per_part_bound
    cand = {r["key"] for r in summ if r["key"] is not None}
    assert "hot" in cand  # 5000/7000 > 1/4
    n_total = sum(r["mg_count"] for r in summ if r["key"] is None)
    assert n_total == len(rows)


def test_mg_empty_input(spark):
    from spacetime_crawler4_spark.operators.sketch import mg_heavy_hitters

    df = spark.createDataFrame([], "key string")
    assert mg_heavy_hitters(df, "key", 3).collect() == []


# ----------------------------------------------------------------------
# label propagation
# ----------------------------------------------------------------------


def _lp(spark, edges, iters):
    from spacetime_crawler4_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["id"]: r["label"] for r in label_propagation(df, iters).collect()
    }


def test_label_propagation_converges_to_component_min(spark):
    edges = [("b", "c"), ("c", "d"), ("a", "b"), ("x", "y"), ("y", "z")]
    labels = _lp(spark, edges, 4)
    assert labels == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
    }


def test_label_propagation_intermediate_round_is_khop_min(spark):
    """After exactly 1 round each node holds the min id within 1 hop —
    the synchronous (Jacobi) semantics the oracle unrolls, not the
    order-dependent asynchronous variant."""
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    labels = _lp(spark, edges, 1)
    # d's 1-hop neighborhood is {c, d} -> 'c'; c's is {b,c,d} -> 'b'
    assert labels == {"a": "a", "b": "a", "c": "b", "d": "c"}


def test_label_propagation_parallel_edges_and_direction(spark):
    """Symmetrization + min make the result independent of edge
    direction and multiplicity."""
    e1 = [("n2", "n1"), ("n2", "n1"), ("n1", "n2"), ("n3", "n2")]
    e2 = [("n1", "n2"), ("n2", "n3")]
    assert _lp(spark, e1, 3) == _lp(spark, e2, 3)


# ----------------------------------------------------------------------
# mojibake
# ----------------------------------------------------------------------


def test_repair_roundtrip_and_passthrough(spark):
    from spacetime_crawler4_spark.operators.encoding import (
        MOJI_DAMAGED,
        MOJI_PHRASE,
        repair_mojibake_udf,
    )

    rows = [
        ("d1", "plain ascii stays"),          # no-op
        ("d2", f"prefix {MOJI_DAMAGED} suffix"),  # repaired
        ("d3", "Ãx broken not utf8"),         # roundtrip fails -> unchanged
        ("d4", "已经 outside cp1252"),          # encode fails -> unchanged
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r["id"]: r["f"]
        for r in df.select("id", repair_mojibake_udf(F.col("t")).alias("f")).collect()
    }
    assert got["d1"] == "plain ascii stays"
    assert got["d2"] == f"prefix {MOJI_PHRASE} suffix"
    assert got["d3"] == "Ãx broken not utf8"
    assert got["d4"] == "已经 outside cp1252"


def test_moji_audit_counts(spark):
    from spacetime_crawler4_spark.operators.encoding import (
        MOJI_PCT_BUCKETS,
        moji_audit,
    )
    from spacetime_crawler4_spark.operators.sampling import sample_bucket

    docs = spark.createDataFrame(
        [(i, "s", "clean ascii text " * 3) for i in range(400)],
        ["doc_id", "source", "text"],
    )
    out = moji_audit(docs).collect()
    assert len(out) == 1
    row = out[0]
    expected_injected = docs.filter(
        sample_bucket(F.col("doc_id"), "moji:") < MOJI_PCT_BUCKETS
    ).count()
    assert row["n_docs"] == 400
    assert row["n_injected"] == expected_injected > 0
    # detector fires on every injected doc and nothing else; repair is
    # byte-exact on all of them
    assert row["n_detected"] == expected_injected
    assert row["n_repaired_ok"] == expected_injected


# ----------------------------------------------------------------------
# logistic regression
# ----------------------------------------------------------------------


def _np_logreg(X, y, lrs, iters):
    n = len(y)
    A = np.hstack([np.ones((n, 1)), X.astype(float)])
    w = np.zeros(A.shape[1])
    for _ in range(iters):
        z = A @ w
        p6 = np.floor(1e6 / (1 + np.exp(-z)) + 0.5)
        g = A.T @ (p6 - 1e6 * y)
        w = w - np.array(lrs) * g / (n * 1e6)
    return w


def test_logreg_matches_numpy_reference(spark):
    from spacetime_crawler4_spark.operators.classify import logreg_train_gd

    rng = np.random.RandomState(7)
    X = rng.randint(-20, 21, size=(300, 2))
    y = (X[:, 0] + 2 * X[:, 1] + rng.randint(-5, 6, 300) > 0).astype(int)
    rows = [(int(a), int(b), int(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"]).repartition(8)
    lrs = [0.5, 0.01, 0.01]
    w, n = logreg_train_gd(df, ["x1", "x2"], "y", iterations=3, lr=lrs)
    ref = _np_logreg(X, y.astype(float), lrs, 3)
    assert n == 300
    # bit-level agreement is expected (identical integer gradients +
    # identical IEEE update arithmetic); allow 1e-12 for exp() ulps
    assert np.allclose(w, ref, rtol=0, atol=1e-12)
    # and the model actually separates this separable-ish data
    A = np.hstack([np.ones((300, 1)), X.astype(float)])
    assert (((A @ ref) >= 0) == y).mean() > 0.8


def test_logreg_partitioning_invariance(spark):
    from spacetime_crawler4_spark.operators.classify import logreg_train_gd

    rows = [(i % 13 - 6, (i * 7) % 9 - 4, (i * 3) % 2) for i in range(500)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    w1, _ = logreg_train_gd(df.repartition(1), ["x1", "x2"], "y", 2, 0.01)
    w32, _ = logreg_train_gd(df.repartition(32), ["x1", "x2"], "y", 2, 0.01)
    assert w1 == w32  # exact, not approximate


def test_logreg_empty_and_bad_lr(spark):
    from spacetime_crawler4_spark.operators.classify import logreg_train_gd

    empty = spark.createDataFrame([], "x1 long, y int")
    w, n = logreg_train_gd(empty, ["x1"], "y", 2, 0.1)
    assert (w, n) == ([0.0, 0.0], 0)
    df = spark.createDataFrame([(1, 1)], ["x1", "y"])
    with pytest.raises(ValueError):
        logreg_train_gd(df, ["x1"], "y", 1, [0.1, 0.1, 0.1])


# ----------------------------------------------------------------------
# sliding windows
# ----------------------------------------------------------------------


def test_sliding_window_membership(spark):
    """An event at 10:30 lands in exactly the 4 hourly-aligned 4h windows
    [07:00..11:00) .. [10:00..14:00)."""
    import datetime as dt

    ev = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 10, 30),)], ["ts"]
    )
    got = sorted(
        r["w"]["start"].hour
        for r in ev.groupBy(
            F.window("ts", "4 hours", "1 hour").alias("w")
        ).count().collect()
    )
    assert got == [7, 8, 9, 10]


# ----------------------------------------------------------------------
# grouped HLL
# ----------------------------------------------------------------------


def test_hll_estimate_by_matches_global_per_group(spark):
    """Each group's estimate equals the global hll_estimate run on that
    group alone — the register files are identical by construction."""
    from spacetime_crawler4_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_by,
    )

    rows = [("g1", f"k{i}") for i in range(1000)] + [
        ("g2", f"k{i % 40}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["g", "k"]).repartition(8)
    grouped = {
        r["g"]: r["hll_estimate"] for r in hll_estimate_by(df, "g", "k").collect()
    }
    for g in ("g1", "g2"):
        solo = hll_estimate(df.filter(F.col("g") == g), "k").collect()[0][
            "hll_estimate"
        ]
        assert grouped[g] == solo
    # small group is in the linear-counting regime and lands near-exact
    assert abs(grouped["g2"] - 40) <= 3


def test_hll_registers_merge_across_shards(spark):
    """Group-keyed registers union across shards: estimating over the
    full frame == estimating over two halves is guaranteed by max()
    associativity; check the by-group path is insensitive to shard
    boundaries."""
    from spacetime_crawler4_spark.operators.sketch import hll_estimate_by

    rows = [("g", f"k{i}") for i in range(800)]
    df = spark.createDataFrame(rows, ["g", "k"])
    whole = hll_estimate_by(df, "g", "k").collect()[0]["hll_estimate"]
    halves = df.filter(F.length("k") == 2).unionByName(
        df.filter(F.length("k") != 2)
    )
    assert hll_estimate_by(halves, "g", "k").collect()[0]["hll_estimate"] == whole


# ----------------------------------------------------------------------
# quantile audit
# ----------------------------------------------------------------------


def test_quantile_audit_guarantee_holds(spark, tmp_path):
    """The GK bound audit passes on a skewed synthetic documents table
    at several partition layouts (the sketch value may move between
    layouts — the guarantee must not)."""
    from spacetime_crawler4_spark.queries import q_sketch_quantile_audit

    rows = [(i, "t", "en", "s", (i * i) % 997 + 1) for i in range(3000)]
    for parts in (1, 7, 32):
        df = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).repartition(parts)
        df.write.mode("overwrite").parquet(f"{tmp_path}/p{parts}/documents.parquet")
        out = q_sketch_quantile_audit(spark, f"{tmp_path}/p{parts}").collect()
        assert len(out) == 5
        assert all(r["approx_within_bound"] for r in out)
        assert all(r["n"] == 3000 for r in out)


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """The same F.window(ts, '4 hours', '1 hour') aggregation over a file
    STREAM (availableNow, complete mode) produces exactly the batch
    query's windows — the claim behind calling events_sliding_window the
    batch twin of the streaming watermark aggregation. (count(distinct)
    is not streamable, so the twin compares counts and sums.)"""
    import datetime as dt

    rows = [
        (i, dt.datetime(2025, 3, 1) + dt.timedelta(minutes=17 * i), i % 7, float(i % 5))
        for i in range(300)
    ]
    src = tmp_path / "ev"
    spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"]).write.parquet(
        str(src)
    )
    win = F.window("ts", "4 hours", "1 hour").alias("w")
    agg = lambda df: (  # noqa: E731
        df.groupBy(win)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .select(F.col("w.start").alias("ws"), "n", "sv")
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(str(src))
    q = (
        agg(stream)
        .writeStream.format("memory")
        .queryName("slide_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["ws"]: (r["n"], r["sv"])
        for r in spark.sql("select * from slide_stream").collect()
    }
    exp = {
        r["ws"]: (r["n"], r["sv"])
        for r in agg(spark.read.parquet(str(src))).collect()
    }
    assert got == exp and len(exp) > 20


def test_label_propagation_agrees_with_pointer_jumping_cc(spark):
    """At convergence (iterations >= diameter) synchronous min-label
    propagation and the pointer-jumping connected_components operator
    assign identical component minima on a randomized multi-component
    graph — two independently-implemented algorithms, one answer."""
    import random

    from spacetime_crawler4_spark.operators.dedup import connected_components
    from spacetime_crawler4_spark.operators.graph import label_propagation

    rng = random.Random(13)
    edges = []
    for comp in range(6):  # 6 islands of ring+chords, ids interleaved
        ids = [f"v{comp + 6 * i:03d}" for i in range(rng.randint(3, 12))]
        edges += list(zip(ids, ids[1:]))
        for _ in range(3):
            edges.append((rng.choice(ids), rng.choice(ids)))
    df = spark.createDataFrame(edges, ["src", "dst"])
    lp = {
        r["id"]: r["label"]
        for r in label_propagation(df, iterations=14).collect()
    }
    cc = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        ).collect()
    }
    # cc drops self-loop-only singletons; lp keeps every node seen in sym
    assert {k: v for k, v in lp.items() if k in cc} == cc


def test_repair_mojibake_idempotent_and_total(spark):
    """Fuzz the repairer over adversarial unicode: it never throws, and
    applying it twice equals applying it once on pure-mojibake inputs
    (the repaired text no longer round-trips through cp1252 as UTF-8,
    or is a fixed point)."""
    import random

    from spacetime_crawler4_spark.operators.encoding import repair_mojibake_udf

    rng = random.Random(99)
    atoms = [
        "plain", "Ã©", "â€”", "Ã", " ", "€", "已", "\x7f", "é",
        "ÃÃÃ", "â‚¬", "ï»¿", "a" * 50, "Ã¼ber", "ðŸ˜€",
    ]
    docs = [
        ("".join(rng.choice(atoms) for _ in range(rng.randint(1, 8))),)
        for _ in range(300)
    ]
    df = spark.createDataFrame(docs, ["t"])
    once = df.select(repair_mojibake_udf(F.col("t")).alias("r1"))
    twice = once.select(
        "r1", repair_mojibake_udf(F.col("r1")).alias("r2")
    ).collect()
    assert len(twice) == 300  # no UDF crash across all rows
    # double-application may legitimately decode twice-encoded text
    # further, but must itself never fail and never produce NULL
    assert all(r["r2"] is not None for r in twice)


def test_hll_register_state_roundtrip_and_merge(spark, tmp_path):
    """The incremental-cardinality pattern end to end: batch A's
    registers persist to parquet, batch B's registers merge in WITHOUT
    re-reading batch A's raw rows, and the merged estimate is identical
    to a from-scratch build over A ∪ B."""
    from spacetime_crawler4_spark.operators.sketch import (
        hll_estimate_by,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers_by,
    )

    a = spark.createDataFrame(
        [("g", f"a{i}") for i in range(600)] + [("h", f"x{i}") for i in range(50)],
        ["g", "k"],
    )
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(300, 900)]  # overlaps A
        + [("h", f"y{i}") for i in range(30)],
        ["g", "k"],
    )
    state = tmp_path / "hll_state"
    hll_registers_by(a, "g", "k").write.parquet(str(state))
    merged = hll_merge_registers(
        spark.read.parquet(str(state)), hll_registers_by(b, "g", "k"), "g"
    )
    got = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate_from_registers(merged, "g").collect()
    }
    want = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate_by(a.unionByName(b), "g", "k").collect()
    }
    assert got == want


def test_label_propagation_converged_stops_at_diameter(spark):
    from spacetime_crawler4_spark.operators.graph import (
        label_propagation_converged,
    )

    # path a-b-c-d-e (diameter 4) + separate triangle
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    labels, rounds = label_propagation_converged(df)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
        "t1": "t1", "t2": "t1", "t3": "t1",
    }
    # path needs 4 propagation rounds + 1 no-change round to detect stop
    assert rounds == 5


def test_label_propagation_converged_backstop(spark):
    from spacetime_crawler4_spark.operators.graph import (
        label_propagation_converged,
    )

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(10)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    labels, rounds = label_propagation_converged(df, max_iterations=3)
    assert rounds == 3  # backstop hit, still deterministic output
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got["n03"] == "n00"  # 3-hop min reached
    assert got["n10"] == "n07"  # not yet the global min
