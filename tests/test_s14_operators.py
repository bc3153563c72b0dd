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


# ----------------------------------------------------------------------
# One-permutation MinHash + one-pass LSH election
# ----------------------------------------------------------------------


def _py_oph(shingles, k=8):
    """Independent re-derivation of the densified OPH slots."""
    import hashlib

    C = 16 ** 12
    mins = [None] * k
    for s in shingles:
        h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        b = h % k
        if mins[b] is None or h < mins[b]:
            mins[b] = h
    out = []
    for j in range(k):
        for t in range(k):
            m = mins[(j + t) % k]
            if m is not None:
                out.append(m + t * C)
                break
        else:
            out.append(None)
    return out


def test_oph_densified_mins_match_python(spark):
    """Spark's integer-exact OPH slots equal a pure-python rederivation,
    including densified (borrowed) slots for sparse shingle sets."""
    from spacetime_crawler4_spark.operators.dedup import oph_densified_mins

    docs = {
        "d1": ["alpha beta gamma", "beta gamma delta", "x y z"],
        "d2": ["q"],  # single shingle: 7 of 8 buckets densified
        "d3": [f"sh{i} a b" for i in range(50)],
    }
    rows = [(d, s) for d, ss in docs.items() for s in ss]
    sh = spark.createDataFrame(rows, ["id", "shingle"])
    got = {
        r["id"]: [r[f"_v{j}"] for j in range(8)]
        for r in oph_densified_mins(sh, k=8).collect()
    }
    for d, ss in docs.items():
        assert got[d] == _py_oph(set(ss), 8), d


def test_oph_pairs_catch_planted_neardup(spark):
    """A planted near-identical pair (J >= 0.8) surfaces through the
    OPH-banded plan with its exact Jaccard."""
    from spacetime_crawler4_spark.operators.dedup import (
        oph_lsh_pairs,
        word_shingles,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    near = base + " extra"
    noise = [" ".join(f"n{d}w{i}" for i in range(40)) for d in range(10)]
    rows = [("a", base), ("b", near)] + [
        (f"z{d}", t) for d, t in enumerate(noise)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(docs, "doc_id", "text", 3)
    got = oph_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert ("a", "b") in pairs and len(pairs) == 1


def test_lsh_onepass_subset_of_cc_removals(spark):
    """Every one-pass removal is also a CC removal (sharing a bucket with
    a smaller id puts a smaller id in your component), and on directly
    bucket-connected families the two removal SETS coincide."""
    from spacetime_crawler4_spark.operators.dedup import (
        connected_components,
        lsh_onepass_removals,
        minhash_band_sigs,
        word_shingles,
    )

    tmpl = " ".join(f"w{i}" for i in range(50))
    rows = [("a1", tmpl), ("a2", tmpl + " x"), ("a3", tmpl + " y")] + [
        (f"u{d}", " ".join(f"d{d}t{i}" for i in range(30))) for d in range(8)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(docs, "doc_id", "text", 3)
    bands = minhash_band_sigs(sh, k=8, r=2)
    onepass = {
        (r["id"], r["master"]) for r in lsh_onepass_removals(bands).collect()
    }
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    cc = connected_components(pairs, "id_a", "id_b")
    cc_removed = {
        r["id"] for r in cc.filter(F.col("id") != F.col("cluster_id")).collect()
    }
    assert {i for i, _ in onepass} <= cc_removed
    assert {i for i, _ in onepass} == {"a2", "a3"}
    assert dict(onepass) == {"a2": "a1", "a3": "a1"}


# ----------------------------------------------------------------------
# OPIC
# ----------------------------------------------------------------------


def _py_opic(edges, iterations=3):
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    c = {v: 1.0 / n for v in nodes}
    h = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        dang = sum(c[v] for v in nodes if v not in out)
        nc = {v: 0.0 for v in nodes}
        for s, d in edges:
            nc[d] += c[s] / out[s]
        for v in nodes:
            h[v] += c[v]
            nc[v] += dang / n
        c = nc
    k = iterations + 1
    return {v: (h[v] + c[v]) / k for v in nodes}, c


def test_opic_matches_python_and_conserves_cash(spark):
    from spacetime_crawler4_spark.operators.graph import opic

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "d"),  # e -> d -> c; f dangling via c? no: add sink
        ("a", "f"),  # f has no out-edges (dangling)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: (r["importance"], r["cash"]) for r in opic(df, 3).collect()}
    imp, cash = _py_opic(edges, 3)
    assert set(got) == set(imp)
    for v in imp:
        assert abs(got[v][0] - imp[v]) < 1e-12, v
        assert abs(got[v][1] - cash[v]) < 1e-12, v
    # cash conservation: importance is an average of unit cash vectors
    assert abs(sum(g[0] for g in got.values()) - 1.0) < 1e-9
    assert abs(sum(g[1] for g in got.values()) - 1.0) < 1e-9


def test_opic_importance_favors_link_targets(spark):
    """A node every other node links to accumulates the most cash."""
    from spacetime_crawler4_spark.operators.graph import opic

    edges = [(f"u{i}", "hub") for i in range(6)] + [("hub", "u0")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = {r["id"]: r["importance"] for r in opic(df, 4).collect()}
    assert rows["hub"] == max(rows.values())


def test_window_hll_registers_fold_across_batches(spark):
    """Per-micro-batch window-keyed HLL register state folds (max-merge)
    into exactly the whole-input per-window estimate — the property that
    lets the sliding-window cardinality run under a streaming trigger
    without re-reading history."""
    from spacetime_crawler4_spark.operators.sketch import (
        hll_estimate_by,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers_by,
    )

    rows = [(f"w{i % 5}", f"u{i % 97}") for i in range(3000)]
    df = spark.createDataFrame(rows, ["window_start", "user_id"])
    b1, b2 = df.filter(F.md5("user_id").startswith("a")), df.filter(
        ~F.md5("user_id").startswith("a")
    )
    merged = hll_merge_registers(
        hll_registers_by(b1, "window_start", "user_id"),
        hll_registers_by(b2, "window_start", "user_id"),
        "window_start",
    )
    got = {
        (r["window_start"], r["hll_estimate"])
        for r in hll_estimate_from_registers(merged, "window_start").collect()
    }
    want = {
        (r["window_start"], r["hll_estimate"])
        for r in hll_estimate_by(df, "window_start", "user_id").collect()
    }
    assert got == want


def test_opic_host_rank_feeds_domain_rank_policy(spark, corpus_dir, tmp_path):
    """The OPIC→scheduling loop closes: page-level OPIC importance over
    the committed crawl links, summed per host, IS a valid
    frontier_policy='domain_rank' priority table — with global_budget=1
    the scheduler pops the seed of the highest-OPIC host first (expected
    host derived from the query output itself, so the assertion tracks
    the fixture)."""
    from spacetime_crawler4_spark.crawl.schema import CrawlConfig
    from spacetime_crawler4_spark.crawl.seqoracle import SeqCrawler
    from spacetime_crawler4_spark.queries import q_crawl_opic_importance
    from spacetime_crawler4_spark.sources.fixture import (
        FIXTURE_WHITELIST,
        SEED_URLS,
    )

    imp = q_crawl_opic_importance(spark, "unused")
    hosts = (
        imp.select(
            F.concat(
                F.parse_url("url", F.lit("PROTOCOL")),
                F.lit("://"),
                F.parse_url("url", F.lit("HOST")),
            ).alias("domain"),
            "importance",
        )
        .groupBy("domain")
        .agg(F.sum("importance").alias("rank"))
    )
    table = str(tmp_path / "opic_ranks.parquet")
    hosts.write.mode("overwrite").parquet(table)
    ranks = {r["domain"]: r["rank"] for r in hosts.collect()}
    # expected first pop: the seed whose host carries the highest OPIC
    # mass (fifo seed order breaks ties)
    expect = max(
        SEED_URLS,
        key=lambda u: (
            ranks.get(u.rsplit("/", 1)[0] if u.count("/") > 2 else u, 0.0),
            -SEED_URLS.index(u),
        ),
    )
    cfg = CrawlConfig(
        frontier_policy="domain_rank",
        priority_table=table,
        global_budget=1,
        max_waves=2,
        whitelist=FIXTURE_WHITELIST,
    )
    c = SeqCrawler(
        f"{corpus_dir}/pages.parquet",
        f"{corpus_dir}/robots.parquet",
        SEED_URLS,
        cfg,
        mode="wave",
    )
    c.run()
    assert c.visit_log[0][2] == expect


# ----------------------------------------------------------------------
# Winnow fingerprint sets + MOSS overlap pairs
# ----------------------------------------------------------------------


def test_winnow_fp_sets_match_relational(spark):
    """The vectorized (doc_id, fp) set rows equal the relational
    frame-spec-window derivation exactly."""
    from pyspark.sql.window import Window
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fp_sets_vectorized,
    )

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "pack my box with five dozen liquor jugs"),
        ("c", "tiny"),  # shorter than k+w-1: absent from output
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fp_sets_vectorized(docs, k=8, w=4).collect()
    }
    txt = F.lower(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(txt) - 7, F.lit(1))),
        lambda i: txt.substr(i, F.lit(8)),
    )
    g = docs.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    np_ = Window.partitionBy("doc_id")
    rel = (
        g.withColumn("wmin", F.min("h").over(win))
        .withColumn("npos", F.count("*").over(np_))
        .filter(F.col("pos") <= F.col("npos") - 4)
        .select("doc_id", "wmin")
        .distinct()
    )
    want = {(r["doc_id"], r["wmin"]) for r in rel.collect()}
    assert got == want and not any(d == "c" for d, _ in got)


def test_winnow_overlap_catches_lifted_paragraph(spark):
    """Two globally-different docs sharing one lifted sentence surface as
    an overlap pair (local similarity), while unrelated docs do not."""
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fp_sets_vectorized,
        winnow_overlap_pairs,
    )

    lifted = "climate change is accelerating faster than models predicted"
    rows = [
        ("a", "report one intro. " + lifted + " end of report one."),
        ("b", "completely different study text here. " + lifted),
        ("u1", "unrelated document about cooking pasta al dente nightly"),
        ("u2", "another text regarding medieval castle architecture notes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fp_sets_vectorized(docs, k=8, w=4)
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(fps, min_shared=3, max_df=20).collect()
    }
    assert ("a", "b") in got and got[("a", "b")] >= 3
    assert all(k == ("a", "b") for k in got)


# ----------------------------------------------------------------------
# PPJoin exact set-similarity join
# ----------------------------------------------------------------------


def test_ppjoin_equals_uncapped_exact_join(spark):
    """The prefix-filtered pair set equals the full uncapped co-occurrence
    exact join at the same threshold — recall 1.0, the lemma made a test
    (run on the sf0.001 fixture corpus where the exact join is cheap)."""
    from spacetime_crawler4_spark.operators.dedup import (
        jaccard_pairs,
        ppjoin_pairs,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pp = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ppjoin_pairs(sh, t=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs(sh, min_jaccard=0.5).collect()
    }
    assert pp == exact and len(pp) > 0


def test_ppjoin_prefix_prunes_candidates(spark):
    """The prefix join's candidate count is strictly below the full
    co-occurrence pair count on a corpus with heavy shared boilerplate
    (every doc shares a header, so co-occurrence is quadratic while
    prefixes stay rare)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from spacetime_crawler4_spark.operators.dedup import word_shingles

    header = " ".join(f"h{i}" for i in range(10))
    rows = [
        (f"d{i}", header + " " + " ".join(f"u{i}w{j}" for j in range(30)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(docs, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "_pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("_df", "shingle")
            ),
        )
        .withColumn("_sz", F.count("*").over(Window.partitionBy("id")))
    )
    pre = ranked.filter(
        F.col("_pos") <= F.col("_sz") - F.ceil(F.lit(0.5) * F.col("_sz")) + 1
    ).select("id", "shingle")
    n_pre_cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    n_full_cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    # every doc pair co-occurs through the header (full = 40*39/2); the
    # rarest-first prefixes are the unique tokens, so candidates collapse
    assert n_full_cand == 40 * 39 // 2
    assert n_pre_cand < n_full_cand / 10


def test_sliding_distinct_stream_register_fold_matches_batch(spark, tmp_path):
    """foreachBatch incremental run of the sliding-distinct plane: each
    micro-batch contributes only its window-keyed HLL registers, folded
    into persistent state by max — the final per-window estimates equal
    the one-shot batch query over the full input. This is the streaming
    claim in q_events_sliding_distinct's contract made executable."""
    import datetime as dt

    from spacetime_crawler4_spark.operators.sketch import (
        hll_estimate_by,
        hll_estimate_from_registers,
        hll_registers_by,
    )

    rows = [
        (i, dt.datetime(2025, 3, 1) + dt.timedelta(minutes=13 * i), i % 41)
        for i in range(500)
    ]
    src = tmp_path / "ev"
    spark.createDataFrame(rows, ["event_id", "ts", "user_id"]).repartition(
        4
    ).write.parquet(str(src))

    def windowed(df):
        return df.select(
            F.window("ts", "4 hours", "1 hour").alias("w"), "user_id"
        ).select(F.col("w.start").alias("ws"), "user_id")

    state: dict = {}

    def fold(batch_df, _bid):
        for r in hll_registers_by(windowed(batch_df), "ws", "user_id").collect():
            k = (r["ws"], r["bucket"])
            state[k] = max(state.get(k, 0), r["r"])

    q = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    folded = spark.createDataFrame(
        [(ws, b, r) for (ws, b), r in state.items()], ["ws", "bucket", "r"]
    )
    got = {
        (r["ws"], r["hll_estimate"])
        for r in hll_estimate_from_registers(folded, "ws").collect()
    }
    want = {
        (r["ws"], r["hll_estimate"])
        for r in hll_estimate_by(
            windowed(spark.read.parquet(str(src))), "ws", "user_id"
        ).collect()
    }
    assert got == want and len(want) > 20


# ----------------------------------------------------------------------
# AMS F2
# ----------------------------------------------------------------------


def test_ams_f2_accuracy_and_partition_invariance(spark):
    """The median-of-16 AMS estimate lands within ~2/sqrt(k/2) relative
    error of the exact self-join size on a zipf-ish frequency table,
    and is invariant to input partitioning (each fold is an exact
    integer sum)."""
    from spacetime_crawler4_spark.operators.sketch import ams_f2_estimate
    from pyspark.sql import functions as F

    rows = [(f"t{i}", max(1, 4000 // (i + 1))) for i in range(800)]
    exact = sum(f * f for _, f in rows)
    df1 = spark.createDataFrame(rows, ["term", "tf"]).repartition(1)
    df32 = spark.createDataFrame(rows, ["term", "tf"]).repartition(32)
    e1 = ams_f2_estimate(df1, "term", "tf").collect()[0]["f2_est"]
    e32 = ams_f2_estimate(df32, "term", "tf").collect()[0]["f2_est"]
    assert e1 == e32
    assert abs(e1 - exact) / exact < 0.75  # median-of-16 bound, generous


def test_ams_f2_null_key_matches_sql_mirror(spark, tmp_path):
    """A NULL key must fold into the SAME estimator bucket in Spark and
    the DuckDB mirror (ADVICE r4: concat_ws skips NULLs while '||' of a
    NULL yields NULL, so the two engines disagreed before the shared
    AMS_NULL_KEY coalesce). Bit-for-bit f2_est equality over a table
    that contains a NULL key proves the sentinel is applied on both
    sides."""
    import duckdb

    from spacetime_crawler4_spark.operators.sketch import (
        ams_f2_estimate,
        ams_f2_sql,
    )

    rows = [("a", 5), ("b", 3), (None, 7), ("c", 2)]
    df = spark.createDataFrame(rows, ["term", "tf"])
    spark_est = ams_f2_estimate(df, "term", "tf").collect()[0]["f2_est"]

    pq = str(tmp_path / "tf.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW tf AS SELECT * FROM '{pq}/*.parquet'")
    sql = f"WITH {ams_f2_sql('tf', 'term', 'tf')} SELECT f2_est FROM ams"
    duck_est = con.sql(sql).fetchone()[0]
    assert spark_est == duck_est


# ----------------------------------------------------------------------
# Poisson bootstrap
# ----------------------------------------------------------------------


def test_poisson_bootstrap_ci_covers_mean_and_is_partition_invariant(spark):
    """The 95% interval brackets the observed mean, has sane width, and
    is identical under different partitionings (weights are row-keyed,
    sums exact up to IEEE associativity absorbed by round-6)."""
    from spacetime_crawler4_spark.operators.sketch import poisson_bootstrap_mean

    rows = [(i, float(100 + (i * 37) % 50)) for i in range(2000)]
    df1 = spark.createDataFrame(rows, ["id", "v"]).repartition(1)
    df8 = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    r1 = poisson_bootstrap_mean(df1, "id", "v").collect()[0]
    r8 = poisson_bootstrap_mean(df8, "id", "v").collect()[0]
    assert tuple(r1) == tuple(r8)
    assert r1["ci_lo"] <= r1["obs_mean"] <= r1["ci_hi"]
    assert r1["n_replicates"] == 100
    # width ~ 4*sd/sqrt(n): sd of the 50-wide sawtooth ≈ 14.4 → ~1.3
    assert 0.3 < r1["ci_hi"] - r1["ci_lo"] < 4.0


def test_salsa_authority_converges_to_indeg_share(spark):
    """On a CONNECTED graph the SALSA authority vector is exactly
    indeg/|E| at every iteration (the TKC-immunity stationary point) —
    the audit behind crawl_salsa's indeg_share column."""
    from spacetime_crawler4_spark.operators.graph import salsa

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b"),
        ("b", "a"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["authority"] for r in salsa(df, 4).collect()}
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    ne = len(edges)
    for v, a in got.items():
        assert abs(a - indeg[v] / ne) < 1e-9, v
