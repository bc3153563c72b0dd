"""Round-4 session-11 operators: tf-idf cosine pairs, hard-negative
mining, token-balanced shard layout, temperature mixture, quality-aware
master election (query-level), host components (query-level).

Hand-computed expectations; the engine-vs-DuckDB gate for the staged
queries themselves lives in tests/test_oracle_parity.py (pending_registry
is swept automatically)."""

import math

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.chunking import shard_assignments
from spacetime_crawler4_spark.operators.dedup import tfidf_cosine_pairs
from spacetime_crawler4_spark.operators.sampling import temperature_mixture
from spacetime_crawler4_spark.operators.similarity import hard_negative_topk


class TestTfidfCosine:
    def test_identical_docs_cos_one(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma"),
                (2, "alpha beta gamma"),
                (3, "delta epsilon zeta eta"),
            ],
            "doc_id long, text string",
        )
        rows = tfidf_cosine_pairs(df, min_cos=0.0).collect()
        by_pair = {(r.id_a, r.id_b): r.cos for r in rows}
        assert by_pair[(1, 2)] == 1.0
        # doc 3 shares no term with 1/2 — no pair row at all
        assert (1, 3) not in by_pair and (2, 3) not in by_pair

    def test_hand_computed_cosine(self, spark):
        # doc1: a b   doc2: a c   N=2, df(a)=2, df(b)=df(c)=1
        # w = tf * ln(1 + N/df): wa = ln(2), wb = wc = ln(3)
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a c")], "doc_id long, text string"
        )
        rows = tfidf_cosine_pairs(df, min_cos=0.0).collect()
        assert len(rows) == 1
        wa, wb = math.log(2.0), math.log(3.0)
        expect = round(wa * wa / (math.hypot(wa, wb) ** 2), 6)
        assert rows[0].cos == expect

    def test_df_cap_excludes_term_from_space(self, spark):
        # 'common' is in all 4 docs; with max_df=3 it is dropped from the
        # SPACE, so docs sharing only 'common' have no pair row.
        df = spark.createDataFrame(
            [
                (1, "common only here alpha"),
                (2, "common beta unrelated stuff"),
                (3, "common gamma other words"),
                (4, "common delta more things"),
            ],
            "doc_id long, text string",
        )
        assert tfidf_cosine_pairs(df, max_df=3, min_cos=0.0).count() == 0


class TestHardNegatives:
    def test_same_label_excluded_and_ranked(self, spark):
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),  # query
                (1, [1.0, 0.0], 0),  # identical but SAME label -> excluded
                (2, [0.9, 0.1], 1),  # nearest different-label
                (3, [0.0, 1.0], 1),  # orthogonal
            ],
            "vec_id long, embedding array<double>, label int",
        )
        q = emb.filter(F.col("vec_id") == 0)
        rows = hard_negative_topk(emb, q, k=2).collect()
        assert [r.neighbor_id for r in rows] == [2, 3]
        assert all(r.neighbor_label != 0 for r in rows)
        assert rows[0].rank == 1 and rows[0].cos > rows[1].cos

    def test_k_bounds_output(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0], i % 2) for i in range(10)],
            "vec_id long, embedding array<double>, label int",
        )
        q = emb.filter(F.col("vec_id") == 0)
        assert hard_negative_topk(emb, q, k=3).count() == 3


class TestShardAssignments:
    def test_shard_boundaries_and_totals(self, spark):
        # 5 docs of 3 tokens each, one lang, target 6 tokens/shard:
        # offsets 0,3,6,9,12 -> shards 0,0,1,1,2
        df = spark.createDataFrame(
            [(i, "one two three", "en") for i in range(5)],
            "doc_id long, text string, lang string",
        )
        rows = shard_assignments(df, target_tokens=6).orderBy("shard").collect()
        assert [(r.shard, r.n_docs, r.n_tokens) for r in rows] == [
            (0, 2, 6),
            (1, 2, 6),
            (2, 1, 3),
        ]
        assert rows[0].first_doc == 0 and rows[0].last_doc == 1
        assert rows[2].first_doc == 4

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d", "en"), (2, "a b c d", "de")],
            "doc_id long, text string, lang string",
        )
        rows = shard_assignments(df, target_tokens=3).collect()
        # each lang starts at offset 0 -> both docs in shard 0 of their lang
        assert sorted((r.lang, r.shard) for r in rows) == [("de", 0), ("en", 0)]

    def test_token_total_is_conserved(self, spark):
        df = spark.createDataFrame(
            [(i, "w " * (i + 1), "en") for i in range(8)],
            "doc_id long, text string, lang string",
        )
        out = shard_assignments(df, target_tokens=5)
        assert out.agg(F.sum("n_tokens")).first()[0] == sum(range(1, 9))


class TestTemperatureMixture:
    def test_alpha_one_keeps_natural_mixture(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "en"), (2, "d e", "de")],
            "doc_id long, text string, lang string",
        )
        rows = temperature_mixture(df, alpha=1.0).collect()
        for r in rows:
            assert r.temp_share == r.share
            assert r.boost == 1.0

    def test_alpha_zero_is_uniform(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f g h", "en"), (2, "x y", "de")],
            "doc_id long, text string, lang string",
        )
        rows = temperature_mixture(df, alpha=0.0).collect()
        assert all(r.temp_share == 0.5 for r in rows)

    def test_low_alpha_boosts_tail(self, spark):
        df = spark.createDataFrame(
            [(1, "w " * 90, "en"), (2, "w " * 10, "de")],
            "doc_id long, text string, lang string",
        )
        by = {r.lang: r for r in temperature_mixture(df, alpha=0.3).collect()}
        assert by["de"].boost > 1.0 > by["en"].boost
        # shares still sum to 1 (within rounding)
        assert abs(by["de"].temp_share + by["en"].temp_share - 1.0) < 1e-5


class TestTreeRoots:
    def test_forest_resolves_to_roots(self, spark):
        from spacetime_crawler4_spark.operators.graph import tree_roots

        # two trees: a->b->c->d chain and lone root x with child y
        rows = [
            ("a", None), ("b", "a"), ("c", "b"), ("d", "c"),
            ("x", None), ("y", "x"),
        ]
        df = spark.createDataFrame(rows, "id string, parent string")
        got = {r.id: r.root for r in tree_roots(df).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                       "x": "x", "y": "x"}

    def test_deep_chain_converges_in_log_rounds(self, spark):
        from spacetime_crawler4_spark.operators.graph import tree_roots

        n = 33  # depth 32 -> needs 6 doublings; max_rounds=8 must suffice
        rows = [("n0", None)] + [(f"n{i}", f"n{i-1}") for i in range(1, n)]
        df = spark.createDataFrame(rows, "id string, parent string")
        got = tree_roots(df, max_rounds=8).collect()
        assert all(r.root == "n0" for r in got) and len(got) == n


class TestCdcChunks:
    def test_conservation_and_duplicate_detection(self, spark):
        from spacetime_crawler4_spark.operators.dedup import cdc_chunk_stats

        text = "the quick brown fox jumps over the lazy dog " * 20
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "entirely different content here")],
            "doc_id long, text string",
        )
        row = cdc_chunk_stats(df).first()
        # chars are conserved: every char lands in exactly one chunk
        assert row.total_chars == sum(len(t.lower()) for _, t in
                                      [(1, text), (2, text),
                                       (3, "entirely different content here")])
        # the two identical docs chunk identically -> heavy dedup
        assert row.n_unique_chunks < row.n_chunks
        assert 0 < row.dedup_ratio < 1

    def test_shift_robustness(self, spark):
        from spacetime_crawler4_spark.operators.dedup import cdc_chunk_stats

        body = "shared repeated content block that is long enough " * 10
        df = spark.createDataFrame(
            [(1, body), (2, "PREFIX-INSERTED " + body)],
            "doc_id long, text string",
        )
        row = cdc_chunk_stats(df).first()
        # content-defined cuts re-align after the insertion: unique chars
        # grow by far less than a full second copy
        assert row.unique_chars < len(body) * 1.5


class TestPcaPowerTop:
    def test_recovers_dominant_axis(self, spark):
        from spacetime_crawler4_spark.operators.similarity import pca_power_top

        # variance concentrated on axis 2 of 4 dims
        rows = [(i, [0.01 * (i % 3), 0.02, float(10 + (i % 7)), 0.03])
                for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = pca_power_top(df, dim=4, iters=4).collect()
        loadings = [r.loading for r in sorted(got, key=lambda r: r.j)]
        assert abs(loadings[2]) > 0.99
        assert sum(x * x for x in loadings) == pytest.approx(1.0, abs=1e-4)

    def test_unit_norm_and_row_per_dim(self, spark):
        from spacetime_crawler4_spark.operators.similarity import pca_power_top

        rows = [(i, [float(i % 5), float((i * 3) % 7), 1.0])
                for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = pca_power_top(df, dim=3, iters=3).collect()
        assert len(got) == 3
        assert sum(r.loading ** 2 for r in got) == pytest.approx(1.0, abs=1e-4)


class TestHashedDocVectors:
    def test_unit_norm_and_determinism(self, spark):
        from spacetime_crawler4_spark.operators.similarity import (
            hashed_doc_vectors,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta gamma alpha"), (2, "delta epsilon")],
            "doc_id long, text string",
        )
        rows = hashed_doc_vectors(df, buckets=8).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r.w)
        for ws in by_doc.values():
            assert sum(w * w for w in ws) == pytest.approx(1.0, abs=1e-4)
        # identical text -> identical vector (hash family is deterministic)
        again = hashed_doc_vectors(df, buckets=8).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_repeated_token_doubles_weight(self, spark):
        from spacetime_crawler4_spark.operators.similarity import (
            hashed_doc_vectors,
        )

        df = spark.createDataFrame(
            [(1, "word"), (2, "word word")], "doc_id long, text string"
        )
        rows = hashed_doc_vectors(df, buckets=8).collect()
        # both docs have one non-zero bucket, both normalize to ±1
        assert sorted(abs(r.w) for r in rows) == [1.0, 1.0]
        assert rows[0].bucket == rows[1].bucket


class TestKneserNey:
    def test_hand_computed_bigram_kn(self, spark):
        from spacetime_crawler4_spark.operators.textstats import (
            kneser_ney_bits_per_token,
        )

        # train == score: "a b a b a c"
        # big: (a,b)=2 (b,a)=2 (a,c)=1; ctx a: c=3,N1+=2; b: c=2,N1+=1
        # pcont(w) = (N1+(.,w)+0.5)/(3 + 0.5*(3+1)) = (1+0.5)/5 = 0.3 each
        df = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
        row = kneser_ney_bits_per_token(df).first()
        p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3
        p_ba = (2 - 0.75) / 2 + 0.75 * 1 / 2 * 0.3
        p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3
        bits = [-math.log2(p) for p in (p_ab, p_ba, p_ab, p_ba, p_ac)]
        assert row.n_scored == 5
        assert row.bits_per_token == pytest.approx(
            round(sum(bits) / 5, 4), abs=2e-4
        )
        assert row.cont_rate == 0.0

    def test_unseen_context_scores_from_continuation(self, spark):
        from spacetime_crawler4_spark.operators.textstats import (
            kneser_ney_bits_per_token,
        )

        train = spark.createDataFrame(
            [(1, "a b a b a c")], "doc_id long, text string"
        )
        held = spark.createDataFrame([(2, "c a")], "doc_id long, text string")
        row = kneser_ney_bits_per_token(held, train).first()
        # 'c' is never a context in train -> pure continuation estimate
        assert row.n_scored == 1
        assert row.cont_rate == 1.0
        assert row.bits_per_token == pytest.approx(
            round(-math.log2(0.3), 4), abs=2e-4
        )


class TestMarkovAndPareto:
    def test_transition_rows_sum_to_one(self, spark):
        import sys
        sys.path.insert(0, "/root/repo")
        # full surface, rotation-proof: the query moves from pending into
        # the live registry once the driver window reaches it
        from spacetime_crawler4_spark.queries import pending_registry, registry

        fn, _ = {**registry(), **pending_registry()}["events_markov"]
        rows = fn(spark, "/root/testdata/sf0.001").collect()
        by_prev = {}
        for r in rows:
            by_prev.setdefault(r.prev_type, 0.0)
            by_prev[r.prev_type] += r.p
        for total in by_prev.values():
            assert total == pytest.approx(1.0, abs=1e-4)

    def test_pareto_cumshare_monotone_to_one(self, spark):
        import sys
        sys.path.insert(0, "/root/repo")
        from spacetime_crawler4_spark.queries import pending_registry, registry

        fn, _ = {**registry(), **pending_registry()}["tpch_revenue_pareto"]
        rows = fn(spark, "/root/testdata/sf0.001").orderBy("decile").collect()
        shares = [r.cum_share for r in rows]
        assert shares == sorted(shares)
        assert shares[-1] == pytest.approx(1.0, abs=1e-5)
        # top decile concentrates the most revenue
        revs = [r.decile_revenue for r in rows]
        assert revs[0] == max(revs)


class TestGiniAndEstimate:
    def test_gini_hand_values(self, spark):
        import sys
        sys.path.insert(0, "/root/repo")
        from spacetime_crawler4_spark.queries import q_events_gini

        # uniform counts -> gini 0; use sf0.001 for the real query shape
        row = q_events_gini(spark, "/root/testdata/sf0.001").first()
        assert row.n_users > 0 and 0.0 <= row.gini < 1.0

    def test_gini_zero_for_uniform(self, spark):
        # direct formula check on a synthetic uniform frame
        df = spark.createDataFrame(
            [(u, "click") for u in range(4) for _ in range(5)],
            "user_id long, event_type string",
        )
        per = df.groupBy("user_id").count()
        rows = per.collect()
        xs = sorted(r["count"] for r in rows)
        n = len(xs)
        g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (n + 1) / n
        assert g == pytest.approx(0.0, abs=1e-12)

    def test_minhash_estimate_identical_docs(self, spark):
        import sys
        sys.path.insert(0, "/root/repo")
        from spacetime_crawler4_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
            word_shingles,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [(1, base), (2, base)], "doc_id long, text string"
        )
        sh = word_shingles(df, "doc_id", "text", 3)
        pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
        assert pairs.count() == 1 and pairs.first().jaccard == 1.0
        # identical shingle sets -> identical signatures -> estimate 1.0
        sig = minhash_signatures(sh, k=8).collect()
        by = {}
        for r in sig:
            by.setdefault(r.id, {})[r.band] = r.sig
        assert by[1] == by[2]
