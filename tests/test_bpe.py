"""Distributed BPE training (operators/bpe.py): differential vs a pure
python reference implementation, the classic Sennrich walkthrough, and
the greedy-overlap edge case."""

from collections import Counter

from spacetime_crawler4_spark.operators.bpe import bpe_train


def _py_bpe(word_freqs, n_merges):
    """Reference BPE with the same tie-break (count desc, then lexicographic)."""
    state = {w: [*w, "</w>"] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, a + b, c))
        for w, syms in state.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def _train(spark, text, k):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return [
        (r["left"], r["right"], r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=k).collect()
    ]


def test_bpe_sennrich_walkthrough(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    got = _train(spark, text, 6)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == _py_bpe(freqs, 6)
    # the famous first merges: es -> est -> est</w>
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_bpe_greedy_overlap_left_equals_right(spark):
    # "aaaa" with merge (a,a): greedy left-to-right gives [aa, aa], NOT
    # three overlapping candidates — parity with the sequential reference
    text = " ".join(["aaaa"] * 4 + ["ab"] * 1)
    got = _train(spark, text, 3)
    freqs = {"aaaa": 4, "ab": 1}
    assert got == _py_bpe(freqs, 3)
    # rank-1 COUNT includes overlaps (3 per "aaaa" — the standard
    # adjacent-pair counter both implementations share)
    assert got[0] == ("a", "a", "aa", 12)
    # rank 2 proves the APPLY was greedy non-overlapping: "aaaa" became
    # [aa, aa, </w>] (never [aa, a, a...]), so (aa,aa) and (aa,</w>)
    # both count 4 and the lexicographic tie-break picks (aa,</w>)
    # because '<' sorts before 'a'
    assert got[1] == ("aa", "</w>", "aa</w>", 4)


def test_bpe_differential_random_corpus(spark):
    import random

    rng = random.Random(3)
    vocab = ["".join(rng.choices("abcde", k=rng.randint(2, 6))) for _ in range(40)]
    words = [rng.choice(vocab) for _ in range(400)]
    text = " ".join(words)
    freqs = Counter(words)
    got = _train(spark, text, 8)
    assert got == _py_bpe(dict(freqs), 8)


def test_bpe_apply_fertility(spark):
    from spacetime_crawler4_spark.operators.bpe import bpe_tokens_per_doc

    text = " ".join(["low"] * 5 + ["lowest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = bpe_tokens_per_doc(df, n_merges=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_words == 8
    # BPE always segments into at least 1 and at most len(word)+1 symbols
    assert r.n_bpe_tokens >= r.n_words
    assert 1.0 <= r.tokens_per_word <= 7.0
    # differential: fertility must equal the python reference segmentation
    freqs = {"low": 5, "lowest": 3}
    merges = _py_bpe(freqs, 4)
    state = {w: [*w, "</w>"] for w in freqs}
    for a, b, _, _ in merges:
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    want = sum(len(state[w]) * f for w, f in freqs.items())
    assert r.n_bpe_tokens == want


def test_bpe_stops_when_vocabulary_exhausts(spark):
    """A corpus whose every word fully merges before n_merges rounds must
    stop with the merges learned so far, not silently empty the state
    (ADVICE r3: empty `best` crossJoin poisoning)."""
    from spacetime_crawler4_spark.operators.bpe import bpe_train, bpe_tokens_per_doc

    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id int, text string")
    # 'ab</w>' exhausts after 2 merges: (a,b) then (ab,</w>)
    merges = bpe_train(docs, n_merges=10).collect()
    assert 0 < len(merges) < 10
    assert [m["rank"] for m in merges] == list(range(1, len(merges) + 1))
    # and the apply path still tokenizes (1 token per word once merged)
    out = bpe_tokens_per_doc(docs, n_merges=10).collect()
    assert len(out) == 1
