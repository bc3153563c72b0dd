"""Chunking + packing operator semantics (operators/chunking.py) and the
mixture-weight reducer (operators/sampling.py:source_mixture_weights).

The oracle-parity suite already proves DuckDB equality at sf0.01; these
tests pin the *semantics* (coverage, overlap, manifest invariants) on
hand-built frames where the expected answer is computable by eye, plus
the plan property the docstring claims: chunking never shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)
from spacetime_crawler4_spark.operators.sampling import source_mixture_weights


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=f"s{i % 2}") for i, t in enumerate(texts)]
    )


def test_chunks_cover_every_token_with_exact_overlap(spark):
    words = [f"w{i}" for i in range(100)]
    df = _docs(spark, [" ".join(words)])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    # stride 6: starts 0,6,...; n_chunks = 1 + ceil(92/6) = 17
    assert [r["chunk_idx"] for r in out] == sorted(r["chunk_idx"] for r in out)
    assert len(out) == 17
    seen = []
    for r in sorted(out, key=lambda r: r["chunk_idx"]):
        toks = r["chunk_text"].split(" ")
        assert r["n_tokens"] == len(toks)
        start = r["chunk_idx"] * 6
        assert toks == words[start : start + 8]
        seen.extend(toks[2:] if r["chunk_idx"] else toks)
    # stripping each chunk's 2-token overlap reconstructs the doc exactly
    assert seen == words


def test_chunk_short_and_empty_docs(spark):
    df = _docs(spark, ["one two three", "", "   ?!  "])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    # doc 0 -> one whole-doc chunk; docs 1-2 tokenize empty -> no chunks
    assert len(out) == 1
    assert out[0]["doc_id"] == 0
    assert out[0]["chunk_idx"] == 0
    assert out[0]["n_tokens"] == 3
    assert out[0]["chunk_text"] == "one two three"


def test_chunk_ids_deterministic_and_distinct(spark):
    df = _docs(spark, ["a " * 50, "a " * 50])
    out = chunk_documents(df, chunk_tokens=8, overlap=2)
    ids = [r["chunk_id"] for r in out.collect()]
    assert len(ids) == len(set(ids))  # distinct across identical texts
    again = [r["chunk_id"] for r in chunk_documents(df, 8, 2).collect()]
    assert sorted(ids) == sorted(again)


def test_chunk_rejects_degenerate_overlap(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_plan_has_no_shuffle_and_single_tokenize(spark):
    df = _docs(spark, ["x " * 200] * 4)
    out = chunk_documents(df, chunk_tokens=8, overlap=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # the tokenizer split must appear once (below the Generate), not be
    # inlined into the per-chunk slice projection (quadratic re-tokenize)
    assert plan.count("split(lower(text)") <= 1, plan


def test_pack_manifest_invariants(spark):
    # per-source concat: offsets are a gapless prefix sum in doc_id order
    texts = ["a " * n for n in (300, 10, 250, 0, 5, 600)]
    df = _docs(spark, texts)
    rows = pack_sequences(df, seq_len=256).orderBy("source", "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for rs in by_src.values():
        expect_off = 0
        for r in rs:
            assert r["tok_offset"] == expect_off
            expect_off += r["n_toks"]
            assert r["seq_begin"] == r["tok_offset"] // 256
            last_tok = max(r["tok_offset"] + r["n_toks"] - 1, r["tok_offset"])
            assert r["seq_end"] == max(last_tok // 256, r["seq_begin"])
            assert r["n_seqs"] == r["seq_end"] - r["seq_begin"] + 1
    # a doc longer than seq_len spans multiple sequences
    assert any(r["n_seqs"] > 1 for r in rows)
    # the empty doc is kept with zero tokens and a single-seq span
    zero = [r for r in rows if r["n_toks"] == 0]
    assert len(zero) == 1 and zero[0]["n_seqs"] == 1


def test_pack_window_is_partitioned_by_shard(spark):
    # the cumulative sum must hash-partition on source — a global
    # (unpartitioned) window would single-thread the whole corpus
    df = _docs(spark, ["a b c"] * 8)
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(source" in plan, plan


def test_mixture_weights_uniform_target(spark):
    df = _docs(spark, ["a " * 10, "b " * 30, "c " * 10, "d " * 30])
    # s0: docs 0,2 -> 20 toks; s1: docs 1,3 -> 60 toks; total 80
    rows = {r["source"]: r for r in source_mixture_weights(df).collect()}
    assert rows["s0"]["n_docs"] == 2 and rows["s0"]["n_toks"] == 20
    assert rows["s0"]["share"] == 0.25 and rows["s0"]["target_share"] == 0.5
    assert rows["s0"]["weight"] == 2.0  # under-represented -> up-weight
    assert rows["s1"]["weight"] == pytest.approx(0.5 / 0.75, abs=1e-6)


def test_mixture_weights_explicit_target(spark):
    df = _docs(spark, ["a " * 10, "b " * 30])
    rows = {
        r["source"]: r
        for r in source_mixture_weights(df, target={"s0": 3.0, "s1": 1.0}).collect()
    }
    assert rows["s0"]["target_share"] == 0.75
    assert rows["s1"]["target_share"] == 0.25
    assert rows["s0"]["weight"] == 3.0  # 0.75 / 0.25
