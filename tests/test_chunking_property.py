"""Property tests for chunking/packing (operators/chunking.py): a pure
python re-derivation of the contract over hypothesis-generated corpora,
checked against ONE Spark run per example batch (examples are generated
as whole corpora so Spark session cost amortizes), plus a streaming
chunking test — chunk_documents is map-side only, so the identical
operator must run unchanged on a streaming frame.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from spacetime_crawler4_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)

_TOKEN_RE = re.compile(r"[^a-z0-9']+")


def _pytokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def _pychunks(text: str, chunk: int, overlap: int):
    toks = _pytokens(text)
    if not toks:
        return []
    stride = chunk - overlap
    n_extra = (max(len(toks) - chunk, 0) + stride - 1) // stride
    return [
        (i, " ".join(toks[i * stride : i * stride + chunk]))
        for i in range(n_extra + 1)
    ]


# text alphabet deliberately includes separators, digits, apostrophes,
# unicode, and empty/whitespace-only strings
_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab9' -\t.ßé")), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, chunk=st.integers(3, 12), overlap=st.integers(0, 2))
def test_chunks_match_python_rederivation(spark, texts, chunk, overlap):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in enumerate(texts)]
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    exp = {
        (i, idx): body
        for i, t in enumerate(texts)
        for idx, body in _pychunks(t, chunk, overlap)
    }
    assert got == exp


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(0, 40), min_size=1, max_size=10),
    seq_len=st.integers(4, 32),
)
def test_pack_matches_python_rederivation(spark, lens, seq_len):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="w " * n, source=f"s{i % 2}") for i, n in enumerate(lens)]
    )
    rows = pack_sequences(df, seq_len).collect()
    # python re-derivation: per-source prefix sums in doc_id order
    offsets: dict[str, int] = {}
    exp = {}
    for i, n in enumerate(lens):
        src = f"s{i % 2}"
        off = offsets.get(src, 0)
        begin = off // seq_len
        end = max((off + n - 1) // seq_len, begin)
        exp[i] = (src, n, off, begin, end, end - begin + 1)
        offsets[src] = off + n
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_toks"],
            r["tok_offset"],
            r["seq_begin"],
            r["seq_end"],
            r["n_seqs"],
        )
        for r in rows
    }
    assert got == exp


def test_chunking_runs_on_streaming_frame(spark, tmp_path):
    """chunk_documents is a stateless map-side transform, so the SAME
    operator must work under Structured Streaming with no changes — the
    contract that lets one chunking definition serve both the batch
    corpus build and a streaming ingest."""
    src = tmp_path / "docs_in"
    src.mkdir()
    batch_df = spark.createDataFrame(
        [Row(doc_id=i, text=f"tok{i} " * 20) for i in range(8)]
    )
    batch_df.coalesce(1).write.parquet(str(src / "drop-000.parquet"))

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(src / "*.parquet")
    )
    q = (
        chunk_documents(stream, chunk_tokens=8, overlap=2)
        .writeStream.format("memory")
        .queryName("chunk_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_id"])
        for r in spark.sql("select * from chunk_stream").collect()
    }
    exp = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_id"])
        for r in chunk_documents(batch_df, 8, 2).collect()
    }
    assert got == exp
    # 20 tokens, chunk 8, stride 6 -> starts 0,6,12 -> 3 chunks/doc
    assert len(got) == 8 * 3
