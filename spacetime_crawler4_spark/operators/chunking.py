"""Document chunking + sequence packing — the two structural transforms
between "a cleaned document table" and "model-ready training sequences".

Neither has a counterpart in the reference (a crawler stops at page
text); both are table stakes for the LLM-data pipeline this engine
serves, so they follow the same contract as every other operator here:
JVM-only expressions, DuckDB-oracle-checkable output, and a plan shape
that survives 100 TB.

``chunk_documents``
    Sliding token windows (chunk_tokens wide, stride = chunk - overlap)
    — the RAG / context-window split. Map-side only: tokenize once per
    document, Generate (posexplode) the window starts, slice the cached
    token array per chunk. The token array is carried as a COLUMN
    through the Generate so Catalyst cannot inline the tokenizer split
    into the per-chunk projection (the quadratic CollapseProject trap
    measured in ``dedup.word_shingles``) — each document is tokenized
    exactly once regardless of its chunk count. No shuffle anywhere.

``pack_sequences``
    Concat-and-chop packing (the standard LM pretraining batcher: lay
    documents end to end, cut every ``seq_len`` tokens) expressed as a
    manifest: for every document, the range of training sequences it
    occupies. Packing is per ``source`` shard — a global concatenation
    order would serialize the cumulative sum through one partition,
    which is exactly the kind of hidden single-node bottleneck this
    repo refuses; per-shard packing is both the scalable shape and what
    real pipelines do (pack within a shard file, pad at shard end). One
    window (partitioned cumulative sum), all integers — hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spacetime_crawler4_spark.operators.dedup import sql_tokens

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_id, n_tokens, chunk_text) — one row per
    sliding token window. Starts are 0, stride, 2*stride, …; the number
    of chunks is 1 + ceil(max(n - chunk, 0) / stride), so every token is
    covered and the final chunk may run short (never shorter than the
    tail the previous chunk didn't cover). Empty documents yield no
    chunks. chunk_id = md5("{doc_id}:{chunk_idx}") — deterministic and
    engine-portable, usable as a join key by downstream embedding /
    retrieval stages.
    """
    if overlap >= chunk_tokens:
        raise ValueError("chunking: overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # tokenize ONCE per document; "toks" crosses the Generate below as an
    # attribute, so the per-chunk slice never re-evaluates the split
    base = docs.select(
        F.col(id_col).alias("doc_id"), sql_tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    # ceil(max(n - chunk, 0) / stride) in exact integer arithmetic
    n_extra = (F.greatest(n - chunk_tokens, F.lit(0)) + (stride - 1)) / F.lit(stride)
    last_start = F.floor(n_extra).cast("int") * stride
    exploded = base.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), last_start, F.lit(stride))).alias(
            "chunk_idx", "start"
        ),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5(F.concat_ws(":", "doc_id", "chunk_idx")).alias("chunk_id"),
        F.least(
            F.lit(chunk_tokens), F.size("toks") - F.col("start")
        ).cast("int").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop packing manifest, per shard: documents are laid
    end to end in ``id_col`` order within each ``shard_col`` value and
    cut every ``seq_len`` tokens. Returns one row per document:

      (source, doc_id, n_toks, tok_offset, seq_begin, seq_end, n_seqs)

    where ``tok_offset`` is the token position (named to dodge the
    reserved word OFFSET in oracle SQL) the document starts at in
    its shard's concatenation, ``seq_begin``/``seq_end`` the first/last
    training-sequence index it contributes tokens to, and ``n_seqs``
    how many sequences it spans. Integers only — the manifest is
    hash-exact, and an executor can materialize any sequence k by
    scanning exactly the docs with seq_begin <= k <= seq_end.

    Empty documents are kept (n_toks=0) with seq_begin == seq_end ==
    the sequence their offset falls in: a zero-token doc "occupies" the
    sequence at its offset boundary, which keeps offsets a prefix sum
    with no gaps.
    """
    w = Window.partitionBy(shard_col).orderBy(id_col)
    toks = docs.select(
        F.col(shard_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(sql_tokens(F.col(text_col))).cast("bigint").alias("n_toks"),
    )
    offset = (
        F.coalesce(F.sum("n_toks").over(w), F.lit(0)).cast("bigint") - F.col("n_toks")
    )
    out = toks.withColumn("tok_offset", offset)
    seq_begin = F.floor(F.col("tok_offset") / seq_len).cast("bigint")
    seq_end = F.greatest(
        F.floor((F.col("tok_offset") + F.col("n_toks") - 1) / F.lit(seq_len)).cast(
            "bigint"
        ),
        seq_begin,
    )
    return out.select(
        "source",
        "doc_id",
        "n_toks",
        "tok_offset",
        seq_begin.alias("seq_begin"),
        seq_end.alias("seq_end"),
        (seq_end - seq_begin + 1).cast("bigint").alias("n_seqs"),
    )


def shard_assignments(
    docs: DataFrame,
    target_tokens: int = 2000,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-balanced OUTPUT-shard assignment — the data-layout step that
    turns an admitted corpus into evenly-sized training shards (the
    WebDataset / Common-Crawl-segment shape). Documents are laid out in
    ``id_col`` order within each ``group_col`` value; a document starts
    shard ``floor(start_offset / target_tokens)`` where start_offset is
    the running token count before it — so every shard holds
    ~``target_tokens`` tokens, deterministically, with no driver-side
    bin packing.

    One row per (group, shard): n_docs, n_tokens, first/last doc id.
    Integers only — hash-exact across engines.

    Scale shape: tokenize is map-only; the cumulative sum is a window
    PARTITIONED BY group (per-lang/per-source parallelism — no global
    single-partition sort), then one partial-aggregated groupBy. At
    100 TB the group key is (source, date-bucket), keeping every window
    partition bounded.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.size(sql_tokens(F.col(text_col))).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = toks.select(
        "grp",
        "id",
        "n_toks",
        F.floor(
            (F.sum("n_toks").over(w) - F.col("n_toks")) / F.lit(target_tokens)
        ).cast("int").alias("shard"),
    )
    return (
        assigned.groupBy("grp", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("id").alias("first_doc"),
            F.max("id").alias("last_doc"),
        )
        .withColumnRenamed("grp", group_col)
    )
