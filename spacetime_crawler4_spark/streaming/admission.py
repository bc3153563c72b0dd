"""Streaming corpus admission — rolling ingestion with incremental dedup.

The streaming twin of ``operators/decontam.incremental_dedup``: document
batches arrive as a stream; each micro-batch is deduped against the
*accumulated admitted corpus* (MinHash-banded candidates, batch x base
only; exact-Jaccard verify) and the kept rows are appended to the base.
This is the shape a rolling Common-Crawl ingest actually runs: the base
is a durable table (Iceberg in production, a parquet directory here —
same append-only discipline), and the per-batch cost scales with the
batch and its colliding buckets, never with |base|².

Exactly-once effect from an at-least-once trigger: foreachBatch can
replay a batch after a crash, so each batch writes to its OWN
``b<batch_id>`` subdirectory with mode=overwrite — the standard
idempotent-sink recipe. A replayed batch (a) overwrites whatever partial
files its failed attempt left, and (b) dedupes only against the PRIOR
batches' subdirectories, never against its own partial output — the two
failure modes a flat append-mode base suffers. With an Iceberg base the
same discipline is one atomic ``append`` commit carrying the batch_id in
the snapshot summary (replay = no-op when the id is already committed).

Batch-equivalence contract (tested): streaming the corpus in ordered
chunks admits exactly the docs the one-shot batch operator admits for
the same base/batch split — tests/test_streaming_admission.py replays
the registry's oracle-checked ``dedup_incremental`` split through the
stream and compares the admitted sets row-for-row; it also replays one
batch on top of a planted partial write and asserts the admitted set is
unchanged (idempotence).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.decontam import incremental_dedup


def _batch_dir(base_dir: str, batch_id: int) -> str:
    return os.path.join(base_dir, f"b{batch_id:012d}")


def _prior_batch_dirs(base_dir: str, batch_id: int) -> list[str]:
    """Subdirectories of already-admitted batches, EXCLUDING the current
    batch_id (whose directory, if present, is a failed attempt's partial
    output and must not be read as base)."""
    if not os.path.isdir(base_dir):
        return []
    me = f"b{batch_id:012d}"
    return sorted(
        os.path.join(base_dir, d)
        for d in os.listdir(base_dir)
        if d.startswith("b") and d != me
    )


def read_admitted(spark: SparkSession, base_dir: str) -> DataFrame:
    """The accumulated admitted corpus — union of all batch
    subdirectories under ``base_dir``."""
    return spark.read.option("recursiveFileLookup", "true").parquet(base_dir)


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    base_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
) -> None:
    """Admit ONE micro-batch idempotently: dedup against all prior
    batches' output, then overwrite this batch_id's own subdirectory.
    Calling it twice with the same (batch_df, batch_id) is a no-op the
    second time — the replay path foreachBatch needs."""
    batch_df = batch_df.localCheckpoint(eager=True)
    prior = _prior_batch_dirs(base_dir, batch_id)
    out = _batch_dir(base_dir, batch_id)
    if not prior:
        # first batch bootstraps the base after an *internal* dedup
        # against nothing — every doc admits (intra-batch dups are
        # the intra-corpus planes' job, same as the batch operator)
        batch_df.write.mode("overwrite").parquet(out)
        return
    base = spark.read.parquet(*prior)
    verdict = incremental_dedup(
        base, batch_df, id_col, text_col, min_jaccard=min_jaccard
    )
    kept = batch_df.join(
        verdict.filter(F.col("keep")).select(
            F.col("batch_id").alias(id_col)
        ),
        id_col,
    )
    kept.write.mode("overwrite").parquet(out)


def admission_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    base_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
):
    """writeStream writer: admit each micro-batch of documents against
    the parquet base at ``base_dir`` (created on first batch), appending
    only kept rows (one ``b<batch_id>`` subdirectory per batch — read the
    corpus back with :func:`read_admitted`). Returns the un-started
    writer so callers pick the trigger/checkpoint."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        admit_batch(
            spark, batch_df, batch_id, base_dir, id_col, text_col, min_jaccard
        )

    return docs_stream.writeStream.foreachBatch(handle_batch).outputMode(
        "update"
    )
