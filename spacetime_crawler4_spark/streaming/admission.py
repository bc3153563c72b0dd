"""Streaming corpus admission — rolling ingestion with incremental dedup.

The streaming twin of ``operators/decontam.incremental_dedup``: document
batches arrive as a stream; each micro-batch is deduped against the
*accumulated admitted corpus* (MinHash-banded candidates, batch x base
only; exact-Jaccard verify) and the kept rows are appended to the base.
This is the shape a rolling Common-Crawl ingest actually runs: the base
is a durable table (Iceberg in production, a parquet directory here —
same append-only discipline), the per-batch cost scales with the batch
and its colliding buckets, never with |base|², and exactly-once-ness
comes from the sink's atomic appends plus the stream checkpoint, not
from driver state.

Batch-equivalence contract (tested): streaming the corpus in ordered
chunks admits exactly the docs the one-shot batch operator admits for
the same base/batch split — tests/test_streaming_admission.py replays
the registry's oracle-checked ``dedup_incremental`` split through the
stream and compares the admitted sets row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.decontam import incremental_dedup


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
    only kept rows. Returns the un-started writer so callers pick the
    trigger/checkpoint."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        if not os.path.exists(base_dir):
            # first batch bootstraps the base after an *internal* dedup
            # against nothing — every doc admits (intra-batch dups are
            # the intra-corpus planes' job, same as the batch operator)
            batch_df.write.mode("overwrite").parquet(base_dir)
            return
        base = spark.read.parquet(base_dir)
        verdict = incremental_dedup(
            base, batch_df, id_col, text_col, min_jaccard=min_jaccard
        )
        kept = batch_df.join(
            verdict.filter(F.col("keep")).select(
                F.col("batch_id").alias(id_col)
            ),
            id_col,
        )
        kept.write.mode("append").parquet(base_dir)

    return docs_stream.writeStream.foreachBatch(handle_batch).outputMode(
        "update"
    )
