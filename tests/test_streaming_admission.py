"""Streaming admission == the oracle-checked batch incremental dedup.

Replays the registry's dedup_incremental split (base = doc_id < 400,
batch = doc_id >= 400) as a two-chunk file stream with
maxFilesPerTrigger=1 and asserts the final admitted corpus equals
base + the batch docs the one-shot operator keeps."""

import os
import time

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.decontam import incremental_dedup
from spacetime_crawler4_spark.streaming.admission import (
    admission_stream,
    admit_batch,
    read_admitted,
)

SF_DIR = "/root/testdata/sf0.01"


def test_streaming_admission_matches_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_docs = docs.filter(F.col("doc_id") < 400)
    batch_docs = docs.filter(F.col("doc_id") >= 400)

    drops = tmp_path / "drops"
    drops.mkdir()
    # one file per micro-batch, ordered by mtime (the file source's order)
    base_docs.coalesce(1).write.parquet(str(drops / "d0.parquet"))
    time.sleep(1.1)
    batch_docs.coalesce(1).write.parquet(str(drops / "d1.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops) + "/*/")
    )
    base_dir = str(tmp_path / "admitted")
    q = (
        admission_stream(spark, stream, base_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    admitted = {
        r.doc_id
        for r in read_admitted(spark, base_dir).select("doc_id").collect()
    }
    verdict = incremental_dedup(base_docs, batch_docs, "doc_id", "text")
    kept_batch = {
        r.batch_id for r in verdict.filter(F.col("keep")).collect()
    }
    dropped = {
        r.batch_id for r in verdict.filter(~F.col("keep")).collect()
    }
    expected = {r.doc_id for r in base_docs.select("doc_id").collect()} | kept_batch
    assert dropped, "split must actually drop something for the test to bite"
    assert admitted == expected


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch must (a) not dedup
    against its own failed attempt's partial files and (b) leave the
    admitted set exactly as a single clean run would."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_docs = docs.filter(F.col("doc_id") < 400)
    batch_docs = docs.filter(F.col("doc_id") >= 400)
    base_dir = str(tmp_path / "admitted")

    admit_batch(spark, base_docs, 0, base_dir)

    # plant a partial write from a "crashed" first attempt of batch 1:
    # a subset of the batch already sits in b...001 when the replay runs
    partial = batch_docs.limit(5)
    partial.write.mode("overwrite").parquet(
        os.path.join(base_dir, f"b{1:012d}")
    )

    # replay: must overwrite the partial output and dedup only vs batch 0
    admit_batch(spark, batch_docs, 1, base_dir)
    admitted_replayed = {
        r.doc_id
        for r in read_admitted(spark, base_dir).select("doc_id").collect()
    }

    # clean single-run reference
    clean_dir = str(tmp_path / "clean")
    admit_batch(spark, base_docs, 0, clean_dir)
    admit_batch(spark, batch_docs, 1, clean_dir)
    admitted_clean = {
        r.doc_id
        for r in read_admitted(spark, clean_dir).select("doc_id").collect()
    }

    assert admitted_replayed == admitted_clean
    # and a second full replay of the same batch changes nothing
    admit_batch(spark, batch_docs, 1, base_dir)
    again = {
        r.doc_id
        for r in read_admitted(spark, base_dir).select("doc_id").collect()
    }
    assert again == admitted_clean
