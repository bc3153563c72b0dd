"""Multimodal plumbing: mapInPandas metadata extraction over binary
payloads and the JVM-only frame-sampling plan."""

import hashlib

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.multimodal import (
    decode_image_stub,
    extract_media_meta,
    frame_sample_plan,
)


def test_extract_media_meta_roundtrip(spark):
    payloads = [b"", b"\x89PNG fake", b"\xff\xd8jpeg-ish" * 100, bytes(range(256))]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in extract_media_meta(df).collect()}
    assert len(rows) == len(payloads)
    for i, p in enumerate(payloads):
        r = rows[i]
        assert r["n_bytes"] == len(p)
        assert r["sha"] == hashlib.sha256(p).hexdigest()
        assert (r["width"], r["height"], r["format"]) == decode_image_stub(p)


def test_extract_media_meta_is_arrow(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    plan = extract_media_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 95), (2, 0), (3, 30)], "media_id long, n_frames int"
    )
    got = sorted(
        (r["media_id"], r["frame_idx"])
        for r in frame_sample_plan(df, every=30).collect()
    )
    assert got == [(1, 0), (1, 30), (1, 60), (1, 90), (2, 0), (3, 0)]
    plan = frame_sample_plan(df, every=30)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure JVM explode
