"""Multimodal-plane queries: PNG/JPEG/WAV/AVI codec metadata.

Split from the former single-module queries.py (round 5); definition
order within this file is preserved from the original.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import resources as _res
import math
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spacetime_crawler4_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dup_cluster_stats,
    duplicated_span_stats,
    remove_duplicated_spans,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    oph_lsh_pairs,
    simhash_docs,
    simhash_near_pairs,
    sql_tokens,
    word_shingles,
)
from spacetime_crawler4_spark.operators.multimodal import extract_media_meta
from spacetime_crawler4_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
    weighted_sample,
)
from spacetime_crawler4_spark.operators.webfilter import (
    DOC_GOOD_RULES,
    HOST_BLOCK_MEAN_RULES,
    c4_clean_lines,
    gopher_quality,
    host_reputation,
    repetition_stats,
)
from spacetime_crawler4_spark.operators.asof import asof_join
from spacetime_crawler4_spark.operators.decontam import (
    decontaminate,
    incremental_dedup,
)
from spacetime_crawler4_spark.operators.pii import (
    PII_PATTERNS,
    inject_pii,
    pii_report,
)
from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS
from spacetime_crawler4_spark.operators.graph import hits, pagerank, triangle_count
from spacetime_crawler4_spark.operators.quantize import int8_fidelity
from spacetime_crawler4_spark.operators.sketch import (
    CMS_DEPTH,
    cms_pairs_sql,
    cms_point_estimates,
    cms_registers,
    hll_estimate,
    hll_register_expr,
    hll_sql,
)
from spacetime_crawler4_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_pairs,
    ivf_assign,
    ivf_topk,
    ivf_topk_multiprobe,
    ivf_train,
    srp_near_pairs,
    srp_planes,
)
from spacetime_crawler4_spark.operators.textstats import (
    BACKOFF_ALPHA,
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    bigram_bits_per_token,
    doc_fingerprint,
    langid_heuristic,
    quality_features,
    token_stats,
    unigram_bits_per_token,
)
import os as _os

from ._shared import _t  # noqa: F401



# --------------------------------------------------------------------------
# multimodal plane (binary payload plumbing; stubbed decode)
# --------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: documents.text bytes as an opaque payload ->
    mapInPandas metadata extraction (size/sha/stub-decoded dims). The
    oracle reproduces the deterministic stub in SQL — it checks the Arrow
    plumbing end-to-end, not a real codec."""
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_media_meta(media).orderBy("media_id")


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
       CAST(1 + (octet_length(encode(text)) // 640) % 480 AS INTEGER) AS height,
       CASE WHEN length(text) = 0 THEN 'png'
            WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN 'png'
            ELSE 'jpeg' END AS format
FROM documents ORDER BY media_id
"""


def q_multimodal_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: build a 10×10 24-bit BMP whose pixel
    bytes are the document's text bytes (modular indexing), then DECODE it
    with the numpy BMP parser (header offset, row padding, bottom-up rows)
    and emit per-channel means. The oracle recomputes the identical means
    straight from the text's character codes — any decode bug (padding,
    row order, channel order) breaks the hash match."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from spacetime_crawler4_spark.operators.multimodal import (
        encode_bmp,
        extract_media_features,
    )

    @pandas_udf(BinaryType())
    def bmp_payload(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "?").encode("utf-8")
            pix = bytes(b[j % len(b)] for j in range(300))
            out.append(encode_bmp(pix, 10, 10))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), bmp_payload(F.col("text")).alias("payload")
    )
    feats = extract_media_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    ).orderBy("doc_id")


# pixel byte j of the BMP is text byte j mod len(text); pixels are stored
# B,G,R — so channel means are means over code positions 3p / 3p+1 / 3p+2
SQL_MULTIMODAL_BMP = """
WITH px AS (SELECT doc_id,
                   [ascii(substr(text, CAST((j % length(text)) + 1 AS INTEGER), 1))
                    for j in range(0, 300)] AS cs
            FROM documents)
SELECT doc_id, CAST(10 AS INTEGER) AS width, CAST(10 AS INTEGER) AS height,
       round(list_avg([cs[3 * p + 3] for p in range(0, 100)]), 6) AS mean_r,
       round(list_avg([cs[3 * p + 2] for p in range(0, 100)]), 6) AS mean_g,
       round(list_avg([cs[3 * p + 1] for p in range(0, 100)]), 6) AS mean_b
FROM px ORDER BY doc_id
"""


def q_multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end: synthesize 400 PCM16 samples from the
    text's character codes, wrap them in a RIFF/WAVE container, DECODE with
    the chunk-walking WAV parser, emit (n_samples, sample_rate, rms); the
    oracle recomputes rms straight from the codes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from spacetime_crawler4_spark.operators.multimodal import (
        encode_wav_pcm16,
        extract_media_features,
    )

    @pandas_udf(BinaryType())
    def wav_payload(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "?").encode("utf-8")
            samples = [(b[j % len(b)] - 64) * 128 for j in range(400)]
            out.append(encode_wav_pcm16(samples, 8000))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), wav_payload(F.col("text")).alias("payload")
    )
    feats = extract_media_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_samples",
        "sample_rate",
        F.round("rms", 4).alias("rms"),
    ).orderBy("doc_id")


SQL_MULTIMODAL_WAV = """
WITH s AS (SELECT doc_id,
                  [(ascii(substr(text, CAST((j % length(text)) + 1 AS INTEGER), 1)) - 64) * 128
                   for j in range(0, 400)] AS ss
           FROM documents)
SELECT doc_id, CAST(400 AS BIGINT) AS n_samples, CAST(8000 AS INTEGER) AS sample_rate,
       round(sqrt(list_avg([CAST(x AS DOUBLE) * x for x in ss])), 4) AS rms
FROM s ORDER BY doc_id
"""


def q_multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec end-to-end (round 4 — retires the png stub): build a
    10×10 RGB PNG whose pixel bytes are the document's text bytes (modular
    indexing) with the per-row filter type CYCLING through all five PNG
    filters (None/Sub/Up/Average/Paeth), zlib-deflate it, then DECODE with
    the chunk-walking stdlib-zlib parser and emit per-channel means. PNG
    filtering is lossless, so the oracle recomputes the identical means
    straight from the character codes — any unfilter bug (Paeth ties,
    first-column/first-row edges, CRC handling) breaks the hash match."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from spacetime_crawler4_spark.operators.multimodal import (
        encode_png,
        extract_media_features,
    )

    @pandas_udf(BinaryType())
    def png_payload(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "?").encode("utf-8")
            pix = bytes(b[j % len(b)] for j in range(300))
            out.append(
                encode_png(pix, 10, 10, color_type=2, filters=[y % 5 for y in range(10)])
            )
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), png_payload(F.col("text")).alias("payload")
    )
    feats = extract_media_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    ).orderBy("doc_id")


# PNG pixels are stored R,G,B (opposite of BMP): pixel byte j is text byte
# j mod len(text), so channel means are means over code positions
# 3p / 3p+1 / 3p+2 (1-indexed below). Filtering is lossless — the filter
# plan never appears in the oracle, only in the bitstream under test.
SQL_MULTIMODAL_PNG = """
WITH px AS (SELECT doc_id,
                   [ascii(substr(text, CAST((j % length(text)) + 1 AS INTEGER), 1))
                    for j in range(0, 300)] AS cs
            FROM documents)
SELECT doc_id, CAST(10 AS INTEGER) AS width, CAST(10 AS INTEGER) AS height,
       round(list_avg([cs[3 * p + 1] for p in range(0, 100)]), 6) AS mean_r,
       round(list_avg([cs[3 * p + 2] for p in range(0, 100)]), 6) AS mean_g,
       round(list_avg([cs[3 * p + 3] for p in range(0, 100)]), 6) AS mean_b
FROM px ORDER BY doc_id
"""


def q_multimodal_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata + frame sampling (round 4 — retires
    the video stub): wrap each document in a structurally-valid RIFF/AVI
    header (n_frames derived from the text length, 25 fps), PARSE it back
    with the RIFF/hdrl/avih walker, then explode the every-30th-frame
    sampling plan (pure JVM sequence+explode). The oracle re-derives the
    frame indices from the text length alone, so a mis-parsed header
    (wrong offset, missed word alignment) shifts every row."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from spacetime_crawler4_spark.operators.multimodal import (
        encode_avi_header,
        extract_video_meta,
        frame_sample_plan,
    )

    @pandas_udf(BinaryType())
    def avi_payload(text: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_avi_header(1 + len(t or "") % 240, 320, 240, 40000)
                for t in text
            ]
        )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), avi_payload(F.col("text")).alias("payload")
    )
    meta = extract_video_meta(media)
    plan = frame_sample_plan(meta, n_frames_col="n_frames", every=30)
    return (
        meta.select("media_id", "n_frames", "width", "height", F.round("fps", 4).alias("fps"))
        .join(plan, "media_id")
        .select(
            F.col("media_id").alias("doc_id"),
            "n_frames", "width", "height", "fps", "frame_idx",
        )
        .orderBy("doc_id", "frame_idx")
    )


SQL_MULTIMODAL_VIDEO = """
WITH m AS (SELECT doc_id, CAST(1 + length(text) % 240 AS INTEGER) AS n_frames
           FROM documents)
SELECT doc_id, n_frames,
       CAST(320 AS INTEGER) AS width, CAST(240 AS INTEGER) AS height,
       CAST(25.0 AS DOUBLE) AS fps,
       CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_idx
FROM m ORDER BY doc_id, frame_idx
"""


def q_multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG codec end-to-end: per doc, 16 constant 8×8 blocks
    whose levels come from the text's character codes are entropy-coded into
    a 32×32 grayscale baseline JPEG (analytically exact coefficients:
    constant block v → DC = (v-128)/2 at quant 16, AC = 0), then DECODED by
    the full baseline pipeline — Huffman MCU scan, DC differential,
    dezigzag, dequantize, IDCT — and the luma mean emitted. The oracle
    recomputes the mean straight from the character codes, so any decode
    bug (canonical-code build, EXTEND sign, zigzag map, IDCT scale) breaks
    the value hash."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from spacetime_crawler4_spark.operators.multimodal import (
        encode_jpeg_gray,
        extract_media_features,
    )

    @pandas_udf(BinaryType())
    def jpeg_payload(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = (t or "?").encode("utf-8")
            # block value v = 2*(code%128) (even => exact DC quantization);
            # decoded pixel = dequant(DC)/8 + 128 = v exactly
            levels = np.array(
                [b[j % len(b)] % 128 for j in range(16)], np.int32
            ).reshape(4, 4)
            blocks = np.zeros((4, 4, 8, 8), np.int32)
            blocks[:, :, 0, 0] = levels - 64  # (2*level - 128) / 2
            out.append(encode_jpeg_gray(blocks, 32, 32))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), jpeg_payload(F.col("text")).alias("payload")
    )
    feats = extract_media_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        F.round("mean_g", 6).alias("mean_gray"),
    ).orderBy("doc_id")


SQL_MULTIMODAL_JPEG = """
WITH v AS (SELECT doc_id,
                  [ascii(substr(text, CAST((j % length(text)) + 1 AS INTEGER), 1)) % 128
                   for j in range(0, 16)] AS vs
           FROM documents)
SELECT doc_id, CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height,
       round(list_avg([2 * x for x in vs]), 6) AS mean_gray
FROM v ORDER BY doc_id
"""
