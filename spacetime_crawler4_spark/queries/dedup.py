"""Dedup-plane queries: exact/MinHash/SimHash/semantic/substring dedup.

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

from ._shared import CONT_MIN, INCR_SPLIT_ID, JACCARD_MAX_DF, SPAN_N, WINNOW_MAX_DF, WINNOW_MIN_SHARED, _DUCK_TOKS, _TFIDF_MAX_DF, _TFIDF_MIN_COS, _stopwords, _t, _wordhash_values  # noqa: F401
from .sketch import _duck_grams  # noqa: F401
from .similarity import _CENTROID_VALUES, _SQL_SRP_BASE, _SRP_BAND_BITS, _SRP_MIN_COS, _SRP_PLANES, _centroids_df, _duck_cos  # noqa: F401



# --------------------------------------------------------------------------
# dedup plane (SURVEY.md §2.3 J4/J5 + training-data dedup suite)
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (J4 analogue on documents)."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dup_groups(docs, "doc_id", "text").orderBy("bucket")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS bucket, count(*) AS n_members, min(doc_id) AS master_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY bucket
"""


def q_dedup_prefix_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a first-2-token prefix key — same operator shape as
    q_dedup_exact but guaranteed non-trivial buckets on this corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = sql_tokens(F.col("text"))
    keyed = docs.select(
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 2))).alias("bucket"),
        F.col("doc_id").alias("id"),
    )
    return (
        keyed.groupBy("bucket")
        .agg(F.count("*").alias("n_members"), F.min("id").alias("master_id"))
        .filter(F.col("n_members") > 1)
        .orderBy("bucket")
    )


SQL_DEDUP_PREFIX = f"""
WITH keyed AS (
  SELECT md5(array_to_string(({_DUCK_TOKS})[1:2], ' ')) AS bucket, doc_id AS id
  FROM documents)
SELECT bucket, count(*) AS n_members, min(id) AS master_id
FROM keyed GROUP BY bucket HAVING count(*) > 1 ORDER BY bucket
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar document pairs by word-3-gram Jaccard, with the
    standard doc-frequency cap on shingles (a shingle in d docs contributes
    d²/2 join rows; capping df keeps the co-occurrence join linear at
    corpus scale — the oracle applies the identical cap)."""
    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(
        word_shingles(docs, "doc_id", "text", 3), top_k=20, max_df=JACCARD_MAX_DF
    )


SQL_DEDUP_JACCARD = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh0 AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
dfc AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {JACCARD_MAX_DF}),
sh AS (SELECT id, sh0.shingle FROM sh0 JOIN dfc USING (shingle)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
ORDER BY jaccard DESC, id_a, id_b LIMIT 20
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (Broder): pairs where the smaller
    word-3-gram set is >= 80% inside the larger — the engulfment family
    (boilerplate wrappers, quoted inclusions) that symmetric Jaccard
    misses. Same df-capped equi-join shape as dedup_ngram_jaccard, with
    the Jaccard reported alongside to show the asymmetry."""
    docs = _t(spark, sf_dir, "documents")
    return containment_pairs(
        word_shingles(docs, "doc_id", "text", 3),
        min_containment=CONT_MIN,
        max_df=JACCARD_MAX_DF,
    ).orderBy(F.desc("cont_small"), "id_a", "id_b")


SQL_DEDUP_CONTAINMENT = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh0 AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
dfc AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {JACCARD_MAX_DF}),
sh AS (SELECT id, sh0.shingle FROM sh0 JOIN dfc USING (shingle)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter / least(sa.sz, sb.sz), 6) AS cont_small,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
WHERE round(inter / least(sa.sz, sb.sz), 6) >= {CONT_MIN}
ORDER BY cont_small DESC, id_a, id_b
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=8, md5 family) banded 4×2 + exact-Jaccard verify ≥0.5."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    return minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5).orderBy("id_a", "id_b")


SQL_DEDUP_MINHASH = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
sig AS (SELECT id, band,
               min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
        FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
        GROUP BY id, band),
bands AS (SELECT id, CAST(band // 2 AS INTEGER) AS band_id,
                 md5(string_agg(sig, '|' ORDER BY band)) AS bsig
          FROM sig GROUP BY id, band // 2),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.bsig = b.bsig AND a.id < b.id),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
ORDER BY id_a, id_b
"""


MINHASH_RECALL_THRESHOLDS = (0.5, 0.6, 0.7)


def q_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured MinHash-banding recall vs the EXACT Jaccard pair set at
    three thresholds — the committed evidence for the 4×2 banding
    trade-off (P(candidate)=1-(1-J²)⁴: ≈0.68 at J=0.5, ≈0.94 at J=0.7),
    like dedup_srp_recall is for the hyperplane plane. Precision is 1.0
    by construction (exact verify on candidates), so recall is the only
    quantity banding can lose; the exact side here is the uncapped
    co-occurrence join — affordable at audit scale, which is the point
    of the audit."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    lo = min(MINHASH_RECALL_THRESHOLDS)
    exact = jaccard_pairs(sh, min_jaccard=lo)
    lsh = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=lo)
    thr = spark.createDataFrame(
        [(t,) for t in MINHASH_RECALL_THRESHOLDS], "thr double"
    )
    n_exact = (
        thr.join(exact, exact.jaccard >= thr.thr, "left")
        .groupBy("thr")
        .agg(F.count(exact.jaccard).alias("n_exact"))
    )
    n_lsh = (
        thr.join(lsh, lsh.jaccard >= thr.thr, "left")
        .groupBy("thr")
        .agg(F.count(lsh.jaccard).alias("n_lsh"))
    )
    return (
        n_exact.join(n_lsh, "thr")
        .select(
            "thr",
            "n_exact",
            "n_lsh",
            F.round(F.col("n_lsh") / F.col("n_exact"), 4).alias("recall"),
        )
        .orderBy("thr")
    )


def _sql_minhash_recall() -> str:
    thr_values = ", ".join(
        f"(CAST({t} AS DOUBLE))" for t in MINHASH_RECALL_THRESHOLDS
    )
    pair_ctes = _SQL_MINHASH_PAIR_CTES.split(",\nsym AS")[0]
    return f"""
WITH {pair_ctes},
lsh AS (SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
        WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5),
xinter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
           GROUP BY 1, 2),
exact AS (SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
          FROM xinter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
          WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5),
thr(thr) AS (VALUES {thr_values})
SELECT t.thr,
       (SELECT count(*) FROM exact e WHERE e.jaccard >= t.thr) AS n_exact,
       (SELECT count(*) FROM lsh l WHERE l.jaccard >= t.thr) AS n_lsh,
       round((SELECT count(*) FROM lsh l WHERE l.jaccard >= t.thr) * 1.0
             / (SELECT count(*) FROM exact e WHERE e.jaccard >= t.thr), 4) AS recall
FROM thr t ORDER BY t.thr
"""


# shared CTE chain: minhash-LSH verified pairs (identical to
# SQL_DEDUP_MINHASH) — reused by the connected-components oracles below,
# which close over the pair graph with a recursive CTE.
# verified-pair prefix (non-recursive) — reusable without the CC closure
_SQL_MINHASH_VERIFIED_PAIRS_CTES = f"""
toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
sig AS (SELECT id, band,
               min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
        FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
        GROUP BY id, band),
bands AS (SELECT id, CAST(band // 2 AS INTEGER) AS band_id,
                 md5(string_agg(sig, '|' ORDER BY band)) AS bsig
          FROM sig GROUP BY id, band // 2),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.bsig = b.bsig AND a.id < b.id),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b
          FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
          WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5)"""

_SQL_MINHASH_PAIR_CTES = (
    _SQL_MINHASH_VERIFIED_PAIRS_CTES
    + """,
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
comp AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src)
"""
)


def q_dedup_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: minhash-LSH verified pairs closed into connected
    components (pointer-jumping, O(log n) rounds) — each doc labeled with
    its component's minimum id, i.e. the keep-one master a dedup pipeline
    keeps. Oracle closes the identical pair graph with a recursive CTE."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    return connected_components(pairs).orderBy("id")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES}
SELECT id, cluster_id FROM comp ORDER BY id
"""


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster keep-one summary over the minhash components:
    (cluster_id, n_members, n_dropped) — n_dropped is exactly the rows a
    keep-master dedup pass deletes from the corpus."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    return dup_cluster_stats(connected_components(pairs)).orderBy("cluster_id")


SQL_DEDUP_CLUSTER_STATS = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES}
SELECT cluster_id, count(*) AS n_members,
       count(*) - 1 AS n_dropped
FROM comp GROUP BY cluster_id ORDER BY cluster_id
"""


def q_dedup_simhash_refparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity 32-bit simhash per document (crc64 hash family).

    Oracle: the crc64 word-hash dictionary (computed once from the corpus
    vocabulary by functions/crc.crc64 — itself differentially tested
    against reference helpers/crc64.py) is inlined as a VALUES table; the
    SQL re-runs the bit-vote sum per lane and re-packs the fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_docs(docs, "doc_id", "text").orderBy("id")


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup pairs over the parity simhash; oracle re-derives
    every fingerprint in SQL and cross-joins with bit_count(xor) <= 5."""
    docs = _t(spark, sf_dir, "documents")
    sim = simhash_docs(docs, "doc_id", "text").select("id", "smhash")
    return simhash_near_pairs(sim, threshold=5).orderBy("id_a", "id_b")


def q_dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit simhash near-dup pairs (full crc64 lanes) — the production
    dedup plane: the 32-bit parity fingerprint saturates combinatorially
    at corpus scale (BASELINE.md), the 64-bit one keeps candidate volume
    linear. Same banding (threshold+1) + bit_count verify."""
    docs = _t(spark, sf_dir, "documents")
    sim = simhash_docs(docs, "doc_id", "text", bits=64).select("id", "smhash")
    return simhash_near_pairs(sim, threshold=5, bits=64).orderBy("id_a", "id_b")


def q_dedup_simhash_bitwidth_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bits, n_pairs): measured near-pair density of the 32-bit parity
    fingerprint vs the 64-bit production fingerprint on the SAME corpus —
    the quantitative case for widening the dedup plane."""
    docs = _t(spark, sf_dir, "documents")
    s32 = simhash_docs(docs, "doc_id", "text", bits=32).select("id", "smhash")
    s64 = simhash_docs(docs, "doc_id", "text", bits=64).select("id", "smhash")
    c32 = (
        simhash_near_pairs(s32, threshold=5, bits=32)
        .agg(F.count("*").alias("n_pairs"))
        .select(F.lit(32).alias("bits"), "n_pairs")
    )
    c64 = (
        simhash_near_pairs(s64, threshold=5, bits=64)
        .agg(F.count("*").alias("n_pairs"))
        .select(F.lit(64).alias("bits"), "n_pairs")
    )
    return c32.unionByName(c64).orderBy("bits")


def _sql_simhash_fp(width: int) -> str:
    """Shared CTE chain ending in fp(id, smhash_str[, smhash]): the per-doc
    simhash re-derived in SQL — reference tokenization (whitespace split
    minus the vendored stopword list, exactly the reference tokenizer's
    output on this corpus — see q_crawl_top50_parity_tokens), word counts,
    crc64 dictionary join, per-lane bit-vote sum, MSB-first packing."""
    stop = ", ".join("'" + w.replace("'", "''") + "'" for w in _stopwords())
    hcol = "h32" if width == 32 else "h64"
    num = (
        ",\n              CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) "
        "<< (31 - i) ELSE 0 END) AS BIGINT) AS smhash"
        if width == 32
        else ""
    )
    num_outer = ", coalesce(fp0.smhash, 0) AS smhash" if width == 32 else ""
    return f"""
toks AS (SELECT doc_id AS id,
                unnest([t for t in regexp_split_to_array(lower(text), '\\s+')
                        if t <> '' AND t NOT IN ({stop})]) AS word
         FROM documents),
wc AS (SELECT id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
wh(word, h32, h64) AS (VALUES {_wordhash_values()}),
votes AS (SELECT wc.id, b.i,
                 sum(CASE WHEN substr(wh.{hcol}, b.i + 1, 1) = '1'
                          THEN wc.cnt ELSE -wc.cnt END) AS v
          FROM wc JOIN wh USING (word)
          CROSS JOIN (SELECT unnest(range(0, {width})) AS i) b
          GROUP BY 1, 2),
fp0 AS (SELECT id,
              string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, ''
                         ORDER BY i) AS smhash_str{num}
        FROM votes GROUP BY id),
fp AS (SELECT d.doc_id AS id,
              coalesce(fp0.smhash_str, repeat('0', {width})) AS smhash_str{num_outer}
       FROM documents d LEFT JOIN fp0 ON fp0.id = d.doc_id)
"""


def _sql_simhash_refparity() -> str:
    return f"WITH {_sql_simhash_fp(32)} SELECT id, smhash, smhash_str FROM fp ORDER BY id"


def _sql_simhash_pairs() -> str:
    return f"""
WITH {_sql_simhash_fp(32)}
SELECT a.id AS id_a, b.id AS id_b,
       CAST(hamming(a.smhash_str, b.smhash_str) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.id < b.id
WHERE hamming(a.smhash_str, b.smhash_str) <= 5
ORDER BY id_a, id_b
"""


def _sql_simhash64_pairs() -> str:
    return f"""
WITH {_sql_simhash_fp(64)}
SELECT a.id AS id_a, b.id AS id_b,
       CAST(hamming(a.smhash_str, b.smhash_str) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.id < b.id
WHERE hamming(a.smhash_str, b.smhash_str) <= 5
ORDER BY id_a, id_b
"""


def _sql_simhash_bitwidth_density() -> str:
    return f"""
WITH fp32 AS (WITH {_sql_simhash_fp(32)} SELECT id, smhash_str FROM fp),
fp64 AS (WITH {_sql_simhash_fp(64)} SELECT id, smhash_str FROM fp),
c32 AS (SELECT 32 AS bits, count(*) AS n_pairs
        FROM fp32 a JOIN fp32 b ON a.id < b.id
        WHERE hamming(a.smhash_str, b.smhash_str) <= 5),
c64 AS (SELECT 64 AS bits, count(*) AS n_pairs
        FROM fp64 a JOIN fp64 b ON a.id < b.id
        WHERE hamming(a.smhash_str, b.smhash_str) <= 5)
SELECT bits, n_pairs FROM c32 UNION ALL SELECT bits, n_pairs FROM c64
ORDER BY bits
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-cell-blocked (cos >= 0.35)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, _centroids_df(spark, emb), 0.35).orderBy(
        "id_a", "id_b"
    )


SQL_DEDUP_EMBEDDING = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cids(cell, cvid) AS (VALUES {_CENTROID_VALUES}),
cent AS (SELECT cell, v AS cv FROM cids JOIN e ON e.vec_id = cids.cvid),
scored AS (SELECT e.vec_id, e.v, cent.cell,
                  {_duck_cos("e.v", "cent.cv")} AS ccos
           FROM e CROSS JOIN cent),
assigned AS (SELECT vec_id, v, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell ASC) AS rn FROM scored)
    WHERE rn = 1),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 {_duck_cos("a.v", "b.v")} AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.35 ORDER BY id_a, id_b
"""


_SEMDEDUP_MIN_COS = 0.35


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540) on the committed IVF codebook: embeddings coarse-
    cluster via the zero-shuffle inline-codebook assign, within-cell
    cosine pairs >= 0.35 close into connected components (pointer
    jumping, O(log n) rounds), and every non-minimum member of a
    component drops — the embedding-space twin of the lexical minhash
    keep-one rule. Output is the per-cell admission ledger (members /
    kept / dropped). Cell blocking prices the pair stage at collision
    volume, never corpus²; the oracle closes the identical pair graph
    with a recursive CTE."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = _centroids_df(spark, emb)
    assigned = ivf_assign(emb, cents).select("vec_id", "cell")
    pairs = embedding_near_pairs(emb, cents, _SEMDEDUP_MIN_COS)
    cc = connected_components(pairs)
    flags = assigned.join(cc, assigned.vec_id == cc.id, "left")
    dropped = (
        F.col("cluster_id").isNotNull() & (F.col("cluster_id") != F.col("vec_id"))
    ).cast("long")
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(dropped).alias("n_dropped"),
            (F.count("*") - F.sum(dropped)).alias("n_kept"),
        )
        .orderBy("cell")
    )


SQL_DEDUP_SEMANTIC = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cids(cell, cvid) AS (VALUES {_CENTROID_VALUES}),
cent AS (SELECT cell, v AS cv FROM cids JOIN e ON e.vec_id = cids.cvid),
scored AS (SELECT e.vec_id, e.v, cent.cell,
                  {_duck_cos("e.v", "cent.cv")} AS ccos
           FROM e CROSS JOIN cent),
assigned AS (SELECT vec_id, v, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell ASC) AS rn FROM scored)
    WHERE rn = 1),
pairs AS (SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_cos("a.v", "b.v")} AS cos
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id) p
    WHERE cos >= {_SEMDEDUP_MIN_COS}),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
comp AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src)
SELECT a.cell, count(*) AS n_members,
       CAST(sum(CASE WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> a.vec_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN c.cluster_id IS NOT NULL
                           AND c.cluster_id <> a.vec_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM assigned a LEFT JOIN comp c ON c.id = a.vec_id
GROUP BY a.cell ORDER BY a.cell
"""


def q_dedup_srp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup pairs: 16-bit SRP signatures (map-only),
    4-bit band equi-join for candidates, exact cosine verify (>= 0.35).
    Same LSH topology as the MinHash plane — the one shuffle is keyed on
    (band_idx, band_val), so candidate volume, not corpus size, prices
    the verify stage."""
    emb = _t(spark, sf_dir, "embeddings")
    return srp_near_pairs(
        emb, _SRP_PLANES, _SRP_BAND_BITS, _SRP_MIN_COS
    ).orderBy("id_a", "id_b")


SQL_DEDUP_SRP = f"""
WITH {_SQL_SRP_BASE}
SELECT id_a, id_b, hamming, cos FROM srp ORDER BY id_a, id_b
"""


def q_dedup_srp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured SRP recall vs the exact cosine pair set at three
    similarity thresholds — banding catches tighter pairs with higher
    probability (sign-agreement 1 - theta/pi per bit), and this query is
    the committed evidence of that trade-off, like ann_ivf_recall is for
    the IVF plane."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    exact = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.round(
            cosine(F.col("a.embedding"), F.col("b.embedding")), 6
        ).alias("cos")
    ).filter(F.col("cos") >= _SRP_MIN_COS)
    srp = srp_near_pairs(emb, _SRP_PLANES, _SRP_BAND_BITS, _SRP_MIN_COS)
    thr = spark.createDataFrame(
        [(0.35,), (0.40,), (0.45,)], "thr double"
    )
    # left join + count(cos), NOT inner + count(*): a threshold with zero
    # exact pairs must still emit its row with n_exact=0, matching the
    # oracle's scalar subquery (same shape as q_dedup_minhash_recall)
    n_exact = (
        thr.join(exact, exact.cos >= thr.thr, "left")
        .groupBy("thr")
        .agg(F.count(exact.cos).alias("n_exact"))
    )
    n_srp = (
        thr.join(srp, srp.cos >= thr.thr, "left")
        .groupBy("thr")
        .agg(F.count(srp.cos).alias("n_srp"))
    )
    return (
        n_exact.join(n_srp, "thr")
        .select(
            "thr",
            "n_exact",
            "n_srp",
            F.round(F.col("n_srp") / F.col("n_exact"), 4).alias("recall"),
        )
        .orderBy("thr")
    )


SQL_DEDUP_SRP_RECALL = f"""
WITH {_SQL_SRP_BASE},
exact AS (SELECT cos FROM (
            SELECT {_duck_cos("a.v", "b.v")} AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id) x
          WHERE cos >= {_SRP_MIN_COS}),
t(thr) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES (0.35), (0.40), (0.45)) v(x))
SELECT t.thr,
       (SELECT count(*) FROM exact x WHERE x.cos >= t.thr) AS n_exact,
       (SELECT count(*) FROM srp p WHERE p.cos >= t.thr) AS n_srp,
       round((SELECT count(*) FROM srp p WHERE p.cos >= t.thr) * 1.0
             / (SELECT count(*) FROM exact x WHERE x.cos >= t.thr), 4) AS recall
FROM t ORDER BY t.thr
"""


def q_webfilter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 A1.1) per document — the
    features, the seven rule flags, and the keep verdict. Map-only."""
    docs = _t(spark, sf_dir, "documents")
    return gopher_quality(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "n_stop_hits",
        "flag_word_count",
        "flag_mean_word_len",
        "flag_stopwords",
        "gopher_keep",
    ).orderBy("doc_id")


SQL_WEBFILTER_GOPHER = r"""
WITH w AS (SELECT doc_id,
                  [x for x in regexp_split_to_array(text, '\s+') if x <> ''] AS ws,
                  text
           FROM documents),
f AS (SELECT doc_id,
        len(ws) AS n_words,
        CASE WHEN len(ws) > 0
             THEN round(CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws), 6)
             ELSE 0.0 END AS mean_word_len,
        CASE WHEN len(ws) > 0
             THEN round(CAST(len([x for x in ws if regexp_matches(x, '[A-Za-z]')]) AS DOUBLE) / len(ws), 6)
             ELSE 0.0 END AS frac_alpha_words,
        len([s for s in ['the','be','to','of','and','that','have','with']
             if list_contains([lower(x) for x in ws], s)]) AS n_stop_hits,
        CASE WHEN len(ws) > 0
             THEN round(CAST(len(regexp_extract_all(text, '#'))
                             + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) / len(ws), 6)
             ELSE 0.0 END AS symbol_ratio,
        CASE WHEN len(string_split(text, chr(10))) > 0
             THEN round(CAST(len([l for l in string_split(text, chr(10))
                                  if regexp_matches(ltrim(l), '^[-*•]')]) AS DOUBLE)
                        / len(string_split(text, chr(10))), 6)
             ELSE 0.0 END AS frac_bullet,
        CASE WHEN len(string_split(text, chr(10))) > 0
             THEN round(CAST(len([l for l in string_split(text, chr(10))
                                  if regexp_matches(l, '\.\.\.$')]) AS DOUBLE)
                        / len(string_split(text, chr(10))), 6)
             ELSE 0.0 END AS frac_ellipsis
      FROM w)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_hits,
       (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS flag_mean_word_len,
       (n_stop_hits >= 2) AS flag_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND symbol_ratio <= 0.1 AND frac_bullet <= 0.9 AND frac_ellipsis <= 0.3
        AND frac_alpha_words >= 0.8 AND n_stop_hits >= 2) AS gopher_keep
FROM f ORDER BY doc_id
"""

# the shared w/f feature CTEs of the gopher oracle (everything before its
# final per-doc SELECT) — reused by the host-reputation aggregate
_GOPHER_FEATURE_CTES = SQL_WEBFILTER_GOPHER.split("\nSELECT doc_id, n_words")[0]


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental admission: dedupe the new batch (doc_id >= 400)
    against the existing corpus (doc_id < 400) via MinHash-banded
    candidates (batch x base only — the base never self-joins) with
    exact-Jaccard verification; each batch doc gets keep/drop plus its
    best verified base match for lineage."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < INCR_SPLIT_ID)
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT_ID)
    return incremental_dedup(
        base, batch, "doc_id", "text", n=3, k=8, r=2, min_jaccard=0.5
    ).orderBy("batch_id")


SQL_DEDUP_INCREMENTAL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS ({_duck_grams(3)}),
sig AS (SELECT id, band, min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
        FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
        GROUP BY id, band),
bands AS (SELECT id, CAST(band // 2 AS INTEGER) AS band_id,
                 md5(string_agg(sig, '|' ORDER BY band)) AS bsig
          FROM sig GROUP BY id, band // 2),
cand AS (SELECT DISTINCT q.id AS batch_id, c.id AS base_id
         FROM bands q JOIN bands c
           ON q.band_id = c.band_id AND q.bsig = c.bsig
         WHERE q.id >= {INCR_SPLIT_ID} AND c.id < {INCR_SPLIT_ID}),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
verified AS (
  SELECT v.batch_id, v.base_id, v.jaccard FROM (
    SELECT i.batch_id, i.base_id,
           round(i.inter / (sq.sz + sb.sz - i.inter), 6) AS jaccard
    FROM (SELECT c.batch_id, c.base_id, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.id = c.batch_id
          JOIN sh b ON b.id = c.base_id AND b.shingle = a.shingle
          GROUP BY 1, 2) i
    JOIN sz sq ON sq.id = i.batch_id JOIN sz sb ON sb.id = i.base_id) v
  WHERE v.jaccard >= 0.5),
best AS (SELECT batch_id, base_id, jaccard FROM (
           SELECT *, row_number() OVER (PARTITION BY batch_id
                     ORDER BY jaccard DESC, base_id ASC) AS rn
           FROM verified) WHERE rn = 1)
SELECT d.doc_id AS batch_id, best.base_id AS dup_of, best.jaccard,
       best.base_id IS NULL AS keep
FROM documents d LEFT JOIN best ON best.batch_id = d.doc_id
WHERE d.doc_id >= {INCR_SPLIT_ID} ORDER BY batch_id
"""


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup report (the relational form of Lee et
    al. 2022's suffix-array method at window width 8): per document, the
    count of maximal duplicated spans, duplicated words, and duplicated
    fraction. One whash shuffle for occurrence counts + one per-doc
    window for run-length span merging — linear in corpus words."""
    docs = _t(spark, sf_dir, "documents")
    st = duplicated_span_stats(docs, "doc_id", "text", SPAN_N)
    return (
        st.select(
            F.col("id").alias("doc_id"),
            "n_spans",
            "dup_words",
            F.col("n_words").cast("long").alias("n_words"),
            "dup_frac",
        )
        .orderBy(F.desc("dup_frac"), F.desc("dup_words"), "doc_id")
    )


def q_dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of exact-substring dedup (Lee et al. keep-one
    semantics): duplicated word-8-gram occurrences after the globally
    first are cut from the text; per-doc word counts before/after plus a
    cleaned-text prefix. whash rank shuffle + per-doc coverage window +
    ordered re-aggregate — linear, no suffix array."""
    docs = _t(spark, sf_dir, "documents")
    out = remove_duplicated_spans(docs, "doc_id", "text", SPAN_N)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "kept_words",
        F.substring("cleaned", 1, 120).alias("cleaned_prefix"),
    ).orderBy("doc_id")


def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse tf-idf cosine near-dup pairs (Bayardo et al. WWW'07 shape):
    the TERM-vector complement of the shingle-Jaccard and embedding-cosine
    planes. df-capped space (df <= 50) bounds the posting self-join at
    max_df²/2 candidates per term — never corpus²."""
    from spacetime_crawler4_spark.operators.dedup import tfidf_cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, max_df=_TFIDF_MAX_DF, min_cos=_TFIDF_MIN_COS
    ).orderBy("id_a", "id_b")


SQL_DEDUP_TFIDF_COSINE = f"""
WITH toks AS (SELECT doc_id AS id, unnest({_DUCK_TOKS}) AS term FROM documents),
tf AS (SELECT id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks GROUP BY id, term),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
          HAVING count(*) <= {_TFIDF_MAX_DF}),
w AS (SELECT id, tf.term, tf * ln(1 + n / df) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
dots AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
         FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
         GROUP BY a.id, b.id)
SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots JOIN norms na ON na.id = id_a JOIN norms nb ON nb.id = id_b
WHERE round(dot / (na.nrm * nb.nrm), 6) >= {_TFIDF_MIN_COS}
ORDER BY id_a, id_b
"""


def q_dedup_master_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dup-cluster master election (the FineWeb refinement
    of keep-min-id): over the minhash-LSH connected components, each
    cluster keeps its LONGEST member (token count desc, doc_id asc
    tie-break) — retaining the most complete copy instead of an arbitrary
    one. Emits the per-cluster ledger: elected master, its token count,
    cluster size, and how many rows a keep-master pass drops.

    Scale: the component labeling is the existing O(log n)
    pointer-jumping CC; the election is ONE min(struct) aggregate over
    (cluster_id) — no window, no second shuffle beyond the label key."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    cc = connected_components(pairs)
    words = docs.select(
        F.col("doc_id").alias("id"),
        F.size(sql_tokens(F.col("text"))).cast("bigint").alias("n_words"),
    )
    return (
        cc.join(words, "id")
        .groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_words")).alias("neg_words"), F.col("id").alias("id")
                )
            ).alias("_e"),
            F.count("*").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("_e.id").alias("kept_doc"),
            (-F.col("_e.neg_words")).alias("kept_words"),
            "n_members",
            (F.col("n_members") - 1).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


SQL_DEDUP_MASTER_QUALITY = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES},
words AS (SELECT doc_id AS id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_words
          FROM documents),
ranked AS (SELECT comp.cluster_id, comp.id, words.n_words,
                  row_number() OVER (PARTITION BY comp.cluster_id
                                     ORDER BY words.n_words DESC, comp.id ASC) AS rn,
                  count(*) OVER (PARTITION BY comp.cluster_id) AS n_members
           FROM comp JOIN words USING (id))
SELECT cluster_id, id AS kept_doc, n_words AS kept_words,
       n_members, n_members - 1 AS n_dropped
FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking storage ledger (rsync/LBFS/FastCDC
    family): Karp–Rabin-content-decided chunk boundaries, corpus-wide
    distinct-chunk accounting — the dedup_ratio a content-addressable
    store achieves. Byte-shift-robust where fixed blocks are not."""
    from spacetime_crawler4_spark.operators.dedup import cdc_chunk_stats

    docs = _t(spark, sf_dir, "documents")
    return cdc_chunk_stats(docs, k=8, divisor=32)


SQL_DEDUP_CDC_CHUNKS = """
WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents
           WHERE length(text) > 0),
bounds AS (SELECT doc_id, txt,
       list_sort(list_distinct(
         [0] || [i + 7 FOR i IN range(1, greatest(length(txt) - 7, 1) + 1)
                 IF i + 7 <= length(txt)
                 AND list_reduce([CAST(ascii(c) AS BIGINT)
                                  FOR c IN string_split(substr(txt, i, 8), '')
                                  IF c <> ''],
                                 (a, b) -> (a * 257 + b) % 2147483647)
                     % 32 = 0]
             || [length(txt)])) AS cuts
       FROM t),
chunks AS (SELECT doc_id,
                  unnest([substr(txt, cuts[j] + 1, cuts[j+1] - cuts[j])
                          FOR j IN range(1, len(cuts))]) AS chunk
           FROM bounds),
per AS (SELECT md5(chunk) AS ck, count(*) AS occ,
               min(length(chunk)) AS clen
        FROM chunks GROUP BY ck)
SELECT CAST(sum(occ) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_unique_chunks,
       CAST(sum(occ * clen) AS BIGINT) AS total_chars,
       CAST(sum(clen) AS BIGINT) AS unique_chars,
       round(sum(clen) * 1.0 / sum(occ * clen), 6) AS dedup_ratio
FROM per
"""


def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR-error audit: for every banded-LSH verified pair,
    the signature-agreement Jaccard estimate (matching minhash values /
    k) next to the exact Jaccard — the committed evidence for how much
    the k=8 signature itself (not the banding) blurs similarity.
    Signature join is k rows per doc; exact side reuses the verified
    pair set."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5).select(
        "id_a", "id_b", "jaccard"
    )
    sig = minhash_signatures(sh, k=8)
    sa = sig.select(F.col("id").alias("id_a"), "band", F.col("sig").alias("sig_a"))
    sb = sig.select(
        F.col("id").alias("_idb"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("_idb")) & (F.col("band") == F.col("band_b")))
        .groupBy("id_a", "id_b", "jaccard")
        .agg(
            F.round(
                F.sum((F.col("sig_a") == F.col("sig_b")).cast("double")) / 8.0, 6
            ).alias("jaccard_est")
        )
    )
    return est.select(
        "id_a",
        "id_b",
        "jaccard",
        "jaccard_est",
        F.round(F.col("jaccard_est") - F.col("jaccard"), 6).alias("est_error"),
    ).orderBy("id_a", "id_b")


def _sql_dedup_minhash_estimate() -> str:
    pair_ctes = _SQL_MINHASH_PAIR_CTES.split(",\nsym AS")[0]
    return f"""
WITH {pair_ctes},
vpairs AS (SELECT id_a, id_b,
                  round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
           FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
           WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5),
est AS (SELECT v.id_a, v.id_b, v.jaccard,
               round(sum(CASE WHEN a.sig = b.sig THEN 1.0 ELSE 0.0 END) / 8.0,
                     6) AS jaccard_est
        FROM vpairs v
        JOIN sig a ON a.id = v.id_a
        JOIN sig b ON b.id = v.id_b AND b.band = a.band
        GROUP BY v.id_a, v.id_b, v.jaccard)
SELECT id_a, id_b, jaccard, jaccard_est,
       round(jaccard_est - jaccard, 6) AS est_error
FROM est ORDER BY id_a, id_b
"""


def q_dedup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster provenance audit: for every minhash component, how
    many distinct sources and langs its members span — cross-source
    clusters are the documents-table analogue of mirror hosts (the same
    content syndicated), single-source clusters are true internal dups.
    One metadata join on the component labels + one aggregate."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    cc = connected_components(minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5))
    meta = docs.select(F.col("doc_id").alias("id"), "source", "lang")
    return (
        cc.join(meta, "id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            (F.countDistinct("source") > 1).alias("cross_source"),
        )
        .orderBy("cluster_id")
    )


SQL_DEDUP_CLUSTER_PURITY = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES}
SELECT cluster_id, count(*) AS n_members,
       count(DISTINCT d.source) AS n_sources,
       count(DISTINCT d.lang) AS n_langs,
       count(DISTINCT d.source) > 1 AS cross_source
FROM comp JOIN documents d ON d.doc_id = comp.id
GROUP BY cluster_id ORDER BY cluster_id
"""


def q_dedup_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-cohesion audit over the minhash components: per cluster,
    how many of its member pairs are DIRECT verified LSH pairs vs merely
    transitively connected. Low cohesion flags chain-merged clusters —
    the failure mode where A~B~C links documents A and C that are not
    near-dups of each other, so a keep-one-master pass would drop a
    non-duplicate. Reuses the pair graph; one extra join + aggregate."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    cc = connected_components(pairs)
    mem = cc.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    direct = (
        pairs.join(cc, pairs.id_a == cc.id)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_direct_pairs"))
    )
    possible = (F.col("n_members") * (F.col("n_members") - 1) / 2).cast("long")
    return (
        mem.join(direct, "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            "n_direct_pairs",
            possible.alias("n_possible_pairs"),
            F.round(F.col("n_direct_pairs") / possible, 6).alias("cohesion"),
            (F.col("n_direct_pairs") < possible).alias("chain_merged"),
        )
        .orderBy("cluster_id")
    )


SQL_DEDUP_CLUSTER_COHESION = f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES},
mem AS (SELECT cluster_id, count(*) AS n_members FROM comp GROUP BY cluster_id),
direct AS (SELECT c.cluster_id, count(*) AS n_direct_pairs
           FROM pairs p JOIN comp c ON c.id = p.id_a GROUP BY c.cluster_id)
SELECT m.cluster_id, n_members, n_direct_pairs,
       CAST(n_members * (n_members - 1) / 2 AS BIGINT) AS n_possible_pairs,
       round(n_direct_pairs * 1.0 / (n_members * (n_members - 1) / 2), 6)
           AS cohesion,
       n_direct_pairs < n_members * (n_members - 1) / 2 AS chain_merged
FROM mem m JOIN direct USING (cluster_id) ORDER BY m.cluster_id
"""


def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style local-overlap pairs (Schleimer et al., SIGMOD 2003):
    documents sharing >= 3 winnowed char-8-gram fingerprints, with the
    overlap coefficient — the LOCAL-similarity complement of the
    whole-document MinHash plane (a lifted paragraph leaves shared
    fingerprints even when global Jaccard is tiny; any shared substring
    of length >= k+w-1 = 11 chars is guaranteed one). Production path:
    numpy winnowing in one mapInPandas pass, then the df-capped
    fingerprint equi-join (operators/textstats.winnow_overlap_pairs);
    the oracle rebuilds the fingerprint sets with the frame-spec window
    chain the summary query already proves row-identical."""
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fp_sets_vectorized,
        winnow_overlap_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    fps = winnow_fp_sets_vectorized(docs, k=8, w=4)
    return winnow_overlap_pairs(
        fps, min_shared=WINNOW_MIN_SHARED, max_df=WINNOW_MAX_DF
    ).orderBy("id_a", "id_b")


SQL_DEDUP_WINNOW_PAIRS = f"""
WITH g AS (
  SELECT doc_id,
         unnest([substr(lower(text), i, 8)
                 for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS gram,
         generate_subscripts([substr(lower(text), i, 8)
                 for i in range(1, greatest(length(text) - 7, 1) + 1)], 1) - 1 AS pos
  FROM documents),
wm AS (SELECT doc_id, pos,
              min(md5(gram)) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
              count(*) OVER (PARTITION BY doc_id) AS npos
       FROM g),
fp0 AS (SELECT DISTINCT doc_id AS id, wmin AS fp FROM wm WHERE pos <= npos - 4),
dfc AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}),
fp AS (SELECT id, fp0.fp FROM fp0 JOIN dfc USING (fp)),
sz AS (SELECT id, count(*) AS sz FROM fp GROUP BY id),
sh AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
       FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id
       GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED})
SELECT id_a, id_b, n_shared,
       round(CAST(n_shared AS DOUBLE) / least(sa.sz, sb.sz), 6) AS overlap
FROM sh JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# One-permutation MinHash + single-round LSH election (session 14)
# --------------------------------------------------------------------------


def q_dedup_oph_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via ONE-PERMUTATION MinHash (operators/dedup.
    oph_lsh_pairs): one 48-bit md5 hash per shingle partitioned into
    k=8 buckets, rotation-densified empty slots, banded 4×2, exact
    Jaccard verify ≥ 0.5 — the same collision law as dedup_minhash_lsh
    with 1/k the hash work (the dominant map-side cost at 100-TB
    shingle volume). Signatures are integer-exact BIGINT arithmetic,
    so the oracle reproduces them bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    return oph_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5).orderBy("id_a", "id_b")


def _sql_dedup_oph_pairs() -> str:
    from spacetime_crawler4_spark.operators.dedup import OPH_C, OPH_HEX

    k, r = 8, 2
    mins = ",\n       ".join(
        f"min(CASE WHEN h % {k} = {j} THEN h END) AS m{j}" for j in range(k)
    )
    dens = ",\n       ".join(
        "coalesce("
        + ", ".join(
            f"m{(j + t) % k}" + (f" + {t * OPH_C}" if t else "")
            for t in range(k)
        )
        + f") AS v{j}"
        for j in range(k)
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT id, {bi} AS band_id, "
        f"md5(CAST(v{bi * r} AS VARCHAR) || '|' || "
        f"CAST(v{bi * r + 1} AS VARCHAR)) AS bsig FROM dens"
        for bi in range(k // r)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
hh AS (SELECT id, CAST(('0x' || substr(md5(shingle), 1, {OPH_HEX})) AS BIGINT)
              AS h
       FROM sh),
wide AS (SELECT id,
       {mins}
       FROM hh GROUP BY id),
dens AS (SELECT id,
       {dens}
       FROM wide),
bands AS ({band_rows}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.bsig = b.bsig AND a.id < b.id),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
ORDER BY id_a, id_b
"""


def q_dedup_lsh_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-round LSH dedup election (operators/dedup.
    lsh_onepass_removals): a document is removed iff it shares ANY
    minhash band bucket with a lower doc_id; master = the smallest such
    bucket minimum. ONE groupBy + ONE join — no iterative
    connected-components closure — the keep/remove fast path a 100-TB
    admission wave takes when cluster identity is not needed. Runs over
    the same 4×2 banded k=8 signatures as dedup_minhash_lsh, so its
    removal set is directly comparable to the CC election's."""
    from spacetime_crawler4_spark.operators.dedup import (
        lsh_onepass_removals,
        minhash_band_sigs,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    bands = minhash_band_sigs(sh, k=8, r=2)
    return lsh_onepass_removals(bands).orderBy("id")


SQL_DEDUP_LSH_ONEPASS = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
sig AS (SELECT id, band,
               min(md5(CAST(band AS VARCHAR) || ':' || shingle)) AS sig
        FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
        GROUP BY id, band),
bands AS (SELECT id, CAST(band // 2 AS INTEGER) AS band_id,
                 md5(string_agg(sig, '|' ORDER BY band)) AS bsig
          FROM sig GROUP BY id, band // 2),
mins AS (SELECT band_id, bsig, min(id) AS bmin
         FROM bands GROUP BY band_id, bsig)
SELECT b.id, min(m.bmin) AS master
FROM bands b JOIN mins m
  ON m.band_id = b.band_id AND m.bsig = b.bsig
WHERE m.bmin < b.id
GROUP BY b.id
ORDER BY id
"""


# --------------------------------------------------------------------------
# PPJoin exact set-similarity join (session 14)
# --------------------------------------------------------------------------


def q_dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.5 near-dup pairs via prefix filtering
    (All-Pairs / PPJoin, operators/dedup.ppjoin_pairs) — recall 1.0 by
    construction, unlike the banded LSH plane: docs are candidates iff
    they share one of their rarest-first prefix shingles, so the join
    touches only the smallest buckets and NO true pair can be missed
    (the prefix lemma). This is the plane to certify LSH recall
    against, and the admission path when a pipeline needs provable
    completeness rather than probabilistic recall."""
    from spacetime_crawler4_spark.operators.dedup import ppjoin_pairs

    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    return ppjoin_pairs(sh, t=0.5).orderBy("id_a", "id_b")


SQL_DEDUP_PPJOIN = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT doc_id AS id,
              unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                    for i in range(1, len(ts) - 1)])) AS shingle
       FROM toks),
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
rk AS (SELECT id, sh.shingle,
              row_number() OVER (PARTITION BY id
                                 ORDER BY df, sh.shingle) AS pos,
              count(*) OVER (PARTITION BY id) AS sz
       FROM sh JOIN dfreq USING (shingle)),
pre AS (SELECT id, shingle FROM rk WHERE pos <= sz - ceil(0.5 * sz) + 1),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM pre a JOIN pre b
           ON a.shingle = b.shingle AND a.id < b.id),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
ORDER BY id_a, id_b
"""
