"""Similarity-plane queries: ANN (IVF/brute-force), embeddings, PCA, PQ.

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

from ._shared import _DUCK_TOKS, _FH_BUCKETS, _PCA_DIM, _PCA_ITERS, _t  # noqa: F401


CENTROID_IDS = (0, 11, 23, 37, 41, 53, 67, 79)  # IVF coarse centroids (by vec_id)
ANN_QUERY_MOD = 100  # query set = vec_id % 100 == 0


# --------------------------------------------------------------------------
# similarity-search plane (embeddings)
# --------------------------------------------------------------------------

def _duck_cos(a: str, b: str) -> str:
    """Inline DuckDB cosine matching operators/similarity.cosine exactly:
    sequential-fold dot products in double, sqrt(na)*sqrt(nb) denominator."""
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


def _queries_df(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % ANN_QUERY_MOD == 0)


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _queries_df(emb), k=5).orderBy("query_id", "rank")


SQL_ANN_BRUTE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {ANN_QUERY_MOD} = 0),
s AS (SELECT query_id, e.vec_id AS neighbor_id,
             {_duck_cos("qv", "e.v")} AS cos
      FROM q JOIN e ON e.vec_id <> query_id),
r AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM s)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""


def _centroids_df(spark: SparkSession, emb: DataFrame) -> DataFrame:
    ids = spark.createDataFrame(
        [(cell, vid) for cell, vid in enumerate(CENTROID_IDS)], ["cell", "cvid"]
    )
    return (
        emb.join(F.broadcast(ids), emb.vec_id == ids.cvid)
        .select("cell", F.col("embedding").alias("cvec"))
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probe ANN: assign to nearest of 8 coarse centroids, search
    only the query's cell. The scale path vs q_ann_bruteforce."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned = ivf_assign(emb, _centroids_df(spark, emb))
    return ivf_topk(assigned, _queries_df(emb).select("vec_id"), k=5).orderBy(
        "query_id", "rank"
    )


_CENTROID_VALUES = ", ".join(f"({c}, {v})" for c, v in enumerate(CENTROID_IDS))

SQL_ANN_IVF = f"""
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
q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell FROM assigned
      WHERE vec_id % {ANN_QUERY_MOD} = 0),
s AS (SELECT query_id, a.vec_id AS neighbor_id,
             {_duck_cos("qv", "a.v")} AS cos
      FROM q JOIN assigned a ON a.cell = q.qcell AND a.vec_id <> query_id),
r AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM s)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ann_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (nprobe=2): search the query's two nearest cells —
    the standard recall knob; scans ~2/8 of the data instead of 1/8 and
    closes most of the gap to exact (measured by ann_ivf_recall vs this
    query's own recall in tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk_multiprobe(
        emb, _centroids_df(spark, emb), _queries_df(emb).select("vec_id"), k=5, nprobe=2
    ).orderBy("query_id", "rank")


SQL_ANN_IVF_PROBE2 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cids(cell, cvid) AS (VALUES {_CENTROID_VALUES}),
cent AS (SELECT cell, v AS cv FROM cids JOIN e ON e.vec_id = cids.cvid),
scored AS (SELECT e.vec_id, e.v, cent.cell,
                  {_duck_cos("e.v", "cent.cv")} AS ccos
           FROM e CROSS JOIN cent),
ranked AS (SELECT vec_id, v, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, cell ASC) AS crn
           FROM scored),
assigned AS (SELECT vec_id, v, cell FROM ranked WHERE crn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell FROM ranked
      WHERE crn <= 2 AND vec_id % {ANN_QUERY_MOD} = 0),
s AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id,
             {_duck_cos("qv", "a.v")} AS cos
      FROM q JOIN assigned a ON a.cell = q.qcell AND a.vec_id <> query_id),
r AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM s)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ann_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF with a TRAINED codebook (2 Lloyd iterations over
    the corpus, distributed assign + element-wise vector-sum means; only
    the k×dim codebook touches the driver) vs exact brute force. The
    Lloyd loop itself is iterative (not SQL), but its fold order is
    ascending-vec_id and partition-independent, so the converged codebook
    is bit-deterministic — frozen as resources/ivf_codebook_sf001.json and
    inlined as SQL VALUES by the oracle, which then reproduces the entire
    post-training recall query. tests/test_similarity.py re-trains and
    asserts bit-equality with the frozen codebook (drift alarm) and that
    the Lloyd objective (mean assignment cosine) improves monotonically.

    The frozen codebook is trained at sf0.01 (the driver's correctness
    SF), so this oracle is SF-PINNED (queries.SF_PINNED_ORACLES): at any
    other SF the Spark side retrains on the new corpus while the VALUES
    table stays sf0.01 — tools/parity_sweep.py skips it accordingly."""
    emb = _t(spark, sf_dir, "embeddings")
    code = ivf_train(emb, k=8, iters=2, seed_ids=CENTROID_IDS)
    cdf = spark.createDataFrame(code, ["cell", "cvec"])
    brute = brute_force_topk(emb, _queries_df(emb), k=5).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk_multiprobe(
        emb, cdf, _queries_df(emb).select("vec_id"), k=5, nprobe=1
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    hit = brute.join(
        approx,
        (brute.query_id == approx.query_id)
        & (brute.neighbor_id == approx.a_neighbor),
        "left",
    ).groupBy(brute.query_id).agg(F.count(approx.a_neighbor).alias("n_overlap"))
    return hit.select(
        "query_id", "n_overlap", F.round(F.col("n_overlap") / 5.0, 4).alias("recall")
    ).orderBy("query_id")


def _sql_trained_recall() -> str:
    """Oracle for q_ann_ivf_trained_recall: the frozen bit-deterministic
    codebook (resources/ivf_codebook_sf001.json — repr round-trips each
    double exactly) as a VALUES table, then the same assign/probe/recall
    pipeline as SQL_ANN_IVF + _sql_ann_recall."""
    import json

    payload = json.loads(
        (
            _res.files("spacetime_crawler4_spark") / "resources" / "ivf_codebook_sf001.json"
        ).read_text()
    )
    values = ", ".join(
        f"({c}, CAST([{', '.join(xs)}] AS DOUBLE[]))" for c, xs in payload["codebook"]
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cb(cell, cv) AS (VALUES {values}),
scored AS (SELECT e.vec_id, e.v, cb.cell,
                  {_duck_cos("e.v", "cb.cv")} AS ccos
           FROM e CROSS JOIN cb),
ranked AS (SELECT vec_id, v, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, cell ASC) AS crn
           FROM scored),
assigned AS (SELECT vec_id, v, cell FROM ranked WHERE crn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell FROM assigned
      WHERE vec_id % {ANN_QUERY_MOD} = 0),
s AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id,
             {_duck_cos("qv", "a.v")} AS cos
      FROM q JOIN assigned a ON a.cell = q.qcell AND a.vec_id <> query_id),
r AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM s),
ivf AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 5),
brute AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_BRUTE}) b)
SELECT b.query_id, count(i.neighbor_id) AS n_overlap,
       round(count(i.neighbor_id) / 5.0, 4) AS recall
FROM brute b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id
"""


def q_embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding table, long format
    (label, dim, n_vecs, centroid): the class-prototype summary an
    embedding pipeline maintains (cluster drift, label quality). Uses
    the deterministic two-level element-wise vector-sum fold — one
    shuffle row per vector, never an n×dim posexplode; only the tiny
    label×dim result is exploded for output."""
    from spacetime_crawler4_spark.operators.similarity import (
        grouped_elementwise_mean,
    )

    emb = _t(spark, sf_dir, "embeddings")
    means = grouped_elementwise_mean(emb, "label", "vec_id", "embedding")
    return (
        means.select(
            F.col("key").alias("label"),
            F.col("n").alias("n_vecs"),
            F.posexplode("mean").alias("dim", "v"),
        )
        .select("label", "dim", "n_vecs", F.round("v", 6).alias("centroid"))
        .orderBy("label", "dim")
    )


SQL_EMBED_LABEL_CENTROIDS = """
WITH d AS (SELECT label, vec_id, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) - 1 AS dim
           FROM embeddings)
SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(x) / count(*), 6) AS centroid
FROM d GROUP BY label, dim ORDER BY label, dim
"""


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF cell probe against the exact brute force —
    the measured accuracy/cost trade-off of the ANN scale path."""
    emb = _t(spark, sf_dir, "embeddings")
    brute = brute_force_topk(emb, _queries_df(emb), k=5).select(
        "query_id", "neighbor_id"
    )
    assigned = ivf_assign(emb, _centroids_df(spark, emb))
    approx = ivf_topk(assigned, _queries_df(emb).select("vec_id"), k=5).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor")
    )
    hit = brute.join(
        approx,
        (brute.query_id == approx.query_id)
        & (brute.neighbor_id == approx.a_neighbor),
        "left",
    ).groupBy(brute.query_id).agg(
        F.count(approx.a_neighbor).alias("n_overlap")
    )
    return hit.select(
        "query_id", "n_overlap", F.round(F.col("n_overlap") / 5.0, 4).alias("recall")
    ).orderBy("query_id")


def _sql_ann_recall() -> str:
    return f"""
WITH brute AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_BRUTE}) b),
ivf AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_IVF}) v)
SELECT b.query_id, count(i.neighbor_id) AS n_overlap,
       round(count(i.neighbor_id) / 5.0, 4) AS recall
FROM brute b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id
"""


# --------------------------------------------------------------------------
# product quantization (operators/pq.py — compressed ANN at corpus scale)
# --------------------------------------------------------------------------

_PQ_M, _PQ_DSUB = 4, 16  # dim 64 -> 4 subspaces of 16
_PQ_SEED_IDS = tuple(range(16))  # ksub=16 codewords (measured recall 2x ksub=8)


def _pq_codebooks(spark: SparkSession, emb: DataFrame):
    from spacetime_crawler4_spark.operators.pq import pq_codebooks_from_seeds

    rows = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin(*_PQ_SEED_IDS)).collect()
    }
    return pq_codebooks_from_seeds([rows[v] for v in _PQ_SEED_IDS], _PQ_M)


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-5 by squared L2: 64-dim vectors quantized to
    4 codes (codewords = sub-slices of the 8 seed vectors), queries carry
    their 4×8 distance LUT through a broadcast, neighbors contribute codes
    only. Zero-shuffle encode (inline codebooks), one top-k window."""
    from spacetime_crawler4_spark.operators.pq import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_codebooks(spark, emb)
    return pq_adc_topk(emb, cbs, _queries_df(emb).select("vec_id"), k=5).orderBy(
        "query_id", "rank"
    )


_PQ_SQL_COMMON = f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cids(j, cvid) AS (VALUES {", ".join(f"({j}, {v})" for j, v in enumerate(_PQ_SEED_IDS))}),
ss(s) AS (SELECT unnest(range({_PQ_M}))),
cw AS (SELECT j, s, list_slice(v, s * {_PQ_DSUB} + 1, (s + 1) * {_PQ_DSUB}) AS c
       FROM cids JOIN e ON e.vec_id = cids.cvid CROSS JOIN ss),
subs AS (SELECT vec_id, s, list_slice(v, s * {_PQ_DSUB} + 1, (s + 1) * {_PQ_DSUB}) AS x
         FROM e CROSS JOIN ss),
sd AS (SELECT vec_id, subs.s, j,
              round(list_dot_product(x, x) - 2 * list_dot_product(x, c)
                    + list_dot_product(c, c), 6) AS d
       FROM subs JOIN cw ON cw.s = subs.s),
codes AS (SELECT vec_id, s, j FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn FROM sd)
    WHERE rn = 1),
q AS (SELECT vec_id AS query_id FROM e WHERE vec_id % {ANN_QUERY_MOD} = 0),
adist AS (SELECT query_id, c.vec_id AS neighbor_id, round(sum(l.d), 6) AS adist
          FROM codes c
          JOIN q ON c.vec_id <> q.query_id
          JOIN sd l ON l.vec_id = q.query_id AND l.s = c.s AND l.j = c.j
          GROUP BY query_id, c.vec_id),
pqr AS (SELECT query_id, neighbor_id, adist,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adist, neighbor_id) AS INTEGER) AS rank
        FROM adist)
"""

SQL_ANN_PQ = f"""
WITH {_PQ_SQL_COMMON}
SELECT query_id, neighbor_id, adist, rank FROM pqr WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PQ/ADC against the exact squared-L2 brute force — the
    measured accuracy cost of 64-float -> 4-code compression."""
    from spacetime_crawler4_spark.operators.pq import l2_brute_topk, pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    cbs = _pq_codebooks(spark, emb)
    brute = l2_brute_topk(emb, _queries_df(emb).select("vec_id"), k=5).select(
        "query_id", "neighbor_id"
    )
    approx = pq_adc_topk(emb, cbs, _queries_df(emb).select("vec_id"), k=5).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor")
    )
    hit = brute.join(
        approx,
        (brute.query_id == approx.query_id)
        & (brute.neighbor_id == approx.a_neighbor),
        "left",
    ).groupBy(brute.query_id).agg(F.count(approx.a_neighbor).alias("n_overlap"))
    return hit.select(
        "query_id", "n_overlap", F.round(F.col("n_overlap") / 5.0, 4).alias("recall")
    ).orderBy("query_id")


SQL_ANN_PQ_RECALL = f"""
WITH {_PQ_SQL_COMMON},
bd AS (SELECT query_id, e2.vec_id AS neighbor_id,
              round(list_dot_product(qv.v, qv.v) - 2 * list_dot_product(qv.v, e2.v)
                    + list_dot_product(e2.v, e2.v), 6) AS dist
       FROM (SELECT query_id, v FROM q JOIN e ON e.vec_id = q.query_id) qv
       JOIN e e2 ON e2.vec_id <> qv.query_id),
brute AS (SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY dist, neighbor_id) AS rn FROM bd)
    WHERE rn <= 5),
pq5 AS (SELECT query_id, neighbor_id FROM pqr WHERE rank <= 5)
SELECT b.query_id, count(p.neighbor_id) AS n_overlap,
       round(count(p.neighbor_id) / 5.0, 4) AS recall
FROM brute b LEFT JOIN pq5 p
  ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id
"""


# --------------------------------------------------------------------------
# SRP / hyperplane LSH (operators/similarity.py — Charikar 2002)
# --------------------------------------------------------------------------

_SRP_PLANES = srp_planes(nbits=16, dim=64)
_SRP_BAND_BITS = 4
_SRP_MIN_COS = 0.35


def _sql_srp_sig() -> str:
    terms = []
    for b, row in enumerate(_SRP_PLANES):
        arr = "[" + ",".join(f"{v:.1f}" for v in row) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(terms)


_SQL_SRP_BASE = f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v, ({_sql_srp_sig()}) AS sig FROM e),
b AS (SELECT vec_id, v, sig, i AS band_idx,
             (sig >> (i * {_SRP_BAND_BITS})) & {(1 << _SRP_BAND_BITS) - 1} AS band_val
      FROM s, range({16 // _SRP_BAND_BITS}) t(i)),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b,
                a.sig AS sa, b2.sig AS sb
         FROM b a JOIN b b2
           ON a.band_idx = b2.band_idx AND a.band_val = b2.band_val
              AND a.vec_id < b2.vec_id),
srp AS (SELECT id_a, id_b, hamming, cos FROM (
          SELECT c.id_a, c.id_b,
                 bit_count(xor(c.sa, c.sb)) AS hamming,
                 {_duck_cos("ea.v", "eb.v")} AS cos
          FROM cand c JOIN e ea ON ea.vec_id = c.id_a
                      JOIN e eb ON eb.vec_id = c.id_b) x
        WHERE cos >= {_SRP_MIN_COS})
"""


def q_embed_int8_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale, integer code
    invariants (sum/min/max — exact), reconstruction MSE and
    original-vs-dequantized cosine, all from one map-only pass."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        int8_fidelity(emb, "vec_id", "embedding")
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    )


SQL_EMBED_INT8 = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v, list_max([abs(x) for x in v]) / 127.0 AS scale FROM e),
c AS (SELECT vec_id, v, scale,
             [CASE WHEN scale > 0 THEN
                CAST(greatest(-127, least(127, floor(x / scale + 0.5))) AS INTEGER)
              ELSE 0 END for x in v] AS codes
      FROM s),
d AS (SELECT vec_id, v, scale, codes,
             [CAST(cc AS DOUBLE) * scale for cc in codes] AS deq
      FROM c)
SELECT vec_id,
       len(v) AS dim,
       round(scale, 6) AS scale,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       list_min(codes) AS code_min,
       list_max(codes) AS code_max,
       round(list_sum([(v[i] - deq[i]) * (v[i] - deq[i])
                       for i in range(1, len(v) + 1)]) / len(v), 6) AS mse,
       round(list_dot_product(v, deq)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(deq, deq))),
             6) AS cos_fid
FROM d ORDER BY vec_id
"""


def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (DPR/FlagEmbedding curation): per query
    vector, the top-3 most-cosine-similar vectors with a DIFFERENT label
    — the near-miss negatives contrastive training wants. Broadcast
    query set, single corpus stream, per-query window."""
    from spacetime_crawler4_spark.operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb, _queries_df(emb), k=3).orderBy(
        "query_id", "rank"
    )


SQL_ANN_HARD_NEGATIVES = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e
      WHERE vec_id % {ANN_QUERY_MOD} = 0),
s AS (SELECT query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
             {_duck_cos("qv", "e.v")} AS cos
      FROM q JOIN e ON e.label <> q.qlabel),
r AS (SELECT query_id, neighbor_id, neighbor_label, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM s)
SELECT query_id, neighbor_id, neighbor_label, cos, rank FROM r WHERE rank <= 3
ORDER BY query_id, rank
"""


def q_embed_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus via power
    iteration (X^T X v, never the d×d Gram matrix) — the drift /
    whitening primitive. Oracle unrolls the identical 4-iteration
    recurrence as chained matvec CTEs."""
    from spacetime_crawler4_spark.operators.similarity import pca_power_top

    emb = _t(spark, sf_dir, "embeddings")
    return pca_power_top(emb, dim=_PCA_DIM, iters=_PCA_ITERS)


def _sql_embed_pca_top() -> str:
    head = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
xs AS (SELECT vec_id, CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS j,
              unnest(v) AS x
       FROM e),
v0 AS (SELECT CAST(j AS INTEGER) AS j,
              CASE WHEN j = 0 THEN 1.0 ELSE 0.0 END AS val
       FROM range({_PCA_DIM}) t(j))"""
    steps = []
    for t in range(1, _PCA_ITERS + 1):
        steps.append(f"""
d{t} AS (SELECT vec_id, sum(x * val) AS d
         FROM xs JOIN v{t-1} USING (j) GROUP BY vec_id)""")
        steps.append(f"""
u{t} AS (SELECT j, sum(x * d) AS u FROM xs JOIN d{t} USING (vec_id) GROUP BY j)""")
        if t < _PCA_ITERS:
            steps.append(f"""
v{t} AS (SELECT j, u / sqrt(sum(u * u) OVER ()) AS val FROM u{t})""")
    tail = f"""
SELECT j, round(u / sqrt(sum(u * u) OVER ()), 6) AS loading
FROM u{_PCA_ITERS} ORDER BY j
"""
    return head + "," + ",".join(steps) + tail


def q_text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document vectors (hashing trick, Weinberger et al.
    ICML'09): vocabulary-free 16-dim signed-count text embeddings from
    the md5-portable hash family, L2-normalized, long-form rows."""
    from spacetime_crawler4_spark.operators.similarity import hashed_doc_vectors

    docs = _t(spark, sf_dir, "documents")
    return hashed_doc_vectors(docs, buckets=_FH_BUCKETS).orderBy(
        "doc_id", "bucket"
    )


SQL_TEXT_HASH_EMBEDDING = f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
hashed AS (SELECT doc_id,
                  CAST(CAST('0x' || substr(md5('fh:' || term), 1, 6) AS BIGINT)
                       % {_FH_BUCKETS} AS INTEGER) AS bucket,
                  CASE WHEN CAST('0x' || substr(md5('fh:' || term), 7, 1) AS BIGINT)
                            % 2 = 0
                       THEN 1.0 ELSE -1.0 END AS s
           FROM tok),
per AS (SELECT doc_id, bucket, sum(s) AS v FROM hashed GROUP BY doc_id, bucket),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM per GROUP BY doc_id)
SELECT per.doc_id, bucket,
       round(CASE WHEN nrm > 0 THEN v / nrm ELSE 0.0 END, 6) AS w
FROM per JOIN nrm ON per.doc_id = nrm.doc_id
ORDER BY per.doc_id, bucket
"""


def q_embed_cos_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution audit over the IVF-cell-blocked pair
    set (width-0.1 bins, floor semantics) — the calibration evidence
    behind every cosine threshold in the dedup/ANN planes: where the
    corpus mass actually sits. Cell blocking prices the pair stage at
    collision volume, the same contract as dedup_embedding_cosine."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_pairs(emb, _centroids_df(spark, emb), -1.0)
    bin_ = F.floor(F.col("cos") * 10).cast("int")
    return (
        pairs.groupBy(bin_.alias("cos_bin"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cos_bin")
    )


SQL_EMBED_COS_HISTOGRAM = f"""
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
pairs AS (SELECT {_duck_cos("a.v", "b.v")} AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT CAST(floor(cos * 10) AS INTEGER) AS cos_bin, count(*) AS n_pairs
FROM pairs GROUP BY cos_bin ORDER BY cos_bin
"""


def q_ann_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy skew audit: per-cell vector counts plus each
    cell's ratio to the ideal uniform load — the partition-balance
    evidence behind the ANN scale story (a hot cell is a hot partition;
    multiprobe and repartitioning decisions start from this table)."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned = ivf_assign(emb, _centroids_df(spark, emb))
    per = assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    tot = per.agg(F.sum("n_vecs").alias("_t"), F.count("*").alias("_c"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vecs",
            F.round(F.col("n_vecs") * F.col("_c") / F.col("_t"), 6).alias(
                "load_ratio"
            ),
        )
        .orderBy("cell")
    )


SQL_ANN_IVF_CELL_BALANCE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cids(cell, cvid) AS (VALUES {_CENTROID_VALUES}),
cent AS (SELECT cell, v AS cv FROM cids JOIN e ON e.vec_id = cids.cvid),
scored AS (SELECT e.vec_id, cent.cell,
                  {_duck_cos("e.v", "cent.cv")} AS ccos
           FROM e CROSS JOIN cent),
assigned AS (SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell ASC) AS rn FROM scored)
    WHERE rn = 1),
per AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY cell),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t, count(*) AS c FROM per)
SELECT cell, n_vecs, round(n_vecs * 1.0 * c / t, 6) AS load_ratio
FROM per CROSS JOIN tot ORDER BY cell
"""


MATRYOSHKA_DIMS = (8, 16, 32)


def q_embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation fidelity (Kusupati et al., NeurIPS'22): for
    each prefix width d, recall@5 of cosine top-k over the FIRST d
    dimensions vs the full 64-dim exact top-k. The audit behind the
    shortening trick modern embedding stores use to cut memory/IO 2-8x:
    if recall at d=16 is near 1.0, the ANN tier can index the prefix and
    re-rank with the full vector. Same brute-force plan per width
    (broadcast queries, one corpus stream), widths unioned."""
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_df(emb)
    full = brute_force_topk(emb, q, k=5).select(
        "query_id", F.col("neighbor_id").alias("full_nb")
    )
    out = None
    for d in MATRYOSHKA_DIMS:
        sl = emb.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        qd = q.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        trunc = brute_force_topk(sl, qd, k=5).select(
            "query_id", F.col("neighbor_id").alias("tr_nb")
        )
        hits = full.join(
            trunc,
            (full.query_id == trunc.query_id) & (full.full_nb == trunc.tr_nb),
        ).count()
        denom = full.count()
        row = spark.createDataFrame(
            [(d, denom, hits)], "dim int, n_pairs long, n_hits long"
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "dim",
        "n_pairs",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_pairs"), 6).alias("recall_at_5"),
    ).orderBy("dim")


def _sql_embed_matryoshka_recall() -> str:
    def topk(width: str, name: str) -> str:
        return f"""
{name}_s AS (SELECT q.id AS query_id, e.id AS neighbor_id,
             {_duck_cos(f"list_slice(q.v, 1, {width})", f"list_slice(e.v, 1, {width})")} AS cos
      FROM eq q JOIN e ON e.id <> q.id),
{name} AS (SELECT query_id, neighbor_id FROM (
     SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
     FROM {name}_s) WHERE rank <= 5)"""

    widths = ",".join(topk(str(d), f"t{d}") for d in MATRYOSHKA_DIMS)
    unions = "\nUNION ALL\n".join(
        f"""SELECT {d} AS dim, (SELECT count(*) FROM full_k) AS n_pairs,
       (SELECT count(*) FROM full_k f JOIN t{d} t
        ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id) AS n_hits"""
        for d in MATRYOSHKA_DIMS
    )
    return f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
eq AS (SELECT id, v FROM e WHERE id % {ANN_QUERY_MOD} = 0),
{topk("64", "full_k").lstrip()},
{widths.lstrip()},
u AS ({unions})
SELECT CAST(dim AS INTEGER) AS dim, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / n_pairs, 6) AS recall_at_5
FROM u ORDER BY dim
"""


def q_ann_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| candidate codebook (Bahmani et al., VLDB'12) over the
    embeddings table: 2 oversampling rounds at l=8, entirely
    deterministic (md5-uniform draws, scaled-integer distances), so the
    oracle replays the identical recurrence as two unrolled CTE rounds.
    The operator's per-round pass is a zero-shuffle projection over
    inlined center literals + one scalar aggregate — the O(rounds)
    seeding that replaces k-means++'s O(k) sequential passes in front of
    ivf_train."""
    from spacetime_crawler4_spark.operators.similarity import (
        kmeans_parallel_init,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_parallel_init(emb, l=8, rounds=2)


def _sql_ann_kmeanspp_init() -> str:
    d2 = (
        "(list_dot_product(e.v, e.v) - 2.0 * list_dot_product(e.v, c.v)"
        " + list_dot_product(c.v, c.v))"
    )
    snap = (
        f"CAST(floor({d2} * CAST(1e6 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " AS BIGINT)"
    )

    def draw(rnd: int) -> str:
        return (
            "CAST(CAST('0x' || substr(md5('kmpp:"
            f"{rnd}"
            ":' || CAST(d.id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE)"
            " / CAST(281474976710656 AS DOUBLE)"
            " < CAST(8 * d.d2i AS DOUBLE) / CAST(p.phi AS DOUBLE)"
        )

    return f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
c0 AS (SELECT id, v, 0 AS rnd FROM e
       ORDER BY md5(CAST(id AS VARCHAR)) LIMIT 1),
d1 AS (SELECT e.id, min({snap}) AS d2i
       FROM e CROSS JOIN c0 c GROUP BY e.id),
p1 AS (SELECT CAST(sum(d2i) AS BIGINT) AS phi FROM d1),
s1 AS (SELECT d.id FROM d1 d CROSS JOIN p1 p WHERE {draw(1)}),
c1 AS (SELECT id, v, rnd FROM c0
       UNION ALL SELECT e.id, e.v, 1 FROM e JOIN s1 ON s1.id = e.id),
d2 AS (SELECT e.id, min({snap}) AS d2i
       FROM e CROSS JOIN c1 c GROUP BY e.id),
p2 AS (SELECT CAST(sum(d2i) AS BIGINT) AS phi FROM d2),
s2 AS (SELECT d.id FROM d2 d CROSS JOIN p2 p WHERE {draw(2)}),
c2 AS (SELECT id, v, rnd FROM c1
       UNION ALL SELECT e.id, e.v, 2 FROM e JOIN s2 ON s2.id = e.id),
pair AS (SELECT e.id, c.id AS cid, {snap} AS d2i
         FROM e CROSS JOIN c2 c),
asg AS (SELECT id, cid FROM (
          SELECT id, cid, row_number() OVER (PARTITION BY id
                                             ORDER BY d2i ASC, cid ASC) AS rn
          FROM pair) WHERE rn = 1),
w AS (SELECT cid, count(*) AS weight FROM asg GROUP BY cid)
SELECT c.id AS center_id, CAST(c.rnd AS INTEGER) AS round_added,
       CAST(coalesce(w.weight, 0) AS BIGINT) AS weight
FROM c2 c LEFT JOIN w ON w.cid = c.id ORDER BY center_id
"""


def q_embed_rocchio_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio nearest-centroid classification audit: every embedding is
    assigned to the closest per-label centroid (cosine, centroids from
    the bit-deterministic element-wise fold, components rounded to 6 so
    the election is boundary-stable cross-engine) and the confusion
    matrix (actual, predicted, n, share) says which labels the
    prototype geometry separates — the embedding-plane twin of
    text_langid_confusion. Scale: centroids are a label-count-sized
    broadcast; assignment is map-only; ONE count shuffle."""
    from pyspark.sql.window import Window
    from spacetime_crawler4_spark.operators.similarity import (
        cosine,
        grouped_elementwise_mean,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = grouped_elementwise_mean(emb, "label", "vec_id", "embedding").select(
        F.col("key").alias("clabel"),
        F.transform("mean", lambda x: F.round(x, 6)).alias("cv"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(cosine(F.col("embedding"), F.col("cv")), 6).alias("cos"),
    )
    pred = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cos"), F.asc("clabel")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("actual"), F.col("clabel").alias("predicted"))
    )
    conf = pred.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    tot = conf.groupBy("actual").agg(F.sum("n").alias("t"))
    return (
        conf.join(tot, "actual")
        .select(
            "actual",
            "predicted",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
        )
        .orderBy("actual", "predicted")
    )


SQL_EMBED_ROCCHIO_CONFUSION = f"""
WITH d AS (SELECT label, vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings),
c0 AS (SELECT label AS clabel, dim, round(sum(x) / count(*), 6) AS v
       FROM d GROUP BY label, dim),
cent AS (SELECT clabel, list(v ORDER BY dim) AS cv FROM c0 GROUP BY clabel),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sc AS (SELECT e.vec_id, e.label, cent.clabel,
              {_duck_cos("e.v", "cent.cv")} AS cos
       FROM e CROSS JOIN cent),
pr AS (SELECT label AS actual, clabel AS predicted FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, clabel) AS rn
         FROM sc) WHERE rn = 1),
cf AS (SELECT actual, predicted, count(*) AS n FROM pr GROUP BY 1, 2),
tot AS (SELECT actual, sum(n) AS t FROM cf GROUP BY actual)
SELECT actual, predicted, n, round(CAST(n AS DOUBLE) / t, 6) AS share
FROM cf JOIN tot USING (actual)
ORDER BY actual, predicted
"""
