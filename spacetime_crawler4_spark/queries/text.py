"""Text-plane queries: n-gram stats, perplexity, readability, search.

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

from ._shared import CHUNK_L, CHUNK_OV, KEYWORDS_PER_DOC, OOV_TRAIN_PCT, PACK_SEQ_LEN, PHRASE_QUERY, QL_MU, RRF_K, RRF_TOP, _CHUNK_STRIDE, _DUCK_TOKS, _HEAPS_CHECKPOINTS, _JSD_SMOOTH, _MARKER_VALUES, _RANK_TERMS, _SHARD_TARGET_TOKENS, _STOPLIST_SQL, _stopwords, _t  # noqa: F401



# --------------------------------------------------------------------------
# text-analysis plane
# --------------------------------------------------------------------------


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return quality_features(docs).orderBy("doc_id")

SQL_TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS ts FROM documents),
feat AS (
  SELECT doc_id,
         len(ts) AS n_tokens,
         len(list_distinct(ts)) AS n_unique,
         len(list_distinct(ts)) * 1.0 / greatest(len(ts), 1) AS uniq_r,
         len([t for t in ts if list_contains({_STOPLIST_SQL}, t)]) * 1.0
             / greatest(len(ts), 1) AS stop_r,
         length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0
             / greatest(length(text), 1) AS alnum_r
  FROM base)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_unique AS INTEGER) AS n_unique,
       round(uniq_r, 6) AS uniq_ratio, round(stop_r, 6) AS stopword_ratio,
       round(alnum_r, 6) AS alnum_ratio,
       round(0.5 * uniq_r + 0.3 * stop_r + 0.2 * alnum_r, 6) AS quality_score
FROM feat ORDER BY doc_id
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return langid_heuristic(docs).orderBy("doc_id")

SQL_TEXT_LANGID = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
m(cand_lang, marker) AS (VALUES {_MARKER_VALUES}),
votes AS (SELECT doc_id, cand_lang, count(*) AS hits
          FROM toks JOIN m ON tok = marker GROUP BY 1, 2),
mx AS (SELECT doc_id, max(hits) AS mh FROM votes GROUP BY 1),
win AS (SELECT v.doc_id, min(v.cand_lang) AS guess_lang, max(v.hits) AS marker_hits
        FROM votes v JOIN mx ON v.doc_id = mx.doc_id AND v.hits = mx.mh
        GROUP BY v.doc_id)
SELECT d.doc_id, coalesce(w.guess_lang, 'und') AS guess_lang,
       CAST(coalesce(w.marker_hits, 0) AS BIGINT) AS marker_hits
FROM documents d LEFT JOIN win w ON d.doc_id = w.doc_id ORDER BY d.doc_id
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token statistics (aggregation over per-doc stats)."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = token_stats(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens_per_doc"),
        )
        .orderBy("lang")
    )


SQL_TEXT_TOKEN_STATS = f"""
WITH per AS (SELECT doc_id, lang, len({_DUCK_TOKS}) AS n_tokens FROM documents)
SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens_per_doc
FROM per GROUP BY lang ORDER BY lang
"""


def q_text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish (GPT-2 pretokenizer) regex — the
    corpus-budget numbers an LLM pipeline needs per document."""
    from spacetime_crawler4_spark.operators.textstats import bpe_token_stats

    docs = _t(spark, sf_dir, "documents")
    return bpe_token_stats(docs).orderBy("doc_id")


_BPE_SQL_RE = "''(?:s|t|ll|ve|re|d|m)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

SQL_TEXT_BPE = f"""
WITH t AS (SELECT doc_id, length(text) AS n_chars,
                  regexp_extract_all(lower(text), '{_BPE_SQL_RE}') AS toks
           FROM documents)
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique_bpe,
       round(n_chars / greatest(len(toks), 1), 6) AS chars_per_token
FROM t ORDER BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return doc_fingerprint(docs).orderBy("doc_id")


SQL_TEXT_FINGERPRINT = """
WITH g AS (SELECT doc_id,
                  unnest([substr(lower(text), i, 5)
                          for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS gram
           FROM documents)
SELECT doc_id, min(md5(gram)) AS fingerprint FROM g GROUP BY doc_id ORDER BY doc_id
"""


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints: char-8-gram hashes, min of each
    4-wide sliding window. Production path: per-doc numpy rolling min in
    one mapInPandas pass (no per-char explode/shuffle); the relational
    frame-spec-window form (winnow_fingerprints) is kept as the oracle's
    mirror and proven row-identical in tests."""
    from spacetime_crawler4_spark.operators.textstats import (
        winnow_fingerprints_vectorized,
    )

    docs = _t(spark, sf_dir, "documents")
    return winnow_fingerprints_vectorized(docs, k=8, w=4).orderBy("doc_id")


SQL_TEXT_WINNOW = """
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
fp AS (SELECT DISTINCT doc_id, wmin FROM wm WHERE pos <= npos - 4)
SELECT doc_id, count(*) AS n_fps, min(wmin) AS fp_min, max(wmin) AS fp_max
FROM fp GROUP BY doc_id ORDER BY doc_id
"""


def q_text_rabin_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp–Rabin rolling-hash-family fingerprints per document (char
    8-grams, Horner fold mod 2^31-1). Production path: k shifted numpy
    ops per doc in one mapInPandas pass (no per-gram explode); the
    relational form (rabin_fingerprints) mirrors the oracle and is proven
    row-identical in tests."""
    from spacetime_crawler4_spark.operators.textstats import (
        rabin_fingerprints_vectorized,
    )

    docs = _t(spark, sf_dir, "documents")
    return rabin_fingerprints_vectorized(docs, k=8).orderBy("doc_id")


SQL_TEXT_RABIN = """
WITH g AS (SELECT doc_id,
                  unnest([substr(lower(text), i, 8)
                          for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS gram
           FROM documents),
h AS (SELECT doc_id,
             list_reduce([CAST(ascii(c) AS BIGINT)
                          for c in string_split(gram, '') if c <> ''],
                         (a, b) -> (a * 257 + b) % 2147483647) AS h
      FROM g WHERE gram <> '')
SELECT doc_id, count(*) AS n_windows,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       min(h) AS fp_min, max(h) AS fp_max
FROM h GROUP BY doc_id ORDER BY doc_id
"""


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene-shape idf) of every document
    against a fixed query bag; top-20. One (doc,term) tf shuffle; document
    frequencies and corpus stats ride broadcasts — operators/ranking.py."""
    from spacetime_crawler4_spark.operators.ranking import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, _RANK_TERMS)
        .withColumn("bm25", F.round("bm25", 6))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


SQL_TEXT_BM25 = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'merge') GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id,
       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))), 6) AS bm25
FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20
"""


def q_search_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index AND retrieval: docs containing every query term,
    BM25-ranked top-10. Posting intersection = HAVING count over the
    (doc, matched-term) rows the BM25 tf aggregate already produces —
    operators/ranking.py."""
    from spacetime_crawler4_spark.operators.ranking import conjunctive_search

    docs = _t(spark, sf_dir, "documents")
    return conjunctive_search(docs, _RANK_TERMS, top_k=10)


SQL_SEARCH_CONJUNCTIVE = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'merge') GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
allm AS (SELECT doc_id FROM tf GROUP BY doc_id HAVING count(DISTINCT term) = 3)
SELECT doc_id,
       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))), 6) AS bm25
FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
WHERE doc_id IN (SELECT doc_id FROM allm)
GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
"""


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic tf-idf (ln-scaled tf, smoothed idf) over the same query
    bag; top-20 — operators/ranking.py."""
    from spacetime_crawler4_spark.operators.ranking import tfidf_scores

    docs = _t(spark, sf_dir, "documents")
    return (
        tfidf_scores(docs, _RANK_TERMS)
        .withColumn("tfidf", F.round("tfidf", 6))
        .orderBy(F.desc("tfidf"), F.asc("doc_id"))
        .limit(20)
    )


SQL_TEXT_TFIDF = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'merge') GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id,
       round(sum((1 + ln(tf)) * ln(n_docs / (1 + df))), 6) AS tfidf
FROM tf JOIN dfreq USING (term) CROSS JOIN n
GROUP BY doc_id ORDER BY tfidf DESC, doc_id LIMIT 20
"""


# --------------------------------------------------------------------------
# webtext quality filtering (operators/webfilter.py — Gopher/C4/repetition)
# --------------------------------------------------------------------------
#
# The synthetic documents table is flat word soup (no newlines/punctuation),
# so the line-level filters are exercised over a deterministic "paged" view
# derived identically on both engines: the word array chunked into fixed-size
# lines, terminal '.' on lines where (doc_id+i)%3 != 0, a ' javascript'
# marker injected where (doc_id+i)%11 == 0. Pure array algebra — no regex
# semantics in the derivation — so Spark and DuckDB agree byte-for-byte
# (probed bit-identical at sf0.01 before the oracles below were written).


def _paged_text(chunk: int, punct: bool, inject: bool):
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    n_chunks = F.ceil(F.size(ws) / F.lit(chunk)).cast("int")
    doc_id = F.col("doc_id")

    def line(i):
        base = F.array_join(F.slice(ws, i * chunk + 1, chunk), " ")
        if inject:
            base = F.concat(
                base,
                F.when((doc_id + i) % 11 == 0, F.lit(" javascript")).otherwise(
                    F.lit("")
                ),
            )
        if punct:
            base = F.concat(
                base,
                F.when((doc_id + i) % 3 == 0, F.lit("")).otherwise(F.lit(".")),
            )
        return base

    lines = F.when(
        F.size(ws) > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1), line),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_join(lines, "\n")


def q_text_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per source (the canonical top-k-per-group
    window): ONE shuffle on the group key, rank computed in-partition —
    never a global sort. Deterministic tie-break by doc_id."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


SQL_TEXT_TOPK_PER_SOURCE = """
SELECT source, doc_id, n_chars, rk FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rk
  FROM documents)
WHERE rk <= 3 ORDER BY source, rk
"""


def q_text_unigram_ppx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (the SQL-portable form of CCNet's
    perplexity filter): bits-per-token of every document under the
    add-0.5-smoothed corpus unigram model, plus the integer band a
    pipeline thresholds on. tf-first aggregation collapses the token
    stream before the model join; (N, V) totals broadcast."""
    docs = _t(spark, sf_dir, "documents")
    out = unigram_bits_per_token(docs)
    return out.select(
        F.col("id").alias("doc_id"), "n_toks", "bits_per_token", "ppx_bucket"
    ).orderBy("doc_id")


SQL_TEXT_UNIGRAM_PPX = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT doc_id AS id, unnest(ts) AS token FROM toks),
tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY id, token),
cnt AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY token),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS vocab FROM cnt),
sc AS (SELECT tf.id, tf.tf,
              tf.tf * (-log2((cnt.c + 0.5) / (tot.n_total + 0.5 * tot.vocab))) AS wbits
       FROM tf JOIN cnt USING (token) CROSS JOIN tot),
pd AS (SELECT id, CAST(sum(tf) AS BIGINT) AS n_toks,
              round(sum(wbits) / sum(tf), 4) AS bits_per_token
       FROM sc GROUP BY id)
SELECT id AS doc_id, n_toks, bits_per_token,
       CAST(floor(bits_per_token) AS INT) AS ppx_bucket
FROM pd ORDER BY doc_id
"""


def q_text_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier (operators/classify.py):
    train on documents.lang with Laplace smoothing, score every document,
    emit the argmax label, top-2 margin, and agreement with the training
    label — the classifier-filter step of the CCNet/GPT-3-style pipeline,
    expressed as three aggregations plus one model join."""
    from spacetime_crawler4_spark.operators.classify import nb_classify

    docs = _t(spark, sf_dir, "documents")
    return nb_classify(docs, label_col="lang").orderBy("doc_id")


SQL_TEXT_NB_LANGID = f"""
WITH dw AS (
  SELECT doc_id, word, count(*) AS n_dw FROM (
    SELECT doc_id, unnest({_DUCK_TOKS}) AS word FROM documents)
  GROUP BY doc_id, word
),
labeled AS (SELECT dw.*, d.lang AS label FROM dw JOIN documents d USING (doc_id)),
classes AS (SELECT lang AS label, count(*) AS n_docs_c FROM documents GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
wc AS (SELECT label, word, CAST(sum(n_dw) AS BIGINT) AS cnt
       FROM labeled GROUP BY label, word),
tot AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot FROM wc GROUP BY label),
voc AS (SELECT count(DISTINCT word) AS vocab FROM dw),
grid AS (SELECT dw.doc_id, dw.word, dw.n_dw, c.label
         FROM dw CROSS JOIN (SELECT label FROM classes) c),
contrib AS (
  SELECT doc_id, label,
         sum(n_dw * ln(coalesce(cnt, 0) + 1.0)) AS ll_num,
         CAST(sum(n_dw) AS BIGINT) AS n_tok
  FROM grid LEFT JOIN wc USING (label, word) GROUP BY doc_id, label
),
priors AS (
  SELECT label, ln(CAST(n_docs_c AS DOUBLE) / n_docs) AS log_prior,
         ln(tot + vocab * 1.0) AS log_denom
  FROM classes JOIN tot USING (label) CROSS JOIN nd CROSS JOIN voc
),
scores AS (
  SELECT d.doc_id, p.label,
         p.log_prior + coalesce(c.ll_num, 0.0)
           - coalesce(c.n_tok, 0) * p.log_denom AS score
  FROM (SELECT doc_id FROM documents) d CROSS JOIN priors p
  LEFT JOIN contrib c USING (doc_id, label)
),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER w AS rn, lead(score) OVER w AS runner_up
  FROM scores WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, label ASC)
)
SELECT r.doc_id, r.label AS pred_label,
       round(r.score - r.runner_up, 6) AS margin,
       CAST(r.label = d.lang AS INTEGER) AS correct
FROM ranked r JOIN documents d USING (doc_id)
WHERE rn = 1 ORDER BY doc_id
"""


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf power-law fit over the token rank-frequency head
    (operators/textstats.zipf_fit): closed-form OLS slope/intercept/r² of
    ln(freq) on ln(rank) — the corpus-health audit (natural text slopes
    ≈ −1; boilerplate/spam bend the curve)."""
    from spacetime_crawler4_spark.operators.textstats import zipf_fit

    docs = _t(spark, sf_dir, "documents")
    return zipf_fit(docs, group_col="lang").orderBy("lang")


SQL_TEXT_ZIPF = f"""
WITH counts AS (
  SELECT lang, word, count(*) AS cnt FROM (
    SELECT lang, unnest({_DUCK_TOKS}) AS word FROM documents)
  GROUP BY lang, word
),
ranked AS (
  SELECT lang, ln(CAST(row_number() OVER w AS DOUBLE)) AS x,
         ln(CAST(cnt AS DOUBLE)) AS y, row_number() OVER w AS rank
  FROM counts WINDOW w AS (PARTITION BY lang ORDER BY cnt DESC, word ASC)
),
s AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM ranked WHERE rank <= 200 GROUP BY lang)
SELECT lang, n AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s ORDER BY lang
"""


def q_text_bigram_ppx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram Stupid-Backoff LM scoring (Brants et al. 2007): model
    counts from the TRAIN split (doc_id % 10 != 7, the same eval-split
    convention as decontamination), every document scored — so held-out
    docs genuinely exercise the backoff branch. Per-doc bits/token plus
    backoff rate (garbled text backs off constantly). One lag window +
    two model joins."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(~(F.col("doc_id") % 10 == 7))
    out = bigram_bits_per_token(docs, train)
    return out.select(
        F.col("id").alias("doc_id"), "n_scored", "bits_per_token", "backoff_rate"
    ).orderBy("doc_id")


SQL_TEXT_BIGRAM_PPX = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT doc_id AS id, unnest(ts) AS token,
               generate_subscripts(ts, 1) AS tpos
        FROM toks),
pr AS (SELECT id, tpos, token,
              lag(token) OVER (PARTITION BY id ORDER BY tpos) AS prev
       FROM tok),
trtok AS (SELECT * FROM tok WHERE NOT (id % 10 = 7)),
trpr AS (SELECT * FROM pr WHERE NOT (id % 10 = 7)),
uni AS (SELECT token, count(*) AS c1 FROM trtok GROUP BY token),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total, count(*) AS vocab FROM uni),
big AS (SELECT prev, token, count(*) AS c2 FROM trpr
        WHERE prev IS NOT NULL GROUP BY prev, token),
sc AS (SELECT pr.id,
              -log2(CASE WHEN big.c2 IS NOT NULL
                         THEN big.c2 * 1.0 / up.c1
                         ELSE {BACKOFF_ALPHA} * (coalesce(u.c1, 0) + 0.5)
                              / (tot.n_total + 0.5 * tot.vocab) END) AS bits,
              CASE WHEN big.c2 IS NULL THEN 1 ELSE 0 END AS backed_off
       FROM pr
       LEFT JOIN big ON big.prev = pr.prev AND big.token = pr.token
       LEFT JOIN uni up ON up.token = pr.prev
       LEFT JOIN uni u ON u.token = pr.token
       CROSS JOIN tot
       WHERE pr.prev IS NOT NULL)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       round(avg(bits), 4) AS bits_per_token,
       round(avg(backed_off), 6) AS backoff_rate
FROM sc GROUP BY id ORDER BY doc_id
"""


BPE_MERGES = 10


def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016) over the
    corpus vocabulary: the learned 10-row merge table, every quantity an
    integer or string so the artifact is hash-exact with zero float
    slack. One corpus shuffle for word counts; the loop is relational
    algebra over the vocabulary — operators/bpe.py."""
    from spacetime_crawler4_spark.operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=BPE_MERGES)


def _sql_bpe_train() -> str:
    ctes = [
        f"""w AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
wf AS (SELECT t AS wid, count(*) AS freq
       FROM (SELECT unnest(ts) AS t FROM w) GROUP BY t),
s0 AS MATERIALIZED (
  SELECT wid, freq, unnest(range(1, length(wid) + 2)) AS pos,
         unnest([substr(wid, i, 1) for i in range(1, length(wid) + 1)]
                || ['</w>']) AS sym
  FROM wf)"""
    ]
    for i in range(1, BPE_MERGES + 1):
        p = f"s{i - 1}"
        ctes.append(
            f"""p{i} AS (SELECT sym, nxt, CAST(sum(freq) AS BIGINT) AS pc FROM (
        SELECT sym, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt, freq
        FROM {p}) WHERE nxt IS NOT NULL GROUP BY sym, nxt),
b{i} AS MATERIALIZED (SELECT sym AS l, nxt AS r, sym || nxt AS m, pc
       FROM p{i} ORDER BY pc DESC, sym, nxt LIMIT 1),
c{i} AS MATERIALIZED (
  SELECT wid, freq, pos, sym, nxt,
         (sym = (SELECT l FROM b{i}) AND nxt = (SELECT r FROM b{i})) AS cand
  FROM (SELECT wid, freq, pos, sym,
               lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt
        FROM {p})),
k{i} AS (SELECT wid, pos, TRUE AS merge_here FROM (
        SELECT wid, pos, pos - min(pos) OVER (PARTITION BY wid, grp) AS off
        FROM (SELECT wid, pos,
                     pos - row_number() OVER (PARTITION BY wid ORDER BY pos) AS grp
              FROM c{i} WHERE cand))
       WHERE off % 2 = 0),
s{i} AS MATERIALIZED (
  SELECT wid, freq,
         row_number() OVER (PARTITION BY wid ORDER BY pos) AS pos,
         CASE WHEN coalesce(merge_here, FALSE) THEN (SELECT m FROM b{i})
              ELSE sym END AS sym
  FROM (SELECT c.wid, c.freq, c.pos, c.sym, k.merge_here,
               lag(coalesce(k.merge_here, FALSE))
                   OVER (PARTITION BY c.wid ORDER BY c.pos) AS drop_me
        FROM c{i} c LEFT JOIN k{i} k ON k.wid = c.wid AND k.pos = c.pos)
  WHERE NOT coalesce(drop_me, FALSE))"""
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, l AS \"left\", r AS \"right\", m AS merged, "
        f"pc AS pair_count FROM b{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{rows}\nORDER BY rank"


def q_text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the trained BPE: per doc, word count vs
    BPE-token count and fertility (tokens/word). Tokenization is a hash
    join against the trainer's final per-word segmentation."""
    from spacetime_crawler4_spark.operators.bpe import bpe_tokens_per_doc

    docs = _t(spark, sf_dir, "documents")
    out = bpe_tokens_per_doc(docs, n_merges=BPE_MERGES)
    return out.select(
        F.col("id").alias("doc_id"), "n_words", "n_bpe_tokens", "tokens_per_word"
    ).orderBy("doc_id")


def _sql_bpe_apply() -> str:
    # reuse the full training CTE chain; replace the merge-table SELECT
    # with the fertility join against the final state s{BPE_MERGES}
    train = _sql_bpe_train()
    ctes = train[: train.rindex("\nSELECT 1 AS rank")]
    return f"""{ctes},
seg AS (SELECT wid, count(*) AS n_sym FROM s{BPE_MERGES} GROUP BY wid),
dw AS (SELECT doc_id AS id, unnest(ts) AS wid FROM w)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       round(sum(n_sym) * 1.0 / count(*), 6) AS tokens_per_word
FROM dw JOIN seg USING (wid)
GROUP BY id ORDER BY id
"""


def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (RAG / context-window split): 64-token
    chunks, 16-token overlap, deterministic md5 chunk ids. Map-side only —
    tokenize once per doc, Generate the starts, slice the carried token
    array; no shuffle (operators/chunking.py)."""
    from spacetime_crawler4_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, CHUNK_L, CHUNK_OV).orderBy("doc_id", "chunk_idx")

SQL_TEXT_CHUNK_WINDOWS = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
st AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
ch AS (SELECT doc_id, ts, n,
              unnest(generate_series(0,
                     ((greatest(n - {CHUNK_L}, 0) + {_CHUNK_STRIDE - 1})
                      // {_CHUNK_STRIDE}) * {_CHUNK_STRIDE},
                     {_CHUNK_STRIDE})) AS start
       FROM st)
SELECT doc_id,
       CAST(start // {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       md5(doc_id || ':' || (start // {_CHUNK_STRIDE})) AS chunk_id,
       CAST(least({CHUNK_L}, n - start) AS INT) AS n_tokens,
       array_to_string(ts[start + 1 : start + {CHUNK_L}], ' ') AS chunk_text
FROM ch ORDER BY doc_id, chunk_idx
"""


def q_text_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence-packing manifest (LM pretraining batcher),
    packed per source shard so the cumulative sum never serializes through
    one partition. Integers only — hash-exact (operators/chunking.py)."""
    from spacetime_crawler4_spark.operators.chunking import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, PACK_SEQ_LEN).orderBy("source", "doc_id")


SQL_TEXT_PACK_MANIFEST = f"""
WITH toks AS (SELECT source, doc_id,
                     CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_toks
              FROM documents),
c AS (SELECT source, doc_id, n_toks,
             CAST(coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id),
                           0) AS BIGINT) - n_toks AS tok_offset
      FROM toks),
m AS (SELECT source, doc_id, n_toks, tok_offset,
             CAST(floor(tok_offset / {PACK_SEQ_LEN}.0) AS BIGINT) AS seq_begin,
             greatest(
               CAST(floor((tok_offset + n_toks - 1) / {PACK_SEQ_LEN}.0) AS BIGINT),
               CAST(floor(tok_offset / {PACK_SEQ_LEN}.0) AS BIGINT)) AS seq_end
      FROM c)
SELECT source, doc_id, n_toks, tok_offset, seq_begin, seq_end,
       CAST(seq_end - seq_begin + 1 AS BIGINT) AS n_seqs
FROM m ORDER BY source, doc_id
"""


def q_text_ppx_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partition (Wenzek et al. 2020):
    per-language perplexity terciles under the corpus unigram LM —
    'head' trains first, 'tail' gets filtered or down-weighted. ntile
    over (lang) ordered by the 4dp-rounded bits/token then doc_id, so
    the assignment is deterministic and oracle-exact."""
    docs = _t(spark, sf_dir, "documents")
    scored = unigram_bits_per_token(docs).join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    w = Window.partitionBy("lang").orderBy("bits_per_token", "id")
    tercile = F.ntile(3).over(w)
    return scored.select(
        F.col("id").alias("doc_id"),
        "lang",
        "bits_per_token",
        tercile.alias("tercile"),
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tercile
        ).alias("ppx_band"),
    ).orderBy("lang", "doc_id")


SQL_TEXT_PPX_PARTITION = f"""
WITH ppx AS ({SQL_TEXT_UNIGRAM_PPX}),
base AS (SELECT p.doc_id, d.lang, p.bits_per_token
         FROM ppx p JOIN documents d USING (doc_id)),
t AS (SELECT doc_id, lang, bits_per_token,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY bits_per_token, doc_id) AS tercile
      FROM base)
SELECT doc_id, lang, bits_per_token, tercile,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS ppx_band
FROM t ORDER BY lang, doc_id
"""


def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval via positional posting-list intersection
    (Manning IIR §2.4) — the phrase-query counterpart of the conjunctive
    AND search: docs containing the exact token sequence
    ``PHRASE_QUERY``, with occurrence count and first position.

    Scale: operators/ranking.phrase_search — each intersect side is a
    single term's postings (term filter applied before any wide op);
    k-1 keyed equi-joins on (doc, aligned start position)."""
    from spacetime_crawler4_spark.operators.ranking import phrase_search

    return phrase_search(_t(spark, sf_dir, "documents"), PHRASE_QUERY)


SQL_SEARCH_PHRASE = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT doc_id AS id, unnest(ts) AS term,
               generate_subscripts(ts, 1) - 1 AS pos
        FROM toks),
m AS (SELECT a.id, a.pos
      FROM tok a JOIN tok b ON a.id = b.id AND b.pos = a.pos + 1
      WHERE a.term = '{PHRASE_QUERY[0]}' AND b.term = '{PHRASE_QUERY[1]}')
SELECT id AS doc_id, count(*) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM m GROUP BY id ORDER BY doc_id
"""


def q_text_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output-shard layout (WebDataset / CC-segment shape):
    per-lang running token count assigns each doc to shard
    floor(start_offset/target); one manifest row per (lang, shard).
    All-integer, hash-exact."""
    from spacetime_crawler4_spark.operators.chunking import shard_assignments

    docs = _t(spark, sf_dir, "documents")
    return shard_assignments(docs, target_tokens=_SHARD_TARGET_TOKENS).orderBy(
        "lang", "shard"
    )


SQL_TEXT_SHARD_MANIFEST = f"""
WITH toks AS (SELECT lang, doc_id AS id,
                     CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_toks
              FROM documents),
assigned AS (SELECT lang, id, n_toks,
                    CAST(floor((sum(n_toks) OVER (PARTITION BY lang ORDER BY id
                                ROWS UNBOUNDED PRECEDING) - n_toks)
                               / {_SHARD_TARGET_TOKENS}) AS INTEGER) AS shard
             FROM toks)
SELECT lang, shard, count(*) AS n_docs, sum(n_toks) AS n_tokens,
       min(id) AS first_doc, max(id) AS last_doc
FROM assigned GROUP BY lang, shard ORDER BY lang, shard
"""


def q_text_kn_ppx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (fixed d=0.75, continuation-
    probability lower order) on the same train split as the Stupid-Backoff
    twin — the LM-quality yardstick pair. operators/textstats.py."""
    from spacetime_crawler4_spark.operators.textstats import (
        kneser_ney_bits_per_token,
    )

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(~(F.col("doc_id") % 10 == 7))
    return (
        kneser_ney_bits_per_token(docs, train)
        .select(F.col("id").alias("doc_id"), "n_scored", "bits_per_token", "cont_rate")
        .orderBy("doc_id")
    )


SQL_TEXT_KN_PPX = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT doc_id AS id, unnest(ts) AS token,
               generate_subscripts(ts, 1) AS tpos
        FROM toks),
pr AS (SELECT id, tpos, token,
              lag(token) OVER (PARTITION BY id ORDER BY tpos) AS prev
       FROM tok),
trtok AS (SELECT * FROM tok WHERE NOT (id % 10 = 7)),
trpr AS (SELECT id, tpos, token,
                lag(token) OVER (PARTITION BY id ORDER BY tpos) AS prev
         FROM trtok),
big AS (SELECT prev, token, count(*) AS c2 FROM trpr
        WHERE prev IS NOT NULL GROUP BY prev, token),
ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS cctx, count(*) AS n1p_prev
        FROM big GROUP BY prev),
cont AS (SELECT token, count(*) AS n1p_right FROM big GROUP BY token),
tot AS (SELECT (SELECT count(*) FROM big) AS n_btypes,
               (SELECT count(DISTINCT token) FROM trtok) AS vocab),
sc AS (SELECT pr.id,
              -log2(CASE WHEN ctx.cctx IS NOT NULL
                         THEN greatest(coalesce(big.c2, 0) - 0.75, 0.0) / ctx.cctx
                              + 0.75 * ctx.n1p_prev / ctx.cctx
                                * ((coalesce(cont.n1p_right, 0) + 0.5)
                                   / (tot.n_btypes + 0.5 * (tot.vocab + 1)))
                         ELSE (coalesce(cont.n1p_right, 0) + 0.5)
                              / (tot.n_btypes + 0.5 * (tot.vocab + 1)) END) AS bits,
              CASE WHEN big.c2 IS NULL THEN 1.0 ELSE 0.0 END AS cont_only
       FROM pr
       LEFT JOIN big ON big.prev = pr.prev AND big.token = pr.token
       LEFT JOIN ctx ON ctx.prev = pr.prev
       LEFT JOIN cont ON cont.token = pr.token
       CROSS JOIN tot
       WHERE pr.prev IS NOT NULL)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       round(avg(bits), 4) AS bits_per_token,
       round(avg(cont_only), 6) AS cont_rate
FROM sc GROUP BY id ORDER BY doc_id
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid grade level per document — the classic readability
    quality signal (words/sentence and vowel-run syllables/word, both
    RE2-portable regex counts; grade = 0.39·w/s + 11.8·syl/w − 15.59).
    Map-only; every count an integer before the one float formula."""
    docs = _t(spark, sf_dir, "documents")
    toks = sql_tokens(F.col("text"))
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.greatest(
            F.size(F.filter(F.split(t, "[^aeiouy]+"), lambda x: x != "")),
            F.lit(1),
        ),
    )
    sents = F.greatest(
        F.size(
            F.filter(F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s) != "")
        ),
        F.lit(1),
    )
    out = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    grade = (
        0.39 * F.col("n_words") / F.col("n_sentences")
        + 11.8 * F.col("n_syllables") / F.col("n_words")
        - 15.59
    )
    # explicit half-up on the DOUBLE (floor(x*1e4+0.5)/1e4) instead of
    # F.round: the FK formula can land exactly on a .00005 tie, where
    # Spark's decimal-string HALF_UP and DuckDB's double round() disagree
    # by one ulp — floor on the same double is bit-identical in both
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.floor(grade * 10000 + F.lit(0.5)) / 10000).alias("fk_grade"),
    ).orderBy("doc_id")


SQL_TEXT_READABILITY = f"""
WITH base AS (SELECT doc_id,
       CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_words,
       CAST(greatest(len([s FOR s IN regexp_split_to_array(text, '[.!?]+')
                          IF trim(s) <> '']), 1) AS INTEGER) AS n_sentences,
       CAST(list_sum([greatest(len([v FOR v IN regexp_split_to_array(t, '[^aeiouy]+')
                                    IF v <> '']), 1)
                      FOR t IN {_DUCK_TOKS}]) AS BIGINT) AS n_syllables
FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
       floor((CAST(0.39 AS DOUBLE) * n_words / n_sentences
              + CAST(11.8 AS DOUBLE) * n_syllables / n_words
              - CAST(15.59 AS DOUBLE)) * 10000 + 0.5)
           / 10000 AS fk_grade
FROM base WHERE n_words > 0 ORDER BY doc_id
"""


def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence from the corpus unigram
    distribution — the domain-shift / mixture diagnostic (symmetric,
    bounded [0, 1] in bits, defined even where KL explodes). Add-k
    smoothed over the corpus vocabulary so every term has mass in both
    distributions; one token aggregate per side + one vocab-sized join."""
    docs = _t(spark, sf_dir, "documents")
    k = _JSD_SMOOTH
    tok = docs.select(
        "source", F.explode(sql_tokens(F.col("text"))).alias("term")
    )
    per = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    vocab = tok.select("term").distinct()
    glob = tok.groupBy("term").agg(F.count("*").alias("g"))
    gtot = glob.agg(F.sum("g").alias("_gt"), F.count("*").alias("_v"))
    stot = per.groupBy("source").agg(F.sum("c").alias("_st"))
    full = (
        vocab.crossJoin(stot.select("source", "_st"))
        .join(per, ["source", "term"], "left")
        .join(glob, "term")
        .crossJoin(F.broadcast(gtot))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + k) / (F.col("_st") + k * F.col("_v"))
    q = (F.col("g") + k) / (F.col("_gt") + k * F.col("_v"))
    m = (p + q) / 2
    contrib = 0.5 * p * F.log2(p / m) + 0.5 * q * F.log2(q / m)
    return (
        full.select("source", contrib.alias("j"))
        .groupBy("source")
        .agg(F.round(F.sum("j"), 6).alias("jsd_bits"))
        .orderBy("source")
    )


SQL_TEXT_JS_DIVERGENCE = f"""
WITH tok AS (SELECT source, unnest({_DUCK_TOKS}) AS term FROM documents),
per AS (SELECT source, term, count(*) AS c FROM tok GROUP BY source, term),
vocab AS (SELECT DISTINCT term FROM tok),
gw AS (SELECT term, count(*) AS g FROM tok GROUP BY term),
gtot AS (SELECT CAST(sum(g) AS BIGINT) AS gt, count(*) AS v FROM gw),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM per GROUP BY source),
allv AS (SELECT stot.source, vocab.term, stot.st, coalesce(per.c, 0) AS c,
                gw.g, gtot.gt, gtot.v
         FROM vocab CROSS JOIN stot
         LEFT JOIN per ON per.source = stot.source AND per.term = vocab.term
         JOIN gw ON gw.term = vocab.term
         CROSS JOIN gtot),
contrib AS (SELECT source,
       (c + {_JSD_SMOOTH}) / (st + {_JSD_SMOOTH} * v) AS p,
       (g + {_JSD_SMOOTH}) / (gt + {_JSD_SMOOTH} * v) AS q
       FROM allv)
SELECT source,
       round(sum(0.5 * p * log2(p / ((p + q) / 2))
                 + 0.5 * q * log2(q / ((p + q) / 2))), 6) AS jsd_bits
FROM contrib GROUP BY source ORDER BY source
"""


def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth audit: cumulative distinct vocabulary
    and token volume at ten doc-order checkpoints — V(n) ~ K·n^β sanity
    for the corpus (sub-linear growth; a TRAP corpus of generated gibberish
    grows linearly). All integers. The trick is relational: each term's
    FIRST document (one min aggregate) turns 'distinct so far' into a
    cumulative count of first occurrences — no running-distinct window."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    step = max(1, n_docs // _HEAPS_CHECKPOINTS)
    cps = spark.range(1, _HEAPS_CHECKPOINTS + 1).select(
        (F.col("id") * step).cast("long").alias("checkpoint")
    )
    tok = docs.select(
        "doc_id", F.explode(sql_tokens(F.col("text"))).alias("term")
    )
    first = tok.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    # NB: cps["checkpoint"], not cps.checkpoint — the attribute form
    # resolves to DataFrame.checkpoint (the method), a classic shadow
    vocab_cum = (
        cps.join(first, first.first_doc < cps["checkpoint"])
        .groupBy("checkpoint")
        .agg(F.count("*").alias("vocab_cum"))
    )
    toks_cum = (
        cps.join(per_doc, per_doc.doc_id < cps["checkpoint"])
        .groupBy("checkpoint")
        .agg(F.sum("n").alias("tokens_cum"))
    )
    return (
        toks_cum.join(vocab_cum, "checkpoint").orderBy("checkpoint")
    )


def _sql_text_vocab_growth(sf_dir: str | None = None) -> str:
    # checkpoints derive from the corpus size; the oracle computes them
    # the same way (count(*) // 10), entirely in SQL
    return f"""
WITH n AS (SELECT count(*) AS nd FROM documents),
cps AS (SELECT CAST(x * greatest(nd // {_HEAPS_CHECKPOINTS}, 1) AS BIGINT)
               AS checkpoint
        FROM range(1, {_HEAPS_CHECKPOINTS} + 1) t(x) CROSS JOIN n),
tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
first AS (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term),
per_doc AS (SELECT doc_id, count(*) AS cnt FROM tok GROUP BY doc_id),
vc AS (SELECT checkpoint, count(*) AS vocab_cum
       FROM cps JOIN first ON first.first_doc < cps.checkpoint
       GROUP BY checkpoint),
tc AS (SELECT checkpoint, CAST(sum(cnt) AS BIGINT) AS tokens_cum
       FROM cps JOIN per_doc ON per_doc.doc_id < cps.checkpoint
       GROUP BY checkpoint)
SELECT tc.checkpoint, tokens_cum, vocab_cum
FROM tc JOIN vc ON tc.checkpoint = vc.checkpoint
ORDER BY tc.checkpoint
"""


def q_text_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stopword coverage from the vendored reference stopword
    list (the token-policy data the engine must match): stopword token
    share and distinct-stopword coverage — the fluency-vs-keyword-stuffing
    signal C4/Gopher gate on, here as a per-source audit. The list is a
    broadcast literal on both engines."""
    docs = _t(spark, sf_dir, "documents")
    sw = _stopwords()
    tok = docs.select("source", F.explode(sql_tokens(F.col("text"))).alias("term"))
    is_sw = F.col("term").isin(sw)
    return (
        tok.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(is_sw.cast("long")).alias("n_stopword_tokens"),
            F.countDistinct(F.when(is_sw, F.col("term"))).alias("n_distinct_sw"),
            F.round(F.sum(is_sw.cast("double")) / F.count("*"), 6).alias(
                "stopword_share"
            ),
        )
        .orderBy("source")
    )


def _sql_text_stopword_coverage() -> str:
    # the reference list contains contractions — double the apostrophes
    values = ", ".join("('{}')".format(w.replace("'", "''")) for w in _stopwords())
    return f"""
WITH sw(w) AS (VALUES {values}),
tok AS (SELECT source, unnest({_DUCK_TOKS}) AS term FROM documents),
flag AS (SELECT source, term, term IN (SELECT w FROM sw) AS is_sw FROM tok)
SELECT source, count(*) AS n_tokens,
       CAST(sum(CASE WHEN is_sw THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stopword_tokens,
       count(DISTINCT CASE WHEN is_sw THEN term END) AS n_distinct_sw,
       round(sum(CASE WHEN is_sw THEN 1.0 ELSE 0.0 END) / count(*), 6)
           AS stopword_share
FROM flag GROUP BY source ORDER BY source
"""


def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the NB classifier's predictions
    (text_nb_langid) bucketed by (actual, predicted) with per-actual
    share and mean decision margin — the eval-hygiene table that says
    WHICH languages the filter confuses before anyone thresholds on it.
    One groupBy over the scored frame + one broadcast of per-actual
    totals."""
    from spacetime_crawler4_spark.operators.classify import nb_classify

    docs = _t(spark, sf_dir, "documents")
    preds = nb_classify(docs, label_col="lang")
    lab = docs.select("doc_id", F.col("lang").alias("actual_lang"))
    cell = (
        preds.join(lab, "doc_id")
        .groupBy("actual_lang", "pred_label")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("margin"), 4).alias("avg_margin"),
        )
    )
    per_actual = cell.groupBy("actual_lang").agg(
        F.sum("n_docs").alias("_tot")
    )
    return (
        cell.join(per_actual, "actual_lang")
        .select(
            "actual_lang",
            "pred_label",
            "n_docs",
            "avg_margin",
            F.round(F.col("n_docs") / F.col("_tot"), 6).alias("share_of_actual"),
        )
        .orderBy("actual_lang", "pred_label")
    )


SQL_TEXT_LANGID_CONFUSION = f"""
WITH preds AS (SELECT * FROM ({SQL_TEXT_NB_LANGID}) p),
cell AS (SELECT d.lang AS actual_lang, p.pred_label,
                count(*) AS n_docs,
                round(avg(p.margin), 4) AS avg_margin
         FROM preds p JOIN documents d USING (doc_id)
         GROUP BY d.lang, p.pred_label),
tot AS (SELECT actual_lang, CAST(sum(n_docs) AS BIGINT) AS t
        FROM cell GROUP BY actual_lang)
SELECT c.actual_lang, c.pred_label, c.n_docs, c.avg_margin,
       round(c.n_docs * 1.0 / t.t, 6) AS share_of_actual
FROM cell c JOIN tot t USING (actual_lang)
ORDER BY c.actual_lang, c.pred_label
"""


def q_text_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage audit (operators/encoding.py): a deterministic
    md5-keyed 7% of docs get a known cp1252-mojibake phrase appended;
    the JVM signature predicate then gates an Arrow-batched cp1252→utf-8
    round-trip repair, and the per-source audit reports docs / injected
    / detected / repaired-byte-exact. Map-only end to end; the oracle
    re-derives the injected subset from the md5 key and verifies the
    repair independently via string replacement."""
    from spacetime_crawler4_spark.operators.encoding import moji_audit

    return moji_audit(_t(spark, sf_dir, "documents"))


def _sql_text_mojibake() -> str:
    from spacetime_crawler4_spark.operators.encoding import (
        MOJI_DAMAGED,
        MOJI_PCT_BUCKETS,
        MOJI_PHRASE,
    )

    sigs = " OR ".join(
        f"position('{s}' IN damaged) > 0"
        for s in ("Ã©", "Ã¯", "Ã¨", "Ã¼", "â€", "Â·")
    )
    return f"""
WITH base AS (SELECT doc_id, source, text,
       CAST('0x' || substr(md5('moji:' || CAST(doc_id AS VARCHAR)), 1, 6)
            AS INTEGER) % 1000000 < {MOJI_PCT_BUCKETS} AS injected
     FROM documents),
d AS (SELECT source, text, injected,
       CASE WHEN injected THEN text || ' {MOJI_DAMAGED}' ELSE text END
           AS damaged
      FROM base),
f AS (SELECT source, injected, ({sigs}) AS detected, damaged, text FROM d)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN injected THEN 1 ELSE 0 END) AS BIGINT)
           AS n_injected,
       CAST(sum(CASE WHEN detected THEN 1 ELSE 0 END) AS BIGINT)
           AS n_detected,
       CAST(sum(CASE WHEN detected AND
                replace(damaged, '{MOJI_DAMAGED}', '{MOJI_PHRASE}')
                    = text || ' {MOJI_PHRASE}'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired_ok
FROM f GROUP BY source ORDER BY source
"""


def q_text_oov_goodturing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing out-of-vocabulary budgeting per source: on a
    deterministic md5 80% train split, the singleton mass N1/N is the
    Good-Turing estimate of the probability the NEXT token is unseen;
    the held-out 20% measures the realized OOV token rate against the
    train vocabulary. The audit every tokenizer/vocab decision should
    read before freezing a vocab at corpus scale — sources whose
    realized OOV far exceeds the GT mass are drifting or noisy.

    Scale: two token aggregates per source (train counts, holdout
    probe) and one vocab left join keyed (source, token) — all
    hash-shuffles; the split is the engine-portable md5 convention of
    the sampling plane."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("oov:"), F.col("doc_id"))), 1, 6),
        16,
        10,
    ).cast("long") % 100
    tagged = docs.select(
        "source",
        F.explode(sql_tokens(F.col("text"))).alias("token"),
        (bucket < OOV_TRAIN_PCT).alias("is_train"),
    )
    train_counts = (
        tagged.filter("is_train").groupBy("source", "token").agg(
            F.count("*").alias("c")
        )
    )
    gt = train_counts.groupBy("source").agg(
        F.sum("c").alias("n_train_tokens"),
        F.sum((F.col("c") == 1).cast("long")).alias("n1"),
    )
    hold = tagged.filter(~F.col("is_train")).join(
        train_counts.select("source", "token", F.lit(True).alias("in_vocab")),
        ["source", "token"],
        "left",
    )
    oov = hold.groupBy("source").agg(
        F.count("*").alias("n_holdout_tokens"),
        F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
    )
    return (
        gt.join(oov, "source")
        .select(
            "source",
            "n_train_tokens",
            "n1",
            F.round(F.col("n1") / F.col("n_train_tokens"), 6).alias(
                "gt_unseen_mass"
            ),
            "n_holdout_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_holdout_tokens"), 6).alias(
                "holdout_oov_rate"
            ),
        )
        .orderBy("source")
    )


SQL_TEXT_OOV_GOODTURING = f"""
WITH toks AS (SELECT source,
                     unnest({_DUCK_TOKS}) AS token,
                     CAST(('0x' || substr(md5('oov:' || CAST(doc_id AS VARCHAR)),
                                          1, 6)) AS BIGINT) % 100
                         < {OOV_TRAIN_PCT} AS is_train
              FROM documents),
tc AS (SELECT source, token, count(*) AS c FROM toks
       WHERE is_train GROUP BY source, token),
gt AS (SELECT source, sum(c) AS n_train_tokens,
              sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1
       FROM tc GROUP BY source),
hold AS (SELECT t.source, t.token,
                (tc.token IS NOT NULL) AS in_vocab
         FROM toks t LEFT JOIN tc
           ON tc.source = t.source AND tc.token = t.token
         WHERE NOT t.is_train),
oov AS (SELECT source, count(*) AS n_holdout_tokens,
               sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS n_oov
        FROM hold GROUP BY source)
SELECT source,
       CAST(n_train_tokens AS BIGINT) AS n_train_tokens,
       CAST(n1 AS BIGINT) AS n1,
       round(CAST(n1 AS DOUBLE) / n_train_tokens, 6) AS gt_unseen_mass,
       CAST(n_holdout_tokens AS BIGINT) AS n_holdout_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / n_holdout_tokens, 6) AS holdout_oov_rate
FROM gt JOIN oov USING (source)
ORDER BY source
"""


def q_search_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood language-model retrieval with Dirichlet-prior
    smoothing (Zhai & Lafferty, SIGIR 2001): score(d) = Σ_q ln((tf +
    μ·cf_w/|C|)/(dl + μ)) over the shared query bag, μ=1000 — the third
    classical lexical scorer next to BM25 and tf-idf (and the one the
    CCNet/perplexity plane is secretly a special case of). Candidates =
    docs matching ≥1 term (inverted-index discipline); every candidate
    is then scored over ALL query terms with tf=0 smoothing via a
    left join. Collection stats ride a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(sql_tokens(F.col("text"))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    coll = toks.agg(F.count("*").alias("c_total"))
    terms = spark.createDataFrame([(t,) for t in _RANK_TERMS], "term string")
    cf = (
        terms.alias("t")
        .join(toks.alias("k"), F.col("t.term") == F.col("k.term"), "left")
        .groupBy("t.term")
        .agg(F.count("k.term").alias("cf"))
    )
    tf = (
        toks.filter(F.col("term").isin(*_RANK_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    cand = tf.select("doc_id").distinct()
    scored = (
        cand.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(coll))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        (
                            F.coalesce(F.col("tf"), F.lit(0))
                            + F.lit(QL_MU)
                            * F.col("cf")
                            / F.col("c_total")
                        )
                        / (F.col("dl") + F.lit(QL_MU))
                    )
                ),
                6,
            ).alias("ql")
        )
    )
    return scored.orderBy(F.desc("ql"), "doc_id").limit(20)


SQL_SEARCH_DIRICHLET_QL = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
coll AS (SELECT count(*) AS c_total FROM toks),
terms AS (SELECT unnest(['join', 'filter', 'merge']) AS term),
cf AS (SELECT t.term, count(k.term) AS cf
       FROM terms t LEFT JOIN toks k ON k.term = t.term GROUP BY t.term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'merge') GROUP BY doc_id, term),
cand AS (SELECT DISTINCT doc_id FROM tf)
SELECT c.doc_id,
       round(sum(ln((coalesce(tf.tf, 0) + {QL_MU!r} * cf.cf / coll.c_total)
                    / (dl.dl + {QL_MU!r}))), 6) AS ql
FROM cand c
CROSS JOIN cf
LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = cf.term
JOIN dl ON dl.doc_id = c.doc_id
CROSS JOIN coll
GROUP BY c.doc_id ORDER BY ql DESC, c.doc_id LIMIT 20
"""


def q_search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of the BM25 and tf-idf top-20 lists for the shared query bag:
    rrf(d) = Σ_lists 1/(60 + rank_d). RRF is the standard way a search
    plane combines heterogeneous scorers (lexical+semantic) without
    score calibration — only ranks cross the boundary, so each ranker
    keeps its own scale. Ranks come from the committed top-20 queries
    (scores rounded to 6 first, ties broken by doc_id) so fusion is
    deterministic and the oracle reproduces rank-for-rank."""
    from pyspark.sql.window import Window
    from spacetime_crawler4_spark.operators.ranking import (
        bm25_scores,
        tfidf_scores,
    )

    docs = _t(spark, sf_dir, "documents")
    # top-K FIRST via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global sort), THEN the rank window over the 20-row frame;
    # a row_number window over the full scored set would single-partition
    # sort every matching doc at corpus scale for the same answer
    bm = (
        bm25_scores(docs, _RANK_TERMS)
        .withColumn("bm25", F.round("bm25", 6))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_TOP)
        .withColumn(
            "rank_bm25",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rank_bm25")
    )
    tf = (
        tfidf_scores(docs, _RANK_TERMS)
        .withColumn("tfidf", F.round("tfidf", 6))
        .orderBy(F.desc("tfidf"), F.asc("doc_id"))
        .limit(RRF_TOP)
        .withColumn(
            "rank_tfidf",
            F.row_number().over(
                Window.orderBy(F.desc("tfidf"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rank_tfidf")
    )
    return (
        bm.join(tf, "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_bm25")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_tfidf")),
                    F.lit(0.0),
                ),
                6,
            ).alias("rrf"),
            "rank_bm25",
            "rank_tfidf",
        )
        .orderBy(F.desc("rrf"), "doc_id")
    )


SQL_SEARCH_RRF_FUSION = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'merge') GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
bm AS (SELECT doc_id,
              round(sum(ln(1 + (stats.n_docs - df + 0.5) / (df + 0.5))
                        * (tf * 2.2)
                        / (tf + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))), 6)
                  AS bm25
       FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
       CROSS JOIN stats
       GROUP BY doc_id),
bmr AS (SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
        FROM bm QUALIFY rank_bm25 <= {RRF_TOP}),
ti AS (SELECT doc_id,
              round(sum((1 + ln(tf)) * ln(n.n_docs / (1 + df))), 6) AS tfidf
       FROM tf JOIN dfreq USING (term) CROSS JOIN n
       GROUP BY doc_id),
tir AS (SELECT doc_id,
               row_number() OVER (ORDER BY tfidf DESC, doc_id) AS rank_tfidf
        FROM ti QUALIFY rank_tfidf <= {RRF_TOP})
SELECT coalesce(bmr.doc_id, tir.doc_id) AS doc_id,
       round(coalesce(1.0 / ({RRF_K} + rank_bm25), 0.0)
             + coalesce(1.0 / ({RRF_K} + rank_tfidf), 0.0), 6) AS rrf,
       rank_bm25, rank_tfidf
FROM bmr FULL OUTER JOIN tir USING (doc_id)
ORDER BY rrf DESC, doc_id
"""


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf
    (ln-smoothed idf over document frequency) — the per-doc metadata a
    corpus index materializes for faceting/routing. One (doc, term) tf
    aggregate, a term-df aggregate joined back, and a per-doc rank
    window bounded by each doc's vocabulary; scores round to 6 before
    ranking so the election is engine-stable."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(sql_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / (1 + F.col("df"))), 6
        ).alias("score"),
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= KEYWORDS_PER_DOC)
        .orderBy("doc_id", "rank")
    )


SQL_TEXT_KEYWORDS = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (SELECT doc_id, term,
              round(tf * ln(CAST(n.n_docs AS DOUBLE) / (1 + df)), 6) AS score
       FROM tf JOIN dfreq USING (term) CROSS JOIN n)
SELECT doc_id, term, score,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS rank
FROM sc QUALIFY rank <= {KEYWORDS_PER_DOC}
ORDER BY doc_id, rank
"""
