"""Shared helpers, tokenizer constants, and table loaders for the query planes.

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



SparkFn = Callable[[SparkSession, str], DataFrame]

# word-level tokenizer shared with every oracle (see operators/dedup.sql_tokens)
_TOK_RE = "[^a-z0-9']+"
_DUCK_TOKS = (
    "[t for t in regexp_split_to_array(lower(text), '[^a-z0-9'']+') if t <> '']"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _stopwords() -> list[str]:
    txt = (_res.files("spacetime_crawler4_spark") / "resources" / "stopwords.txt").read_text()
    return [w.strip() for w in txt.splitlines() if w.strip()]


JACCARD_MAX_DF = 32  # df cap: bounds every shingle bucket's pair fan-out


CONT_MIN = 0.8


_WORDHASH_VALUES_SQL: str | None = None


def _wordhash_values() -> str:
    """VALUES rows (word, h32, h64): crc64 hash of every whitespace token
    in the testdata documents tables, as MSB-first bit strings. Computed
    once per process by functions/crc.crc64 (differentially tested vs
    reference helpers/crc64.py) — this is the 'materialized word-hash
    dictionary' that makes the simhash plane SQL-checkable."""
    global _WORDHASH_VALUES_SQL
    if _WORDHASH_VALUES_SQL is None:
        import glob

        import duckdb

        from spacetime_crawler4_spark.functions.crc import crc64

        words: set[str] = set()
        con = duckdb.connect()
        for p in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
            got = con.sql(
                "SELECT DISTINCT unnest([t for t in regexp_split_to_array("
                "lower(text), '\\s+') if t <> '']) AS w FROM "
                f"read_parquet('{p}')"
            ).fetchall()
            words.update(w for (w,) in got)
        con.close()
        rows = []
        for w in sorted(words):
            h = crc64(w.encode("utf-8"))
            q = w.replace("'", "''")
            rows.append(
                f"('{q}', '{format(h & 0xFFFFFFFF, '032b')}', '{format(h, '064b')}')"
            )
        if not rows:  # keep the SQL syntactically valid without testdata
            rows = [f"('', '{'0' * 32}', '{'0' * 64}')"]
        _WORDHASH_VALUES_SQL = ", ".join(rows)
    return _WORDHASH_VALUES_SQL


_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + "]"


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{m}')" for lang, ms in LANG_MARKERS.items() for m in ms
)


# --------------------------------------------------------------------------
# relational plane (TPC-H-ish: scans, joins, aggregations)
# --------------------------------------------------------------------------


_FUNNEL_STEPS = ("view", "click", "purchase")


_Q7_NATIONS = ("NATION_1", "NATION_2")


_DUCK_ANCHOR_TOKS = _DUCK_TOKS.replace("lower(text)", "lower(anchor_text)")


_ANCHOR_BM25_TERMS = ("item", "hub", "section")


# --------------------------------------------------------------------------
# relevance ranking (operators/ranking.py — corpus slicing / boosted sampling)
# --------------------------------------------------------------------------

_RANK_TERMS = ("join", "filter", "merge")


def _sql_paged(chunk: int, punct: bool, inject: bool) -> str:
    js = (
        "|| CASE WHEN (doc_id+i) % 11 = 0 THEN ' javascript' ELSE '' END"
        if inject
        else ""
    )
    dot = (
        "|| CASE WHEN (doc_id+i) % 3 = 0 THEN '' ELSE '.' END" if punct else ""
    )
    return rf"""
w AS (SELECT *, [x for x in regexp_split_to_array(text, '\s+') if x <> ''] AS ws
      FROM documents),
paged AS (SELECT *, array_to_string(
   [array_to_string(ws[i*{chunk}+1 : i*{chunk}+{chunk}], ' ') {js} {dot}
    for i in range(0, CAST(ceil(len(ws)/{chunk}.0) AS INTEGER))], chr(10)) AS ptext
 FROM w)
"""
_BENCH_PRED = "doc_id % 10 = 7"  # deterministic eval-set stand-in


INCR_SPLIT_ID = 400  # doc_id < 400 = existing corpus, >= 400 = new batch


# --------------------------------------------------------------------------
# graph analytics: PageRank (operators/graph.py) over the supplier/customer
# trade graph; exact length quantiles per source
# --------------------------------------------------------------------------

PR_ITERS = 5
PR_DAMPING = 0.85
PR_BACKEDGE_MIN_PRICE = 450_000.0  # only big buyers link back -> real


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier->customer trade graph shared by pagerank and HITS."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pairs = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        "o_totalprice",
    )
    fwd = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).distinct()
    back = (
        pairs.filter(F.col("o_totalprice") > PR_BACKEDGE_MIN_PRICE)
        .select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .distinct()
    )
    return fwd.unionByName(back)


COSUPPLY_TOP_EDGES = 300  # strongest co-supply pairs kept in the projection


SPAN_N = 8  # exact-substring window width in words


def _sql_substring_spans() -> str:
    n = SPAN_N
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
w AS (SELECT doc_id AS id,
             unnest(range(1, len(ts) - {n - 2})) AS pos,
             unnest([md5({gram}) for i in range(1, len(ts) - {n - 2})]) AS whash
      FROM toks),
dup AS (SELECT whash FROM w GROUP BY whash HAVING count(*) >= 2),
dp AS (SELECT id, pos FROM w JOIN dup USING (whash)),
agg AS (SELECT id, count(*) AS n_spans, CAST(sum(span_words) AS BIGINT) AS dup_words
        FROM (SELECT id, grp, count(*) + {n - 1} AS span_words
              FROM (SELECT id, pos,
                           pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS grp
                    FROM dp)
              GROUP BY id, grp)
        GROUP BY id)
SELECT a.id AS doc_id, a.n_spans, a.dup_words,
       CAST(len(t.ts) AS BIGINT) AS n_words,
       round(a.dup_words * 1.0 / len(t.ts), 6) AS dup_frac
FROM agg a JOIN toks t ON t.doc_id = a.id
ORDER BY dup_frac DESC, a.dup_words DESC, a.id
"""


def _sql_substring_removal() -> str:
    n = SPAN_N
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
w AS (SELECT doc_id AS id,
             unnest(range(1, len(ts) - {n - 2})) AS pos,
             unnest([md5({gram}) for i in range(1, len(ts) - {n - 2})]) AS whash
      FROM toks),
ds AS (SELECT id, pos AS tpos, 1 AS dup_start FROM (
         SELECT id, pos,
                row_number() OVER (PARTITION BY whash ORDER BY id, pos) AS rk
         FROM w)
       WHERE rk > 1),
tok AS (SELECT doc_id AS id, unnest(ts) AS token,
               generate_subscripts(ts, 1) AS tpos
        FROM toks),
fl AS (SELECT t.id, t.tpos, t.token,
              max(coalesce(d.dup_start, 0)) OVER (
                  PARTITION BY t.id ORDER BY t.tpos
                  ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW) AS covered
       FROM tok t LEFT JOIN ds d ON d.id = t.id AND d.tpos = t.tpos)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(1 - covered) AS BIGINT) AS kept_words,
       substr(coalesce(string_agg(CASE WHEN covered = 0 THEN token END,
                                  ' ' ORDER BY tpos), ''), 1, 120) AS cleaned_prefix
FROM fl GROUP BY id ORDER BY id
"""


# --------------------------------------------------------------------------
# chunking / packing / mixture / perplexity partition (round-4 session 3)
# --------------------------------------------------------------------------

CHUNK_L = 64  # chunk_tokens
CHUNK_OV = 16  # overlap -> stride 48
PACK_SEQ_LEN = 256


_CHUNK_STRIDE = CHUNK_L - CHUNK_OV


# --------------------------------------------------------------------------
# round-4 session-6: crawl-ops analytics (trap mining, recrawl scheduling)
# + mirror detection + quality-canonical dedup election
# --------------------------------------------------------------------------

# URL template normalization shared by both engines: strip the scheme,
# collapse every query-string VALUE to 'V', then every digit run to 'N'.
# Order matters (value rule first, so '?page=3' -> '?page=V' not '?page=N')
# and both engines apply the identical two regexes globally.
_TRAP_SCHEME_RE = "^https?://"
_TRAP_QVAL_RE = "([?&][^=&]+)=[^&]*"
_TRAP_DIGIT_RE = "[0-9]+"
TRAP_MIN_URLS = 3


def _sql_bucket(salt: str, key_expr: str) -> str:
    """DuckDB twin of operators/sampling.sample_bucket (24-bit md5 prefix
    onto 10^6 buckets)."""
    return (
        f"(CAST('0x' || substr(md5('{salt}' || {key_expr}), 1, 6) AS INTEGER)"
        f" % 1000000)"
    )


# marketing/click-tracking query parameters stripped by the alias
# canonicalizer; the regex removes each pair WITH its preceding delimiter,
# then a second anchored pass repairs '&' -> '?' when the first surviving
# param lost its '?'. Both regexes are RE2-portable and applied identically
# by Spark and DuckDB.
_TRACK_PARAM_RE = r"[?&](utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|ref)=[^&]*"
_TRACK_REPAIR_RE = r"^([^?&]*)&"


# boilerplate lexicon for the soft-404 detector: tokens characteristic of
# error templates but NOT of the fixture's content vocabulary ("page" and
# "catalog" are deliberately excluded — they appear in legitimate titles).
SOFT404_LEXICON = (
    "not", "found", "error", "errors", "sorry", "deleted", "moved", "requested"
)
SOFT404_MIN_SHARE = 0.2


PHRASE_QUERY = ("table", "hash")


# --------------------------------------------------------------------------
# TrustRank + spam mass over the crawl's discovered link graph
# --------------------------------------------------------------------------

TRUST_ITERS = 3


ANCHOR_SPAM_MIN_INLINKS = 2


COCITE_MAX_OUT = 50
COCITE_MIN_COMMON = 2


CDX_N_FILES = 4


# --------------------------------------------------------------------------
# round-4 session-11 staged surface: term-vector near-dup, quality-aware
# master election, hard-negative mining, host-graph components,
# token-balanced shard layout, temperature mixture, retention cohorts
# --------------------------------------------------------------------------

_TFIDF_MAX_DF = 50
_TFIDF_MIN_COS = 0.3


_SHARD_TARGET_TOKENS = 2000


_TEMP_ALPHA = 0.3


_RETENTION_MAX_DAY = 7


_PCA_DIM = 64
_PCA_ITERS = 4


_FH_BUCKETS = 16


_MAD_K = 3.0


_JSD_SMOOTH = 0.5


_HEAPS_CHECKPOINTS = 10


LP_ITERS = 3
LP_EDGE_MIN_PRICE = 480_000.0  # sparser slice of the trade graph


QA_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
QA_ACC = 100  # percentile_approx accuracy -> rank error <= n/100 per summary


# --------------------------------------------------------------------------
# MOSS winnow-overlap pairs; Good-Turing OOV audit (session 14)
# --------------------------------------------------------------------------

WINNOW_MIN_SHARED = 3
WINNOW_MAX_DF = 20


OOV_TRAIN_PCT = 80


# --------------------------------------------------------------------------
# Dirichlet query-likelihood retrieval; Rocchio centroid confusion (s14)
# --------------------------------------------------------------------------

QL_MU = 1000.0


# --------------------------------------------------------------------------
# Reciprocal-rank fusion; TPC-H Q21 shape; windowed top-k (session 14)
# --------------------------------------------------------------------------

RRF_K = 60
RRF_TOP = 20


# --------------------------------------------------------------------------
# TPC-H Q8 (market share) and Q17 (small-quantity revenue) shapes (s14)
# --------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_TYPE = "PROMO"

Q17_BRAND = "Brand#1"


KEYWORDS_PER_DOC = 3
