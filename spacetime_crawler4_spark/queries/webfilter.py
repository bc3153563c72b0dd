"""Web-quality-filter queries (Gopher/C4/repetition/host reputation).

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

from ._shared import _sql_paged, _t  # noqa: F401
from .text import _paged_text  # noqa: F401
from .dedup import SQL_WEBFILTER_GOPHER, _GOPHER_FEATURE_CTES  # noqa: F401



def q_webfilter_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line cleaning (Raffel et al. 2020 §2.2) over the paged view:
    terminal-punctuation + ≥3-words + no-javascript line rules."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "ptext", _paged_text(8, punct=True, inject=True)
    )
    return (
        c4_clean_lines(docs, "ptext")
        .select("doc_id", "n_lines", "n_kept_lines", "clean_chars", "c4_keep")
        .orderBy("doc_id")
    )


SQL_WEBFILTER_C4 = rf"""
WITH {_sql_paged(8, punct=True, inject=True)},
k AS (SELECT doc_id,
        string_split(ptext, chr(10)) AS lines,
        [l for l in string_split(ptext, chr(10))
         if regexp_matches(rtrim(l), '[.!?"'']$')
            AND len([x for x in regexp_split_to_array(l, '\s+') if x <> '']) >= 3
            AND NOT contains(lower(l), 'javascript')] AS kept,
        ptext
      FROM paged)
SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines,
       coalesce(length(array_to_string(kept, chr(10))), 0) AS clean_chars,
       (NOT contains(lower(ptext), 'lorem ipsum') AND NOT contains(ptext, '{{')) AS c4_keep
FROM k ORDER BY doc_id
"""


def q_webfilter_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition counters (A1.2): duplicated-line char fraction over
    a dup-rich 2-word paged view, top-bigram char coverage over raw text."""
    docs = _t(spark, sf_dir, "documents")
    paged = docs.withColumn("ptext", _paged_text(2, punct=False, inject=False))
    rep = repetition_stats(
        paged.select("doc_id", F.col("ptext").alias("text"))
    )
    return rep.orderBy("doc_id")


SQL_WEBFILTER_REPETITION = rf"""
WITH {_sql_paged(2, punct=False, inject=False)},
lr AS (SELECT doc_id, unnest(string_split(ptext, chr(10))) AS line FROM paged),
pl AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS chars
       FROM lr WHERE line <> '' GROUP BY doc_id, line),
dl AS (SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END) AS dup_chars,
         sum(cnt * chars) AS tot_chars
       FROM pl GROUP BY doc_id),
pw AS (SELECT doc_id,
         [x for x in regexp_split_to_array(ptext, '\s+') if x <> ''] AS ws
       FROM paged),
bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
       FROM pw WHERE len(ws) >= 2),
pg AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY doc_id, gram),
tg AS (SELECT p.doc_id, max(p.cnt * length(p.gram)) AS top_bigram_chars
       FROM pg p JOIN (SELECT doc_id, max(cnt) AS mc FROM pg GROUP BY doc_id) m
         ON p.doc_id = m.doc_id AND p.cnt = m.mc
       GROUP BY p.doc_id),
wc AS (SELECT doc_id, coalesce(list_sum([length(x) for x in ws]), 0) AS word_chars
       FROM pw)
SELECT w.doc_id,
       CASE WHEN d.tot_chars > 0
            THEN round(CAST(coalesce(d.dup_chars, 0) AS DOUBLE) / d.tot_chars, 6)
            ELSE 0.0 END AS frac_dup_line_chars,
       CASE WHEN w.word_chars > 0
            THEN round(CAST(coalesce(t.top_bigram_chars, 0) AS DOUBLE) / w.word_chars, 6)
            ELSE 0.0 END AS frac_top_bigram_chars
FROM wc w LEFT JOIN dl d ON w.doc_id = d.doc_id
          LEFT JOIN tg t ON w.doc_id = t.doc_id
ORDER BY w.doc_id
"""


def q_webfilter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level survival funnel through the Gopher and C4 gates —
    the one-row summary a pipeline operator watches per ingest batch."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "ptext", _paged_text(8, punct=True, inject=True)
    )
    g = gopher_quality(docs).select("doc_id", "gopher_keep")
    c = c4_clean_lines(docs, "ptext").select(
        "doc_id", ((F.col("n_kept_lines") > 0) & F.col("c4_keep")).alias("c4_ok")
    )
    return g.join(c, "doc_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("gopher_keep").cast("long")).alias("n_gopher"),
        F.sum(F.col("c4_ok").cast("long")).alias("n_c4"),
        F.sum((F.col("gopher_keep") & F.col("c4_ok")).cast("long")).alias("n_both"),
    )


SQL_WEBFILTER_FUNNEL = rf"""
WITH g AS (SELECT doc_id, gopher_keep FROM ({SQL_WEBFILTER_GOPHER}) s),
{_sql_paged(8, punct=True, inject=True).lstrip()},
c AS (SELECT doc_id,
        (len([l for l in string_split(ptext, chr(10))
              if regexp_matches(rtrim(l), '[.!?"'']$')
                 AND len([x for x in regexp_split_to_array(l, '\s+') if x <> '']) >= 3
                 AND NOT contains(lower(l), 'javascript')]) > 0
         AND NOT contains(lower(ptext), 'lorem ipsum')
         AND NOT contains(ptext, '{{')) AS c4_ok
      FROM paged)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN g.gopher_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
       CAST(sum(CASE WHEN c.c4_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_c4,
       CAST(sum(CASE WHEN g.gopher_keep AND c.c4_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_both
FROM g JOIN c ON g.doc_id = c.doc_id
"""


def q_webfilter_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level reputation (UT1-blocklist-style domain aggregation):
    per source, mean fraction of Gopher rules passed; hosts under the
    block cutoff are dropped wholesale, with the collateral count of
    individually-good docs lost. Map-only flags + one groupBy(source) —
    at 10^10 URLs the host table stays a broadcastable dim."""
    docs = _t(spark, sf_dir, "documents")
    return host_reputation(docs).orderBy("source")


SQL_WEBFILTER_HOST_REPUTATION = f"""{_GOPHER_FEATURE_CTES},
rp AS (SELECT d.source,
              round((
                  CAST((f.n_words >= 50 AND f.n_words <= 100000) AS INT)
                + CAST((f.mean_word_len >= 3.0 AND f.mean_word_len <= 10.0) AS INT)
                + CAST((f.symbol_ratio <= 0.1) AS INT)
                + CAST((f.frac_bullet <= 0.9) AS INT)
                + CAST((f.frac_ellipsis <= 0.3) AS INT)
                + CAST((f.frac_alpha_words >= 0.8) AS INT)
                + CAST((f.n_stop_hits >= 2) AS INT)) / 7.0, 6) AS doc_rules
       FROM f JOIN documents d USING (doc_id)),
agg AS (SELECT source, count(*) AS n_docs,
               round(avg(doc_rules), 6) AS mean_rules,
               CAST(sum(CASE WHEN doc_rules >= {DOC_GOOD_RULES} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_good
        FROM rp GROUP BY source)
SELECT source, n_docs, mean_rules,
       (mean_rules < {HOST_BLOCK_MEAN_RULES}) AS host_blocked,
       CASE WHEN mean_rules < {HOST_BLOCK_MEAN_RULES} THEN n_good
            ELSE CAST(0 AS BIGINT) END AS n_good_docs_lost
FROM agg ORDER BY source
"""
