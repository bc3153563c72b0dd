"""Sampling-plane queries: hash/stratified/weighted/temperature sampling.

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

from ._shared import _DUCK_TOKS, _TEMP_ALPHA, _t  # noqa: F401



# --------------------------------------------------------------------------
# DSIR data selection (operators/dsir.py — Xie et al. 2023)
# --------------------------------------------------------------------------


def q_sample_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (round 4): select the 50 documents whose
    hashed unigram+bigram distribution is most target-like, with the 'en'
    slice as the target corpus and the whole pool as the source model.
    log w(d) = sum_b c_b(d)(log p_b - log q_b) over 4096 md5-hashed
    buckets, add-1 smoothing; deterministic rank by rounded weight (the
    paper's Gumbel noise swaps in via operators/sampling.exp_sort_key).
    Plan: one explode, two aggregations, a broadcast 4096-row model join."""
    from spacetime_crawler4_spark.operators.dsir import dsir_select_topk

    docs = _t(spark, sf_dir, "documents")
    return dsir_select_topk(docs, F.col("lang") == "en", k=50)


SQL_SAMPLE_DSIR = f"""
WITH toks AS (SELECT doc_id, lang, {_DUCK_TOKS} AS ts FROM documents),
uni AS (SELECT doc_id, lang, unnest(ts) AS gram FROM toks),
bi AS (SELECT doc_id, lang,
              unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS gram
       FROM toks),
grams AS (SELECT doc_id, lang,
                 CAST('0x' || substr(md5('dsir' || gram), 1, 6) AS INTEGER) % 4096 AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
dc AS (SELECT doc_id, b, count(*) AS c FROM grams GROUP BY doc_id, b),
tt AS (SELECT b, count(*) AS cs,
              sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
       FROM grams GROUP BY b),
tot AS (SELECT sum(cs) AS ns, sum(ct) AS nt FROM tt),
lr AS (SELECT b, ln((ct + 1.0) / (nt + 4096.0)) - ln((cs + 1.0) / (ns + 4096.0)) AS r
       FROM tt CROSS JOIN tot),
sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
              round(sum(c * r), 4) AS dsir_logw
       FROM dc JOIN lr USING (b) GROUP BY doc_id)
SELECT doc_id, n_grams, dsir_logw FROM sc
ORDER BY dsir_logw DESC, doc_id LIMIT 50
"""


# --------------------------------------------------------------------------
# deterministic sampling (operators/sampling.py — map-only, retry-stable)
# --------------------------------------------------------------------------


def q_sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample of documents keyed on doc_id.

    Map-only (no Exchange, plan-gated in tests/test_sampling.py): one md5 +
    compare per row, so the filter composes with parquet column pruning and
    survives task retries / AQE re-plans with the identical keep set. The
    oracle recomputes the same md5 bucket in DuckDB — the sample is
    engine-portable, not just run-stable.
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        hash_sample(docs, "doc_id", 0.10, salt="s1")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


SQL_SAMPLE_HASH = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST('0x' || substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 6) AS INTEGER)
      % 1000000 < 100000
ORDER BY doc_id
"""


def q_sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample — the dataset-mixing primitive.

    Downsamples the head language (en at 20%) while keeping tails whole
    (zh/es at 100%), default 50% elsewhere. The rate table is a literal map
    expression (broadcast by construction — never a join), so the whole
    sample is still one map-only pass. Returns per-stratum realized counts.
    """
    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.2, "zh": 1.0, "es": 1.0},
        default_rate=0.5,
        salt="mix",
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


SQL_SAMPLE_STRATIFIED = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 6) AS INTEGER)
      % 1000000
      < CASE lang WHEN 'en' THEN 200000
                  WHEN 'zh' THEN 1000000
                  WHEN 'es' THEN 1000000
                  ELSE 500000 END
GROUP BY lang ORDER BY lang
"""


def q_sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test assignment, tallied per source.

    The split is a pure function of doc_id (salt 'split'), so growing the
    corpus or resizing the cluster can never leak a document across the
    boundary — the property eval-set hygiene depends on at 100 TB.
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", 0.2)
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "source")
    )


SQL_SAMPLE_SPLIT = """
SELECT CASE WHEN CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 6)
                 AS INTEGER) % 1000000 < 200000
            THEN 'test' ELSE 'train' END AS split,
       source, count(*) AS n_docs
FROM documents
GROUP BY split, source ORDER BY split, source
"""


WEIGHTED_SAMPLE_K = 50


def q_sample_weighted_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis-Spirakis A-Res),
    50 docs proportional to n_chars — the data-mixing primitive, with
    deterministic md5 uniforms so the oracle re-derives the identical
    sample. Map-only key + TakeOrderedAndProject, no corpus shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return (
        weighted_sample(
            docs.select("doc_id", F.col("n_chars").cast("double").alias("w")),
            "doc_id",
            "w",
            WEIGHTED_SAMPLE_K,
        )
        .select("doc_id", F.col("w").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


SQL_SAMPLE_WEIGHTED = f"""
WITH k AS (SELECT doc_id, n_chars,
       -ln((CAST(('0x' || substr(md5('w' || CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) + 1.0) / {float(16 ** 13)!r}) / CAST(n_chars AS DOUBLE)
           AS esk
       FROM documents)
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM k ORDER BY esk, doc_id LIMIT {WEIGHTED_SAMPLE_K})
ORDER BY doc_id
"""


def q_sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting toward the uniform source mixture
    (DoReMi / The Pile recipe distilled to its deterministic core): each
    source's token share vs target share and the resampling weight. One
    partial-aggregated groupBy; ratios from exact BIGINT counts
    (operators/sampling.py:source_mixture_weights)."""
    from spacetime_crawler4_spark.operators.sampling import source_mixture_weights

    docs = _t(spark, sf_dir, "documents")
    return source_mixture_weights(docs).orderBy("source")


SQL_SAMPLE_MIXTURE = f"""
WITH toks AS (SELECT source, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n
              FROM documents),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_toks
        FROM toks GROUP BY source),
tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS total,
               count(*) AS n_sources FROM per)
SELECT source, n_docs, n_toks,
       round(n_toks / (tot.total * 1.0), 6) AS share,
       round(1.0 / tot.n_sources, 6) AS target_share,
       round((1.0 / tot.n_sources) / (n_toks / (tot.total * 1.0)), 6) AS weight
FROM per CROSS JOIN tot ORDER BY source
"""


def q_sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (mT5 §3.4.2 / XLM-R): sampling
    share p^0.3/Z per lang — flattens the head, boosts the tail; emits
    the per-group boost factor a downstream sampler applies."""
    from spacetime_crawler4_spark.operators.sampling import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    return temperature_mixture(docs, alpha=_TEMP_ALPHA).orderBy("lang")


SQL_SAMPLE_TEMPERATURE = f"""
WITH per AS (SELECT lang, count(*) AS n_docs,
                    sum(CAST(len({_DUCK_TOKS}) AS BIGINT)) AS n_toks
             FROM documents GROUP BY lang),
tot AS (SELECT sum(n_toks) AS total FROM per),
powed AS (SELECT lang, n_docs, n_toks, n_toks / total AS share,
                 pow(n_toks / total, {_TEMP_ALPHA}) AS p_alpha
          FROM per CROSS JOIN tot),
z AS (SELECT sum(p_alpha) AS z FROM powed)
SELECT lang, n_docs, n_toks, round(share, 6) AS share,
       round(p_alpha / z, 6) AS temp_share,
       round((p_alpha / z) / share, 6) AS boost
FROM powed CROSS JOIN z ORDER BY lang
"""


def q_sample_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic repetition plan closing the mixture loop: each
    lang's temperature boost becomes per-doc copy counts — floor(boost)
    guaranteed copies plus one md5-Bernoulli copy with p = frac(boost)
    (Efraimidis-style engine-portable uniform) — so the emitted corpus
    realizes the target mixture in expectation with zero RNG state.
    Output: per lang, docs, planned copies, realized boost."""
    from spacetime_crawler4_spark.operators.sampling import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    mix = temperature_mixture(docs, alpha=_TEMP_ALPHA).select("lang", "boost")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("rp:"), F.col("doc_id").cast("string"))), 1, 6),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**6))
    )
    planned = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(mix), "lang")
        .select(
            "lang",
            "doc_id",
            (
                F.floor("boost")
                + (u < (F.col("boost") - F.floor("boost"))).cast("long")
            ).alias("n_copies"),
        )
    )
    return (
        planned.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_copies").alias("n_copies"),
            F.round(F.sum("n_copies") / F.count("*"), 6).alias("realized_boost"),
        )
        .orderBy("lang")
    )


def _sql_sample_repeat_plan() -> str:
    mix_sql = SQL_SAMPLE_TEMPERATURE.strip().rstrip(";")
    return f"""
WITH mix AS ({mix_sql}),
planned AS (SELECT d.lang, d.doc_id,
       floor(m.boost)
       + CASE WHEN CAST(CAST('0x' || substr(md5('rp:' || CAST(d.doc_id AS VARCHAR)), 1, 6)
                         AS BIGINT) AS DOUBLE) / {float(16**6)}
                   < m.boost - floor(m.boost)
              THEN 1 ELSE 0 END AS n_copies
       FROM documents d JOIN mix m ON m.lang = d.lang)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_copies) AS BIGINT) AS n_copies,
       round(sum(n_copies) * 1.0 / count(*), 6) AS realized_boost
FROM planned GROUP BY lang ORDER BY lang
"""
