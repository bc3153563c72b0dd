"""Pipeline-plane queries: admission, decontamination, PII.

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

from ._shared import _BENCH_PRED, _DUCK_TOKS, _t  # noqa: F401
from .sketch import _duck_grams  # noqa: F401
from .dedup import SQL_WEBFILTER_GOPHER, _SQL_MINHASH_PAIR_CTES, _SQL_MINHASH_VERIFIED_PAIRS_CTES  # noqa: F401



# --------------------------------------------------------------------------
# corpus hygiene: decontamination, incremental dedup, PII scrub, int8
# (operators/decontam.py, operators/pii.py, operators/quantize.py)
# --------------------------------------------------------------------------

DECONTAM_N = 5
DECONTAM_MIN_HITS = 2


SQL_DECONTAM = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS ({_duck_grams(DECONTAM_N)}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE {_BENCH_PRED.replace('doc_id', 'id')}),
corp AS (SELECT * FROM sh WHERE NOT ({_BENCH_PRED.replace('doc_id', 'id')}))
SELECT id AS doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(sum(CASE WHEN shingle IN (SELECT shingle FROM bench) THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS hit_ratio,
       sum(CASE WHEN shingle IN (SELECT shingle FROM bench) THEN 1 ELSE 0 END)
         >= {DECONTAM_MIN_HITS} AS contaminated
FROM corp GROUP BY id ORDER BY doc_id
"""


def q_decontam_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: corpus docs whose whole-document
    Jaccard against ANY benchmark doc reaches 0.5, found by cross-table
    MinHash-banded LSH (benchmark never self-joins) with exact-Jaccard
    verification — catches the paraphrased / lightly-edited eval
    leakage the exact n-gram probe (decontam_report) structurally
    misses. Reuses operators/decontam.incremental_dedup with the
    benchmark as the base side: at production scale the benchmark band
    table is a tiny reusable artifact and the corpus side streams
    through in one pass. Output is the per-corpus-doc manifest
    (matched_bench / jaccard / contaminated)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.expr(_BENCH_PRED))
    corpus = docs.filter(~F.expr(_BENCH_PRED))
    return (
        incremental_dedup(
            bench, corpus, "doc_id", "text", n=3, k=8, r=2, min_jaccard=0.5
        )
        .select(
            F.col("batch_id").alias("doc_id"),
            F.col("dup_of").alias("matched_bench"),
            "jaccard",
            (~F.col("keep")).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


SQL_DECONTAM_FUZZY = f"""
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
         WHERE NOT (q.id % 10 = 7) AND c.id % 10 = 7),
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
SELECT d.doc_id, best.base_id AS matched_bench, best.jaccard,
       best.base_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN best ON best.batch_id = d.doc_id
WHERE NOT (d.doc_id % 10 = 7) ORDER BY doc_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact audit: deterministic synthetic PII (derived
    from doc_id by inlined integer arithmetic, identically in the oracle)
    is planted into each document, then the map-only scrub reports
    per-category match counts and the md5 of the fully redacted text —
    any detector or replacement-order divergence breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return pii_report(
        inject_pii(docs, "doc_id", "text"), "doc_id", "text"
    ).withColumnRenamed("id", "doc_id").orderBy("doc_id")


def _sql_pii() -> str:
    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    redact = "text"
    for _, pat, repl in PII_PATTERNS:
        redact = f"regexp_replace({redact}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pats[name]}')) AS n_{name}"
        for name in pats
    )
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pats[name]}'))" for name in pats
    )
    return f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org'
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0 THEN
                   ' +1-' || CAST(800 + doc_id % 200 AS VARCHAR)
                   || '-555-' || lpad(CAST(doc_id * 37 % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
              || CASE WHEN doc_id % 4 = 0 THEN
                   ' 4' || lpad(CAST(doc_id AS VARCHAR), 15, '0')
                 ELSE '' END AS text
  FROM documents)
SELECT doc_id,
       {counts},
       {total} AS n_pii,
       md5({redact}) AS redacted_md5
FROM injected ORDER BY doc_id
"""


def q_pipeline_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end admission manifest — what actually ships
    to training: per document, the Gopher quality verdict, the near-dup
    keep/drop (minhash-LSH pairs closed into components, drop non-
    masters), benchmark decontamination, eval-split exclusion, the final
    ``admitted`` decision, and the deterministic train/test split. Each
    stage is the already-oracle-checked operator; this query proves they
    compose (the oracle chains the same CTE fragments)."""
    docs = _t(spark, sf_dir, "documents")
    gq = gopher_quality(docs).select("doc_id", "gopher_keep")
    sh = word_shingles(docs, "doc_id", "text", 3)
    cc = connected_components(
        minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    ).withColumnRenamed("id", "doc_id")
    bench = docs.filter(F.expr(_BENCH_PRED))
    corpus = docs.filter(~F.expr(_BENCH_PRED))
    cont = (
        decontaminate(
            corpus, bench, "doc_id", "text",
            n=DECONTAM_N, min_hits=DECONTAM_MIN_HITS,
        )
        .select(F.col("id").alias("doc_id"), "contaminated")
    )
    spl = train_test_split(docs.select("doc_id"), "doc_id", 0.2)
    dup_drop = F.col("cluster_id").isNotNull() & (
        F.col("cluster_id") != F.col("doc_id")
    )
    contaminated = F.coalesce(F.col("contaminated"), F.lit(False))
    is_bench = F.expr(_BENCH_PRED)
    return (
        docs.select("doc_id")
        .join(gq, "doc_id")
        .join(cc, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(spl, "doc_id")
        .select(
            "doc_id",
            "gopher_keep",
            dup_drop.alias("dup_drop"),
            contaminated.alias("contaminated"),
            is_bench.alias("is_bench"),
            (
                F.col("gopher_keep")
                & ~dup_drop
                & ~contaminated
                & ~is_bench
            ).alias("admitted"),
            "split",
        )
        .orderBy("doc_id")
    )


def _sql_pipeline_admission() -> str:
    return f"""
WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES},
g AS (SELECT doc_id, gopher_keep FROM ({SQL_WEBFILTER_GOPHER}) s),
sh5 AS ({_duck_grams(DECONTAM_N)}),
bench5 AS (SELECT DISTINCT shingle FROM sh5 WHERE id % 10 = 7),
cont AS (SELECT id AS doc_id,
                sum(CASE WHEN shingle IN (SELECT shingle FROM bench5)
                    THEN 1 ELSE 0 END) >= {DECONTAM_MIN_HITS} AS contaminated
         FROM sh5 WHERE NOT (id % 10 = 7) GROUP BY id),
spl AS (SELECT doc_id,
               CASE WHEN CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 6)
                         AS INTEGER) % 1000000 < 200000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents)
SELECT d.doc_id, g.gopher_keep,
       (c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id) AS dup_drop,
       coalesce(cont.contaminated, FALSE) AS contaminated,
       (d.doc_id % 10 = 7) AS is_bench,
       (g.gopher_keep
        AND NOT (c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id)
        AND NOT coalesce(cont.contaminated, FALSE)
        AND NOT (d.doc_id % 10 = 7)) AS admitted,
       spl.split
FROM documents d
JOIN g ON g.doc_id = d.doc_id
LEFT JOIN comp c ON c.id = d.doc_id
LEFT JOIN cont ON cont.doc_id = d.doc_id
JOIN spl ON spl.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_pipeline_admission_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admission manifest with the SINGLE-ROUND dup election: a doc
    is dup-dropped iff it has a VERIFIED (J >= 0.5) pair with a smaller
    doc_id — one groupBy over the pair list, no connected-components
    closure (no iteration, no recursion). The trade vs
    ``pipeline_admission``: pure chain-merges (a~b, b~c, never a~c)
    keep c here but drop it under CC — exactly the cases
    dedup_cluster_cohesion flags as questionable CC drops, so at 100-TB
    admission scale this is both the cheaper AND the more conservative
    wave shape. Schema-identical to pipeline_admission for direct
    diffing."""
    docs = _t(spark, sf_dir, "documents")
    gq = gopher_quality(docs).select("doc_id", "gopher_keep")
    sh = word_shingles(docs, "doc_id", "text", 3)
    rm = (
        minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("master"))
        .select(F.col("id_b").alias("doc_id"), "master")
    )
    bench = docs.filter(F.expr(_BENCH_PRED))
    corpus = docs.filter(~F.expr(_BENCH_PRED))
    cont = (
        decontaminate(
            corpus, bench, "doc_id", "text",
            n=DECONTAM_N, min_hits=DECONTAM_MIN_HITS,
        )
        .select(F.col("id").alias("doc_id"), "contaminated")
    )
    spl = train_test_split(docs.select("doc_id"), "doc_id", 0.2)
    dup_drop = F.col("master").isNotNull()
    contaminated = F.coalesce(F.col("contaminated"), F.lit(False))
    is_bench = F.expr(_BENCH_PRED)
    return (
        docs.select("doc_id")
        .join(gq, "doc_id")
        .join(rm, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(spl, "doc_id")
        .select(
            "doc_id",
            "gopher_keep",
            dup_drop.alias("dup_drop"),
            contaminated.alias("contaminated"),
            is_bench.alias("is_bench"),
            (
                F.col("gopher_keep")
                & ~dup_drop
                & ~contaminated
                & ~is_bench
            ).alias("admitted"),
            "split",
        )
        .orderBy("doc_id")
    )


def _sql_pipeline_admission_onepass() -> str:
    return f"""
WITH {_SQL_MINHASH_VERIFIED_PAIRS_CTES},
rm AS (SELECT id_b AS doc_id, min(id_a) AS master FROM pairs GROUP BY id_b),
g AS (SELECT doc_id, gopher_keep FROM ({SQL_WEBFILTER_GOPHER}) s),
sh5 AS ({_duck_grams(DECONTAM_N)}),
bench5 AS (SELECT DISTINCT shingle FROM sh5 WHERE id % 10 = 7),
cont AS (SELECT id AS doc_id,
                sum(CASE WHEN shingle IN (SELECT shingle FROM bench5)
                    THEN 1 ELSE 0 END) >= {DECONTAM_MIN_HITS} AS contaminated
         FROM sh5 WHERE NOT (id % 10 = 7) GROUP BY id),
spl AS (SELECT doc_id,
               CASE WHEN CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 6)
                         AS INTEGER) % 1000000 < 200000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents)
SELECT d.doc_id, g.gopher_keep,
       (rm.master IS NOT NULL) AS dup_drop,
       coalesce(cont.contaminated, FALSE) AS contaminated,
       (d.doc_id % 10 = 7) AS is_bench,
       (g.gopher_keep
        AND NOT (rm.master IS NOT NULL)
        AND NOT coalesce(cont.contaminated, FALSE)
        AND NOT (d.doc_id % 10 = 7)) AS admitted,
       spl.split
FROM documents d
JOIN g ON g.doc_id = d.doc_id
LEFT JOIN rm ON rm.doc_id = d.doc_id
LEFT JOIN cont ON cont.doc_id = d.doc_id
JOIN spl ON spl.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit — the eval-hygiene check every LLM data
    pipeline needs: near-duplicate pairs (the MinHash-LSH verified
    plane, J >= 0.5) bucketed by which splits the two sides landed in.
    A nonzero (test, train) row is leakage: a test document has a
    near-copy in train, so eval measures memorization. The pair's split
    key is order-normalized (least/greatest) so (train,test) and
    (test,train) collapse.

    Scale: composes two already-bounded operators — banded LSH pairs
    (candidate volume prices the join, not corpus size) and the
    md5-keyed split (map-only) — plus two node-sized hash joins."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = minhash_lsh_pairs(sh, k=8, r=2, min_jaccard=0.5)
    spl = train_test_split(docs, "doc_id", 0.2).select("doc_id", "split")
    j = pairs.join(
        spl.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
        "id_a",
    ).join(
        spl.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
        "id_b",
    )
    return (
        j.select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("split_lo", "split_hi")
    )


def _sql_pipeline_split_leakage() -> str:
    pair_ctes = _SQL_MINHASH_PAIR_CTES.split(",\nsym AS")[0]
    return f"""
WITH {pair_ctes},
lsh AS (SELECT id_a, id_b,
               round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
        WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5),
spl AS (SELECT doc_id,
               CASE WHEN CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 6)
                         AS INTEGER) % 1000000 < 200000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents)
SELECT least(a.split, b.split) AS split_lo,
       greatest(a.split, b.split) AS split_hi,
       count(*) AS n_pairs, round(avg(jaccard), 6) AS avg_jaccard
FROM lsh JOIN spl a ON a.doc_id = lsh.id_a
         JOIN spl b ON b.doc_id = lsh.id_b
GROUP BY 1, 2 ORDER BY split_lo, split_hi
"""
