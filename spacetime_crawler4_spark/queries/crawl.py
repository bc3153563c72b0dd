"""Crawl-plane queries: engine-truth state audits, link graph, reports.

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

from ._shared import ANCHOR_SPAM_MIN_INLINKS, CDX_N_FILES, COCITE_MAX_OUT, COCITE_MIN_COMMON, PR_DAMPING, SOFT404_LEXICON, SOFT404_MIN_SHARE, TRAP_MIN_URLS, TRUST_ITERS, _ANCHOR_BM25_TERMS, _BENCH_PRED, _DUCK_ANCHOR_TOKS, _DUCK_TOKS, _TRACK_PARAM_RE, _TRACK_REPAIR_RE, _TRAP_DIGIT_RE, _TRAP_QVAL_RE, _TRAP_SCHEME_RE, _sql_bucket, _stopwords, _t  # noqa: F401
from .graph import OPIC_ITERS, SALSA_ITERS, _pagerank_sql_from_edges  # noqa: F401
from .pipeline import DECONTAM_MIN_HITS, DECONTAM_N  # noqa: F401



# --------------------------------------------------------------------------
# report plane (reference report/report.py:21-98 — SURVEY.md §2.4-2.6)
# --------------------------------------------------------------------------


def q_report_top50_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+W1: global word counts, top-50 by freq desc then word asc
    (reference helpers/common_words.py:4-29, report.py:76-78)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(sql_tokens(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 3)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(50)
    )


SQL_REPORT_TOP50 = f"""
WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
SELECT word, count(*) AS cnt FROM toks WHERE length(word) >= 3
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50
"""


def q_report_longest_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: argmax document by token total (reference report.py:48-54)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.size(sql_tokens(F.col("text"))).alias("n_words"))
        .orderBy(F.desc("n_words"), F.asc("doc_id"))
        .limit(1)
    )


SQL_REPORT_LONGEST = f"""
SELECT doc_id, CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_words
FROM documents ORDER BY n_words DESC, doc_id ASC LIMIT 1
"""


def q_report_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-source counts, name-sorted (reference report.py:35-41,83-85)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source")
    )


SQL_REPORT_PER_SOURCE = """
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_report_lang_tallies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: tallies per class (reference finish-code histogram analogue)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


SQL_REPORT_LANG = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


def q_report_corpus_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: unique-page counts (reference report.py:26,70)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("n_unique_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


SQL_REPORT_TOTALS = """
SELECT count(*) AS n_rows, count(DISTINCT doc_id) AS n_unique_docs,
       count(DISTINCT source) AS n_sources FROM documents
"""


def q_report_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth histogram (reference scripts/depthcnt.sh: per-value counts of
    the frontier's depth counters; crawl/report.py:depth_histogram is the
    real-frontier form, parity-tested vs the sequential oracle). Here the
    same machinery runs over a deterministic URL tree derived from
    documents: each doc's synthetic URL nests (n_chars % 6) directory
    segments (its leading tokens) under its source host, and absdepth is
    computed the way the crawl depth sift sees it — parse_url PATH +
    slash count — not read off the modulus."""
    docs = _t(spark, sf_dir, "documents")
    nseg = (F.col("n_chars") % 6).cast("int")
    segs = F.slice(F.split(F.col("text"), r"\s+"), F.lit(1), nseg)
    url = F.concat(
        F.lit("http://"), F.col("source"), F.lit("/"), F.concat_ws("/", segs)
    )
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    absdepth = (
        F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    ).cast("int")
    return (
        docs.select(absdepth.alias("absdepth"))
        .groupBy("absdepth")
        .agg(F.count("*").alias("n_urls"))
        .orderBy("absdepth")
    )


SQL_REPORT_DEPTH_HISTOGRAM = r"""
WITH u AS (
  -- duckdb: array_to_string([], sep) is NULL, not '' -> coalesce
  SELECT '/' || coalesce(array_to_string(
           list_slice(regexp_split_to_array(text, '\s+'), 1, n_chars % 6), '/'
         ), '') AS path
  FROM documents
)
SELECT CAST(length(path) - length(replace(path, '/', '')) AS INTEGER) AS absdepth,
       count(*) AS n_urls
FROM u GROUP BY 1 ORDER BY absdepth
"""


# --------------------------------------------------------------------------
# crawl text plane on documents (reference-parity tokenizer — the flagship)
# --------------------------------------------------------------------------


def q_crawl_top50_parity_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: reference-parity tokenizer (helpers/tokenize.py:35-137)
    over documents -> valid-word filter (report/report.py:15-19) -> global
    top-50. The oracle reproduces it in SQL because these documents are
    plain lowercase words: whitespace split + the vendored 174-word stopword
    drop is then exactly the reference policy."""
    from spacetime_crawler4_spark.operators.textplane import token_features_udf

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(token_features_udf(F.col("text")).tokens).alias("word"))
        .filter((F.length("word") >= 3) & F.col("word").rlike("[a-z]"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(50)
    )


def _sql_crawl_top50() -> str:
    stop = ", ".join("'" + w.replace("'", "''") + "'" for w in _stopwords())
    return f"""
WITH raw AS (SELECT unnest([t for t in regexp_split_to_array(lower(text), '\\s+')
                            if t <> '']) AS word FROM documents)
SELECT word, count(*) AS cnt FROM raw
WHERE word NOT IN ({stop}) AND length(word) >= 3 AND regexp_matches(word, '[a-z]')
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50
"""

# crawl-state queries (VERDICT r3 #7): REAL crawl-engine output, driver-
# checkable. tools/gen_crawl_state.py runs the deterministic fixture crawl
# (seed=42) to quiescence and commits the final frontier's scalar columns;
# these queries + their DuckDB oracles read that committed parquet, so the
# driver's correctness harness covers the robots gate, depth sift, status/
# redirect/length filters, dedup verdicts and politeness domains (F7-F11/
# J1/J3 outputs) directly. tests/test_crawl_state_queries.py re-crawls and
# asserts the committed file still matches the engine byte-for-value.
#
# __file__-relative on a normal install; under a spark-submit --py-files
# ZIP import the package path is inside the archive where spark.read
# cannot list files, so deployments ship the fixture alongside the job
# and point this env var at it.
_CRAWL_STATE_PARQUET = _os.environ.get(
    "SPARK_GRAFT_CRAWL_STATE",
    _os.path.join(
        # package root (one level up from queries/) holds resources/
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "resources",
        "crawl_state",
        "frontier.parquet",
    ),
)


def _crawl_state(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(_CRAWL_STATE_PARQUET)


def q_crawl_state_finish_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (status, finish) tallies of the fixture crawl's final frontier —
    the reference's launchman status dump (scripts/dump semantics) over
    engine truth: every gate outcome (OK/LOWINFO/TOO_EXACT/TOO_SIMILAR/
    NOT_ALLOWED/REDIRECT/SIFTED/CACHE_ERROR) lands in exactly one bucket."""
    fr = _crawl_state(spark)
    total = fr.count()
    return (
        fr.groupBy("status", "finish")
        .agg(F.count("*").alias("n"))
        .select(
            "status",
            "finish",
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
        )
        .orderBy("status", "finish")
    )


SQL_CRAWL_STATE_FINISH = f"""
WITH fr AS (SELECT * FROM '{_CRAWL_STATE_PARQUET}')
SELECT status, finish, count(*) AS n,
       round(count(*) * 1.0 / (SELECT count(*) FROM fr), 6) AS share
FROM fr GROUP BY status, finish ORDER BY status, finish
"""


def q_crawl_state_domain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain audit of the final frontier: URL count, downloads
    (politeness budget consumers), OK pages, dedup rejects, deepest
    absolute depth, token mass. The reference's per-domain politeness
    ledger (polmut.py) has exactly this shape."""
    fr = _crawl_state(spark)
    return (
        fr.groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((F.col("status") == 2).cast("long")).alias("n_downloaded"),
            F.sum(
                ((F.col("status") == 2) & (F.col("finish") == 0)).cast("long")
            ).alias("n_ok"),
            F.sum(F.col("finish").isin(4, 5).cast("long")).alias("n_dup_reject"),
            F.max("absdepth").alias("max_absdepth"),
            F.sum(F.col("n_words").cast("long")).alias("distinct_word_mass"),
        )
        .orderBy("domain")
    )


SQL_CRAWL_STATE_DOMAIN = f"""
SELECT domain, count(*) AS n_urls,
       CAST(sum(CASE WHEN status = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_downloaded,
       CAST(sum(CASE WHEN status = 2 AND finish = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(sum(CASE WHEN finish IN (4, 5) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_reject,
       max(absdepth) AS max_absdepth,
       CAST(sum(n_words) AS BIGINT) AS distinct_word_mass
FROM '{_CRAWL_STATE_PARQUET}' GROUP BY domain ORDER BY domain
"""


def q_crawl_state_depth_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-sift audit over engine truth: per absolute depth, how many
    URLs entered the frontier, how many were sifted un-downloaded
    (finish=8 = the F7 gate), and the depth-counter maxima the sift
    actually compares against (reldepth/monodepth/dupdepth recurrences,
    reference nurl.py:52-86)."""
    fr = _crawl_state(spark)
    return (
        fr.groupBy("absdepth")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((F.col("finish") == 8).cast("long")).alias("n_sifted"),
            F.max("reldepth").alias("max_reldepth"),
            F.max("monodepth").alias("max_monodepth"),
            F.max("dupdepth").alias("max_dupdepth"),
        )
        .orderBy("absdepth")
    )


SQL_CRAWL_STATE_DEPTH = f"""
SELECT absdepth, count(*) AS n_urls,
       CAST(sum(CASE WHEN finish = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_sifted,
       max(reldepth) AS max_reldepth,
       max(monodepth) AS max_monodepth,
       max(dupdepth) AS max_dupdepth
FROM '{_CRAWL_STATE_PARQUET}' GROUP BY absdepth ORDER BY absdepth
"""


# --------------------------------------------------------------------------
# anchor-text link graph (operators/linkgraph.py) over engine truth: the
# committed links.parquet holds anchor_edges() output for the fixture
# crawl's OK pages (tools/gen_crawl_state.py links_table; drift-gated by
# tests/test_linkgraph.py). The reference discards anchor text
# (scraper.py:10-36) — this is the web-scale anchor-index extension.
# --------------------------------------------------------------------------

_CRAWL_LINKS_PARQUET = _os.environ.get(
    "SPARK_GRAFT_CRAWL_LINKS",
    _os.path.join(_os.path.dirname(_CRAWL_STATE_PARQUET), "links.parquet"),
)


def _crawl_links(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(_CRAWL_LINKS_PARQUET)


def q_crawl_links_top_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor index head: per target URL the in-degree, distinct referring
    pages/hosts, and modal anchor text (count desc, text asc election) —
    operators/linkgraph.anchor_summary over the fixture crawl's edges."""
    from spacetime_crawler4_spark.operators.linkgraph import anchor_summary

    return (
        anchor_summary(_crawl_links(spark))
        .orderBy(F.desc("in_degree"), F.asc("dst_url"))
        .limit(25)
    )


SQL_CRAWL_LINKS_TOP = f"""
WITH e AS (SELECT * FROM '{_CRAWL_LINKS_PARQUET}'),
per_text AS (
  SELECT dst_url, anchor_text, count(*) AS n_text FROM e GROUP BY 1, 2
),
top AS (
  SELECT dst_url, anchor_text AS top_anchor FROM (
    SELECT dst_url, anchor_text,
           row_number() OVER (PARTITION BY dst_url
                              ORDER BY n_text DESC, anchor_text ASC) AS rn
    FROM per_text) WHERE rn = 1
),
base AS (
  SELECT dst_url, count(*) AS in_degree,
         count(DISTINCT src_url) AS n_src_pages,
         count(DISTINCT src_domain) AS n_src_hosts
  FROM e GROUP BY 1
)
SELECT base.dst_url, in_degree, n_src_pages, n_src_hosts, top_anchor
FROM base JOIN top USING (dst_url)
ORDER BY in_degree DESC, base.dst_url ASC LIMIT 25
"""


def q_crawl_links_domain_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph (the PageRank/HITS input shape): per
    (src_domain, dst_domain) edge count and distinct target pages."""
    from spacetime_crawler4_spark.operators.linkgraph import domain_graph

    return domain_graph(_crawl_links(spark)).orderBy("src_domain", "dst_domain")


SQL_CRAWL_LINKS_DOMAINS = f"""
SELECT src_domain, dst_domain, count(*) AS n_edges,
       count(DISTINCT dst_url) AS n_targets
FROM '{_CRAWL_LINKS_PARQUET}'
GROUP BY src_domain, dst_domain ORDER BY src_domain, dst_domain
"""


def q_crawl_links_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-term ranking signal: top (target, term) cells of the anchor
    index by mention count — operators/linkgraph.anchor_term_index with the
    engine-wide sql_tokens tokenizer."""
    from spacetime_crawler4_spark.operators.linkgraph import anchor_term_index

    return (
        anchor_term_index(_crawl_links(spark))
        .orderBy(F.desc("n_mentions"), F.asc("dst_url"), F.asc("term"))
        .limit(30)
    )

SQL_CRAWL_LINKS_TERMS = f"""
WITH t AS (
  SELECT dst_url, src_domain, unnest({_DUCK_ANCHOR_TOKS}) AS term
  FROM '{_CRAWL_LINKS_PARQUET}'
)
SELECT dst_url, term, count(*) AS n_mentions,
       count(DISTINCT src_domain) AS n_hosts
FROM t GROUP BY dst_url, term
ORDER BY n_mentions DESC, dst_url ASC, term ASC LIMIT 30
"""


def q_crawl_links_anchor_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-field BM25: rank link-graph targets for a query bag scored
    over their incoming anchor text — the web-search signal that made
    anchor indexing famous (a target is described by the text OTHERS link
    it with). The field document per target is the union of its anchors:
    operators/ranking.bm25_scores with id_col=dst_url over the edge rows
    merges tf/dl per target in its existing aggregations — no concat, no
    second operator."""
    from spacetime_crawler4_spark.operators.ranking import bm25_scores

    return (
        bm25_scores(
            _crawl_links(spark),
            _ANCHOR_BM25_TERMS,
            id_col="dst_url",
            text_col="anchor_text",
        )
        .select("dst_url", F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("dst_url"))
        .limit(15)
    )


SQL_CRAWL_LINKS_BM25 = f"""
WITH toks AS (SELECT dst_url, unnest({_DUCK_ANCHOR_TOKS}) AS term
              FROM '{_CRAWL_LINKS_PARQUET}'),
dl AS (SELECT dst_url, count(*) AS dl FROM toks GROUP BY dst_url),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT dst_url, term, count(*) AS tf FROM toks
       WHERE term IN ('item', 'hub', 'section') GROUP BY dst_url, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT dst_url,
       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))), 6) AS bm25
FROM tf JOIN dl USING (dst_url) JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY dst_url ORDER BY bm25 DESC, dst_url LIMIT 15
"""


def q_decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= 2 distinct
    word-5-grams with the held-out eval split (doc_id % 10 == 7 — the
    deterministic benchmark stand-in). The benchmark gram dictionary is
    broadcast; the corpus probe is map-side, one shuffle total (the
    per-doc aggregate)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.expr(_BENCH_PRED))
    corpus = docs.filter(~F.expr(_BENCH_PRED))
    return (
        decontaminate(
            corpus, bench, "doc_id", "text",
            n=DECONTAM_N, min_hits=DECONTAM_MIN_HITS,
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


CRAWL_HOST_RANK_ITERS = 3


def q_crawl_state_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-authority PageRank over the committed crawl state — the
    frontier-prioritization signal the north star orders mega-crawls by
    (rank hosts, crawl authoritative hosts first). Edges are the
    cross-host discovery graph: child rows joined to their parent row by
    urlhash, projected to (parent_domain -> child_domain), deduped,
    self-host edges dropped. 3 power iterations of the same checkpointed
    pagerank operator; the oracle unrolls the identical recurrence over
    the identical parquet."""
    fr = _crawl_state(spark)
    child = fr.select("parent", F.col("domain").alias("dst"))
    parent = fr.select(F.col("urlhash").alias("parent"), F.col("domain").alias("src"))
    edges = (
        child.join(parent, "parent")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    ranks = pagerank(edges, iterations=CRAWL_HOST_RANK_ITERS, damping=PR_DAMPING)
    return ranks.select(
        F.col("id").alias("host"), F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), "host")


def _sql_crawl_host_rank() -> str:
    base = _pagerank_sql_from_edges(
        f"""fr AS (SELECT * FROM '{_CRAWL_STATE_PARQUET}'),
e AS (SELECT DISTINCT p.domain AS src, c.domain AS dst
      FROM fr c JOIN fr p ON c.parent = p.urlhash
      WHERE p.domain <> c.domain)""",
        iters=CRAWL_HOST_RANK_ITERS,
    )
    return base.replace(
        "SELECT id, round(r, 6) AS rank FROM r"
        f"{CRAWL_HOST_RANK_ITERS} ORDER BY id",
        f"SELECT id AS host, round(r, 6) AS rank FROM r{CRAWL_HOST_RANK_ITERS} "
        "ORDER BY rank DESC, host",
    )


def q_crawl_trap_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap template mining over engine truth (the fixture crawl's
    final frontier): URLs collapse to templates (digits->N, query
    values->V) and each template aggregates the gate outcomes that mark a
    trap — SIFTED depth rejects (the reference's F7 calendar/ladder trap
    gate, workerpipe.py:33-57) and dup/near-dup rejects. A template with
    many URLs and a high reject share is a trap family a production
    frontier would throttle *before* fetching (the reference can only
    reject post-hoc, one URL at a time).

    Scale: template extraction is two JVM regexp_replace ops (map-only,
    whole-stage codegen); one partial-aggregated groupBy on the template
    key. At a 10^10-URL frontier this is the standard pre-aggregation
    shape — no skew beyond the trap families themselves, which is exactly
    the signal being measured."""
    fr = _crawl_state(spark)
    tmpl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("url"), _TRAP_SCHEME_RE, ""),
            _TRAP_QVAL_RE,
            "$1=V",
        ),
        _TRAP_DIGIT_RE,
        "N",
    )
    agg = (
        fr.select(
            tmpl.alias("template"),
            "domain",
            "finish",
            "dupdepth",
        )
        .groupBy("template")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("domain").alias("n_hosts"),
            F.sum((F.col("finish") == 8).cast("long")).alias("n_sifted"),
            F.sum(F.col("finish").isin(4, 5).cast("long")).alias("n_dup_reject"),
            F.max("dupdepth").alias("max_dupdepth"),
        )
    )
    return (
        agg.filter(F.col("n_urls") >= TRAP_MIN_URLS)
        .select(
            "template",
            "n_urls",
            "n_hosts",
            "n_sifted",
            "n_dup_reject",
            "max_dupdepth",
            F.round(
                (F.col("n_sifted") + F.col("n_dup_reject")) / F.col("n_urls"), 6
            ).alias("trap_score"),
        )
        .orderBy(F.desc("n_urls"), F.desc("trap_score"), "template")
    )


SQL_CRAWL_TRAP_TEMPLATES = f"""
WITH t AS (
  SELECT regexp_replace(
           regexp_replace(
             regexp_replace(url, '{_TRAP_SCHEME_RE}', '', 'g'),
             '{_TRAP_QVAL_RE}', '\\1=V', 'g'),
           '{_TRAP_DIGIT_RE}', 'N', 'g') AS template,
         domain, finish, dupdepth
  FROM '{_CRAWL_STATE_PARQUET}')
SELECT template, count(*) AS n_urls,
       count(DISTINCT domain) AS n_hosts,
       CAST(sum(CASE WHEN finish = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_sifted,
       CAST(sum(CASE WHEN finish IN (4, 5) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_reject,
       max(dupdepth) AS max_dupdepth,
       round((sum(CASE WHEN finish = 8 THEN 1 ELSE 0 END)
              + sum(CASE WHEN finish IN (4, 5) THEN 1 ELSE 0 END)) * 1.0
             / count(*), 6) AS trap_score
FROM t GROUP BY template HAVING count(*) >= {TRAP_MIN_URLS}
ORDER BY n_urls DESC, trap_score DESC, template
"""


RECRAWL_HORIZON_DAYS = 7.0
RECRAWL_TOP_K = 100


def q_crawl_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling head: per-url Poisson change rate (Cho &
    Garcia-Molina 2003 estimator over a deterministic synthetic fetch
    log) and the staleness probability at a 7-day horizon — the refetch
    priority a revisiting frontier pops by. The reference fetches each
    URL exactly once; this is the web-scale revisit extension
    (operators/freshness.py). One groupBy on the url key; the oracle
    re-synthesizes the identical md5-derived log and re-runs the
    estimator in SQL."""
    from spacetime_crawler4_spark.operators.freshness import (
        change_rate,
        synthetic_fetch_log,
    )

    docs = _t(spark, sf_dir, "documents")
    pr = change_rate(
        synthetic_fetch_log(docs), horizon_days=RECRAWL_HORIZON_DAYS
    )
    return (
        pr.withColumnRenamed("id", "doc_id")
        .orderBy(F.desc("p_stale"), "doc_id")
        .limit(RECRAWL_TOP_K)
    )


SQL_CRAWL_RECRAWL_PRIORITY = f"""
WITH base AS (
  SELECT doc_id,
         3 + {_sql_bucket("fr:n", "CAST(doc_id AS VARCHAR)")} % 5 AS n_draw,
         1 + {_sql_bucket("fr:tau", "CAST(doc_id AS VARCHAR)")} % 7 AS tau_days,
         5 + {_sql_bucket("fr:p", "CAST(doc_id AS VARCHAR)")} % 90 AS p_pct
  FROM documents),
log AS (
  SELECT doc_id, tau_days, p_pct,
         unnest(generate_series(1, n_draw)) AS obs_idx
  FROM base),
flags AS (
  SELECT doc_id, tau_days,
         CASE WHEN {_sql_bucket(
             "fr:chg",
             "CAST(doc_id AS VARCHAR) || ':' || CAST(obs_idx AS VARCHAR)",
         )} % 100 < p_pct
              THEN 1 ELSE 0 END AS changed
  FROM log),
agg AS (
  SELECT doc_id, tau_days, count(*) AS n_obs,
         CAST(sum(changed) AS BIGINT) AS n_changed
  FROM flags GROUP BY doc_id, tau_days),
est AS (
  SELECT doc_id, tau_days, n_obs, n_changed,
         -ln((CAST(n_obs - n_changed AS DOUBLE) + 0.5)
             / (CAST(n_obs AS DOUBLE) + 0.5)) / tau_days AS lam
  FROM agg)
SELECT doc_id, tau_days, n_obs, n_changed,
       round(lam, 6) AS lambda_day,
       round(1.0 - exp(-lam * {RECRAWL_HORIZON_DAYS!r}), 6) AS p_stale
FROM est ORDER BY p_stale DESC, doc_id LIMIT {RECRAWL_TOP_K}
"""


# --------------------------------------------------------------------------
# round-4 session-7: content-plane crawl-ops mining over engine truth
# (mirror hosts, tracking-param URL aliases, soft-404 boilerplate)
# --------------------------------------------------------------------------

_CRAWL_WORDSTATS_PARQUET = _os.environ.get(
    "SPARK_GRAFT_CRAWL_WORDSTATS",
    _os.path.join(_os.path.dirname(_CRAWL_STATE_PARQUET), "wordstats.parquet"),
)


def q_crawl_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection over engine truth: host pairs serving byte-
    identical content (shared exhash across distinct domains). The fixture
    plants mirror.example-b.test serving copies of www.example-b.test's
    /b{i} pages; the engine's cross-wave exact-dedup (J4, reference
    workerpipe.py:198-218) records the shared checksum, and this query
    surfaces the host-level aggregate a production crawl uses to demote a
    whole mirror before fetching it page-by-page.

    Scale: groupBy (exhash, domain) pre-aggregates to at most one row per
    (content, host) — the self-join then runs on that reduced frame, and
    dup-cluster sizes bound the pair fan-out. At 10^10 URLs this is the
    standard two-level aggregation; no all-pairs anywhere."""
    fr = _crawl_state(spark).filter(F.col("exhash").isNotNull())
    per = fr.groupBy("exhash", "domain").agg(F.count("*").alias("n"))
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(
        b,
        (F.col("a.exhash") == F.col("b.exhash"))
        & (F.col("a.domain") < F.col("b.domain")),
    )
    return (
        pairs.groupBy(
            F.col("a.domain").alias("host_a"), F.col("b.domain").alias("host_b")
        )
        .agg(
            F.countDistinct("a.exhash").alias("n_shared_content"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("n_url_pairs"),
        )
        .orderBy(F.desc("n_shared_content"), "host_a", "host_b")
    )


SQL_CRAWL_MIRROR_HOSTS = f"""
WITH per AS (
  SELECT exhash, domain, count(*) AS n
  FROM '{_CRAWL_STATE_PARQUET}' WHERE exhash IS NOT NULL
  GROUP BY exhash, domain)
SELECT a.domain AS host_a, b.domain AS host_b,
       count(DISTINCT a.exhash) AS n_shared_content,
       CAST(sum(a.n * b.n) AS BIGINT) AS n_url_pairs
FROM per a JOIN per b ON a.exhash = b.exhash AND a.domain < b.domain
GROUP BY 1, 2 ORDER BY n_shared_content DESC, host_a, host_b
"""


def q_crawl_url_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracking-param URL alias mining over engine truth: frontier URLs
    that collapse to the same canonical form once marketing parameters
    (utm_*, fbclid, gclid, ...) are stripped. The reference's urlhash
    includes the query string (utils/__init__.py:25-30), so every alias is
    fetched and then caught post-hoc by exact dedup; a production frontier
    canonicalizes pre-fetch. n_distinct_content == 1 confirms the aliases
    really served identical bytes (exact-dup exhash).

    Scale: two JVM regexp_replace ops (map-only, codegen) + one groupBy on
    the canonical key — the same pre-aggregation shape as trap mining."""
    fr = _crawl_state(spark)
    canon = F.regexp_replace(
        F.regexp_replace(F.col("url"), _TRACK_PARAM_RE, ""),
        _TRACK_REPAIR_RE,
        "$1?",
    )
    return (
        fr.select(
            canon.alias("canonical_url"),
            "url",
            "exhash",
            (F.col("finish") == 4).cast("long").alias("is_exact_dup"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("exhash").alias("n_distinct_content"),
            F.sum("is_exact_dup").alias("n_dup_rejected"),
        )
        .filter(F.col("n_urls") >= 2)
        .orderBy(F.desc("n_urls"), "canonical_url")
    )


SQL_CRAWL_URL_ALIASES = f"""
WITH c AS (
  SELECT regexp_replace(
           regexp_replace(url, '{_TRACK_PARAM_RE}', '', 'g'),
           '{_TRACK_REPAIR_RE}', '\\1?') AS canonical_url,
         url, exhash, CASE WHEN finish = 4 THEN 1 ELSE 0 END AS is_exact_dup
  FROM '{_CRAWL_STATE_PARQUET}')
SELECT canonical_url, count(*) AS n_urls,
       count(DISTINCT exhash) AS n_distinct_content,
       CAST(sum(is_exact_dup) AS BIGINT) AS n_dup_rejected
FROM c GROUP BY canonical_url HAVING count(*) >= 2
ORDER BY n_urls DESC, canonical_url
"""


def q_crawl_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection over engine truth: HTTP-200 pages whose word bag
    is dominated by error-template boilerplate. The committed wordstats
    table (tools/gen_crawl_state.py) is the fixture crawl's per-page word
    bags; the fixture plants five /gone/item-* pages sharing a "page not
    found" template (the engine already near-dup-rejects four of them —
    reference workerpipe.py:257-277 — but the master survives, which is
    exactly why production pipelines need the content-level detector) and
    one legitimate /gone/legit control the detector must not flag.

    Scale: map-side lexicon predicate + one groupBy on url; the lexicon is
    a literal IN-list (JVM codegen), no UDF, no join."""
    ws = spark.read.parquet(_CRAWL_WORDSTATS_PARQUET)
    err = F.when(F.col("word").isin(*SOFT404_LEXICON), F.col("cnt")).otherwise(
        F.lit(0)
    )
    return (
        ws.groupBy("url", "finish")
        .agg(
            F.sum("cnt").alias("n_words_total"),
            F.sum(err).alias("n_err_words"),
        )
        .withColumn(
            "err_share",
            F.round(F.col("n_err_words") / F.col("n_words_total"), 6),
        )
        .filter(F.col("err_share") >= SOFT404_MIN_SHARE)
        .orderBy(F.desc("err_share"), "url")
    )


def _sql_soft404() -> str:
    lex = ", ".join(f"'{w}'" for w in SOFT404_LEXICON)
    return f"""
SELECT url, finish, CAST(sum(cnt) AS BIGINT) AS n_words_total,
       CAST(sum(CASE WHEN word IN ({lex}) THEN cnt ELSE 0 END) AS BIGINT)
         AS n_err_words,
       round(sum(CASE WHEN word IN ({lex}) THEN cnt ELSE 0 END) * 1.0
             / sum(cnt), 6) AS err_share
FROM '{_CRAWL_WORDSTATS_PARQUET}'
GROUP BY url, finish
HAVING round(sum(CASE WHEN word IN ({lex}) THEN cnt ELSE 0 END) * 1.0
             / sum(cnt), 6) >= {SOFT404_MIN_SHARE}
ORDER BY err_share DESC, url
"""


# --------------------------------------------------------------------------
# round-4 session-8: cross-document line dedup over engine-truth page text
# (CCNet §3.1 / FineWeb line filtering — the boilerplate-removal pass a
# production webtext pipeline runs between extraction and quality filters)
# --------------------------------------------------------------------------

_CRAWL_PAGETEXT_PARQUET = _os.environ.get(
    "SPARK_GRAFT_CRAWL_PAGETEXT",
    _os.path.join(_os.path.dirname(_CRAWL_STATE_PARQUET), "pagetext.parquet"),
)


def _pagetext(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(_CRAWL_PAGETEXT_PARQUET)


def q_crawl_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining over the fixture crawl's admitted page text
    (committed via tools/gen_crawl_state.py, PRODUCTION extractor output —
    one line per visible-text fragment): every trimmed line occurring in
    >= 2 distinct pages, with document/occurrence counts and the global
    first occurrence. Surfaces exactly the nav/footer chrome ("hub",
    "next item", "home") CCNet-style line dedup exists to strip.

    Scale: operators/dedup.dup_line_stats — one explode + ONE hash
    aggregate on the line hash (min(struct) first-occurrence inside the
    same agg; no windows, so a universally duplicated line never lands in
    a single-reducer partition)."""
    from spacetime_crawler4_spark.operators.dedup import dup_line_stats

    return dup_line_stats(_pagetext(spark), "url", "text", min_docs=2).select(
        "line",
        "n_docs",
        "n_occ",
        F.col("first_id").alias("first_url"),
        F.col("first_pos").cast("long").alias("first_pos"),
    )


SQL_CRAWL_DUP_LINES = f"""
WITH occ AS (
  SELECT url, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS line
  FROM (SELECT url, string_split(text, chr(10)) AS arr
        FROM '{_CRAWL_PAGETEXT_PARQUET}')),
keyed AS (
  SELECT url, pos, line, md5(trim(line)) AS lkey
  FROM occ WHERE trim(line) <> ''),
st AS (
  SELECT lkey, min(trim(line)) AS line,
         count(DISTINCT url) AS n_docs, count(*) AS n_occ,
         min({{'id': url, 'pos': pos}}) AS first
  FROM keyed GROUP BY lkey)
SELECT line, n_docs, n_occ,
       struct_extract(first, 'id') AS first_url,
       CAST(struct_extract(first, 'pos') AS BIGINT) AS first_pos
FROM st WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occ DESC, line
"""


def q_crawl_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line dedup TRANSFORM over the same engine-truth page
    text: keep blank lines, unique lines, and the globally FIRST occurrence
    of every cross-page duplicated line; drop all later occurrences
    (including same-page repeats of a cross-page duplicate); re-join
    survivors in original order. Per-page audit row: line counts and the
    full cleaned text, so the oracle checks the reconstructed bytes, not
    just tallies.

    Scale: operators/dedup.line_dedup — explode, ONE aggregate on the line
    hash, a hash join whose build side is only the duplicated-line
    dictionary (boilerplate vocabulary, orders of magnitude smaller than
    the corpus), ONE per-doc re-aggregate. Linear end to end."""
    from spacetime_crawler4_spark.operators.dedup import line_dedup

    return (
        line_dedup(_pagetext(spark), "url", "text", min_docs=2)
        .select(
            F.col("id").alias("url"),
            "n_lines",
            "n_kept",
            "n_dropped",
            "cleaned",
        )
        .orderBy("url")
    )


def q_crawl_nav_chrome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-density content/chrome split per admitted page (the CETR-style
    boilerplate signal): lines whose trimmed text equals the trimmed
    visible text of an <a> on the same page are NAV CHROME; everything
    else is content. Joins the two committed engine-truth fixtures —
    pagetext (extractor lines) and links (anchor_edges output) — so the
    classification is over production extractor bytes, no re-parse.

    Scale: operators/linkgraph.nav_line_share — both join sides pre-reduce
    to one row per (page, key) before a keyed join; one final per-page
    aggregate. Linear, skew-free."""
    from spacetime_crawler4_spark.operators.linkgraph import nav_line_share

    return nav_line_share(
        _pagetext(spark), spark.read.parquet(_CRAWL_LINKS_PARQUET)
    ).orderBy("url")


SQL_CRAWL_NAV_CHROME = f"""
WITH occ AS (
  SELECT url, trim(line) AS key, count(*) AS n,
         CAST(sum(length(line)) AS BIGINT) AS chars
  FROM (SELECT url, unnest(string_split(text, chr(10))) AS line
        FROM '{_CRAWL_PAGETEXT_PARQUET}')
  WHERE trim(line) <> '' GROUP BY url, trim(line)),
nav AS (
  SELECT DISTINCT src_url AS url, trim(anchor_text) AS key, TRUE AS is_nav
  FROM '{_CRAWL_LINKS_PARQUET}' WHERE trim(anchor_text) <> '')
SELECT url, CAST(sum(n) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN is_nav THEN n ELSE 0 END) AS BIGINT) AS n_nav_lines,
       round(sum(CASE WHEN is_nav THEN chars ELSE 0 END) * 1.0 / sum(chars),
             6) AS nav_char_share,
       CAST(sum(CASE WHEN is_nav THEN 0 ELSE chars END) AS BIGINT)
         AS content_chars
FROM occ LEFT JOIN nav USING (url, key)
GROUP BY url ORDER BY url
"""


SQL_CRAWL_LINE_DEDUP = f"""
WITH occ AS (
  SELECT url, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS line
  FROM (SELECT url, string_split(text, chr(10)) AS arr
        FROM '{_CRAWL_PAGETEXT_PARQUET}')),
keyed AS (
  SELECT url, pos, line,
         CASE WHEN trim(line) <> '' THEN md5(trim(line)) END AS lkey
  FROM occ),
dupk AS (
  SELECT lkey, min({{'id': url, 'pos': pos}}) AS first
  FROM keyed WHERE lkey IS NOT NULL
  GROUP BY lkey HAVING count(DISTINCT url) >= 2),
fl AS (
  SELECT o.url, o.pos, o.line,
         (d.lkey IS NULL
          OR (struct_extract(d.first, 'id') = o.url
              AND struct_extract(d.first, 'pos') = o.pos)) AS keep
  FROM keyed o LEFT JOIN dupk d USING (lkey))
SELECT url, count(*) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
                           ORDER BY pos), '') AS cleaned
FROM fl GROUP BY url ORDER BY url
"""


def q_crawl_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (Gyongyi et al., VLDB 2004) + relative spam mass
    (Gyongyi et al., VLDB 2006) over the committed crawl link graph:
    the teleport vector is biased to the crawl's OWN depth-0 seed URLs
    — the operator-curated trusted set — so trust flows outward exactly
    along discovered links, while uniform-teleport PageRank runs on the
    same edges; spam_mass = (pr - trust)/pr flags pages whose rank is
    earned outside trusted paths (the link-farm signature a mega-crawl
    demotes in its frontier priority).

    Scale: operators/graph.trustrank — identical shape to pagerank (one
    edge shuffle/iteration, node-sized trust vector, 1-row dangling
    broadcast); the final spam-mass join is node-sized x node-sized."""
    from spacetime_crawler4_spark.operators.graph import spam_mass, trustrank

    lk = _crawl_links(spark)
    edges = lk.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    ).distinct()
    seeds = (
        _crawl_state(spark)
        .filter(F.col("absdepth") == 0)
        .select(F.col("url").alias("id"))
    )
    tr = trustrank(edges, seeds, iterations=TRUST_ITERS, damping=PR_DAMPING)
    pr = pagerank(edges, iterations=TRUST_ITERS, damping=PR_DAMPING)
    return (
        spam_mass(pr, tr)
        .select(
            F.col("id").alias("url"),
            F.round("trust", 6).alias("trust"),
            F.round("spam_mass", 6).alias("spam_mass"),
        )
        .orderBy(F.desc("trust"), "url")
    )


def _sql_crawl_trustrank() -> str:
    """Both recurrences (uniform-teleport r-chain mirroring
    operators/graph.pagerank, seed-teleport t-chain mirroring
    trustrank) unrolled as chained CTEs over the identical parquet.
    Constants are interpolated with ``repr`` so DuckDB parses the same
    IEEE doubles the Spark literals carry."""
    d = PR_DAMPING
    od = repr(1.0 - d)  # the exact double F.lit(1.0 - damping) evaluates to
    n = "(SELECT count(*) FROM nodes)"
    ctes = [
        f"""lk AS (SELECT * FROM '{_CRAWL_LINKS_PARQUET}'),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM lk),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
we AS (SELECT src, dst, 1.0 / od AS w FROM e JOIN outdeg USING (src)),
sd AS (SELECT DISTINCT n.id FROM nodes n
       JOIN (SELECT url FROM '{_CRAWL_STATE_PARQUET}' WHERE absdepth = 0) f
       ON n.id = f.url),
sv AS (SELECT id, CASE WHEN id IN (SELECT id FROM sd)
                       THEN CAST(1.0 AS DOUBLE) / (SELECT count(*) FROM sd)
                       ELSE CAST(0.0 AS DOUBLE) END AS s FROM nodes),
r0 AS (SELECT id, 1.0 / {n} AS r FROM nodes),
t0 AS (SELECT id, s AS r FROM sv)"""
    ]
    for i in range(1, TRUST_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""r{i} AS (
  SELECT nn.id,
         (1.0 - {d}) / {n}
         + {d} * (coalesce(cb.acc, 0.0)
                  + (SELECT coalesce(sum(r), 0.0) FROM r{p}
                     WHERE id NOT IN (SELECT src FROM outdeg)) / {n}) AS r
  FROM nodes nn LEFT JOIN
       (SELECT dst AS id, sum(w * r) AS acc
        FROM we JOIN r{p} ON r{p}.id = we.src GROUP BY dst) cb
  USING (id))"""
        )
        ctes.append(
            f"""t{i} AS (
  SELECT sv.id,
         {od} * sv.s
         + {d} * (coalesce(cb.acc, 0.0)
                  + (SELECT coalesce(sum(r), 0.0) FROM t{p}
                     WHERE id NOT IN (SELECT src FROM outdeg)) * sv.s) AS r
  FROM sv LEFT JOIN
       (SELECT dst AS id, sum(w * r) AS acc
        FROM we JOIN t{p} ON t{p}.id = we.src GROUP BY dst) cb
  USING (id))"""
        )
    k = TRUST_ITERS
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT t.id AS url, round(t.r, 6) AS trust,
       round((p.r - t.r) / p.r, 6) AS spam_mass
FROM t{k} t JOIN r{k} p ON p.id = t.id
ORDER BY trust DESC, url"""
    )


# --------------------------------------------------------------------------
# SURT canonical keys; anchor-concentration spam signal; co-citation pairs
# --------------------------------------------------------------------------


def q_crawl_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT canonical key per frontier URL — the Wayback/Common-Crawl
    CDX index key (host labels reversed+comma-joined, ``)``, path,
    sorted query params, lowercased, scheme dropped), so one
    lexicographic sort clusters each host with its subdomains and
    collapses param-order URL variants.

    Scale: functions/urls.surt_col is pure JVM built-ins (parse_url /
    split / reverse / array_sort) — a map-only projection inside
    whole-stage codegen; the sort is the output contract, not the op."""
    from spacetime_crawler4_spark.functions.urls import surt_col

    fr = _crawl_state(spark)
    return fr.select("url", surt_col(F.col("url")).alias("surt")).orderBy("url")


SQL_CRAWL_SURT_KEYS = f"""
WITH fr AS (SELECT url FROM '{_CRAWL_STATE_PARQUET}'),
p AS (SELECT url,
             regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      FROM fr),
q AS (SELECT url,
             lower(regexp_extract(rest, '^[^/?]*')) AS host,
             lower(regexp_extract(rest, '^[^/?]*([^?]*)', 1)) AS path,
             lower(regexp_extract(rest, '\\?(.*)$', 1)) AS qs
      FROM p)
SELECT url,
       array_to_string(list_reverse(string_split(host, '.')), ',')
       || ')' || path
       || CASE WHEN array_to_string(list_sort(string_split(qs, '&')), '&') = ''
               THEN ''
               ELSE '?' || array_to_string(list_sort(string_split(qs, '&')), '&')
          END AS surt
FROM q ORDER BY url
"""


def q_crawl_anchor_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text concentration per link target — the link-farm
    signature of many inlinks repeating the same anchor string (organic
    links vary their wording; planted links repeat the money phrase).
    Per dst with >= 2 inlinks: inlink count, distinct anchors, Shannon
    entropy of the anchor distribution, and the top anchor's share.

    Scale: operators/linkgraph.anchor_concentration — two keyed
    hash-aggregates (single-pass entropy via H = ln n - sum(c ln c)/n),
    no window, no self-join."""
    from spacetime_crawler4_spark.operators.linkgraph import anchor_concentration

    c = anchor_concentration(
        _crawl_links(spark), min_inlinks=ANCHOR_SPAM_MIN_INLINKS
    )
    return c.select(
        "dst_url",
        "n_inlinks",
        "n_anchors",
        F.round("anchor_entropy", 6).alias("anchor_entropy"),
        F.round("top_share", 6).alias("top_share"),
    ).orderBy(F.desc("n_inlinks"), "dst_url")


SQL_CRAWL_ANCHOR_SPAM = f"""
WITH g AS (SELECT dst_url, trim(anchor_text) AS a, count(*) AS c
           FROM '{_CRAWL_LINKS_PARQUET}' GROUP BY dst_url, trim(anchor_text)),
agg AS (SELECT dst_url,
               CAST(sum(c) AS BIGINT) AS n_inlinks,
               count(*) AS n_anchors,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 6)
                 AS anchor_entropy,
               round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share
        FROM g GROUP BY dst_url)
SELECT * FROM agg WHERE n_inlinks >= {ANCHOR_SPAM_MIN_INLINKS}
ORDER BY n_inlinks DESC, dst_url
"""


def q_crawl_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation related-page pairs (Small 1973): targets linked from
    the same source page are related, scored by shared-source count.

    Scale: operators/linkgraph.cocitation_pairs — the self-join is
    quadratic in the WORST source's out-degree, so hub/chrome sources
    above ``COCITE_MAX_OUT`` outlinks are dropped before the join (the
    df-cap discipline of the shingle dedup plane); then one equi-join
    on src + one pair-key aggregate."""
    from spacetime_crawler4_spark.operators.linkgraph import cocitation_pairs

    c = cocitation_pairs(
        _crawl_links(spark),
        max_out=COCITE_MAX_OUT,
        min_common=COCITE_MIN_COMMON,
    )
    return c.orderBy(F.desc("n_common"), "url_a", "url_b")


SQL_CRAWL_COCITATION = f"""
WITH e AS (SELECT DISTINCT src_url, dst_url FROM '{_CRAWL_LINKS_PARQUET}'),
deg AS (SELECT src_url FROM e GROUP BY src_url
        HAVING count(*) <= {COCITE_MAX_OUT}),
k AS (SELECT e.src_url, e.dst_url FROM e JOIN deg USING (src_url))
SELECT a.dst_url AS url_a, b.dst_url AS url_b, count(*) AS n_common
FROM k a JOIN k b ON a.src_url = b.src_url AND a.dst_url < b.dst_url
GROUP BY 1, 2 HAVING count(*) >= {COCITE_MIN_COMMON}
ORDER BY n_common DESC, url_a, url_b
"""


def q_crawl_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl-budget allocation — the capstone that closes the
    mining -> scheduling loop: host authority (the 3-iteration PageRank
    of crawl_state_host_rank over the cross-host discovery graph)
    discounted by the host's duplicate share and error share from the
    same crawl state,

        rank = authority * (1 - dup_share) * (1 - err_share)

    emitted in EXACTLY the (domain, rank) shape
    ``CrawlConfig(priority_table=..., frontier_policy='domain_rank')``
    consumes, so the output parquet of one crawl feeds the frontier
    prioritization of the next (FineWeb-style budget-by-quality;
    tests/test_priority.py drives the engine with it end-to-end).

    Scale: the pagerank component is one edge shuffle/iteration; the
    tally is ONE groupBy(domain) over the frontier; the final join is
    host-sized x host-sized."""
    fr = _crawl_state(spark)
    child = fr.select("parent", F.col("domain").alias("dst"))
    parent = fr.select(F.col("urlhash").alias("parent"), F.col("domain").alias("src"))
    edges = (
        child.join(parent, "parent")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    auth = pagerank(edges, iterations=CRAWL_HOST_RANK_ITERS, damping=PR_DAMPING)
    tall = fr.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.sum(
            (F.col("finish").isin(FINISH.TOO_EXACT, FINISH.TOO_SIMILAR)).cast(
                "long"
            )
        ).alias("n_dup"),
        F.sum(
            (
                F.col("finish").isin(
                    FINISH.BAD, FINISH.NOT_ALLOWED, FINISH.CACHE_ERROR
                )
            ).cast("long")
        ).alias("n_err"),
    )
    return (
        tall.join(auth.withColumnRenamed("id", "domain"), "domain", "left")
        .select(
            "domain",
            F.round(
                F.coalesce(F.col("rank"), F.lit(0.0))
                * (F.lit(1.0) - F.col("n_dup") / F.col("n_urls"))
                * (F.lit(1.0) - F.col("n_err") / F.col("n_urls")),
                6,
            ).alias("rank"),
            "n_urls",
            "n_dup",
            "n_err",
        )
        .orderBy(F.desc("rank"), "domain")
    )


def _sql_crawl_budget_allocation() -> str:
    base = _pagerank_sql_from_edges(
        f"""fr AS (SELECT * FROM '{_CRAWL_STATE_PARQUET}'),
e AS (SELECT DISTINCT p.domain AS src, c.domain AS dst
      FROM fr c JOIN fr p ON c.parent = p.urlhash
      WHERE p.domain <> c.domain)""",
        iters=CRAWL_HOST_RANK_ITERS,
    )
    k = CRAWL_HOST_RANK_ITERS
    return base.replace(
        f"\nSELECT id, round(r, 6) AS rank FROM r{k} ORDER BY id",
        f""",
tall AS (
  SELECT domain, count(*) AS n_urls,
         CAST(sum(CASE WHEN finish IN ({FINISH.TOO_EXACT},
                                       {FINISH.TOO_SIMILAR})
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         CAST(sum(CASE WHEN finish IN ({FINISH.BAD}, {FINISH.NOT_ALLOWED},
                                       {FINISH.CACHE_ERROR})
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM fr GROUP BY domain)
SELECT t.domain,
       round(coalesce(a.r, 0.0)
             * (1.0 - CAST(t.n_dup AS DOUBLE) / t.n_urls)
             * (1.0 - CAST(t.n_err AS DOUBLE) / t.n_urls), 6) AS rank,
       t.n_urls, t.n_dup, t.n_err
FROM tall t LEFT JOIN r{k} a ON a.id = t.domain
ORDER BY rank DESC, domain""",
    )


def q_crawl_discovery_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl dynamics per discovery generation: URLs first discovered at
    each gen, how many were downloaded, and the cumulative frontier
    size — the discovery curve an operator watches to spot frontier
    exhaustion or trap blowup.

    Scale: one groupBy(gen) over the frontier plus a running sum over
    the generation axis — a window over O(max_depth) rows, not data."""
    fr = _crawl_state(spark)
    per = fr.groupBy("gen").agg(
        F.count("*").alias("n_discovered"),
        F.sum((F.col("status") == STATUS.IS_DOWN).cast("long")).alias(
            "n_downloaded"
        ),
    )
    w = Window.orderBy("gen").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "gen",
        "n_discovered",
        "n_downloaded",
        F.sum("n_discovered").over(w).alias("cum_discovered"),
    ).orderBy("gen")


SQL_CRAWL_DISCOVERY_CURVE = f"""
WITH per AS (SELECT gen, count(*) AS n_discovered,
                    CAST(sum(CASE WHEN status = {STATUS.IS_DOWN} THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_downloaded
             FROM '{_CRAWL_STATE_PARQUET}' GROUP BY gen)
SELECT gen, n_discovered, n_downloaded,
       CAST(sum(n_discovered) OVER (ORDER BY gen) AS BIGINT) AS cum_discovered
FROM per ORDER BY gen
"""


def q_crawl_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-graph in-degree distribution in power-of-two buckets — the
    Broder-et-al power-law sanity check of the discovered link graph
    (a healthy web crawl shows a heavy in-degree tail; a trap shows a
    spike). Bucket = floor(log2(indeg)) computed INTEGER-exact via
    binary-string length (float log2 rounds differently across engines
    at exact powers of two).

    Scale: one groupBy(dst) + one tiny bucket aggregate."""
    lk = _crawl_links(spark)
    indeg = (
        lk.select("src_url", "dst_url")
        .distinct()
        .groupBy("dst_url")
        .agg(F.count("*").alias("indeg"))
    )
    return (
        indeg.select(
            (F.length(F.expr("bin(indeg)")) - 1).cast("int").alias("log2_bucket"),
            "indeg",
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("indeg").alias("min_indeg"),
            F.max("indeg").alias("max_indeg"),
        )
        .orderBy("log2_bucket")
    )


SQL_CRAWL_DEGREE_POWERLAW = f"""
WITH e AS (SELECT DISTINCT src_url, dst_url FROM '{_CRAWL_LINKS_PARQUET}'),
indeg AS (SELECT dst_url, count(*) AS indeg FROM e GROUP BY dst_url)
SELECT CAST(length(format('{{:b}}', indeg)) - 1 AS INTEGER) AS log2_bucket,
       count(*) AS n_nodes, min(indeg) AS min_indeg, max(indeg) AS max_indeg
FROM indeg GROUP BY 1 ORDER BY log2_bucket
"""


def q_crawl_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host link reciprocity — the link-exchange spam metric
    (Gyongyi & Garcia-Molina, Web spam taxonomy, AIRWeb 2005): share of
    a host's page-level outgoing edges whose exact reverse edge exists.
    The fixture's ladder/hub structures reciprocate by design (159
    mutual pairs), so the shares are non-trivial on both sides.

    Scale: operators/linkgraph.link_reciprocity — one dedup, one
    composite-key self equi-join (each edge matches at most its unique
    reverse — no fan-out), one groupBy(src_domain)."""
    from spacetime_crawler4_spark.operators.linkgraph import link_reciprocity

    return link_reciprocity(_crawl_links(spark)).orderBy(
        F.desc("recip_share"), "src_domain"
    )


SQL_CRAWL_RECIPROCITY = f"""
WITH e AS (SELECT DISTINCT src_url, dst_url, src_domain
           FROM '{_CRAWL_LINKS_PARQUET}'),
rev AS (SELECT DISTINCT dst_url AS src_url, src_url AS dst_url, TRUE AS recip
        FROM '{_CRAWL_LINKS_PARQUET}')
SELECT e.src_domain,
       count(*) AS n_edges,
       CAST(coalesce(sum(CASE WHEN recip THEN 1 END), 0) AS BIGINT) AS n_recip,
       round(CAST(coalesce(sum(CASE WHEN recip THEN 1 END), 0) AS DOUBLE)
             / count(*), 6) AS recip_share
FROM e LEFT JOIN rev USING (src_url, dst_url)
GROUP BY e.src_domain
ORDER BY recip_share DESC, src_domain
"""


def q_crawl_cdx_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted CDX manifest of the crawl's WET export — per admitted
    page its archive file, byte offset, record length, and payload
    digest, before a single byte is written. The archive layout
    (sources/warc.write_wet_archive) is a pure function of (url, text):
    file = md5-prefix bucket, within-file order = url sort, offset =
    window cumsum of the frozen record-length formula — so the index
    Common Crawl publishes alongside its WET files is here just a query.

    Scale: one map-side projection (md5/octet_length/conv built-ins) +
    ONE shuffle on file_id for the cumsum — the same shuffle the writer
    itself needs; tests/test_warc_sink.py proves these predicted offsets
    match the physical bytes byte-for-byte."""
    from spacetime_crawler4_spark.sources.warc import wet_manifest

    return wet_manifest(_pagetext(spark), CDX_N_FILES)


def _sql_crawl_cdx_manifest() -> str:
    from spacetime_crawler4_spark.sources.warc import wet_manifest_sql

    return wet_manifest_sql(_CRAWL_PAGETEXT_PARQUET, CDX_N_FILES)


_CRAWL_WAVE1_PARQUET = _os.environ.get(
    "SPARK_GRAFT_CRAWL_WAVE1",
    _os.path.join(_os.path.dirname(_CRAWL_STATE_PARQUET), "frontier_wave1.parquet"),
)


def q_crawl_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain diff between two crawl snapshots — the committed
    wave-1 frontier vs the final one. This is the Iceberg
    incremental-read pattern over the store's per-wave snapshot commits
    (crawl/store.py; SURVEY §1.2 S5): what each later wave DID — URLs
    discovered after the checkpoint, pending rows it resolved, finish
    verdicts it assigned.

    The frontier is insert-or-update only (urlhash is the PK; rows never
    leave, domains never change), so a LEFT join final←wave1 is total.
    Scale: one shuffle join on the PK + one groupBy — at 10^10 URLs both
    sides are bucketed by urlhash in the store, so the join co-locates."""
    t0 = spark.read.parquet(_CRAWL_WAVE1_PARQUET).select(
        "urlhash",
        F.col("status").alias("status0"),
        F.col("finish").alias("finish0"),
    )
    t1 = _crawl_state(spark).select("urlhash", "domain", "status", "finish")
    j = t1.join(t0, "urlhash", "left")
    return (
        j.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_final"),
            F.sum(F.col("status0").isNull().cast("long")).alias("n_new"),
            F.sum(
                (
                    F.col("status0").isNotNull()
                    & (F.col("status0") != 2)
                    & (F.col("status") == 2)
                ).cast("long")
            ).alias("n_resolved"),
            F.sum(
                (
                    F.col("finish0").isNotNull()
                    & (F.col("finish0") != F.col("finish"))
                ).cast("long")
            ).alias("n_reverdicted"),
        )
        .orderBy("domain")
    )


SQL_CRAWL_SNAPSHOT_DELTA = f"""
WITH t0 AS (SELECT urlhash, status AS status0, finish AS finish0
            FROM '{_CRAWL_WAVE1_PARQUET}'),
t1 AS (SELECT urlhash, domain, status, finish FROM '{_CRAWL_STATE_PARQUET}')
SELECT domain,
       count(*) AS n_final,
       CAST(coalesce(sum(CASE WHEN status0 IS NULL THEN 1 END), 0) AS BIGINT)
         AS n_new,
       CAST(coalesce(sum(CASE WHEN status0 IS NOT NULL AND status0 <> 2
                               AND status = 2 THEN 1 END), 0) AS BIGINT)
         AS n_resolved,
       CAST(coalesce(sum(CASE WHEN finish0 IS NOT NULL AND finish0 <> finish
                          THEN 1 END), 0) AS BIGINT) AS n_reverdicted
FROM t1 LEFT JOIN t0 USING (urlhash)
GROUP BY domain
ORDER BY domain
"""


def q_crawl_host_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected components of the host link graph (Broder et al.
    web-structure audit): cross-host edges from the committed engine-truth
    anchor index close into islands via the same O(log n) pointer-jumping
    CC the dedup plane uses — string host labels, min = lexicographic.
    Isolated-from-other-hosts domains never enter a pair and stay out, by
    the connected_components contract. Per-island: size + member hosts."""
    from spacetime_crawler4_spark.operators.dedup import connected_components

    edges = (
        _crawl_links(spark)
        .filter(F.col("src_domain") != F.col("dst_domain"))
        .select(
            F.least("src_domain", "dst_domain").alias("id_a"),
            F.greatest("src_domain", "dst_domain").alias("id_b"),
        )
        .distinct()
    )
    cc = connected_components(edges)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_hosts"),
            F.array_join(F.array_sort(F.collect_list("id")), ",").alias("hosts"),
        )
        .orderBy("cluster_id")
    )


SQL_CRAWL_HOST_COMPONENTS = f"""
WITH RECURSIVE pairs AS (
    SELECT DISTINCT least(src_domain, dst_domain) AS id_a,
                    greatest(src_domain, dst_domain) AS id_b
    FROM '{_CRAWL_LINKS_PARQUET}' WHERE src_domain <> dst_domain),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
comp AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src)
SELECT cluster_id, count(*) AS n_hosts,
       string_agg(id, ',' ORDER BY id) AS hosts
FROM comp GROUP BY cluster_id ORDER BY cluster_id
"""


# --- round-4 session-11 batch 2: seed attribution, CDC chunk dedup,
# --- PCA power iteration


def q_crawl_seed_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed attribution over the committed engine-truth frontier: every
    crawled URL resolved to the SEED that (transitively) discovered it —
    the parent chain closed with the pointer-jumping tree_roots operator
    (O(log depth) rounds, one keyed self-join each; the oracle walks the
    identical forest with a recursive CTE). Per seed: frontier rows,
    OK downloads, dedup casualties, deepest reach — which seed actually
    paid for the crawl."""
    from spacetime_crawler4_spark.operators.graph import tree_roots

    fr = _crawl_state(spark)
    roots = tree_roots(fr, id_col="urlhash", parent_col="parent")
    seeds = fr.filter(F.col("parent").isNull()).select(
        F.col("urlhash").alias("root"), F.col("url").alias("seed_url")
    )
    return (
        fr.join(roots, fr.urlhash == roots.id)
        .join(F.broadcast(seeds), "root")
        .groupBy("seed_url")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((F.col("finish") == 0).cast("long")).alias("n_ok"),
            F.sum(F.col("finish").isin(4, 5).cast("long")).alias("n_dup"),
            F.max("absdepth").alias("max_depth"),
        )
        .orderBy("seed_url")
    )


SQL_CRAWL_SEED_ATTRIBUTION = f"""
WITH RECURSIVE fr AS (SELECT * FROM '{_CRAWL_STATE_PARQUET}'),
walk AS (SELECT urlhash AS id, url AS seed_url FROM fr WHERE parent IS NULL
         UNION ALL
         SELECT f.urlhash, w.seed_url FROM fr f JOIN walk w ON f.parent = w.id)
SELECT seed_url, count(*) AS n_urls,
       CAST(sum(CASE WHEN finish = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(sum(CASE WHEN finish IN (4, 5) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       max(absdepth) AS max_depth
FROM fr JOIN walk ON walk.id = fr.urlhash
GROUP BY seed_url ORDER BY seed_url
"""


def q_crawl_hub_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-page detection over the engine-truth anchor index: top source
    pages by out-degree with distinct-target/host fanout and the share of
    SELF-host links — navigation hubs (high out-degree, low cross-host
    reach) separate from genuine directory pages. One groupBy on src."""
    links = _crawl_links(spark)
    return (
        links.groupBy("src_url")
        .agg(
            F.count("*").alias("out_degree"),
            F.countDistinct("dst_url").alias("n_targets"),
            F.countDistinct("dst_domain").alias("n_dst_hosts"),
            F.round(
                F.sum(
                    (F.col("dst_domain") == F.col("src_domain")).cast("double")
                )
                / F.count("*"),
                6,
            ).alias("self_share"),
        )
        .orderBy(F.desc("out_degree"), F.asc("src_url"))
        .limit(20)
    )


SQL_CRAWL_HUB_PAGES = f"""
SELECT src_url, count(*) AS out_degree,
       count(DISTINCT dst_url) AS n_targets,
       count(DISTINCT dst_domain) AS n_dst_hosts,
       round(sum(CASE WHEN dst_domain = src_domain THEN 1.0 ELSE 0.0 END)
             / count(*), 6) AS self_share
FROM '{_CRAWL_LINKS_PARQUET}'
GROUP BY src_url ORDER BY out_degree DESC, src_url ASC LIMIT 20
"""


def q_crawl_opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC page importance (Abiteboul, Preda & Cobena, WWW 2003) over
    the committed crawl link graph (operators/graph.opic): cash starts
    uniform, flows along out-links each round (dangling cash re-spread
    uniformly), and importance is the running average of cash held —
    the classic frontier-prioritization score for crawlers that cannot
    afford synchronous PageRank sweeps, since cash updates are
    creditable per-fetch online. The batch-synchronous form here is
    unrolled round-for-round by the oracle.

    Scale: one edge shuffle per round, node-sized cash vector, 1-row
    dangling broadcast — identical shape to graph_pagerank."""
    from spacetime_crawler4_spark.operators.graph import opic

    lk = _crawl_links(spark)
    edges = lk.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    ).distinct()
    return (
        opic(edges, iterations=OPIC_ITERS)
        .select(
            F.col("id").alias("url"),
            F.round("importance", 6).alias("importance"),
            F.round("cash", 6).alias("cash"),
        )
        .orderBy(F.desc("importance"), "url")
    )


def _sql_crawl_opic_ctes() -> tuple[str, str, str]:
    """Shared OPIC oracle scaffolding: returns (WITH-clause text,
    importance chain expr ``c0.c + … + cR.c``, join tail) so both final
    SELECTs (_sql_crawl_opic_importance / _sql_crawl_opic_host_rank)
    compose from the SAME rendered prefix — no rpartition string
    surgery that a future trailing-subquery edit would silently
    truncate (ADVICE r4)."""
    n = "(SELECT count(*) FROM nodes)"
    ctes = [
        f"""lk AS (SELECT * FROM '{_CRAWL_LINKS_PARQUET}'),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM lk),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
we AS (SELECT src, dst, 1.0 / od AS w FROM e JOIN outdeg USING (src)),
c0 AS (SELECT id, 1.0 / {n} AS c FROM nodes)"""
    ]
    for i in range(1, OPIC_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS (
  SELECT nn.id,
         coalesce(cb.acc, 0.0)
         + (SELECT coalesce(sum(c), 0.0) FROM c{p}
            WHERE id NOT IN (SELECT src FROM outdeg)) / {n} AS c
  FROM nodes nn LEFT JOIN
       (SELECT dst AS id, sum(w * c) AS acc
        FROM we JOIN c{p} ON c{p}.id = we.src GROUP BY dst) cb
  USING (id))"""
        )
    chain = " + ".join(f"c{i}.c" for i in range(OPIC_ITERS + 1))
    joins = "\n".join(
        f"JOIN c{i} ON c{i}.id = c0.id" for i in range(1, OPIC_ITERS + 1)
    )
    return "WITH " + ",\n".join(ctes), chain, joins


def _sql_crawl_opic_importance() -> str:
    """The cash recurrence unrolled as chained CTEs; importance is the
    left-to-right average (c0 + ... + cR)/(R+1), matching the engine's
    incremental history accumulation addition-for-addition."""
    with_clause, chain, joins = _sql_crawl_opic_ctes()
    return (
        with_clause
        + f"""
SELECT c0.id AS url,
       round(({chain}) / {float(OPIC_ITERS + 1)!r}, 6) AS importance,
       round(c{OPIC_ITERS}.c, 6) AS cash
FROM c0
{joins}
ORDER BY importance DESC, url"""
    )


def q_crawl_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA authorities/hubs (Lempel & Moran, WWW 2000) over the
    committed crawl link graph (operators/graph.salsa): the
    degree-normalized stochastic cousin of HITS — no global L2 barrier
    per step, and the theory says a connected component's authority
    converges to indeg/|E| (TKC immunity), so the query emits that
    theoretical stationary alongside the iterated score as its own
    audit. Same one-materialized-edge-list, two-joins-per-round shape
    as the rest of the link-analysis family."""
    from spacetime_crawler4_spark.operators.graph import salsa

    lk = _crawl_links(spark)
    edges = lk.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    )
    e = edges.distinct()
    n_edges = e.count()
    indeg = e.groupBy("dst").agg(F.count("*").alias("idg"))
    out = salsa(edges, iterations=SALSA_ITERS)
    return (
        out.join(indeg.select(F.col("dst").alias("id"), "idg"), "id", "left")
        .select(
            F.col("id").alias("url"),
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
            F.round(
                F.coalesce("idg", F.lit(0)) / F.lit(float(n_edges)), 6
            ).alias("indeg_share"),
        )
        .orderBy(F.desc("authority"), "url")
    )


def _sql_crawl_salsa() -> str:
    ctes = [
        f"""lk AS (SELECT * FROM '{_CRAWL_LINKS_PARQUET}'),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM lk),
od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
idg AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst),
we AS (SELECT src, dst, od, idg FROM e JOIN od USING (src) JOIN idg USING (dst)),
ne AS (SELECT count(*) AS ne FROM we),
a0 AS (SELECT dst AS id, CAST(idg AS DOUBLE) / (SELECT ne FROM ne) AS a
       FROM (SELECT DISTINCT dst, idg FROM we))"""
    ]
    for i in range(1, SALSA_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""h{i} AS (SELECT we.src, sum(a{p}.a / we.idg) AS h
        FROM we JOIN a{p} ON a{p}.id = we.dst GROUP BY we.src)"""
        )
        ctes.append(
            f"""a{i} AS (SELECT we.dst AS id, sum(h{i}.h / we.od) AS a
        FROM we JOIN h{i} ON h{i}.src = we.src GROUP BY we.dst)"""
        )
    k = SALSA_ITERS
    ctes.append(
        f"""hf AS (SELECT we.src AS id, sum(a{k}.a / we.idg) AS h
        FROM we JOIN a{k} ON a{k}.id = we.dst GROUP BY we.src)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT coalesce(a{k}.id, hf.id) AS url,
       round(coalesce(a{k}.a, 0.0), 6) AS authority,
       round(coalesce(hf.h, 0.0), 6) AS hub,
       round(coalesce(idg.idg, 0) / CAST((SELECT ne FROM ne) AS DOUBLE), 6)
           AS indeg_share
FROM a{k} FULL OUTER JOIN hf ON hf.id = a{k}.id
LEFT JOIN idg ON idg.dst = coalesce(a{k}.id, hf.id)
ORDER BY authority DESC, url"""
    )


# --------------------------------------------------------------------------
# OPIC host rank table; Q15 shape; stickiness; keyword extraction (s14)
# --------------------------------------------------------------------------

_HOST_RE = "^[a-z]+://[^/]+"


def q_crawl_opic_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level OPIC priority table: page importances summed per
    ``scheme://host`` — EXACTLY the (domain, rank) parquet shape
    ``frontier_policy='domain_rank'`` consumes (the integration test
    drives the scheduler with this query's output), now oracle-
    certified like crawl_budget_allocation. The scale story is OPIC's
    own: cash updates credit online per fetch, so this table refreshes
    incrementally between waves without a synchronous PageRank sweep."""
    from spacetime_crawler4_spark.operators.graph import opic

    lk = _crawl_links(spark)
    edges = lk.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    ).distinct()
    imp = opic(edges, iterations=OPIC_ITERS)
    return (
        imp.select(
            F.regexp_extract("id", _HOST_RE, 0).alias("domain"), "importance"
        )
        .groupBy("domain")
        .agg(F.round(F.sum("importance"), 6).alias("rank"))
        .orderBy(F.desc("rank"), "domain")
    )


def _sql_crawl_opic_host_rank() -> str:
    with_clause, chain, joins = _sql_crawl_opic_ctes()
    return (
        with_clause
        + f"""
SELECT regexp_extract(c0.id, '{_HOST_RE}') AS domain,
       round(sum(({chain}) / {float(OPIC_ITERS + 1)!r}), 6) AS rank
FROM c0
{joins}
GROUP BY domain
ORDER BY rank DESC, domain"""
    )
