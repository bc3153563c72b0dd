"""Sketch-plane queries: CMS, HLL, KMV, AMS, MG, quantiles, bootstrap.

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

from ._shared import QA_ACC, QA_QS, _DUCK_TOKS, _t  # noqa: F401



def _duck_grams(n: int) -> str:
    gram = " || ' ' || ".join([f"ts[i+{j}]" for j in range(n)])
    return (
        f"SELECT doc_id AS id, "
        f"unnest(list_distinct([{gram} for i in range(1, len(ts) - {n - 2})])) AS shingle "
        f"FROM toks"
    )


def q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams by document frequency (docs containing the
    gram — per-doc distinct shingles, the same one explode + two-phase
    hash-aggregate + TakeOrderedAndProject shape as the top-50 words
    report), ties broken lexicographically."""
    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", 2)
    return (
        sh.groupBy(F.col("shingle").alias("gram"))
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "gram")
        .limit(20)
    )


SQL_TEXT_TOP_NGRAMS = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
sh AS ({_duck_grams(2)})
SELECT shingle AS gram, count(*) AS df
FROM sh GROUP BY shingle ORDER BY df DESC, gram LIMIT 20
"""


def q_text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source length distribution: n_docs, median and p90 of
    n_chars (exact linear-interpolation percentiles — Spark `percentile`
    and DuckDB `quantile_cont` implement the identical definition; both
    engines see the same integer inputs)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("median_chars"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
        )
        .orderBy("source")
    )


SQL_TEXT_LENGTH_QUANTILES = """
SELECT source, count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
       round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL distinct sketch vs exact distinct, on three keys that
    exercise both correction branches: events.user_id (50 — linear
    counting), events.event_id (10k — raw HLL), lineitem.l_partkey.
    Because the register hash is md5 on BOTH engines, the oracle checks
    the ESTIMATE hash-exactly, not approximately — the sketch itself is
    the thing under test. Register build = one shuffle with map-side
    partial max; sketches merge by max, so per-partition registers union
    for free at any scale."""
    out = None
    for label, table, col in (
        ("events.user_id", "events", "user_id"),
        ("events.event_id", "events", "event_id"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ):
        df = _t(spark, sf_dir, table)
        est = hll_estimate(df, col)
        exact = df.agg(F.count_distinct(F.col(col)).alias("n_exact"))
        row = (
            est.crossJoin(exact)
            .select(
                F.lit(label).alias("key"),
                "n_exact",
                "hll_estimate",
                F.round(
                    F.abs(F.col("hll_estimate") - F.col("n_exact"))
                    / F.col("n_exact"),
                    6,
                ).alias("rel_err"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("key")


def _sql_sketch_distinct() -> str:
    blocks = []
    for label, table, col in (
        ("events.user_id", "events", "user_id"),
        ("events.event_id", "events", "event_id"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ):
        blocks.append(
            f"""SELECT '{label}' AS key,
       (SELECT count(DISTINCT {col}) FROM {table}) AS n_exact,
       e.hll_estimate,
       round(abs(e.hll_estimate - (SELECT count(DISTINCT {col}) FROM {table}))
             * 1.0 / (SELECT count(DISTINCT {col}) FROM {table}), 6) AS rel_err
FROM ({hll_sql(table, col)}) e"""
        )
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY key"


def q_sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-merge contract as an oracle-checked query: per-partition
    HLL register files UNION BY MAX. Here the 'partitions' are the click
    and view event streams — merging their registers must yield the
    bit-identical estimate of the union's distinct users, checked against
    both the direct union sketch and the exact count (plus the
    inclusion-exclusion intersection estimate). At 100 TB this is why
    distinct-counts never need a global distinct shuffle: registers
    merge associatively from any partitioning."""
    ev = _t(spark, sf_dir, "events")
    bucket, rho = hll_register_expr(F.col("user_id"))

    def regs(df):
        return (
            df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("r"))
        )

    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    both = ev.filter(F.col("event_type").isin("click", "view"))
    merged = (
        regs(clicks)
        .unionByName(regs(views))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )

    m = 16 ** 2  # HLL_HEX_CHARS = 2
    from spacetime_crawler4_spark.operators.sketch import _alpha

    def est(rdf):
        agg = rdf.agg(
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
            F.count("*").alias("nz"),
        )
        raw = F.lit(_alpha(m) * m * m) / (F.col("s") + (F.lit(m) - F.col("nz")))
        e = F.when(
            (raw <= 2.5 * m) & (F.col("nz") < m),
            F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("nz"))),
        ).otherwise(raw)
        return agg.select(F.floor(e).cast("long").alias("est"))

    exact = both.agg(F.count_distinct("user_id").alias("n_exact"))
    direct = est(regs(both)).select(F.col("est").alias("hll_direct"))
    viamerge = est(merged).select(F.col("est").alias("hll_merged"))
    inter = (
        hll_estimate(clicks, "user_id")
        .select(F.col("hll_estimate").alias("ec"))
        .crossJoin(hll_estimate(views, "user_id").select(F.col("hll_estimate").alias("ev")))
    )
    return (
        exact.crossJoin(direct)
        .crossJoin(viamerge)
        .crossJoin(inter)
        .select(
            "n_exact",
            "hll_direct",
            "hll_merged",
            (F.col("hll_merged") == F.col("hll_direct")).alias("merge_exact"),
            (F.col("ec") + F.col("ev") - F.col("hll_merged")).alias(
                "hll_intersection_est"
            ),
        )
    )


def _sql_sketch_hll_union() -> str:
    m = 16 ** 2
    from spacetime_crawler4_spark.operators.sketch import (
        HLL_HEX_CHARS,
        HLL_RHO_HEX,
        _alpha,
    )

    nbits = 4 * HLL_RHO_HEX

    def regs(pred: str) -> str:
        return f"""(SELECT bucket, max(r) AS r FROM (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, {HLL_HEX_CHARS})) AS INTEGER) AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), {HLL_HEX_CHARS + 1}, {HLL_RHO_HEX})) AS BIGINT) = 0
              THEN {nbits + 1}
              ELSE {nbits} - length(bin(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), {HLL_HEX_CHARS + 1}, {HLL_RHO_HEX})) AS BIGINT))) + 1
         END AS r
  FROM events WHERE {pred}) GROUP BY bucket)"""

    def est(src: str) -> str:
        return f"""(SELECT CAST(floor(CASE WHEN raw <= {2.5 * m!r} AND nz < {m}
              THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / ({m} - nz))
              ELSE raw END) AS BIGINT)
        FROM (SELECT CAST({_alpha(m)!r} AS DOUBLE) * {m} * {m} / (s + ({m} - nz)) AS raw, nz
              FROM (SELECT sum(power(2.0, -r)) AS s, count(*) AS nz FROM {src} t)))"""

    merged = f"""(SELECT bucket, max(r) AS r FROM (
  SELECT * FROM {regs("event_type = 'click'")} u
  UNION ALL SELECT * FROM {regs("event_type = 'view'")} v) GROUP BY bucket)"""
    return f"""
SELECT (SELECT count(DISTINCT user_id) FROM events
        WHERE event_type IN ('click', 'view')) AS n_exact,
       {est(regs("event_type IN ('click', 'view')"))} AS hll_direct,
       {est(merged)} AS hll_merged,
       ({est(merged)} = {est(regs("event_type IN ('click', 'view')"))}) AS merge_exact,
       ({est(regs("event_type = 'click'"))} + {est(regs("event_type = 'view'"))}
        - {est(merged)}) AS hll_intersection_est
"""


def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the document token stream: the top-20
    tokens by exact count, each with its CMS point estimate and the
    (always >= 0) overestimate. Because every row hash is md5 on BOTH
    engines, the oracle checks the counter matrix and the estimates
    hash-exactly. Matrix build = one shuffle bounded at depth*width rows
    per map task; the probe join broadcasts the 3x1024-row matrix."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(sql_tokens(F.col("text"))).alias("token"))
    regs = cms_registers(toks, "token")
    exact = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "token")
        .limit(20)
    )
    est = cms_point_estimates(regs, exact.select("token"), "token")
    return (
        exact.join(est, "token")
        .select(
            "token",
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.desc("n_exact"), "token")
    )


def _sql_sketch_cms() -> str:
    pair_rows = "\n  UNION ALL ".join(
        f"SELECT {j} AS rw, {cms_pairs_sql('token', j)} AS bucket FROM tok"
        for j in range(CMS_DEPTH)
    )
    probe_rows = "\n  UNION ALL ".join(
        f"SELECT token, {j} AS rw, {cms_pairs_sql('token', j)} AS bucket FROM exact"
        for j in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT unnest(ts) AS token FROM toks),
pairs AS (
  {pair_rows}),
regs AS (SELECT rw, bucket, count(*) AS c FROM pairs GROUP BY rw, bucket),
exact AS (SELECT token, count(*) AS n_exact FROM tok GROUP BY token
          ORDER BY n_exact DESC, token LIMIT 20),
probes AS (
  {probe_rows}),
est AS (SELECT p.token, min(coalesce(r.c, 0)) AS cms_estimate
        FROM probes p LEFT JOIN regs r ON r.rw = p.rw AND r.bucket = p.bucket
        GROUP BY p.token)
SELECT e.token, e.n_exact, s.cms_estimate,
       s.cms_estimate - e.n_exact AS overestimate
FROM exact e JOIN est s ON s.token = e.token
ORDER BY n_exact DESC, e.token
"""


# --------------------------------------------------------------------------
# session-13 staged queries: Misra-Gries heavy hitters, label-propagation
# communities, sliding event windows, mojibake inject/detect/repair audit,
# deterministic logistic-regression training
# --------------------------------------------------------------------------

MG_K = 30  # heavy-hitter threshold: keys with share > 1/30


def q_sketch_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact >n/30-frequency tokens via the Misra-Gries two-pass shape
    (operators/sketch.mg_heavy_hitters): map-only <=k-counter summaries
    per partition (mapInPandas, zero shuffle), candidate union, then one
    exact-count pass whose agg state is bounded by the broadcast
    candidate set instead of the vocabulary — the 100-TB alternative to
    a full-vocab groupBy. The MG superset guarantee makes the final
    output EXACT and partition-independent, so the oracle is plain SQL."""
    from spacetime_crawler4_spark.operators.sketch import mg_heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(sql_tokens(F.col("text"))).alias("token"))
    return (
        mg_heavy_hitters(toks, "token", MG_K)
        .select(
            "token",
            "n_exact",
            "n_total",
            F.round(F.col("n_exact") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_exact"), "token")
    )


SQL_SKETCH_MG_HEAVY_HITTERS = f"""
WITH toks AS (SELECT {_DUCK_TOKS} AS ts FROM documents),
tok AS (SELECT unnest(ts) AS token FROM toks),
tot AS (SELECT count(*) AS n FROM tok)
SELECT token, count(*) AS n_exact,
       (SELECT n FROM tot) AS n_total,
       round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS share
FROM tok GROUP BY token
HAVING count(*) * {MG_K} > (SELECT n FROM tot)
ORDER BY n_exact DESC, token
"""


def q_sketch_hll_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content diversity: distinct word-3-gram cardinality per
    source, estimated with one HLL PER GROUP (operators/sketch.
    hll_estimate_by — the mergeable-by-key production shape: registers
    shuffle once on (group, bucket) with map-side partial max, at most
    groups*256 rows reduce-side, and group-keyed registers union across
    corpus shards for free). Exact count and relative error reported
    alongside; the md5-portable registers make every per-group estimate
    hash-exact against the oracle."""
    from spacetime_crawler4_spark.operators.sketch import hll_estimate_by

    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "source", "text", n=3)
    est = hll_estimate_by(sh, "id", "shingle")
    exact = sh.groupBy("id").agg(F.count_distinct("shingle").alias("n_exact"))
    return (
        est.join(exact, "id")
        .select(
            F.col("id").alias("source"),
            "n_exact",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


def _sql_sketch_hll_per_source() -> str:
    from spacetime_crawler4_spark.operators.sketch import hll_group_sql

    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(3))
    return f"""
WITH toks AS (SELECT source, {_DUCK_TOKS} AS ts FROM documents),
sh AS (SELECT source,
              unnest(list_distinct([{gram} for i in range(1, len(ts) - 1)]))
                  AS shingle
       FROM toks),
est AS (SELECT * FROM ({hll_group_sql("sh", "source", "shingle")}) hq),
exact AS (SELECT source, count(DISTINCT shingle) AS n_exact
          FROM sh GROUP BY source)
SELECT e.grp AS source, x.n_exact, e.hll_estimate,
       round(CAST(abs(e.hll_estimate - x.n_exact) AS DOUBLE) / x.n_exact, 6)
           AS rel_err
FROM est e JOIN exact x ON x.source = e.grp
ORDER BY source
"""


def q_sketch_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs approximate quantiles of document length. The exact side
    (``percentile``) interpolates identically in Spark and DuckDB (same
    p*(n-1) linear rule — verified bit-identical), so exact values are
    oracle-checked directly. The GK sketch side (``percentile_approx``)
    can vary with partition layout, so what the query emits for it is
    only the GUARANTEE audit: the sketch value's true rank (one
    conditional count per q) must sit within the doubled merged-summary
    bound 2n/accuracy + 1 of the target rank. At 100 TB the GK sketch is
    the only affordable path (exact percentile is a global sort / full
    count-map); this audit is what lets a pipeline trust it."""
    docs = _t(spark, sf_dir, "documents")
    qarr = F.array(*[F.lit(q) for q in QA_QS])
    row = docs.agg(
        F.percentile("n_chars", qarr).alias("ex"),
        F.percentile_approx("n_chars", qarr, F.lit(QA_ACC)).alias("ap"),
        F.count("*").alias("n"),
    ).collect()[0]
    ex, ap, n = row["ex"], row["ap"], row["n"]
    ranks = docs.agg(
        *[
            F.sum((F.col("n_chars") <= int(ap[i])).cast("long")).alias(f"r{i}")
            for i in range(len(QA_QS))
        ]
    ).collect()[0]
    bound = 2 * n // QA_ACC + 1
    out = None
    for i, q in enumerate(QA_QS):
        lo = int(math.floor(q * n)) - bound
        hi = int(math.ceil(q * n)) + bound
        within = bool(lo <= int(ranks[f"r{i}"]) <= hi)
        rdf = spark.range(1).select(
            F.lit(float(q)).alias("q"),
            F.round(F.lit(float(ex[i])), 4).alias("exact_value"),
            F.lit(int(n)).alias("n"),
            F.lit(within).alias("approx_within_bound"),
        )
        out = rdf if out is None else out.unionByName(rdf)
    return out.orderBy("q")


def _sql_sketch_quantile_audit() -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({q!r} AS DOUBLE) AS q, "
        f"round(quantile_cont(CAST(n_chars AS DOUBLE), {q!r}), 4) AS exact_value, "
        f"count(*) AS n, TRUE AS approx_within_bound FROM documents"
        for q in QA_QS
    )
    return rows + "\nORDER BY q"


# --------------------------------------------------------------------------
# KMV theta-sketch set algebra (session 14)
# --------------------------------------------------------------------------


def q_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content overlap from KMV/theta sketches
    (operators/sketch.kmv_*): per source, the k=128 smallest 48-bit
    md5 hashes of its distinct word-3-gram set form the sketch; every
    source PAIR's union / intersection / Jaccard cardinality is then
    estimated from the two sketches alone — the set-EXPRESSION
    cardinality HLL cannot give (register max destroys intersection
    evidence). Exact counterparts are computed alongside so the row
    carries its own error audit.

    Scale: the raw corpus is touched once (distinct-hash shuffle);
    everything pairwise runs over <= k rows per group — at 100 TB the
    sketches are a tiny persisted state table and cross-shard overlap
    questions never re-scan data. Estimates are integer-exact in
    selection and bit-portable (md5 prefix), so the oracle matches
    hash-for-hash."""
    from spacetime_crawler4_spark.operators.sketch import (
        kmv_hashes,
        kmv_pair_setops,
        kmv_sketch,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "source", "text", n=3).distinct()
    est = kmv_pair_setops(kmv_sketch(kmv_hashes(sh, "id", "shingle")))
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("grp_a"), F.col("b.id").alias("grp_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("grp_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("grp_b"), F.col("sz").alias("sz_b"))
    return (
        est.join(inter, ["grp_a", "grp_b"], "left")
        .join(F.broadcast(sa), "grp_a")
        .join(F.broadcast(sb), "grp_b")
        .select(
            F.col("grp_a").alias("source_a"),
            F.col("grp_b").alias("source_b"),
            "n_kept",
            "rho",
            "union_est",
            "inter_est",
            "jaccard_est",
            (F.col("sz_a") + F.col("sz_b") - F.coalesce("n_inter", F.lit(0)))
            .cast("long")
            .alias("n_union"),
            F.coalesce("n_inter", F.lit(0)).cast("long").alias("n_inter"),
        )
        .orderBy("source_a", "source_b")
    )


def _sql_sketch_kmv_setops() -> str:
    from spacetime_crawler4_spark.operators.sketch import (
        KMV_HEX,
        kmv_pair_sql,
    )

    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(3))
    return f"""
WITH toks AS (SELECT source, {_DUCK_TOKS} AS ts FROM documents),
shd AS (SELECT DISTINCT source AS grp,
               unnest(list_distinct([{gram} for i in range(1, len(ts) - 1)]))
                   AS shingle
        FROM toks),
hh AS (SELECT DISTINCT grp,
              CAST(('0x' || substr(md5(shingle), 1, {KMV_HEX})) AS BIGINT)
                  AS h
       FROM shd),
{kmv_pair_sql("hh")},
sz AS (SELECT grp, count(*) AS sz FROM shd GROUP BY grp),
itr AS (SELECT a.grp AS grp_a, b.grp AS grp_b, count(*) AS n_inter
        FROM shd a JOIN shd b
          ON a.shingle = b.shingle AND a.grp < b.grp
        GROUP BY 1, 2)
SELECT e.grp_a AS source_a, e.grp_b AS source_b, e.n_kept, e.rho,
       round(e.union_est, 6) AS union_est,
       round(e.jacc * e.union_est, 6) AS inter_est,
       round(e.jacc, 6) AS jaccard_est,
       CAST(za.sz + zb.sz - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
       CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter
FROM est e
LEFT JOIN itr i ON i.grp_a = e.grp_a AND i.grp_b = e.grp_b
JOIN sz za ON za.grp = e.grp_a
JOIN sz zb ON zb.grp = e.grp_b
ORDER BY source_a, source_b
"""


# --------------------------------------------------------------------------
# Poisson bootstrap CI (session 14)
# --------------------------------------------------------------------------


def q_text_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% confidence interval for the mean document length via the
    POISSON BOOTSTRAP (Chamandy et al., Google 2012) — the uncertainty
    method that actually works at 100 TB: instead of materializing B
    resampled copies, every row carries B=100 deterministic Poisson(1)
    weights derived from its own md5, and ALL replicate means come out
    of ONE aggregate pass (202 numbers leave the executors, the data
    never reshuffles). The md5-uniform → inverse-CDF draw uses exact
    shared double thresholds, so every replicate mean is bit-portable
    and the oracle reproduces the interval exactly."""
    from spacetime_crawler4_spark.operators.sketch import (
        poisson_bootstrap_mean,
    )

    docs = _t(spark, sf_dir, "documents")
    return poisson_bootstrap_mean(docs, "doc_id", "n_chars")


def _sql_text_bootstrap_ci() -> str:
    from spacetime_crawler4_spark.operators.sketch import (
        poisson_bootstrap_sql,
    )

    return f"""
WITH {poisson_bootstrap_sql("documents", "doc_id", "n_chars")}
SELECT obs_mean, ci_lo, ci_hi, n, n_replicates FROM boot
"""


# --------------------------------------------------------------------------
# AMS F2 self-join-size estimate (session 14)
# --------------------------------------------------------------------------


def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch (Alon, Matias & Szegedy, STOC 1996) over the
    corpus term-frequency table: F2 = Σ tf(term)² is the SELF-JOIN
    SIZE on the term key — what a planner must price before choosing a
    join strategy on a skewed key. The sketch folds the whole table
    into k=16 exact BIGINT countersigns (one aggregate, map-side
    combine, 16 integers to the driver) and reports the median-of-
    squares estimate next to the exact F2 and relative error. Every
    estimator is integer-exact and md5-portable, so the oracle matches
    bit-for-bit."""
    from spacetime_crawler4_spark.operators.sketch import ams_f2_estimate

    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(sql_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    est = ams_f2_estimate(tf, "term", "tf")
    exact = tf.agg(F.sum(F.col("tf") * F.col("tf")).alias("f2_exact"))
    return est.crossJoin(exact).select(
        "f2_exact",
        F.round("f2_est", 1).alias("f2_est"),
        F.round(
            F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact"), 6
        ).alias("rel_err"),
    )


def _sql_sketch_ams_f2() -> str:
    from spacetime_crawler4_spark.operators.sketch import ams_f2_sql

    return f"""
WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS term FROM documents),
tf AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
{ams_f2_sql("tf", "term", "tf")},
ex AS (SELECT sum(tf * tf) AS f2_exact FROM tf)
SELECT CAST(ex.f2_exact AS BIGINT) AS f2_exact,
       round(ams.f2_est, 1) AS f2_est,
       round(abs(ams.f2_est - ex.f2_exact) / ex.f2_exact, 6) AS rel_err
FROM ams CROSS JOIN ex
"""
