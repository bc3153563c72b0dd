"""Graph-plane queries: PageRank, HITS, TrustRank, SALSA, OPIC.

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

from ._shared import COSUPPLY_TOP_EDGES, LP_EDGE_MIN_PRICE, LP_ITERS, PR_BACKEDGE_MIN_PRICE, PR_DAMPING, PR_ITERS, _t, _trade_edges  # noqa: F401

# dangling mass (customers with no big order have no out-edges)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 synchronous power iterations, d=0.85, uniform dangling
    redistribution) over the trade graph: supplier -> customer for every
    supply relationship, customer -> supplier only for orders above
    450k (so a third of the customers genuinely dangle and the dangling
    path is exercised). One shuffle per iteration on the weighted edge
    list; the rank vector and dangling mass are the small/broadcast
    sides."""
    ranks = pagerank(
        _trade_edges(spark, sf_dir), iterations=PR_ITERS, damping=PR_DAMPING
    )
    return ranks.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def _pagerank_sql_from_edges(edge_ctes: str, iters: int = PR_ITERS) -> str:
    """Unrolled-CTE PageRank mirror shared by every pagerank oracle:
    ``edge_ctes`` must end by defining ``e(src, dst)``; the recurrence
    CTEs then mirror operators/graph.pagerank's arithmetic 1:1 (same
    formula, same coalesce placement, same dangling term)."""
    d, n = PR_DAMPING, "(SELECT count(*) FROM nodes)"
    ctes = [
        f"""{edge_ctes},
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
we AS (SELECT src, dst, 1.0 / od AS w FROM e JOIN outdeg USING (src)),
r0 AS (SELECT id, 1.0 / {n} AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
  SELECT nn.id,
         (1.0 - {d}) / {n}
         + {d} * (coalesce(cb.acc, 0.0)
                  + (SELECT coalesce(sum(r), 0.0) FROM {p}
                     WHERE id NOT IN (SELECT src FROM outdeg)) / {n}) AS r
  FROM nodes nn LEFT JOIN
       (SELECT dst AS id, sum(w * r) AS acc
        FROM we JOIN {p} ON {p}.id = we.src GROUP BY dst) cb
  USING (id))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(r, 6) AS rank FROM r{iters} ORDER BY id"
    )


def _sql_pagerank() -> str:
    return _pagerank_sql_from_edges(
        f"""pairs AS (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS s,
              'c' || CAST(o_custkey AS VARCHAR) AS c, o_totalprice
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS (SELECT DISTINCT s AS src, c AS dst FROM pairs
      UNION
      SELECT DISTINCT c AS src, s AS dst FROM pairs
      WHERE o_totalprice > {PR_BACKEDGE_MIN_PRICE})"""
    )


HITS_ITERS = 5


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (5 rounds, L1-normalized half-steps) over the
    same trade graph as graph_pagerank — suppliers act as hubs pointing
    at the customers they supply; only big-buyer back-edges give
    customers hub mass. Two edge shuffles per iteration; score vectors
    and normalizers stay broadcast-small."""
    ranks = hits(_trade_edges(spark, sf_dir), iterations=HITS_ITERS)
    return ranks.select(
        "id",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    ).orderBy("id")


def _sql_hits() -> str:
    ctes = [
        f"""pairs AS MATERIALIZED (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS s,
              'c' || CAST(o_custkey AS VARCHAR) AS c, o_totalprice
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS MATERIALIZED (SELECT DISTINCT s AS src, c AS dst FROM pairs
      UNION
      SELECT DISTINCT c AS src, s AS dst FROM pairs
      WHERE o_totalprice > {PR_BACKEDGE_MIN_PRICE}),
nodes AS MATERIALIZED (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
a0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS a FROM nodes)"""
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""hr{i} AS MATERIALIZED (SELECT e.src AS id, sum(p.a) AS s
         FROM e JOIN a{i - 1} p ON p.id = e.dst GROUP BY e.src),
h{i} AS MATERIALIZED (SELECT n.id, coalesce(r.s, 0.0) / (SELECT sum(s) FROM hr{i}) AS h
         FROM nodes n LEFT JOIN hr{i} r USING (id)),
ar{i} AS MATERIALIZED (SELECT e.dst AS id, sum(p.h) AS s
          FROM e JOIN h{i} p ON p.id = e.src GROUP BY e.dst),
a{i} AS MATERIALIZED (SELECT n.id, coalesce(r.s, 0.0) / (SELECT sum(s) FROM ar{i}) AS a
         FROM nodes n LEFT JOIN ar{i} r USING (id))"""
        )
    k = HITS_ITERS
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT h.id, round(h.h, 6) AS hub, round(a.a, 6) AS authority
FROM h{k} h JOIN a{k} a USING (id) ORDER BY h.id"""
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-supply projection: the bipartite trade
    graph is triangle-free by construction, so project it onto suppliers
    (edge weight = shared distinct customers) and keep the top-300
    strongest edges (deterministic tie-break) — the backbone-graph cut
    that stays meaningful at any SF where an absolute weight threshold
    would not. Ordered (lo, hi) orientation counts each triangle once
    via two equi-joins."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    sc = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    a, b = sc.alias("a"), sc.alias("b")
    proj = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count("*").alias("shared"))
        .orderBy(F.desc("shared"), "src", "dst")
        .limit(COSUPPLY_TOP_EDGES)
        .select("src", "dst")
    )
    tri = triangle_count(proj)
    edges = proj.agg(F.count("*").alias("n_edges"))
    return edges.crossJoin(tri).select("n_edges", "n_triangles")


SQL_GRAPH_TRIANGLES = f"""
WITH sc AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
proj AS (SELECT a.s AS src, b.s AS dst
         FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
         GROUP BY a.s, b.s
         ORDER BY count(*) DESC, a.s, b.s LIMIT {COSUPPLY_TOP_EDGES}),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM proj WHERE src <> dst),
tri AS (SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
          ON e3.a = e1.a AND e3.b = e2.b)
SELECT (SELECT count(*) FROM proj) AS n_edges, tri.n_triangles FROM tri
"""


def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation (operators/graph.
    label_propagation) over the big-ticket slice of the trade graph:
    after 3 rounds every node carries the smallest id within 3 hops, and
    the query reports the resulting label census (label, n_members).
    The static symmetrized edge list is materialized once and reused by
    all rounds — one hash join + groupBy(min) per round, the
    neighbor-step community primitive that beats pointer-jumping when
    the graph is huge and shallow. The oracle unrolls the identical
    3-round recurrence."""
    from spacetime_crawler4_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    edges = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("o_totalprice") > LP_EDGE_MIN_PRICE)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    labels = label_propagation(edges, iterations=LP_ITERS)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), "label")
    )


def _sql_graph_label_propagation() -> str:
    ctes = [
        f"""e AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > {LP_EDGE_MIN_PRICE})""",
        """sym AS (SELECT src AS a, dst AS b FROM e
       UNION SELECT dst, src FROM e)""",
        "l0 AS (SELECT DISTINCT a AS id, a AS lab FROM sym)",
    ]
    for i in range(1, LP_ITERS + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS (SELECT id, min(lab) AS lab FROM (
  SELECT id, lab FROM {p}
  UNION ALL
  SELECT s.b AS id, l.lab FROM sym s JOIN {p} l ON l.id = s.a
) GROUP BY id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT lab AS label, count(*) AS n_members FROM l{LP_ITERS}
GROUP BY lab ORDER BY n_members DESC, label"""
    )


# --------------------------------------------------------------------------
# OPIC adaptive page importance (session 14)
# --------------------------------------------------------------------------

OPIC_ITERS = 3


# --------------------------------------------------------------------------
# SALSA link analysis (session 14)
# --------------------------------------------------------------------------

SALSA_ITERS = 3
