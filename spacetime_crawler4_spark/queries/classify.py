"""Classifier-plane queries: bit-reproducible logistic regression.

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

from ._shared import _DUCK_TOKS, _stopwords, _t  # noqa: F401



LR_FEATURES = ("n_tok", "n_stop", "n_chars")
# per-weight step sizes (bias first) — exact binary AND decimal literals,
# the deterministic stand-in for feature normalization (the three integer
# features differ ~50x in spread; see operators/classify.logreg_train_gd)
LR_RATES = (0.25, 2**-10, 2**-6, 2**-13)
LR_ITERS = 4


def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sw = _stopwords()
    tf = (
        docs.select("doc_id", F.explode(sql_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(F.col("term").isin(sw).cast("long")).alias("n_stop"),
        )
    )
    return (
        docs.select(
            "doc_id", "n_chars", (F.col("lang") == "en").cast("int").alias("y")
        )
        .join(tf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("n_stop", F.lit(0)).alias("n_stop"),
            "n_chars",
            "y",
        )
    )


def _lr_fit(spark: SparkSession, sf_dir: str):
    """Shared fit: centered integer features (exact integer means) + the
    weights after LR_ITERS deterministic GD iterations."""
    from spacetime_crawler4_spark.operators.classify import logreg_train_gd

    raw = _lr_features(spark, sf_dir).localCheckpoint(eager=True)
    tot = raw.agg(
        *[F.sum(c).alias(c) for c in LR_FEATURES], F.count("*").alias("n")
    ).collect()[0]
    means = {c: int(tot[c]) // int(tot["n"]) for c in LR_FEATURES}
    feats = raw.select(
        "doc_id",
        *[(F.col(c) - F.lit(means[c])).alias(c) for c in LR_FEATURES],
        "y",
    ).localCheckpoint(eager=True)
    w, _n = logreg_train_gd(
        feats, list(LR_FEATURES), "y", LR_ITERS, list(LR_RATES)
    )
    return feats, w


def q_classify_lr_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-reproducible logistic-regression training (operators/classify.
    logreg_train_gd): 2 full-batch GD iterations predicting lang='en'
    from integer shape features (token count, stopword count, chars).
    Features are centered by their exact integer means (one tiny
    aggregate to the driver) so the bias can learn the class prior.
    Each iteration is ONE map-side-combined aggregation producing d+1
    numbers; gradients are summed in exact BIGINT space (fixed-point
    sigmoid), so the learned weights are identical under any
    partitioning/retry and in the oracle's unrolled four-iteration CTE.
    Output: the fitted weights plus training accuracy of sign(w·x)."""
    from spacetime_crawler4_spark.operators.classify import logreg_decision_col

    feats, w = _lr_fit(spark, sf_dir)
    z = logreg_decision_col(w, list(LR_FEATURES))
    acc = feats.agg(
        F.round(
            F.avg(((z >= 0).cast("int") == F.col("y")).cast("double")), 6
        ).alias("value")
    ).select(F.lit("accuracy").alias("term"), "value")
    weights = spark.createDataFrame(
        [("bias",), ("w_n_tok",), ("w_n_stop",), ("w_n_chars",)], ["term"]
    ).withColumn(
        "value",
        F.when(F.col("term") == "bias", F.round(F.lit(w[0]), 8))
        .when(F.col("term") == "w_n_tok", F.round(F.lit(w[1]), 8))
        .when(F.col("term") == "w_n_stop", F.round(F.lit(w[2]), 8))
        .otherwise(F.round(F.lit(w[3]), 8)),
    )
    return weights.unionByName(acc).orderBy("term")


def q_classify_lr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply: the fitted LR of classify_lr_weights applied as a
    per-document admission gate — (doc_id, score, admitted). The model
    is d+1 driver floats folded back in as column literals, so applying
    it is MAP-ONLY (no join, no broadcast table, survives any
    partitioning); this is the shape a quality-classifier gate takes
    inside the admission pipeline at 100 TB. The oracle re-derives the
    identical weights through the unrolled training CTEs and scores
    every doc with the same fixed-order dot product."""
    from spacetime_crawler4_spark.operators.classify import logreg_decision_col

    feats, w = _lr_fit(spark, sf_dir)
    z = logreg_decision_col(w, list(LR_FEATURES))
    return feats.select(
        "doc_id",
        F.round(z, 6).alias("score"),
        (z >= 0).alias("admitted"),
    ).orderBy("doc_id")


def _classify_lr_cte_chain() -> tuple[list[str], str]:
    """Shared oracle CTE chain: tokenize → features → integer-mean
    centering → LR_ITERS unrolled GD iterations → zf (per-doc decision
    value under the final weights). Returns (ctes, final_weights_cte)."""
    sw_vals = ", ".join(
        "('{}')".format(w.replace("'", "''")) for w in _stopwords()
    )
    scale = 1_000_000
    feat = list(LR_FEATURES)
    nw = len(feat) + 1
    # step-size literals: repr() of the exact binary floats, CAST to
    # DOUBLE (DuckDB parses bare numeric literals as DECIMAL — the
    # session-11 rounding-divergence class)
    lrs = [f"CAST({r!r} AS DOUBLE)" for r in LR_RATES]

    def zexpr(wpfx: str) -> str:
        z = f"{wpfx}_0"
        for j, c in enumerate(feat):
            z += f" + {wpfx}_{j + 1} * {c}"
        return z

    ctes = [
        f"sw(w) AS (VALUES {sw_vals})",
        f"tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)",
        """tf AS (SELECT doc_id, count(*) AS n_tok,
              CAST(sum(CASE WHEN term IN (SELECT w FROM sw) THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_stop
       FROM tok GROUP BY doc_id)""",
        """feats0 AS (SELECT d.doc_id, coalesce(t.n_tok, 0) AS n_tok,
                 coalesce(t.n_stop, 0) AS n_stop, d.n_chars,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents d LEFT JOIN tf t USING (doc_id))""",
        "m AS (SELECT "
        + ", ".join(f"sum({c}) // count(*) AS m_{c}" for c in feat)
        + ", count(*) AS c FROM feats0)",
        "feats AS (SELECT doc_id, "
        + ", ".join(f"{c} - (SELECT m_{c} FROM m) AS {c}" for c in feat)
        + ", y FROM feats0)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS DOUBLE) AS w0_{j}" for j in range(nw))
        + ")",
    ]
    for i in range(1, LR_ITERS + 1):
        p = f"w{i - 1}"
        ctes.append(
            f"z{i} AS (SELECT f.*, {zexpr(p)} AS z FROM feats f, {p})"
        )
        ctes.append(
            f"p{i} AS (SELECT *, CAST(floor({scale}.0 / (1.0 + exp(-z)) + 0.5)"
            f" AS BIGINT) AS p6 FROM z{i})"
        )
        gterms = [f"sum(p6 - {scale} * y) AS g_0"] + [
            f"sum((p6 - {scale} * y) * {c}) AS g_{j + 1}"
            for j, c in enumerate(feat)
        ]
        ctes.append(f"g{i} AS (SELECT {', '.join(gterms)} FROM p{i})")
        upd = ", ".join(
            f"{p}_{j} - ({lrs[j]} * g_{j}) / (c * CAST({scale} AS DOUBLE))"
            f" AS w{i}_{j}"
            for j in range(nw)
        )
        ctes.append(f"w{i} AS (SELECT {upd} FROM g{i}, {p}, m)")
    wf = f"w{LR_ITERS}"
    ctes.append(
        f"zf AS (SELECT f.*, {zexpr(wf)} AS z FROM feats f, {wf})"
    )
    return ctes, wf


def _sql_classify_lr() -> str:
    ctes, wf = _classify_lr_cte_chain()
    ctes = ctes + [
        """acc AS (SELECT round(avg(CASE WHEN (CASE WHEN z >= 0 THEN 1 ELSE 0
                     END) = y THEN 1.0 ELSE 0.0 END), 6) AS value FROM zf)"""
    ]
    rows = ["SELECT 'accuracy' AS term, value FROM acc"] + [
        f"SELECT '{t}', round({wf}_{j}, 8) FROM {wf}"
        for j, t in enumerate(["bias", "w_n_tok", "w_n_stop", "w_n_chars"])
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(rows)
        + "\nORDER BY term"
    )


def _sql_classify_lr_gate() -> str:
    ctes, _wf = _classify_lr_cte_chain()
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT doc_id, round(z, 6) AS score, z >= 0 AS admitted"
        + "\nFROM zf ORDER BY doc_id"
    )
