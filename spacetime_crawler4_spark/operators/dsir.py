"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pretraining documents from a raw pool so the
selected set's hashed-n-gram distribution matches a small target corpus.

The published recipe, re-expressed relationally:

1. featurize every document as counts over ``n_buckets`` HASHED n-gram
   buckets (unigrams + bigrams, as in the paper's default);
2. fit bag-of-buckets models ``p`` on the target slice and ``q`` on the
   raw pool (add-``alpha`` smoothing over the bucket space);
3. per-document log importance weight
   ``log w(d) = sum_b c_b(d) * (log p_b - log q_b)``;
4. resample: the paper adds Gumbel noise before the top-k; this engine's
   deterministic variant ranks by the weight itself (plus doc-id
   tie-break) so task retries, re-runs, and the DuckDB oracle pick the
   identical set — swap in ``exp_sort_key``-style md5 noise from
   operators/sampling.py for the stochastic form.

Scale shape (the reason DSIR beats classifier-based selection at 100 TB):
everything is one explode + two aggregations. The bucket-ratio model is
``n_buckets`` rows — broadcast by construction — so scoring the pool is a
map-side broadcast join + one groupBy(doc) shuffle; no per-row Python
anywhere. The hash is the md5-portable family from operators/sampling.py,
so a DuckDB oracle reproduces bucket assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import sql_tokens

DSIR_BUCKETS = 4096  # hashed feature space (paper uses 10^4; 2^12 keeps
# the oracle's 24-bit md5 prefix wrap exactly uniform: 16777216 = 4096*4096)
DSIR_ALPHA = 1.0  # add-alpha smoothing mass per bucket
_SALT = "dsir"


def dsir_bucket(gram: Column, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Deterministic hashed-n-gram bucket in [0, n_buckets) — the
    oracle-portable md5 form (see operators/sampling.py:sample_bucket):
    DuckDB computes the identical value as
    ``CAST('0x' || substr(md5('dsir' || gram), 1, 6) AS INTEGER) % n``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(_SALT), gram)), 1, 6), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def _doc_grams(
    docs: DataFrame, id_col: str, text_col: str, extra_cols: list[str]
) -> DataFrame:
    """(id, [extra...], gram): unigrams + space-joined bigrams, one explode.
    Bigrams via zip_with over a shifted slice — linear per document (same
    anti-quadratic construction as operators/dedup.word_shingles)."""
    toks = sql_tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(id, n_grams, dsir_logw): per-document DSIR log importance weight.

    ``target_pred`` marks the rows whose distribution the selection should
    match (the paper's 'target corpus'); the pool model ``q`` is fit on
    every row. One explode, two bucket aggregations (map-side partials),
    a broadcast model join, one groupBy(id) — nothing wider than the
    corpus token stream itself.
    """
    grams = _doc_grams(
        docs.withColumn("_is_tgt", target_pred), id_col, text_col, ["_is_tgt"]
    ).withColumn("b", dsir_bucket(F.col("gram"), n_buckets))
    # per-doc bucket counts (the c_b(d) vector, sparse)
    doc_counts = grams.groupBy("id", "b").agg(F.count("*").alias("c"))
    # pool + target bucket totals in ONE aggregation pass over the token
    # stream; <= n_buckets rows, cached so the scalar totals and the ratio
    # model both come from the single materialization
    totals = grams.groupBy("b").agg(
        F.count("*").alias("cs"),
        F.sum(F.col("_is_tgt").cast("long")).alias("ct"),
    ).cache()
    tot = totals.agg(
        F.sum("cs").alias("ns"), F.sum("ct").alias("nt")
    ).first()
    denom_t = float(tot["nt"] or 0) + alpha * n_buckets
    denom_s = float(tot["ns"] or 0) + alpha * n_buckets
    ratios = totals.select(
        "b",
        (
            F.log((F.col("ct") + F.lit(alpha)) / F.lit(denom_t))
            - F.log((F.col("cs") + F.lit(alpha)) / F.lit(denom_s))
        ).alias("r"),
    )
    # every doc bucket is present in the pool totals by construction
    return (
        doc_counts.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("r")).alias("dsir_logw"),
        )
    )


def dsir_select_topk(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    round_dp: int = 4,
) -> DataFrame:
    """Deterministic DSIR selection: top-``k`` documents by rounded log
    importance weight (ties by id). Rounding BEFORE ranking makes the
    cut engine-portable: both engines rank the identical rounded values,
    so a last-ulp float-summation difference cannot flip the boundary."""
    w = dsir_logweights(docs, target_pred, id_col, text_col, n_buckets, alpha)
    scored = w.select(
        F.col("id").alias(id_col),
        "n_grams",
        F.round("dsir_logw", round_dp).alias("dsir_logw"),
    )
    return scored.orderBy(F.desc("dsir_logw"), F.asc(id_col)).limit(k)
