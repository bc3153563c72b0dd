"""Deterministic sampling operators for training-corpus pipelines.

Sampling at 100 TB must be two things the naive ``df.sample()`` is not:

- **map-only** — a pure filter that composes with parquet column pruning
  and never shuffles; and
- **retry-deterministic** — ``rand()``-based Bernoulli re-rolls when a
  task is re-executed after an executor loss (Spark recomputes lost
  partitions from lineage), silently changing the sample between
  attempts of the *same job*. Hashing a stable row key instead makes
  every keep/drop decision a pure function of the data: task retries,
  AQE re-plans, speculative duplicates, and whole re-runs all agree,
  and a downstream engine (the DuckDB oracles here) can re-derive the
  exact sample from the key alone.

Hash family: the first 24 bits of ``md5(salt || key)`` → a bucket in
[0, HASH_BUCKETS). md5 is computed identically by Spark's JVM built-in
and DuckDB, so the oracle reproduces the sample bit-for-bit. The 2^24
space maps onto 10^6 buckets with a wrap (16.77×), a ≤0.5% per-bucket
density ripple — irrelevant for sampling, and exactly mirrored by the
oracle. ``salt`` decorrelates independent samples drawn from the same
key (a 10% sample and an 80/20 split must not be nested by accident).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, HASH_BUCKETS) from a row key.

    Oracle-portable form: DuckDB computes the identical value as
    ``CAST('0x' || substr(md5(salt || CAST(key AS VARCHAR)), 1, 6) AS
    INTEGER) % 1000000``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6), 16, 10
    )
    return F.pmod(h.cast("long"), F.lit(HASH_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    Map-only: one md5 + compare per row, no shuffle, column pruning
    untouched. The same (key, salt) is kept or dropped identically on
    every run at every scale — growing the corpus never flips the
    decision for an existing row (the property incremental pipelines
    rely on to keep yesterday's sample a subset of today's).
    """
    thr = int(round(rate * HASH_BUCKETS))
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing primitive.

    ``rates`` maps stratum value → keep probability (e.g. downsample the
    head language, keep the tail at 1.0). The rate table rides along as a
    literal map expression (broadcast by construction, never a join);
    strata missing from ``rates`` fall back to ``default_rate``. Still
    map-only: threshold lookup + one md5 per row.
    """
    thr_map = F.create_map(
        *[
            x
            for s, r in sorted(rates.items())
            for x in (F.lit(s), F.lit(int(round(r * HASH_BUCKETS))))
        ]
    )
    thr = F.coalesce(
        thr_map[F.col(stratum_col)],
        F.lit(int(round(default_rate * HASH_BUCKETS))),
    )
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float, salt: str = "split"
) -> DataFrame:
    """Adds a deterministic ``split`` column ('test' | 'train').

    Keyed on the row key so the assignment is stable across runs and
    engines — a document can never leak from train to test because a
    cluster resize re-partitioned the data.
    """
    thr = int(round(test_frac * HASH_BUCKETS))
    return df.withColumn(
        "split",
        F.when(sample_bucket(F.col(key_col), salt) < thr, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


WEIGHTED_HEX = 13  # 52 bits of md5 -> uniform in (0, 1], double-exact


def exp_sort_key(key: Column, weight: Column, salt: str = "w") -> Column:
    """Efraimidis-Spirakis (2006) weighted-sampling sort key:
    k = -ln(u) / w with u a DETERMINISTIC md5 uniform in (0, 1] — the
    top-k rows by ASCENDING k are a weighted sample without replacement,
    exactly as if drawn sequentially with probability proportional to
    weight. Same retry-determinism argument as ``sample_bucket``:
    every decision is a pure function of (key, salt), so task retries
    and the DuckDB oracle reproduce the identical sample.

    u = (slice of md5 + 1) / 16^13: +1 keeps u > 0 (ln(0) guard) and the
    13-hex slice is 52 bits, inside a double's exact-integer range on
    both engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, WEIGHTED_HEX),
        16,
        10,
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(16 ** WEIGHTED_HEX))
    return -F.log(u) / weight


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "w",
) -> DataFrame:
    """Top-``k`` weighted sample without replacement (A-Res): rows with
    the k smallest exponential sort keys. Map-only key computation +
    TakeOrderedAndProject — no shuffle of the corpus, the global top-k
    merges per-partition heaps. The standard data-mixing primitive
    (sample documents proportional to length/quality weight)."""
    return (
        df.withColumn("_esk", exp_sort_key(F.col(key_col), F.col(weight_col), salt))
        .orderBy("_esk", key_col)
        .limit(k)
        .drop("_esk")
    )


def source_mixture_weights(
    docs: DataFrame,
    shard_col: str = "source",
    text_col: str = "text",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Domain-mixture reweighting (the DoReMi / The Pile recipe distilled
    to its deterministic core): compare each source's share of the token
    budget against a target mixture and emit the sampling weight that
    reshapes the corpus toward the target.

    (source, n_docs, n_toks, share, target_share, weight) — weight =
    target_share / share; a downstream Bernoulli pass keeps each doc
    with probability min(1, weight * global_rate) or repeats it
    ceil(weight) times for up-sampled domains. ``target`` maps source ->
    desired share (need not sum to 1; it is normalized); default is the
    uniform mixture over observed sources.

    Scale shape: one partial-aggregated groupBy over (source); the
    per-source table is tiny (domains << docs) and every ratio derives
    from exact BIGINT token counts, so Spark and a SQL oracle agree
    bit-for-bit before rounding.
    """
    from spacetime_crawler4_spark.operators.dedup import sql_tokens

    per = (
        docs.select(
            F.col(shard_col).alias("source"),
            F.size(sql_tokens(F.col(text_col))).cast("bigint").alias("n"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_toks"))
    )
    totals = per.agg(
        F.sum("n_toks").alias("_total"), F.count("*").alias("_n_sources")
    )
    per = per.crossJoin(F.broadcast(totals))
    if target is None:
        target_share = F.lit(1.0) / F.col("_n_sources")
    else:
        z = sum(target.values())
        mapping = F.create_map(
            *[x for k, v in sorted(target.items()) for x in (F.lit(k), F.lit(v / z))]
        )
        target_share = F.coalesce(mapping[F.col("source")], F.lit(0.0))
    share = F.col("n_toks") / F.col("_total")
    return per.select(
        "source",
        "n_docs",
        "n_toks",
        F.round(share, 6).alias("share"),
        F.round(target_share, 6).alias("target_share"),
        F.round(target_share / share, 6).alias("weight"),
    )


def temperature_mixture(
    docs: DataFrame,
    shard_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled sampling mixture (the mT5/XLM-R recipe,
    arXiv:1910.10683 §3.4.2 / arXiv:1911.02116 §3): the sampling share
    of group i becomes p_i^alpha / sum_j p_j^alpha, flattening the head
    and boosting the tail (alpha=1 keeps the natural mixture, alpha=0 is
    uniform). The complement of source_mixture_weights' explicit-target
    form — here the target derives from the observed shares themselves.

    (group, n_docs, n_toks, share, temp_share, boost) — boost =
    temp_share / share, the per-group up/down-sampling factor a
    Bernoulli or repetition pass applies downstream.

    Scale shape: ONE partial-aggregated groupBy over the group key plus
    a 1-row broadcast of the two normalizers; shares derive from exact
    BIGINT token counts, rounding only at the emitted columns.
    """
    from spacetime_crawler4_spark.operators.dedup import sql_tokens

    per = (
        docs.select(
            F.col(shard_col).alias("grp"),
            F.size(sql_tokens(F.col(text_col))).cast("bigint").alias("n"),
        )
        .groupBy("grp")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_toks"))
    )
    share = F.col("n_toks") / F.col("_total")
    totals = per.agg(F.sum("n_toks").alias("_total"))
    powed = per.crossJoin(F.broadcast(totals)).withColumn(
        "_p_alpha", F.pow(share, F.lit(alpha))
    )
    z = powed.agg(F.sum("_p_alpha").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            F.col("grp").alias(shard_col),
            "n_docs",
            "n_toks",
            F.round(share, 6).alias("share"),
            F.round(F.col("_p_alpha") / F.col("_z"), 6).alias("temp_share"),
            F.round((F.col("_p_alpha") / F.col("_z")) / share, 6).alias("boost"),
        )
    )
