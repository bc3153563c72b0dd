"""Benchmark decontamination and incremental (batch-vs-corpus) dedup.

Two corpus-hygiene operators every pre-training pipeline runs before a
model ever sees the data:

- **decontamination** — flag training documents that overlap an evaluation
  benchmark by exact word-n-gram collision (the GPT-3 appendix-C /
  PaLM-style check: a document is contaminated when it shares >= a minimum
  number of n-grams with any benchmark doc). The benchmark side is tiny by
  nature (eval sets are thousands of rows, the corpus is billions), so the
  gram join is a **broadcast** — the corpus side never shuffles for the
  probe; the only shuffle is the per-doc aggregate keyed on doc id.

- **incremental dedup** — admit a new crawl batch against an existing
  corpus without re-deduping the world: MinHash band signatures on both
  sides (same family as ``dedup.minhash_band_sigs``), candidates from the
  band equi-join (batch x base, never base x base), exact-Jaccard verify
  on candidates only, then one left join turns the verdict into a
  keep/drop per batch doc. Cost scales with |batch| + colliding buckets,
  not |corpus|² — the property that makes rolling Common-Crawl ingestion
  feasible.

Both are pure JVM DataFrame compositions (no Python on any hot path), and
both are oracle-mirrored in DuckDB SQL (queries.py) gram-for-gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import (
    minhash_band_sigs,
    word_shingles,
)


def contamination_report(
    corpus_sh: DataFrame,
    bench_sh: DataFrame,
    min_hits: int = 2,
) -> DataFrame:
    """(id, n_grams, n_hit, hit_ratio, contaminated) per corpus document.

    ``corpus_sh`` / ``bench_sh`` are (id, shingle) frames (from
    ``word_shingles`` — already distinct per doc). The benchmark gram
    dictionary is deduped then **broadcast**, so the corpus side is probed
    map-side; the single shuffle is the groupBy(id) count, which the
    partial aggregate has already collapsed to one row per (id, partition).
    A doc is ``contaminated`` when it hits >= ``min_hits`` distinct
    benchmark grams (exact-collision rule; hit_ratio is reported so a
    threshold-based policy can reuse the same scan).
    """
    bench_grams = bench_sh.select("shingle").distinct()
    hits = corpus_sh.join(
        F.broadcast(bench_grams).withColumn("_hit", F.lit(1)),
        "shingle",
        "left",
    )
    return (
        hits.groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
        .select(
            "id",
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("hit_ratio"),
            (F.col("n_hit") >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 2,
) -> DataFrame:
    """Contamination report for ``corpus`` docs against ``bench`` docs,
    shingled at word-``n``-grams. Convenience wrapper over
    ``contamination_report`` using the shared SQL-portable tokenizer."""
    return contamination_report(
        word_shingles(corpus, id_col, text_col, n),
        word_shingles(bench, id_col, text_col, n),
        min_hits=min_hits,
    )


def incremental_dedup(
    base: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    r: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """(batch_id, dup_of, jaccard, keep) — admit/deny each batch doc
    against the existing corpus.

    MinHash band signatures (k hashes, bands of r — identical family and
    banding to ``dedup.minhash_band_sigs``, so candidates behave exactly
    like the intra-corpus LSH plane) are built for both sides; the
    candidate join is **batch x base only** keyed on (band_id, bsig) —
    the base never self-joins, and at production scale the base band
    table is a bucketed/sorted artifact reused across batches while only
    the (small) batch side is recomputed. Exact word-n-gram Jaccard
    verifies candidates; a batch doc is dropped (keep = false) when its
    best verified match reaches ``min_jaccard``. ``dup_of`` is the
    lowest-id best match (ties broken by id) for lineage, NULL for kept
    docs.
    """
    base_sh = word_shingles(base, id_col, text_col, n)
    batch_sh = word_shingles(batch, id_col, text_col, n)
    base_bands = minhash_band_sigs(base_sh, k, r)
    batch_bands = minhash_band_sigs(batch_sh, k, r)
    cand = (
        batch_bands.alias("q")
        .join(
            base_bands.alias("c"),
            (F.col("q.band_id") == F.col("c.band_id"))
            & (F.col("q.bsig") == F.col("c.bsig")),
        )
        .select(
            F.col("q.id").alias("batch_id"), F.col("c.id").alias("base_id")
        )
        .distinct()
    )
    bsz = base_sh.groupBy("id").agg(F.count("*").alias("sz"))
    qsz = batch_sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(batch_sh.alias("qs"), cand.batch_id == F.col("qs.id"))
        .join(
            base_sh.alias("cs"),
            (cand.base_id == F.col("cs.id"))
            & (F.col("qs.shingle") == F.col("cs.shingle")),
        )
        .groupBy("batch_id", "base_id")
        .agg(F.count("*").alias("inter"))
    )
    verified = (
        inter.join(
            F.broadcast(qsz.select(F.col("id").alias("batch_id"), F.col("sz").alias("sz_q"))),
            "batch_id",
        )
        .join(
            F.broadcast(bsz.select(F.col("id").alias("base_id"), F.col("sz").alias("sz_b"))),
            "base_id",
        )
        .select(
            "batch_id",
            "base_id",
            F.round(
                F.col("inter")
                / (F.col("sz_q") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    best = verified.groupBy("batch_id").agg(
        F.max_by(
            F.struct("base_id", "jaccard"),
            F.struct(F.col("jaccard"), -F.col("base_id")),
        ).alias("m")
    )
    return (
        batch.select(F.col(id_col).alias("batch_id"))
        .join(best, "batch_id", "left")
        .select(
            "batch_id",
            F.col("m.base_id").alias("dup_of"),
            F.col("m.jaccard").alias("jaccard"),
            F.col("m").isNull().alias("keep"),
        )
    )
