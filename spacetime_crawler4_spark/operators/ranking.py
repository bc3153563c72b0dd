"""Relevance ranking over the corpus-analytics token plane: TF-IDF and
Okapi BM25 — the retrieval-side counterpart of the dedup/quality suite
(a training-data pipeline uses these for query-based corpus slicing and
boosted sampling).

Shuffle shape at 100 TB: one explode + one (doc, term) partial-aggregated
shuffle for term frequencies, one tiny per-term aggregate for document
frequencies (|query| rows — broadcast back), one single-row corpus-stats
aggregate (broadcast). The scoring join touches only docs containing a
query term (inner join on the tf table), so the big side is filtered
before any wide operation. All arithmetic is JVM column expressions —
shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.dedup import sql_tokens


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(id_col, F.explode(sql_tokens(F.col(text_col))).alias("term"))


def bm25_idf(n_docs: Column, df: Column) -> Column:
    """Lucene-shape BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return F.log(F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Okapi BM25 score against a bag of query terms.

    score(d) = sum over t in query of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Only documents containing at least one query term appear (score > 0
    everywhere by construction). Scalar corpus stats (N, avgdl) ride a
    broadcast single-row cross join; per-term document frequencies are a
    |query|-row broadcast. Nothing but the (doc, term) tf aggregate
    shuffles the corpus.
    """
    terms = _doc_terms(docs, id_col, text_col)
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "s",
            bm25_idf(F.col("n_docs"), F.col("df"))
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("s").alias("bm25"))


def tfidf_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic tf-idf (ln-scaled tf, smoothed idf) summed over the query
    bag: sum_t (1 + ln tf) * ln(N / (1 + df))."""
    terms = _doc_terms(docs, id_col, text_col)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    tf = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "s",
            (F.lit(1.0) + F.log(F.col("tf")))
            * F.log(F.col("n_docs") / (F.lit(1.0) + F.col("df"))),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("s").alias("tfidf"))


def conjunctive_search(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index conjunctive (AND) retrieval: documents containing
    EVERY query term, ranked by BM25, top-k. The AND set is the posting
    intersection — here a groupBy over the (doc, matched-term) tf rows
    with HAVING count == |query| (tf already has one row per matched
    term), so intersection costs nothing beyond the tf aggregate BM25
    needs anyway. At index scale the per-term posting lists are the
    partitioned dimension; the intersection is a count aggregate, never
    a multi-way self-join."""
    scores = bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col)
    terms = _doc_terms(docs, id_col, text_col)
    matched = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col)
        .agg(F.count_distinct("term").alias("nm"))
        .filter(F.col("nm") == len(query_terms))
        .select(id_col)
    )
    return (
        scores.join(matched, id_col)
        .select(id_col, F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_k)
    )


def phrase_search(
    docs: DataFrame,
    phrase: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional-index phrase retrieval: documents containing the exact
    token sequence ``phrase``, with occurrence count and first match
    position. The classic positional posting-list intersect (Manning,
    IIR §2.4): the posting list of term i is aligned to the phrase start
    by subtracting i from its positions, then all k lists intersect on
    (doc, start-pos).

    Returns (id_col, n_matches, first_pos) ordered by id.

    Scale shape: each join side is a SINGLE term's postings (explode +
    term filter pushed against the token stream — the selective filter
    runs before any wide operation), and the k-1 intersects are keyed
    equi-joins on (doc, aligned-pos), so skew is bounded by the hottest
    single term. A production deployment materializes the positional
    index (doc, term, pos) once as a bucketed table and every phrase
    query reuses it; here the index is built inline from the corpus.
    """
    if len(phrase) < 1:
        raise ValueError("phrase_search: need at least one term")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(sql_tokens(F.col(text_col))).alias("pos", "term"),
    )
    base = toks.filter(F.col("term") == phrase[0]).select("id", "pos")
    for i, t in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("term") == t).select(
            "id", (F.col("pos") - i).alias("pos")
        )
        base = base.join(nxt, ["id", "pos"])
    return (
        base.groupBy("id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .select(F.col("id").alias(id_col), "n_matches", "first_pos")
        .orderBy(id_col)
    )
