"""Webtext quality filtering — Gopher rules, C4 line cleaning, repetition.

The standard pre-training corpus filters, re-expressed as pure-JVM column
expressions (published heuristics: Gopher quality rules, Rae et al. 2021
appendix A1; C4 line filters, Raffel et al. 2020 §2.2). Everything here is
map-only over the document row except the repetition counters, which are
the same two-phase hash-aggregate shape as a word count (map-side partial
agg, one shuffle on (doc_id, gram)) — no windows, no Python.

Determinism/oracle notes: every ratio is one integer÷integer division
rounded to 6dp (no float fold-order hazards), and every regex sticks to
char classes + anchors so Java regex (Spark) and RE2 (DuckDB) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's required-stopword rule: a real English document contains at
# least GOPHER_MIN_STOP_HITS of these (Rae et al. 2021, A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _ratio6(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num.cast("double") / den, 6)).otherwise(
        F.lit(0.0)
    )


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality features + rule flags + keep verdict.

    Adds: n_words, mean_word_len, frac_alpha_words, n_stop_hits,
    symbol_ratio, frac_bullet_lines, frac_ellipsis_lines, the seven rule
    booleans, and ``gopher_keep`` (AND of all rules). One map-only pass:
    the word/line arrays are bound once in a single ``withColumns`` so
    Catalyst keeps the projection in one WholeStageCodegen span.
    """
    text = F.col(text_col)
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    n_symbols = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))

    out = df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": _ratio6(sum_word_len, n_words),
            "frac_alpha_words": _ratio6(n_alpha_words, n_words),
            "n_stop_hits": stop_hits,
            "symbol_ratio": _ratio6(n_symbols, n_words),
            "frac_bullet_lines": _ratio6(n_bullet, n_lines),
            "frac_ellipsis_lines": _ratio6(n_ellipsis, n_lines),
        }
    )
    flags = {
        "flag_word_count": (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000),
        "flag_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "flag_symbol_ratio": F.col("symbol_ratio") <= 0.1,
        "flag_bullet": F.col("frac_bullet_lines") <= 0.9,
        "flag_ellipsis": F.col("frac_ellipsis_lines") <= 0.3,
        "flag_alpha": F.col("frac_alpha_words") >= 0.8,
        "flag_stopwords": F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS,
    }
    out = out.withColumns(flags)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def c4_clean_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2), map-only.

    A line survives if it ends in terminal punctuation, has ≥3 words, and
    does not mention 'javascript' (case-insensitive); the whole document
    is dropped (``c4_keep`` false) if it contains 'lorem ipsum' or a
    curly brace. Adds n_lines, n_kept_lines, clean_text, clean_chars.
    """
    text = F.col(text_col)
    lines = _lines(text)
    kept = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike("[.!?\"']$")
        & (F.size(_words(l)) >= 3)
        & ~F.lower(l).contains("javascript"),
    )
    clean_text = F.array_join(kept, "\n")
    return df.withColumns(
        {
            "n_lines": F.size(lines),
            "n_kept_lines": F.size(kept),
            "clean_text": clean_text,
            "clean_chars": F.length(clean_text),
            "c4_keep": ~F.lower(text).contains("lorem ipsum")
            & ~text.contains("{"),
        }
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition counters (Rae et al. 2021, A1.2).

    Returns one row per doc_id: ``frac_dup_line_chars`` (characters inside
    lines that occur more than once in the document / total line chars) and
    ``frac_top_bigram_chars`` (characters covered by the single most
    frequent word bigram / total word chars).

    Shape at scale: explode → two-phase hash aggregate keyed (doc_id, gram)
    → per-doc max/sum — the exact word-count topology (partial aggregation
    map-side, one shuffle whose key includes doc_id, so no single reducer
    hot-spots however large the corpus; a skewed mega-doc only ever meets
    its own grams).
    """
    text = F.col(text_col)
    # duplicated-line chars
    line_rows = df.select(
        "doc_id", F.explode(_lines(text)).alias("line")
    ).filter(F.col("line") != "")
    per_line = line_rows.groupBy("doc_id", "line").agg(
        F.count("*").alias("cnt"), F.length(F.col("line")).alias("chars")
    )
    dup_lines = per_line.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("chars")).otherwise(0)
        ).alias("dup_chars"),
        F.sum(F.col("cnt") * F.col("chars")).alias("tot_chars"),
    )
    # top word-bigram coverage
    words = df.select("doc_id", _words(text).alias("ws"))
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array())
        ).alias("gram"),
    )
    per_gram = bigrams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    top_gram = per_gram.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("cnt"), (F.length("gram") * F.col("cnt")).alias("cov")
            )
        )["cov"].alias("top_bigram_chars")
    )
    word_chars = words.select(
        "doc_id",
        F.aggregate(F.col("ws"), F.lit(0), lambda a, w: a + F.length(w)).alias(
            "word_chars"
        ),
    )
    return (
        word_chars.join(dup_lines, "doc_id", "left")
        .join(top_gram, "doc_id", "left")
        .select(
            "doc_id",
            _ratio6(F.coalesce(F.col("dup_chars"), F.lit(0)), F.col("tot_chars")).alias(
                "frac_dup_line_chars"
            ),
            _ratio6(
                F.coalesce(F.col("top_bigram_chars"), F.lit(0)), F.col("word_chars")
            ).alias("frac_top_bigram_chars"),
        )
    )


GOPHER_FLAGS = (
    "flag_word_count",
    "flag_mean_word_len",
    "flag_symbol_ratio",
    "flag_bullet",
    "flag_ellipsis",
    "flag_alpha",
    "flag_stopwords",
)
HOST_BLOCK_MEAN_RULES = 0.79  # block a host whose mean rules-passed < this
DOC_GOOD_RULES = 0.8  # a doc individually "good" passes >= 80% of rules


def host_reputation(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Host-level reputation filtering (the UT1-blocklist / spam-domain
    aggregation every production crawl pipeline runs): per source host,
    the mean fraction of Gopher rules its documents pass; hosts under
    ``HOST_BLOCK_MEAN_RULES`` are blocked wholesale. ``n_good_docs_lost``
    counts the collateral — docs that individually pass >= 80% of rules
    but live on a blocked host (the quantity you monitor before turning
    a host blocklist on).

    Returns (source, n_docs, mean_rules, host_blocked, n_good_docs_lost).

    Scale shape: the per-doc rule flags are map-only column expressions
    (one WholeStageCodegen span); the reputation is ONE groupBy(source)
    with map-side partial aggregation. At 10^10 URLs the host dimension
    is ~10^7 rows — still a broadcastable dim after this aggregate,
    which is the point: the blocklist join back onto the corpus is a
    broadcast, never a shuffle of the corpus.
    """
    g = gopher_quality(df, text_col)
    score = sum(F.col(c).cast("int") for c in GOPHER_FLAGS) / F.lit(
        float(len(GOPHER_FLAGS))
    )
    per = g.select(
        F.col(source_col).alias("source"), F.round(score, 6).alias("doc_rules")
    )
    agg = per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("doc_rules"), 6).alias("mean_rules"),
        F.sum(
            (F.col("doc_rules") >= DOC_GOOD_RULES).cast("long")
        ).alias("n_good"),
    )
    blocked = F.col("mean_rules") < HOST_BLOCK_MEAN_RULES
    return agg.select(
        "source",
        "n_docs",
        "mean_rules",
        blocked.alias("host_blocked"),
        F.when(blocked, F.col("n_good"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_good_docs_lost"),
    )
