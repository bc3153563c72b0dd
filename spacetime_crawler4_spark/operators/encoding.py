"""Encoding-damage (mojibake) detection and repair for web-text corpora.

Real crawled text is full of UTF-8 bytes that some upstream system
decoded as Windows-1252 and re-emitted — the "cafÃ©" / "â€”" damage
class (what ftfy calls mojibake; the reference crawl never guards
against it because its corpus is served pre-decoded). At 100 TB this
must be a MAP-ONLY plane: a cheap JVM-side signature predicate gates an
Arrow-batched repair UDF (the cp1252→utf-8 round-trip); no shuffle, no
driver traffic, parquet column pruning untouched.

Because the sandbox corpus is clean ASCII, correctness is evidenced the
same way the PII plane does it (operators/pii.py): a DETERMINISTIC
INJECTION AUDIT. A fixed md5-keyed subset of documents gets a known
mojibake phrase appended; the detector and repairer then run over the
whole corpus, and the audit reports, per source: docs, injected,
detected, and repaired-byte-exact counts. The DuckDB oracle re-derives
the same subset from the md5 key and verifies the repair independently
(string replace of the damaged phrase), so detector recall AND repair
byte-fidelity are both oracle-checked, not asserted.

Repair semantics (the ftfy core move, re-derived): a string whose chars
all fit Windows-1252 is re-encoded through cp1252 and re-decoded as
UTF-8; if that fails (it wasn't double-encoded after all) the input is
returned unchanged. Pure per-row function — retry/AQE deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from spacetime_crawler4_spark.operators.sampling import sample_bucket

# the injected damage: one phrase covering the two dominant signature
# families (Ã+letter from C3-prefixed two-byte sequences, â€+punct from
# E2-80-prefixed three-byte sequences)
MOJI_PHRASE = "café déjà vu — naïve résumé"
MOJI_DAMAGED = MOJI_PHRASE.encode("utf-8").decode("cp1252")
# injection subset: md5-keyed 7% of doc ids (salt 'moji:'), oracle-portable
MOJI_PCT_BUCKETS = 70_000  # of sampling.HASH_BUCKETS (1e6) -> 7%

_SIGNATURES = ("Ã©", "Ã¯", "Ã¨", "Ã¼", "â€", "Â·")


def moji_detect_col(text: Column) -> Column:
    """JVM-side mojibake signature predicate (no UDF): true when the text
    contains any of the high-precision double-encoding digraphs. These
    literals are near-impossible in intentional text (Ã directly followed
    by a Latin-1 symbol char) — the standard cheap gate before paying for
    the repair round-trip."""
    pred = F.contains(text, F.lit(_SIGNATURES[0]))
    for s in _SIGNATURES[1:]:
        pred = pred | F.contains(text, F.lit(s))
    return pred


@pandas_udf(StringType())
def repair_mojibake_udf(texts: pd.Series) -> pd.Series:
    """cp1252→utf-8 round-trip repair, Arrow-batched (§2.10: never
    row-at-a-time Python). Returns the input unchanged when the
    round-trip is impossible (chars outside cp1252) or produces invalid
    UTF-8 (the text was not double-encoded)."""

    def _fix(s: str) -> str:
        if s is None:
            return s
        try:
            return s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s

    return texts.map(_fix)


def moji_inject(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic damage injection: the md5-keyed 7% of rows get the
    damaged phrase appended to ``text_col`` (new column ``damaged``),
    plus the ``injected`` ground-truth flag. Same hash family as the
    sampling plane, so task retries and the oracle agree row-for-row."""
    injected = sample_bucket(F.col(id_col), "moji:") < MOJI_PCT_BUCKETS
    return df.withColumn("injected", injected).withColumn(
        "damaged",
        F.when(
            injected, F.concat(F.col(text_col), F.lit(" " + MOJI_DAMAGED))
        ).otherwise(F.col(text_col)),
    )


def moji_audit(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-``group_col`` inject→detect→repair audit.

    Columns: n_docs, n_injected, n_detected (signature predicate over
    the damaged text), n_repaired_ok (repair output byte-equal to the
    pristine text + the correctly-decoded phrase). On a clean corpus
    detector precision is visible as n_detected == n_injected and repair
    fidelity as n_repaired_ok == n_injected."""
    d = moji_inject(df, id_col, text_col)
    detected = moji_detect_col(F.col("damaged"))
    repaired = F.when(detected, repair_mojibake_udf(F.col("damaged"))).otherwise(
        F.col("damaged")
    )
    expected = F.concat(F.col(text_col), F.lit(" " + MOJI_PHRASE))
    return (
        d.select(
            F.col(group_col),
            F.col("injected"),
            detected.alias("detected"),
            (detected & (repaired == expected)).alias("repaired_ok"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("injected").cast("long")).alias("n_injected"),
            F.sum(F.col("detected").cast("long")).alias("n_detected"),
            F.sum(F.col("repaired_ok").cast("long")).alias("n_repaired_ok"),
        )
        .orderBy(group_col)
    )
