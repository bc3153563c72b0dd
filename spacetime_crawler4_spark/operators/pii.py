"""PII detection and redaction for webtext corpora.

Standard pre-release scrub (emails, IPv4 addresses, phone-shaped numbers,
long digit runs — the categories every public-corpus pipeline masks, cf.
the BigScience ROOTS / The-Pile release checklists): detect with pure-JVM
``regexp_count`` and redact with chained ``regexp_replace``, all map-only
over the document row — zero shuffles at any scale, the whole scrub rides
inside one WholeStageCodegen projection.

Regex portability contract (same discipline as operators/webfilter.py):
every pattern is built from character classes + bounded quantifiers only —
no lookarounds, no backrefs — so Java regex (Spark) and RE2 (DuckDB)
accept the identical string and agree on every match. The DuckDB oracle
uses these exact patterns verbatim via ``PII_PATTERNS``.

Redaction order matters and is fixed: EMAIL before IP/PHONE/NUM (an email
local-part may contain digits), IP before NUM (an IP is four digit runs),
PHONE before NUM (a phone is a digit run with separators). The synthetic
test corpus carries no PII, so ``inject_pii`` deterministically plants
one instance of each category derived from the doc id — the same
arithmetic is inlined in the oracle SQL, making the detectors' true- and
false-positive behavior hash-checkable without any external data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category -> (pattern, replacement) in mandatory application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    ),
    (
        "longnum",
        r"[0-9]{12,19}",
        "<NUM>",
    ),
)


def inject_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically append one PII instance per category, derived
    from the doc id by integer arithmetic (portable to the SQL oracle
    verbatim). Only docs with id % 3 == 0 get the phone and only
    id % 4 == 0 the card-shaped number, so detector counts vary by row
    instead of being a constant the hash couldn't distinguish."""
    i = F.col(id_col).cast("long")

    def s(col: Column) -> Column:
        return col.cast("string")

    email = F.concat(
        F.lit("user"), s(i), F.lit("@ex"), s(i % 7), F.lit(".org")
    )
    ip = F.concat(
        F.lit("10."), s(i % 256), F.lit("."), s((i * 3) % 256),
        F.lit("."), s((i * 7) % 256),
    )
    phone = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" +1-"), s(800 + i % 200), F.lit("-555-"),
            F.lpad(s(i * 37 % 10000), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    card = F.when(
        i % 4 == 0, F.concat(F.lit(" 4"), F.lpad(s(i), 15, "0"))
    ).otherwise(F.lit(""))
    return df.withColumn(
        text_col,
        F.concat(
            F.col(text_col), F.lit(" contact "), email, F.lit(" from "), ip,
            phone, card,
        ),
    )


def pii_scan(text: Column) -> dict[str, Column]:
    """Per-category match counts, map-only."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact(text: Column) -> Column:
    """Apply every category's replacement in the fixed order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, n_longnum, n_pii, redacted_md5) —
    one map-only pass: counts from the raw text, then the redacted text
    folded to an md5 so the oracle hash-checks the exact redacted bytes
    without shipping them."""
    text = F.col(text_col)
    counts = pii_scan(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col).alias("id"),
        *[c.alias(name) for name, c in counts.items()],
        total.alias("n_pii"),
        F.md5(pii_redact(text)).alias("redacted_md5"),
    )
