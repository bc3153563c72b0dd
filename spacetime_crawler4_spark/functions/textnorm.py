"""Stopword / contraction predicates.

Word lists vendored verbatim from the reference's ``rsrc/stopwords.txt``
(174 entries) and ``rsrc/contractions.txt`` (147 entries; lines starting
with ``-`` are generic suffix patterns) — see reference
helpers/stopwords_set.py:6-23 and helpers/contra_set.py:6-38 for the
semantics these predicates must match. The sets are module-level frozensets
captured by closure into the tokenize pandas UDF (broadcast with the Python
worker, no per-row I/O).
"""

from __future__ import annotations

from importlib import resources as _res

_PKG = "spacetime_crawler4_spark.resources"


def _load_lines(name: str) -> list[str]:
    text = _res.files(_PKG).joinpath(name).read_text(encoding="utf-8")
    return [ln.strip() for ln in text.splitlines() if ln.strip()]


STOPWORDS_SET: frozenset[str] = frozenset(_load_lines("stopwords.txt"))

_contra_lines = _load_lines("contractions.txt")
CONTRA_SET: frozenset[str] = frozenset(w for w in _contra_lines if not w.startswith("-"))
# generic contraction suffixes: a token ending with any of these is a
# contraction regardless of its stem (reference contra_set.py:20-23)
GENERIC_CONTRA_SUFFIXES: tuple[str, ...] = tuple(
    w[1:] for w in _contra_lines if w.startswith("-")
)


def is_stopword(word: str) -> bool:
    """Reference helpers/stopwords_set.py:14-23."""
    return word in STOPWORDS_SET


def is_contraction(word: str) -> bool:
    """Reference helpers/contra_set.py:25-38: exact member or generic suffix."""
    if word in CONTRA_SET:
        return True
    return word.endswith(GENERIC_CONTRA_SUFFIXES)
