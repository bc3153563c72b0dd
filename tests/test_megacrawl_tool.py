"""Shape math for tools/soak_megacrawl.py (no Spark: the soak itself is a
recorded one-off — BASELINE.md round-4 session 5 — this pins the corpus
sizing so a future run hits its page target)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from soak_megacrawl import _shape_for


def _pages(shape: dict) -> int:
    return shape["n_domains"] * (1 + shape["fanout"] * (1 + shape["leaves"]))


def test_shape_hits_target_within_rounding():
    for target in (20_000, 100_000, 500_000, 1_000_000, 2_000_000):
        shape = _shape_for(target)
        got = _pages(shape)
        # leaves rounds to the nearest integer: the error bound is half a
        # leaf tier = n_domains * fanout / 2 pages
        assert abs(got - target) <= shape["n_domains"] * shape["fanout"] / 2 + 1, (
            target,
            shape,
            got,
        )


def test_shape_always_valid():
    for target in (1, 1000, 10**7):
        shape = _shape_for(target)
        assert shape["leaves"] >= 1
        assert _pages(shape) > 0
