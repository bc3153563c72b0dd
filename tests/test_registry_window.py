"""Correctness-window invariant: the driver certifies the FIRST 50
registry entries per round. Every query that has never received a green
driver CORRECTNESS row must therefore sit inside that window — a query
appended past position 50 would ship without driver certification
(VERDICT r3 #1). Queries already green in a prior round may rotate out
(their local DuckDB-oracle gate still applies every run)."""

import json
from pathlib import Path

WINDOW = 50
_REPO = Path(__file__).resolve().parent.parent


def _driver_green() -> set[str]:
    names: set[str] = set()
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                names.add(name)
    return names


def test_never_driver_checked_queries_lead_the_registry():
    """Never-checked BASE queries must all sit inside the window; staged
    queries that did not fit (the registry has grown past the cumulative
    certification capacity) trail at the END, behind every driver-green
    query — visible as queries()/oracle_sql() surface, never displacing
    a certifiable slot."""
    from spacetime_crawler4_spark.queries import pending_registry, registry

    order = list(registry())
    green = _driver_green()
    pending = set(pending_registry())
    never = [n for n in order if n not in green and n not in pending]
    outside = [n for n in never if n not in order[: WINDOW]]
    assert not outside, (
        f"{len(outside)} never-driver-checked queries sit past position "
        f"{WINDOW} and would ship uncertified: {outside}"
    )
    # still-pending staged entries trail the green tail, in staging order
    n_pending = len(pending)
    assert order[len(order) - n_pending :] == [
        n for n in order if n in pending
    ], "pending staged queries must trail the registry"


def test_every_registry_query_has_an_oracle_or_is_marked():
    """Each entry pairs a Spark callable with oracle SQL (None is allowed
    only for genuinely non-SQL-expressible ops; today there are none)."""
    from spacetime_crawler4_spark.queries import pending_registry, registry

    for name, (fn, sql) in {**registry(), **pending_registry()}.items():
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and "SELECT" in sql.upper()), name


def test_pending_registry_does_not_shadow_base_names():
    """Staged queries (future window candidates) must not shadow a BASE
    query name — the rotation moves them into leading slots wholesale,
    and a duplicate name would silently drop one definition in the
    merged registry()."""
    from spacetime_crawler4_spark.queries import (
        _base_registry,
        _staged_registry,
        pending_registry,
        registry,
    )

    overlap = set(_staged_registry()) & set(_base_registry())
    assert not overlap, f"staged queries shadow base names: {sorted(overlap)}"
    # and registry() exposes the full surface exactly once
    full = set(_base_registry()) | set(_staged_registry())
    assert set(registry()) == full
    assert set(pending_registry()) <= set(_staged_registry())


def test_promotion_rule_pure():
    from spacetime_crawler4_spark.queries import _promotion

    base = [f"b{i}" for i in range(6)]
    staged = ["s0", "s1", "s2"]
    # no green history: window = base never-checked, nothing promotes
    order, still = _promotion(base, staged, frozenset(), window=5)
    assert order == base and still == staged
    # partial green: freed slots promote staged IN ORDER, greens trail
    order, still = _promotion(base, staged, frozenset({"b1", "b4"}), window=5)
    assert order == ["b0", "b2", "b3", "b5", "s0", "b1", "b4"]
    assert still == ["s1", "s2"]  # only what FITS the window promotes
    # all green: staged owns the window, greens keep definition order
    order, still = _promotion(base, staged, frozenset(base), window=5)
    assert order == ["s0", "s1", "s2"] + base
    assert still == []


def test_round5_rotation_simulation(tmp_path, monkeypatch):
    """With a (simulated) green CORRECTNESS_r04 over the current window,
    registry() must promote every staged query into the leading slots —
    the hands-off round-boundary rotation."""
    import json

    import spacetime_crawler4_spark.queries as q

    base, staged = q._base_registry(), q._staged_registry()
    green = q._driver_green_names() | frozenset(list(base)[:WINDOW])
    monkeypatch.setattr(q, "_driver_green_names", lambda: green)
    order = list(q.registry())
    assert set(order) == set(base) | set(staged)
    fits = list(staged)[:WINDOW]
    assert order[: len(fits)] == fits  # staged lead the window
    assert set(q.pending_registry()) == set(list(staged)[WINDOW:])
    # every staged name that fits is inside the certifiable window; any
    # overflow trails the registry (still queries()-exposed, local-gated)
    assert set(fits) <= set(order[:WINDOW])
    overflow = list(staged)[WINDOW:]
    assert order[len(order) - len(overflow) :] == overflow
