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
    from spacetime_crawler4_spark.queries import registry

    order = list(registry())
    green = _driver_green()
    never = [n for n in order if n not in green]
    outside = [n for n in never if n not in order[: WINDOW]]
    assert not outside, (
        f"{len(outside)} never-driver-checked queries sit past position "
        f"{WINDOW} and would ship uncertified: {outside}"
    )


def test_every_registry_query_has_an_oracle_or_is_marked():
    """Each entry pairs a Spark callable with oracle SQL (None is allowed
    only for genuinely non-SQL-expressible ops; today there are none)."""
    from spacetime_crawler4_spark.queries import pending_registry, registry

    for name, (fn, sql) in {**registry(), **pending_registry()}.items():
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and "SELECT" in sql.upper()), name


def test_pending_registry_is_disjoint_from_registry():
    """Staged queries (next-round window candidates) must not shadow a
    registered name — the round-5 rotation moves them over wholesale."""
    from spacetime_crawler4_spark.queries import pending_registry, registry

    overlap = set(pending_registry()) & set(registry())
    assert not overlap, f"pending queries shadow registry(): {sorted(overlap)}"
