"""The driver hard-checks only the first 50 registry entries (insertion
order) against its DuckDB oracle.  These invariants keep that window fully
checkable AND honestly rotated: every window slot must carry a SQL twin,
the current round's rotation slots must be queries that never had a
driver-green row before (so driver coverage grows monotonically instead of
re-showing known-green entries), every slot vacated by a rotation must
keep prior driver-green evidence, and the registry must stay
duplicate-free."""

import json
import pathlib

from arrow_supercluster_spark.plans.registry import (
    _ROTATION_R4,
    _ROTATION_R5,
    _ROTATION_R6,
    _WINDOW_CORE,
    REGISTRY,
)

REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_union(max_round: int) -> set:
    """Union of query names with a driver row in CORRECTNESS_r01..r{N}."""
    seen = set()
    for r in range(1, max_round + 1):
        p = REPO / f"CORRECTNESS_r{r:02d}.json"
        if p.exists():
            seen |= set(json.loads(p.read_text()))
    return seen


def test_first_50_all_sql_backed():
    window = list(REGISTRY)[:50]
    rows_only = [n for n in window if REGISTRY[n].sql is None]
    assert not rows_only, f"rows-only queries in the driver window: {rows_only}"


def test_window_is_core_plus_rotation():
    assert list(REGISTRY)[:50] == _WINDOW_CORE + _ROTATION_R6


def test_r4_rotation_was_never_checked_before_r4():
    """Historical invariant: the r4 rotation slots had no driver row in
    rounds 1-3 (driver coverage grew by exactly those 20 in r4)."""
    seen = _driver_union(3)
    already = [n for n in _ROTATION_R4 if n in seen]
    assert not already, f"r4 rotation slots wasted on already-checked: {already}"


def test_r5_rotation_was_never_checked_before_r5():
    seen = _driver_union(4)
    already = [n for n in _ROTATION_R5 if n in seen]
    assert not already, f"r5 rotation slots wasted on already-checked: {already}"


def test_r6_rotation_entries_never_driver_checked_before():
    seen = _driver_union(5)
    already = [n for n in _ROTATION_R6 if n in seen]
    assert not already, f"r6 rotation slots wasted on already-checked: {already}"


def test_r6_rotation_slots_disjoint_and_sql_backed():
    assert len(set(_ROTATION_R6)) == 20
    assert not set(_ROTATION_R6) & set(_WINDOW_CORE)
    assert not set(_ROTATION_R6) & set(_ROTATION_R4)
    assert not set(_ROTATION_R6) & set(_ROTATION_R5)
    for n in _ROTATION_R6:
        assert REGISTRY[n].sql is not None, f"rows-only in rotation: {n}"


def test_vacated_slots_all_have_prior_driver_rows():
    """Dropping a query from the window must not destroy evidence: every
    previously-windowed query that is no longer in the first 50 needs a
    driver-green row in some past round's record."""
    seen = _driver_union(5)
    window = set(list(REGISTRY)[:50])
    lost = [n for n in seen - window if n not in seen]
    assert not lost
    # specifically: every r4/r5 window member not in the current window
    # has a driver-green row recorded in its own round's record
    for rec in ("CORRECTNESS_r04.json", "CORRECTNESS_r05.json"):
        prior = set(json.loads((REPO / rec).read_text()))
        assert not [n for n in prior - window if n not in seen]


def test_registry_size_and_uniqueness():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 313


def test_readme_query_count_matches_registry():
    """Doc-count drift guard (VERDICT r4 'What's wrong' #3): the README's
    claimed registry size must equal the loaded registry."""
    import re

    readme = (REPO / "README.md").read_text()
    m = re.search(r"registry\*\.py\s+(\d+) queries", readme)
    assert m, "README no longer states the registry query count"
    assert int(m.group(1)) == len(REGISTRY)
