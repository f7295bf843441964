"""The driver hard-checks only the first 50 registry entries (insertion
order) against its DuckDB oracle.  These invariants keep that window fully
checkable AND honestly rotated: every window slot must carry a SQL twin,
the round-4 rotation slots must be queries that never had a driver-green
row before (so driver coverage grows monotonically instead of re-showing
known-green entries), and the registry must stay duplicate-free."""

import json
import pathlib

from arrow_supercluster_spark.plans.registry import (
    _ROTATION_R4,
    _WINDOW_CORE,
    REGISTRY,
)

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_first_50_all_sql_backed():
    window = list(REGISTRY)[:50]
    rows_only = [n for n in window if REGISTRY[n].sql is None]
    assert not rows_only, f"rows-only queries in the driver window: {rows_only}"


def test_window_is_core_plus_rotation():
    assert list(REGISTRY)[:50] == _WINDOW_CORE + _ROTATION_R4


def test_rotation_entries_never_driver_checked_before():
    seen = set()
    for rec in sorted(REPO.glob("CORRECTNESS_r0[123].json")):
        seen |= set(json.loads(rec.read_text()))
    already = [n for n in _ROTATION_R4 if n in seen]
    assert not already, f"rotation slots wasted on already-checked: {already}"


def test_vacated_slots_all_have_prior_driver_rows():
    """Dropping a query from the window must not destroy evidence: every
    previously-windowed query that is no longer in the first 50 needs a
    driver-green row in some past round's record."""
    seen = set()
    for rec in sorted(REPO.glob("CORRECTNESS_r0[123].json")):
        seen |= set(json.loads(rec.read_text()))
    window = set(list(REGISTRY)[:50])
    r3 = set(json.loads((REPO / "CORRECTNESS_r03.json").read_text()))
    lost = [n for n in r3 - window if n not in seen]
    assert not lost


def test_registry_size_and_uniqueness():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 313
