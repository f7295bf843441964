"""The driver hard-checks only the first 50 registry entries (insertion
order) against its DuckDB oracle.  These invariants keep that window fully
checkable: every entry in it must carry a SQL twin, the swapped-out
rows-only queries must still be registered (later), and the registry must
stay duplicate-free."""

from arrow_supercluster_spark.plans.registry import _WINDOW_SWAPS, REGISTRY


def test_first_50_all_sql_backed():
    window = list(REGISTRY)[:50]
    rows_only = [n for n in window if REGISTRY[n].sql is None]
    assert not rows_only, f"rows-only queries in the driver window: {rows_only}"


def test_swapped_rows_only_queries_still_registered():
    for old, new in _WINDOW_SWAPS.items():
        assert old in REGISTRY, f"{old} dropped from registry"
        assert new in list(REGISTRY)[:50], f"{new} not promoted into window"
        assert list(REGISTRY)[:50].count(new) == 1


def test_registry_size_and_uniqueness():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 301
