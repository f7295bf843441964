"""Batch-220 tests: python replays of the spatial-statistics
completions (Geary's C, General G, IDW) on the zoom-6 cell lattice."""

from collections import Counter


def _cells(spark, sf_dir):
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
    from arrow_supercluster_spark.operators import grid_cluster as gc
    from arrow_supercluster_spark.plans.registry_core import _points_xy
    from arrow_supercluster_spark.plans.registry_ext45 import _MI_ZOOM

    rows = (
        gc.with_cells(_points_xy(spark, sf_dir), _MI_ZOOM, OPTS)
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {(r.cell_x, r.cell_y): r.n for r in rows}


def _rook_pairs(cells):
    out = []
    for (x, y), n in cells.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (x + dx, y + dy) in cells:
                out.append((n, cells[(x + dx, y + dy)]))
    return out


def test_geary_c_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    cells = _cells(spark, sf_dir)
    pairs = _rook_pairs(cells)
    n_cells = len(cells)
    mu = sum(cells.values()) / n_cells
    ss = sum((v - mu) ** 2 for v in cells.values())
    diff = sum((a - b) ** 2 for a, b in pairs)
    row = REGISTRY["q_geary_c"].spark(spark, sf_dir).collect()[0]
    assert row.n_cells == n_cells
    assert row.w_sum == len(pairs)
    if pairs and ss > 0:
        want = (n_cells - 1) * diff / (2 * len(pairs) * ss)
        assert abs(row.geary_c - want) < 1e-5
        assert row.geary_c >= 0


def test_getis_ord_g_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    cells = _cells(spark, sf_dir)
    pairs = _rook_pairs(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    num = sum(a * b for a, b in pairs)
    den = sx * sx - sxx
    row = REGISTRY["q_getis_ord_g"].spark(spark, sf_dir).collect()[0]
    assert row.n_cells == len(cells)
    assert row.w_sum == len(pairs)
    assert abs(row.general_g - num / den) < 1e-6
    n = len(cells)
    assert row.expected_g == round(len(pairs) / (n * (n - 1)), 6)
    assert 0 <= row.general_g <= 1


def test_idw_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext225 import _IDW_PROBES

    cells = _cells(spark, sf_dir)
    got = {
        (r.px, r.py): r
        for r in REGISTRY["q_idw_interpolation"].spark(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(_IDW_PROBES)
    lo, hi = min(cells.values()), max(cells.values())
    for (px, py), row in got.items():
        if (px, py) in cells:
            assert row.exact and row.idw_density == float(cells[(px, py)])
        else:
            wsum = sum(
                n / ((px - x) ** 2 + (py - y) ** 2)
                for (x, y), n in cells.items()
            )
            w = sum(
                1.0 / ((px - x) ** 2 + (py - y) ** 2)
                for (x, y) in cells
            )
            assert not row.exact
            assert abs(row.idw_density - wsum / w) < 1e-4
            # IDW is a convex combination: bounded by the data range
            assert lo - 1e-9 <= row.idw_density <= hi + 1e-9
