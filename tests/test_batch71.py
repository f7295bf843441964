"""Batch-71 test: pyramid consistency (z=4 slice == q_tile_counts;
per-zoom conservation; parent-child rollup)."""

from collections import defaultdict

from arrow_supercluster_spark.plans.registry import REGISTRY, _points_xy


def test_tile_pyramid_consistency(spark, sf_dir):
    pyr = REGISTRY["q_tile_pyramid"].spark(spark, sf_dir).collect()
    n_pts = _points_xy(spark, sf_dir).count()
    by_z = defaultdict(dict)
    for r in pyr:
        by_z[r.z][(r.tile_x, r.tile_y)] = r.n
    assert set(by_z) == {2, 4, 6}
    for z, tiles in by_z.items():
        assert sum(tiles.values()) == n_pts, z
    # z=4 slice equals the standalone manifest
    single = {
        (r.tile_x, r.tile_y): r.n
        for r in REGISTRY["q_tile_counts"].spark(spark, sf_dir).collect()
    }
    assert by_z[4] == single
    # each z=4 tile's count equals the sum of its four z=6 children...
    # children of (x,y) at z+2 are the 4x4 block [4x..4x+3] x [4y..4y+3]
    for (x, y), n in by_z[4].items():
        kids = sum(
            by_z[6].get((cx, cy), 0)
            for cx in range(4 * x, 4 * x + 4)
            for cy in range(4 * y, 4 * y + 4)
        )
        assert kids == n, (x, y)
