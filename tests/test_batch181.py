"""Batch-181 tests: quadkey bit-interleave replay + hierarchy
invariants, spatial NN join brute-force-within-radius recall."""

import numpy as np
from pyspark.sql import functions as F


def test_quadkey_matches_replay_and_hierarchy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext186 import (
        _QK_PARENT_Z,
        _QK_Z,
        q_quadkey_encode,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    pts = derived_points(spark, sf_dir, with_nulls=False).collect()
    n = 1 << _QK_Z
    leaf = {}
    for p in pts:
        mx = p.lng / 360.0 + 0.5
        s = np.sin(np.radians(p.lat))
        my = min(max(0.5 - np.log((1 + s) / (1 - s)) / (4 * np.pi), 0.0), 1.0)
        tx = min(int(mx * n), n - 1)
        ty = min(int(my * n), n - 1)
        qk = "".join(
            str(((ty >> (_QK_Z - i)) & 1) * 2 + ((tx >> (_QK_Z - i)) & 1))
            for i in range(1, _QK_Z + 1)
        )
        leaf[qk] = leaf.get(qk, 0) + 1
    rows = q_quadkey_encode(spark, sf_dir).collect()
    got = {r.quadkey: r for r in rows}
    assert {k: v.n_points for k, v in got.items()} == leaf
    # hierarchy: parent = prefix; parent counts = sum of children
    parents = {}
    for k, v in leaf.items():
        parents[k[:_QK_PARENT_Z]] = parents.get(k[:_QK_PARENT_Z], 0) + v
    for r in rows:
        assert r.parent == r.quadkey[:_QK_PARENT_Z]
        assert r.n_in_parent == parents[r.parent]
    # quadkey alphabet is base 4, fixed length
    assert all(len(r.quadkey) == _QK_Z and set(r.quadkey) <= set("0123")
               for r in rows)


def test_spatial_nn_join_matches_bruteforce_within_grid(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext186 import (
        _NN_Z,
        _stores,
        q_spatial_nn_join,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    def tile(lng, lat, z):
        n = 1 << z
        mx = lng / 360.0 + 0.5
        s = np.sin(np.radians(lat))
        my = min(max(0.5 - np.log((1 + s) / (1 - s)) / (4 * np.pi), 0.0), 1.0)
        return min(int(mx * n), n - 1), min(int(my * n), n - 1)

    def hav(a_lng, a_lat, b_lng, b_lat):
        p1, p2 = np.radians(a_lat), np.radians(b_lat)
        dl = np.radians(b_lng - a_lng)
        dp = p2 - p1
        return round(
            2
            * 6371008.8
            * np.arcsin(
                np.sqrt(
                    np.sin(dp / 2) ** 2
                    + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
                )
            ),
            3,
        )

    pts = derived_points(spark, sf_dir, with_nulls=False).collect()
    sts = _stores(spark, sf_dir).collect()
    st_tiles = [(s.store_id, s.lng, s.lat, *tile(s.lng, s.lat, _NN_Z))
                for s in sts]
    want = {}
    for p in pts:
        tx, ty = tile(p.lng, p.lat, _NN_Z)
        best = None
        for sid, slng, slat, stx, sty in st_tiles:
            if abs(stx - tx) <= 1 and abs(sty - ty) <= 1:
                d = hav(p.lng, p.lat, slng, slat)
                k = (d, sid)
                if best is None or k < best:
                    best = k
        if best is not None:
            want[p.id] = (best[1], best[0])
    got = {
        r.id: (r.store_id, r.dist_m)
        for r in q_spatial_nn_join(spark, sf_dir).collect()
    }
    assert got == want
    # sanity: matches exist and distances are plausible (< 3 tiles)
    assert len(got) > 0
    assert all(d >= 0 for _, d in got.values())
