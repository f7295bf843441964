"""Batch-110 tests: Fellegi-Sunter linkage, permutation test, integer
shoelace polygons — python oracles independent of both engines."""

import math
from collections import defaultdict

_P = 2147483647


def test_record_linkage_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext115 import (
        _FS_LINK,
        _FS_NONLINK,
        _WB_A,
        _WB_D,
        _WN_A,
        _WN_D,
        _WS_A,
        _WS_D,
        q_record_linkage,
    )

    got = {r.verdict: r for r in q_record_linkage(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[c.c_nationkey].append(c)
    agg = defaultdict(lambda: [0, 0, math.inf, -math.inf])
    for c in cust:
        b_digits = c.c_custkey + 1000000 if c.c_custkey % 10 == 0 else c.c_custkey
        b_bal = c.c_acctbal + ((c.c_custkey * 7) % 21 - 10)
        b_seg = "BUILDING" if c.c_custkey % 17 == 0 else c.c_mktsegment
        for a in by_nation[c.c_nationkey]:
            s = (
                (_WN_A if a.c_custkey == b_digits else _WN_D)
                + (_WB_A if abs(a.c_acctbal - b_bal) <= 5.5 else _WB_D)
            ) + (_WS_A if a.c_mktsegment == b_seg else _WS_D)
            v = (
                "link"
                if s >= _FS_LINK
                else ("non_link" if s <= _FS_NONLINK else "possible")
            )
            e = agg[v]
            e[0] += 1
            e[1] += 1 if a.c_custkey == c.c_custkey else 0
            e[2], e[3] = min(e[2], s), max(e[3], s)
    assert set(got) == set(agg)
    for v, (n, t, lo, hi) in agg.items():
        r = got[v]
        assert (r.n_pairs, r.n_true) == (n, t)
        assert abs(r.true_frac - round(t / n, 4)) < 1e-9
        assert abs(r.min_score - round(lo, 4)) < 1e-9
        assert abs(r.max_score - round(hi, 4)) < 1e-9
    # the linkage must actually work: links are nearly all true matches;
    # a true pair can fall to non_link only when BOTH its name and
    # balance were corrupted, so the false-non-link rate stays tiny
    assert got["link"].true_frac > 0.8
    assert got["non_link"].true_frac < 0.01


def test_permutation_test_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext115 import (
        _PT_K,
        q_permutation_test,
    )

    [r] = q_permutation_test(spark, sf_dir).collect()
    ev = [
        e
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if e.event_type in ("click", "purchase")
    ]
    cents = {e.event_id: round(e.value * 100) for e in ev}

    def mean_diff(groups):
        s = {0: [0, 0], 1: [0, 0]}
        for eid, lbl in groups.items():
            s[lbl][0] += cents[eid]
            s[lbl][1] += 1
        return s[0][0] / (100.0 * s[0][1]) - s[1][0] / (100.0 * s[1][1])

    obs = mean_diff(
        {e.event_id: 0 if e.event_type == "click" else 1 for e in ev}
    )
    stats = []
    for p in range(1, _PT_K + 1):
        stats.append(
            mean_diff(
                {
                    e.event_id: ((e.event_id % _P) * 2654435761
                                 + p * 100003 + 12345) % _P % 2
                    for e in ev
                }
            )
        )
    n_ext = sum(1 for s in stats if abs(s) >= abs(obs))
    assert r.n_perms == _PT_K
    assert r.n_extreme == n_ext
    assert abs(r.obs_stat - round(obs, 4)) < 1e-9
    assert abs(r.p_value - round((1 + n_ext) / (_PT_K + 1), 4)) < 1e-9
    assert abs(r.null_min - round(min(stats), 4)) < 1e-9
    assert abs(r.null_max - round(max(stats), 4)) < 1e-9
    assert 0.0 < r.p_value <= 1.0


def test_city_polygons_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext115 import (
        _GEO_SCALE,
        q_city_polygons,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    got = {r.city: r for r in q_city_polygons(spark, sf_dir).collect()}
    pts = derived_points(spark, sf_dir, with_nulls=False).collect()
    by_city = defaultdict(list)
    for p in pts:
        by_city[p.city].append(
            (p.id, round(p.lng * _GEO_SCALE), round(p.lat * _GEO_SCALE))
        )
    assert set(got) == set(by_city)
    for city, rows in by_city.items():
        cx = math.floor(sum(x for _, x, _ in rows) / len(rows))
        cy = math.floor(sum(y for _, _, y in rows) / len(rows))

        def pangle(row):
            _, x, y = row
            dx, dy = x - cx, y - cy
            den = abs(dx) + abs(dy)
            if den == 0:
                return 0.0
            return 1.0 - dx / den if dy >= 0 else 3.0 + dx / den

        ordered = sorted(rows, key=lambda r: (pangle(r), r[0]))
        s = 0
        per = 0
        for i, (_, x, y) in enumerate(ordered):
            _, xn, yn = ordered[(i + 1) % len(ordered)]
            s += x * yn - xn * y
            per += round(math.sqrt((xn - x) ** 2 + (yn - y) ** 2))
        r = got[city]
        assert r.n_vertices == len(rows)
        assert abs(
            r.area_deg2 - round(abs(s) / (2.0 * _GEO_SCALE * _GEO_SCALE), 6)
        ) < 1e-9
        assert abs(r.perimeter_deg - round(per / _GEO_SCALE, 4)) < 1e-9
        assert r.area_deg2 > 0
