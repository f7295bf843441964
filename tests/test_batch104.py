"""Batch-104 tests: Hilbert index vs a reference python xy2d (plus
curve properties), Allen relation histogram vs a python oracle."""

from collections import Counter

from pyspark.sql import functions as F


def _xy2d(n, x, y):
    """Reference Hilbert xy→d (the standard public-domain formulation)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_order_matches_reference(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext109 import (
        _HN,
        q_hilbert_order,
    )

    rows = q_hilbert_order(spark, sf_dir).collect()
    assert len(rows) > 0
    seen = {}
    for r in rows:
        assert 0 <= r.hx < _HN and 0 <= r.hy < _HN
        assert r.hilbert_d == _xy2d(_HN, r.hx, r.hy), (r.hx, r.hy)
        seen[(r.hx, r.hy)] = r.hilbert_d
    # injectivity over the occupied cells
    assert len(set(seen.values())) == len(seen)
    # range bound
    assert all(0 <= d < _HN * _HN for d in seen.values())


def test_hilbert_curve_is_unit_step_continuous():
    """The defining Hilbert property, on the full order-4 grid: walking
    d = 0..n²−1 moves exactly one cell (Manhattan distance 1) per step —
    the locality property Morton/Z-order lacks."""
    n = 16
    d2xy = {}
    for x in range(n):
        for y in range(n):
            d2xy[_xy2d(n, x, y)] = (x, y)
    assert sorted(d2xy) == list(range(n * n))  # bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = d2xy[d], d2xy[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_allen_relations_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext109 import (
        q_allen_relations,
    )

    got = {r.relation: r.n for r in q_allen_relations(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    max_ship = {}
    for row in li:
        k = row.l_orderkey
        if k not in max_ship or row.l_shipdate > max_ship[k]:
            max_ship[k] = row.l_shipdate
    by_cust = {}
    for o in orders:
        if o.o_orderkey not in max_ship:
            continue
        by_cust.setdefault(o.o_custkey, []).append(
            (o.o_orderdate, max_ship[o.o_orderkey], o.o_orderkey)
        )
    want = Counter()
    for ivs in by_cust.values():
        ivs.sort()
        for (a_s, a_e, _), (b_s, b_e, _) in zip(ivs, ivs[1:]):
            if a_e < b_s:
                rel = "before"
            elif a_e == b_s:
                rel = "meets"
            elif a_s == b_s and a_e == b_e:
                rel = "equals"
            elif a_s == b_s and a_e < b_e:
                rel = "starts"
            elif a_s == b_s and a_e > b_e:
                rel = "started_by"
            elif a_e == b_e and a_s < b_s:
                rel = "finished_by"
            elif a_e == b_e and a_s > b_s:
                rel = "finishes"
            elif a_s < b_s and a_e > b_e:
                rel = "contains"
            elif a_s > b_s and a_e < b_e:
                rel = "during"
            elif a_s < b_s and b_s < a_e < b_e:
                rel = "overlaps"
            elif b_s < a_s < b_e and a_e > b_e:
                rel = "overlapped_by"
            elif a_s == b_e:
                rel = "met_by"
            else:
                rel = "after"
            want[rel] += 1
    assert got == dict(want)
    assert sum(want.values()) > 0
