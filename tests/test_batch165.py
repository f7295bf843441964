"""Batch-165 tests: python replays of the TPC-H Q8/Q17/Q19/Q22 shapes
against raw parquet rows."""

import collections
import datetime


def _rows(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").collect()


def _ri(x):
    """Half-away-from-zero cent rounding (Spark/DuckDB round), NOT
    python's banker's rounding."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_tpch_q8_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext170 import (
        _Q8_END,
        _Q8_NATION,
        _Q8_REGION,
        _Q8_START,
        _Q8_TYPE,
        q_tpch_q8,
    )

    got = {
        r.o_year: (r.mkt_share, r.total_volume)
        for r in q_tpch_q8(spark, sf_dir).collect()
    }
    region = {
        r.r_regionkey: r.r_name for r in _rows(spark, sf_dir, "region")
    }
    nat = {
        r.n_nationkey: (r.n_name, region[r.n_regionkey])
        for r in _rows(spark, sf_dir, "nation")
    }
    cust_in_region = {
        r.c_custkey
        for r in _rows(spark, sf_dir, "customer")
        if nat[r.c_nationkey][1] == _Q8_REGION
    }
    supp_nation = {
        r.s_suppkey: nat[r.s_nationkey][0]
        for r in _rows(spark, sf_dir, "supplier")
    }
    parts = {
        r.p_partkey
        for r in _rows(spark, sf_dir, "part")
        if r.p_type == _Q8_TYPE
    }
    a = datetime.datetime.fromisoformat(_Q8_START)
    b = datetime.datetime.fromisoformat(_Q8_END)
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate)
        for r in _rows(spark, sf_dir, "orders")
        if a <= r.o_orderdate < b
    }
    tot = collections.defaultdict(int)
    nsum = collections.defaultdict(int)
    for li in _rows(spark, sf_dir, "lineitem"):
        o = orders.get(li.l_orderkey)
        if o is None or o[0] not in cust_in_region:
            continue
        if li.l_partkey not in parts:
            continue
        cents = _ri(li.l_extendedprice * (1 - li.l_discount) * 100)
        y = o[1].year
        tot[y] += cents
        if supp_nation[li.l_suppkey] == _Q8_NATION:
            nsum[y] += cents
    want = {
        y: (round(nsum[y] * 1.0 / tot[y], 6), round(tot[y] / 100.0, 2))
        for y in tot
    }
    assert got == want
    assert len(got) >= 2  # both order years populated


def test_tpch_q17_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext170 import (
        _Q17_BRAND,
        _Q17_FRACTION,
        q_tpch_q17,
    )

    r = q_tpch_q17(spark, sf_dir).collect()[0]
    brand_parts = {
        p.p_partkey
        for p in _rows(spark, sf_dir, "part")
        if p.p_brand == _Q17_BRAND
    }
    per_part = collections.defaultdict(list)
    for li in _rows(spark, sf_dir, "lineitem"):
        if li.l_partkey in brand_parts:
            per_part[li.l_partkey].append(li)
    cents = 0
    n = 0
    for pk, lis in per_part.items():
        aq = sum(x.l_quantity for x in lis) / len(lis)
        for x in lis:
            if x.l_quantity < _Q17_FRACTION * aq:
                cents += _ri(x.l_extendedprice * 100)
                n += 1
    assert r.n_lines == n
    assert abs(r.avg_yearly - round(cents / 100.0 / 7.0, 2)) < 1e-9


def test_tpch_q19_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext170 import (
        _Q19_BANDS,
        q_tpch_q19,
    )

    r = q_tpch_q19(spark, sf_dir).collect()[0]
    pinfo = {
        p.p_partkey: (p.p_brand, p.p_size)
        for p in _rows(spark, sf_dir, "part")
    }
    cents = 0
    n = 0
    for li in _rows(spark, sf_dir, "lineitem"):
        brand, size = pinfo[li.l_partkey]
        if any(
            brand == b and s1 <= size <= s2 and q1 <= li.l_quantity <= q2
            for b, s1, s2, q1, q2 in _Q19_BANDS
        ):
            cents += _ri(li.l_extendedprice * (1 - li.l_discount) * 100)
            n += 1
    assert r.n_lines == n
    assert r.revenue == round(cents / 100.0, 2)
    assert n > 0  # the disjunction matches real rows at every SF


def test_tpch_q22_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext170 import (
        _Q22_CUTOFF,
        q_tpch_q22,
    )

    got = {
        r.c_nationkey: (r.numcust, r.totacctbal)
        for r in q_tpch_q22(spark, sf_dir).collect()
    }
    cust = _rows(spark, sf_dir, "customer")
    pos = [c.c_acctbal for c in cust if c.c_acctbal > 0]
    avg = sum(pos) / len(pos)
    cut = datetime.datetime.fromisoformat(_Q22_CUTOFF)
    recent = {
        o.o_custkey
        for o in _rows(spark, sf_dir, "orders")
        if o.o_orderdate >= cut
    }
    agg = collections.defaultdict(lambda: [0, 0.0])
    for c in cust:
        if c.c_acctbal > avg and c.c_custkey not in recent:
            agg[c.c_nationkey][0] += 1
            agg[c.c_nationkey][1] += c.c_acctbal
    want = {k: (v[0], round(v[1], 2)) for k, v in agg.items()}
    assert got == want
    assert got  # lapsed high-balance customers exist at every SF
