"""Batch-164 tests: python replays of the four new TPC-H shapes
(Q7 volume shipping, Q12 shipmode priority, Q13 customer distribution,
Q14 promo effect) against raw parquet rows."""

import collections


def _rows(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").collect()


def _ri(x):
    """Half-away-from-zero cent rounding (Spark/DuckDB round), NOT
    python's banker's rounding."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_tpch_q7_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext169 import (
        _Q7_END,
        _Q7_N1,
        _Q7_N2,
        _Q7_START,
        q_tpch_q7,
    )

    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue
        for r in q_tpch_q7(spark, sf_dir).collect()
    }
    nat = {r.n_nationkey: r.n_name for r in _rows(spark, sf_dir, "nation")}
    sup = {
        r.s_suppkey: nat[r.s_nationkey]
        for r in _rows(spark, sf_dir, "supplier")
    }
    cus = {
        r.c_custkey: nat[r.c_nationkey]
        for r in _rows(spark, sf_dir, "customer")
    }
    ocust = {
        r.o_orderkey: r.o_custkey for r in _rows(spark, sf_dir, "orders")
    }
    import datetime

    a = datetime.datetime.fromisoformat(_Q7_START)
    b = datetime.datetime.fromisoformat(_Q7_END)
    want = collections.defaultdict(int)
    for r in _rows(spark, sf_dir, "lineitem"):
        if not (a <= r.l_shipdate < b):
            continue
        sn = sup[r.l_suppkey]
        cn = cus[ocust[r.l_orderkey]]
        if {sn, cn} != {_Q7_N1, _Q7_N2}:
            continue
        cents = _ri(r.l_extendedprice * (1 - r.l_discount) * 100)
        want[(sn, cn, r.l_shipdate.year)] += int(cents)
    assert got == {k: round(v / 100.0, 2) for k, v in want.items()}
    # both directions present (the symmetric disjunction is real)
    assert {k[0] for k in got} == {_Q7_N1, _Q7_N2}


def test_tpch_q12_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext169 import (
        _Q12_YEAR,
        q_tpch_q12,
    )

    got = {
        r.shipmode: (r.high_line_count, r.low_line_count)
        for r in q_tpch_q12(spark, sf_dir).collect()
    }
    prio = {
        r.o_orderkey: r.o_orderpriority
        for r in _rows(spark, sf_dir, "orders")
    }
    want = collections.defaultdict(lambda: [0, 0])
    modes = {0: "MAIL", 1: "SHIP", 2: "TRUCK"}
    for r in _rows(spark, sf_dir, "lineitem"):
        if r.l_shipdate.year != _Q12_YEAR:
            continue
        hi = prio[r.l_orderkey] in ("1-URGENT", "2-HIGH")
        want[modes[r.l_linenumber % 3]][0 if hi else 1] += 1
    assert got == {m: tuple(v) for m, v in want.items()}
    assert len(got) == 3


def test_tpch_q13_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext169 import (
        _Q13_EXCL,
        q_tpch_q13,
    )

    got = {
        r.c_count: r.custdist for r in q_tpch_q13(spark, sf_dir).collect()
    }
    per_cust = collections.Counter()
    for r in _rows(spark, sf_dir, "orders"):
        if r.o_orderpriority != _Q13_EXCL:
            per_cust[r.o_custkey] += 1
    want = collections.Counter()
    for r in _rows(spark, sf_dir, "customer"):
        want[per_cust.get(r.c_custkey, 0)] += 1
    assert got == dict(want)
    assert 0 in got or min(got) >= 0  # zero-order bucket representable
    assert sum(got.values()) == len(_rows(spark, sf_dir, "customer"))


def test_tpch_q14_replay(spark, sf_dir):
    import datetime

    from arrow_supercluster_spark.plans.registry_ext169 import (
        _Q14_END,
        _Q14_START,
        q_tpch_q14,
    )

    r = q_tpch_q14(spark, sf_dir).collect()[0]
    ptype = {
        p.p_partkey: p.p_type for p in _rows(spark, sf_dir, "part")
    }
    a = datetime.datetime.fromisoformat(_Q14_START)
    b = datetime.datetime.fromisoformat(_Q14_END)
    promo = total = 0
    for li in _rows(spark, sf_dir, "lineitem"):
        if not (a <= li.l_shipdate < b):
            continue
        cents = _ri(li.l_extendedprice * (1 - li.l_discount) * 100)
        total += cents
        if ptype[li.l_partkey] == "PROMO":
            promo += cents
    assert abs(r.promo_revenue_pct - round(100.0 * promo / total, 4)) < 1e-9
    assert r.total_revenue == round(total / 100.0, 2)
    assert 0 < r.promo_revenue_pct < 100
