"""Batch-172 tests: python replays of the bandit readout, incremental
join maintenance, and table checksums; Zelen-Severo accuracy."""

import math


def test_zs_phi_accuracy():
    from arrow_supercluster_spark.plans.registry_ext177 import _ZS_B, _ZS_P

    def zs(x):
        ax = abs(x)
        t = 1.0 / (1.0 + _ZS_P * ax)
        b1, b2, b3, b4, b5 = _ZS_B
        poly = ((((b5 * t + b4) * t + b3) * t + b2) * t + b1) * t
        pdf = math.exp(-(ax * ax) / 2.0) / math.sqrt(2.0 * math.pi)
        up = 1.0 - pdf * poly
        return up if x >= 0 else 1.0 - up

    for x in (-3.5, -2.0, -0.7, 0.0, 0.3, 1.1, 2.5, 4.0):
        exact = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
        assert abs(zs(x) - exact) < 1e-7


def test_bandit_probability_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext177 import (
        q_bandit_probability,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_bandit_probability(spark, sf_dir).collect()[0]
    conv = {}
    for e in read_events(spark, sf_dir).collect():
        hit = e.event_type == "purchase" and (e.value or 0) > 90
        conv[e.user_id] = conv.get(e.user_id, False) or hit
    arm = {0: [0, 0], 1: [0, 0]}  # [n, x]
    for u, c in conv.items():
        arm[u % 2][0] += 1
        arm[u % 2][1] += c
    na, xa = arm[0]
    nb, xb = arm[1]
    pa, pb = xa / na, xb / nb
    pat, pbt = (xa + 1) / (na + 2), (xb + 1) / (nb + 2)
    z = (pb - pa) / math.sqrt(
        pat * (1 - pat) / na + pbt * (1 - pbt) / nb
    )
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.rate_a - round(pa, 6)) < 1e-9
    assert abs(r.rate_b - round(pb, 6)) < 1e-9
    assert abs(r.z - round(z, 6)) < 1e-6
    exact = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
    assert abs(r.p_b_beats_a - exact) < 1e-5
    assert 0.0 < r.p_b_beats_a < 1.0


def test_incremental_join_consistent(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext177 import (
        q_incremental_join,
    )

    rows = q_incremental_join(spark, sf_dir).collect()
    assert rows
    assert all(r.consistent for r in rows)
    assert all(r.n_maint == r.n_full for r in rows)
    # every order lands in exactly one segment bucket
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_full for r in rows) == orders


def test_table_checksum_replay_and_sensitivity(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext177 import (
        _CK_MOD,
        _CK_TABLES,
        q_table_checksum,
    )

    got = {r.tbl: (r.n_rows, r.key_checksum)
           for r in q_table_checksum(spark, sf_dir).collect()}
    assert set(got) == {t for t, _ in _CK_TABLES}
    for t, expr in _CK_TABLES:
        rows = spark.read.parquet(f"{sf_dir}/{t}.parquet").collect()
        if t == "lineitem":
            keys = [r.l_orderkey * 8 + r.l_linenumber for r in rows]
        else:
            col = expr
            keys = [getattr(r, col) for r in rows]
        want = sum((k * 2654435761 + 17) % _CK_MOD for k in keys)
        assert got[t] == (len(rows), want), t
    # sensitivity: dropping one key or duplicating one changes the sum
    t, ck = "customer", got["customer"][1]
    rows = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    k0 = rows[0].c_custkey
    h0 = (k0 * 2654435761 + 17) % _CK_MOD
    assert ck - h0 != ck and ck + h0 != ck
