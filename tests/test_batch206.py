"""Batch-206 tests: TOPSIS replay + closeness bounds, onion-layer
brute force + partition/dominance invariants."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math

from decimal import ROUND_HALF_UP, Decimal


def _spark_round(x):
    return int(
        Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def test_topsis_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext211 import (
        _TP_W,
        q_topsis,
    )

    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    ).collect()
    crit = {}
    for r in rows:
        rev, disc, n = crit.get(r.l_suppkey, (0, 0, 0))
        rev += _spark_round(r.l_extendedprice * (1 - r.l_discount) * 100)
        disc += _spark_round(r.l_discount * 100)
        n += 1
        crit[r.l_suppkey] = (rev, disc, n)
    mrev = max(rev for rev, _, _ in crit.values())
    mdisc = max(d / n for _, d, n in crit.values())
    mship = max(n for _, _, n in crit.values())
    normed = {
        k: (rev / mrev, (d / n) / mdisc, n / mship)
        for k, (rev, d, n) in crit.items()
    }
    i = (
        max(c1 for c1, _, _ in normed.values()),
        min(c2 for _, c2, _ in normed.values()),
        max(c3 for _, _, c3 in normed.values()),
    )
    a = (
        min(c1 for c1, _, _ in normed.values()),
        max(c2 for _, c2, _ in normed.values()),
        min(c3 for _, _, c3 in normed.values()),
    )
    w = _TP_W
    want = {}
    for k, c in normed.items():
        dp = math.sqrt(sum(wj * (cj - ij) ** 2 for wj, cj, ij in zip(w, c, i)))
        dm = math.sqrt(sum(wj * (cj - aj) ** 2 for wj, cj, aj in zip(w, c, a)))
        want[k] = dm / (dp + dm)
    got = q_topsis(spark, sf_dir).collect()
    assert len(got) == len(want)
    order = sorted(want, key=lambda k: (-want[k], k))
    assert [r.s_suppkey for r in got] == order
    for r in got:
        assert abs(r.closeness - round(want[r.s_suppkey], 6)) < 1e-9
        assert 0 <= r.closeness <= 1


def test_onion_layers_match_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext211 import (
        _ON_LAYERS,
        q_onion_layers,
    )

    rows = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = {
        r.p_partkey: (_spark_round(r.p_retailprice * 100), int(r.p_size))
        for r in rows
    }
    layers = []
    remaining = dict(pts)
    for _ in range(_ON_LAYERS):
        sky = {}
        for k, (p, s) in remaining.items():
            dominated = any(
                (bp <= p and bs >= s and (bp < p or bs > s))
                for bk, (bp, bs) in remaining.items()
                if bk != k
            )
            if not dominated:
                sky[k] = (p, s)
        layers.append(sky)
        for k in sky:
            del remaining[k]
    got = q_onion_layers(spark, sf_dir).collect()
    assert [r.layer for r in got] == list(range(1, _ON_LAYERS + 1))
    for r, sky in zip(got, layers):
        assert r.n_parts == len(sky)
        assert abs(
            r.min_price - round(min(p for p, _ in sky.values()) / 100.0, 2)
        ) < 1e-9
        assert r.max_size == max(s for _, s in sky.values())
    # onion property: every layer-k point is dominated by some point in
    # layer k-1 (that is what peeling means)
    for kprev, knext in zip(layers, layers[1:]):
        for p, s in knext.values():
            assert any(
                bp <= p and bs >= s and (bp < p or bs > s)
                for bp, bs in kprev.values()
            )
