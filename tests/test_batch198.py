"""Batch-198 tests: ABC replay (including the exact Pareto cut
semantics), EOQ/safety-stock closed-form replay, Syntetos-Boylan
quadrant replay + cutoff coherence."""

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F


def _spark_round(x):
    """Spark round(double): HALF_UP on the shortest-decimal repr
    (BigDecimal.valueOf semantics) — NOT python's half-even round."""
    return int(
        Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _li_parts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.to_date("l_shipdate").alias("d"),
    )
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type", "p_retailprice"
    )
    return li.collect(), pt.collect()


def test_abc_classification_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext203 import (
        _ABC_A,
        _ABC_B,
        q_abc_classification,
    )

    li, _ = _li_parts(spark, sf_dir)
    rev = {}
    for r in li:
        c = _spark_round(r.l_extendedprice * (1 - r.l_discount) * 100)
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + c
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    classes = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    cum = 0
    for pk, rv in ordered:
        cum += rv
        cls = (
            "A"
            if 100 * cum <= _ABC_A * total
            else ("B" if 100 * cum <= _ABC_B * total else "C")
        )
        classes[cls][0] += 1
        classes[cls][1] += rv
    got = {r.abc_class: r for r in q_abc_classification(spark, sf_dir).collect()}
    for cls, (n, rv) in classes.items():
        if n == 0:
            assert cls not in got
            continue
        r = got[cls]
        assert r.n_parts == n
        assert abs(r.revenue - round(rv / 100.0, 2)) < 1e-6
        assert abs(r.revenue_share - round(rv / total, 6)) < 1e-9
    # rank semantics: mean revenue per part is non-increasing A → B → C
    # (always true for a cut of a descending ranking, whatever the
    # revenue distribution's shape)
    means = [
        got[c].revenue / got[c].n_parts for c in ("A", "B", "C") if c in got
    ]
    assert means == sorted(means, reverse=True)


def _type_frames(spark, sf_dir):
    li, pt = _li_parts(spark, sf_dir)
    ptype = {r.p_partkey: r.p_type for r in pt}
    daily = {}
    for r in li:
        t = ptype[r.l_partkey]
        key = (t, r.d)
        daily[key] = daily.get(key, 0) + int(r.l_quantity)
    return li, pt, ptype, daily


def test_eoq_policy_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext203 import (
        _EOQ_HOLD,
        _EOQ_S,
        _SS_LEAD,
        _SS_Z,
        q_eoq_policy,
    )

    li, pt, ptype, daily = _type_frames(spark, sf_dir)
    got = {r.p_type: r for r in q_eoq_policy(spark, sf_dir).collect()}
    types = sorted({r.p_type for r in pt})
    assert sorted(got) == types
    for t in types:
        d_total = sum(int(r.l_quantity) for r in li if ptype[r.l_partkey] == t)
        cents = [
            round(r.p_retailprice * 100) for r in pt if r.p_type == t
        ]
        h = _EOQ_HOLD * sum(cents) / 100.0 / len(cents)
        eoq = math.sqrt(2.0 * d_total * _EOQ_S / h)
        dqs = [v for (tt, _), v in daily.items() if tt == t]
        nd = len(dqs)
        mu = sum(dqs) / nd
        var = (sum(v * v for v in dqs) - sum(dqs) ** 2 / nd) / (nd - 1)
        ss = _SS_Z * math.sqrt(var) * math.sqrt(_SS_LEAD)
        r = got[t]
        assert r.d_total == d_total
        assert abs(r.eoq - round(eoq, 4)) < 1e-6
        assert abs(r.safety_stock - round(ss, 4)) < 1e-6
        assert abs(r.reorder_point - round(mu * _SS_LEAD + ss, 4)) < 1e-6
        assert r.eoq > 0 and r.reorder_point > r.safety_stock


def test_demand_classification_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext203 import (
        _SB_ADI,
        _SB_CV2,
        q_demand_classification,
    )

    li, pt, ptype, daily = _type_frames(spark, sf_dir)
    n_cal = len({r.d for r in li})
    got = {r.p_type: r
           for r in q_demand_classification(spark, sf_dir).collect()}
    for t in sorted({r.p_type for r in pt}):
        dqs = [v for (tt, _), v in daily.items() if tt == t]
        nd = len(dqs)
        adi = n_cal / nd
        mu = sum(dqs) / nd
        var = (sum(v * v for v in dqs) - sum(dqs) ** 2 / nd) / (nd - 1)
        cv2 = var / (mu * mu)
        if adi < _SB_ADI and cv2 < _SB_CV2:
            cls = "smooth"
        elif adi >= _SB_ADI and cv2 < _SB_CV2:
            cls = "intermittent"
        elif adi < _SB_ADI:
            cls = "erratic"
        else:
            cls = "lumpy"
        r = got[t]
        assert abs(r.adi - round(adi, 4)) < 1e-9
        assert abs(r.cv2 - round(cv2, 4)) < 1e-9
        assert r.demand_class == cls
        assert r.adi >= 1.0  # demand days cannot exceed calendar days
