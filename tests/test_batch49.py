"""Batch-49 tests: imputation audit math, LOO no-leakage property,
WoE/IV reference."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events, read_table


def test_impute_audit(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("event_type", "value").collect()
    by_type = defaultdict(lambda: [0, 0, 0.0])  # n, nulls, sum
    means = defaultdict(list)
    for r in ev:
        by_type[r.event_type][0] += 1
        if r.value is None:
            by_type[r.event_type][1] += 1
        else:
            by_type[r.event_type][2] += r.value
            means[r.event_type].append(r.value)
    got = {r.event_type: r for r in REGISTRY["q_impute_values"].spark(spark, sf_dir).collect()}
    for et, (n, nulls, s) in by_type.items():
        m = round(sum(means[et]) / len(means[et]), 6)
        r = got[et]
        assert (r.n_rows, r.n_imputed) == (n, nulls)
        assert abs(r.fill_value - m) < 1.01e-6
        assert abs(r.sum_imputed - round(s + nulls * m, 4)) < 2e-3


def test_target_encoding_no_leakage(spark, sf_dir):
    rows = REGISTRY["q_target_encoding"].spark(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").collect()
    c = {r.c_custkey: None for r in read_table(spark, sf_dir, "customer").collect()}
    y = {}
    seg_of = {}
    cust = {r.c_custkey: r.c_mktsegment for r in read_table(spark, sf_dir, "customer").collect()}
    for r in o:
        y[r.o_orderkey] = r.o_totalprice
        seg_of[r.o_orderkey] = cust[r.o_custkey]
    sums = defaultdict(float)
    ns = defaultdict(int)
    for k, v in y.items():
        sums[seg_of[k]] += v
        ns[seg_of[k]] += 1
    for r in rows[:500]:
        n = ns[r.seg]
        if n > 1:
            expect = round((sums[r.seg] - y[r.o_orderkey]) / (n - 1), 4)
            assert abs(r.loo_encoding - expect) < 2e-4
        else:
            assert r.loo_encoding is None


def test_woe_iv_reference(spark, sf_dir):
    rows = REGISTRY["q_woe_iv"].spark(spark, sf_dir).collect()
    assert rows
    # totals are over ALL buckets (the query filters zero-count buckets
    # AFTER computing shares) -> recompute population totals from events
    per_user = {}
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        lab = per_user.get(r.user_id, 0)
        if r.event_type == "purchase" and r.value > 90:
            lab = 1
        per_user[r.user_id] = max(lab, per_user.get(r.user_id, 0))
    tp = sum(per_user.values())
    tn = len(per_user) - tp
    iv = 0.0
    for r in rows:
        sp, sn = r.n_pos / tp, r.n_neg / tn
        assert abs(r.woe - round(math.log(sp / sn), 6)) < 2e-5
        iv += (sp - sn) * math.log(sp / sn)
    assert iv >= 0  # IV is a sum of non-negative terms
