"""Batch-155 tests: theta-sketch estimates vs exact + python KMV
replay, bitmap-index algebra vs python set ops, Gorilla bit model
replay."""

import numpy as np


def test_theta_sketch_replay_and_accuracy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext160 import (
        _TS_K,
        _TS_P,
        q_theta_sketch,
    )
    from pyspark.sql import functions as F

    r = q_theta_sketch(spark, sf_dir).collect()[0]
    pu = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("ne"),
        )
        .collect()
    )
    A = {u.user_id for u in pu if u.np >= 14}
    B = {u.user_id for u in pu if u.ne >= 13}
    assert (r.exact_a, r.exact_b, r.exact_inter) == (
        len(A), len(B), len(A & B),
    )

    def h(u):
        return ((u * 48271 + 11) % _TS_P) / _TS_P

    def kmv(s):
        hs = sorted((h(u), u) for u in s)
        kept = [x for x, _ in hs[:_TS_K]]
        theta = 1.0 if len(kept) < _TS_K else max(kept)
        est = len(kept) if theta == 1.0 else (_TS_K - 1) / theta
        return set(kept), theta, est

    ka, ta, ea = kmv(A)
    kb, tb, eb = kmv(B)
    t = min(ta, tb)
    ei = len({x for x in ka & kb if x < t}) / t
    assert abs(r.est_a - ea) < 1e-3
    assert abs(r.est_b - eb) < 1e-3
    assert abs(r.est_inter - ei) < 1e-3
    # sketch accuracy: KMV relative error ~ 1/sqrt(k-1) ≈ 18%; allow 3x
    for est, exact in [
        (r.est_a, r.exact_a),
        (r.est_b, r.exact_b),
        (r.est_inter, r.exact_inter),
    ]:
        if exact > 0:
            assert abs(est - exact) / exact < 0.55


def test_bitmap_index_matches_set_algebra(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext160 import (
        q_bitmap_index,
    )

    rows = q_bitmap_index(spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    sets = {}
    for e in ev:
        sets.setdefault(e.event_type, set()).add(e.user_id)
    types = sorted(sets)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = sets[r.type_a], sets[r.type_b]
        assert r.n_and == len(a & b)
        assert abs(r.jaccard - len(a & b) / len(a | b)) < 1e-6
        # shared-word popcounts never exceed the full set sizes
        assert r.n_a_shared_words <= len(a)
        assert r.n_b_shared_words <= len(b)


def test_gorilla_bits_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext160 import (
        q_gorilla_bits,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_gorilla_bits(spark, sf_dir).collect()[0]
    ev = sorted(
        read_events(spark, sf_dir)
        .selectExpr("user_id", "unix_timestamp(ts) AS t", "event_id")
        .collect(),
        key=lambda x: (x.user_id, x.t, x.event_id),
    )
    # re-sort exactly as the query does: per user by (ts, event_id) —
    # unix_timestamp truncates ts, so sort on the raw ts order proxy
    by_user = {}
    rows2 = sorted(
        read_events(spark, sf_dir)
        .select("user_id", "ts", "event_id")
        .collect(),
        key=lambda x: (x.user_id, x.ts, x.event_id),
    )
    import calendar

    for x in rows2:
        by_user.setdefault(x.user_id, []).append(
            calendar.timegm(x.ts.utctimetuple())
        )
    total = n = zero = small = 0
    for seq in by_user.values():
        for i, t in enumerate(seq):
            n += 1
            if i == 0:
                total += 64
            elif i == 1:
                total += 14
            else:
                dod = (seq[i] - seq[i - 1]) - (seq[i - 1] - seq[i - 2])
                if dod == 0:
                    total += 1
                    zero += 1
                elif -63 <= dod <= 64:
                    total += 9
                    small += 1
                elif -255 <= dod <= 256:
                    total += 12
                elif -2047 <= dod <= 2048:
                    total += 16
                else:
                    total += 36
    assert r.n_timestamps == n
    assert r.total_bits == total
    assert abs(r.bits_per_ts - total / n) < 1e-3
    assert abs(r.compression_ratio - 64 * n / total) < 1e-3
    assert r.n_zero_dod == zero
    assert r.n_small_dod == small
    assert r.compression_ratio > 1  # the model must predict a win
