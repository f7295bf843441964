"""Batch-91 tests: Bayesian posterior sanity, IVM delta-term coverage,
PSM matching semantics."""

import tempfile

from pyspark.sql import functions as F


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, t string"
    ).select(
        "event_id", F.to_timestamp("t").alias("ts"), "user_id",
        "event_type", "value", F.lit('{"k": 1}').alias("props"),
    ).write.parquet(f"{d}/events.parquet")


def test_bayes_ab_symmetric_and_dominant(spark):
    from arrow_supercluster_spark.plans.registry_ext96 import q_bayes_ab

    with tempfile.TemporaryDirectory() as d:
        # symmetric arms: even/odd users, 2 of 4 convert in each arm
        rows = []
        eid = 0
        for uid in range(8):
            eid += 1
            conv = uid in (0, 2, 1, 3)
            rows.append(
                (eid, uid, "purchase" if conv else "view",
                 100.0 if conv else 1.0, "2024-01-01 00:00:00")
            )
        _write_events(spark, d, rows)
        [r] = q_bayes_ab(spark, d).collect()
        assert (r.n0, r.k0, r.n1, r.k1) == (4, 2, 4, 2)
        assert abs(r.p_b_beats_a - 0.5) < 0.02

    with tempfile.TemporaryDirectory() as d:
        # arm 1 dominates: all odd users convert, no even user does
        rows = []
        eid = 0
        for uid in range(20):
            eid += 1
            conv = uid % 2 == 1
            rows.append(
                (eid, uid, "purchase" if conv else "view",
                 100.0 if conv else 1.0, "2024-01-01 00:00:00")
            )
        _write_events(spark, d, rows)
        [r] = q_bayes_ab(spark, d).collect()
        assert r.p_b_beats_a > 0.99


def test_join_ivm_delta_terms_all_fire_and_match_recompute(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext96 import q_join_ivm

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # the split predicates must make every delta term non-empty
    for ro, rl in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        n = (
            o.filter((F.col("o_orderkey") % 5 == 0) == (ro == 1))
            .join(
                li.filter((F.col("l_linenumber") >= 4) == (rl == 1)),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert n > 0, (ro, rl)
    got = {
        r.priority: (r.n_lines, r.revenue)
        for r in q_join_ivm(spark, sf_dir).collect()
    }
    want = {
        r.priority: (r.n_lines, r.revenue)
        for r in o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_psm_matches_nearest_control_with_caliper(spark):
    """Verify the matching against a brute-force nearest-control
    computed in Python, INCLUDING treated users dropped because no
    control lands within the ±1 score band."""
    from arrow_supercluster_spark.plans.registry_ext96 import (
        _H_MOD,
        _H_MULT,
        _PSM_BANDS,
        q_psm_att,
    )

    uids = list(range(1, 30))
    with tempfile.TemporaryDirectory() as d:
        rows = [
            (i, uid, "purchase", float(uid), "2024-01-01 00:00:00")
            for i, uid in enumerate(uids)
        ]
        _write_events(spark, d, rows)
        [r] = q_psm_att(spark, d).collect()

    def score(u):
        return ((u * _H_MULT) % _H_MOD) / _H_MOD

    treated = [(u, score(u), float(u)) for u in uids if u % 2 == 1]
    control = [(u, score(u), float(u)) for u in uids if u % 2 == 0]
    gaps = []
    for tu, ts, tout in treated:
        tb = int(ts * _PSM_BANDS)
        cand = [
            (abs(ts - cs), cu, cout)
            for cu, cs, cout in control
            if tb - 1 <= int(cs * _PSM_BANDS) <= tb + 1
        ]
        if cand:
            _, _, cout = min(cand)
            gaps.append(tout - cout)
    assert r.n_matched == len(gaps)
    assert abs(r.att - round(sum(gaps) / len(gaps), 4)) < 1e-9
