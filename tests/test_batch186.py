"""Batch-186 tests: Count-Min replay + guarantee, AMS median-of-means
replay, Efraimidis-Spirakis top-k replay."""

import math

from pyspark.sql import functions as F


def _user_counts(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r.user_id: r.n for r in rows}


def test_countmin_matches_replay_and_never_undercounts(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext191 import (
        _CM_D,
        _CM_W,
        _P,
        q_countmin,
    )

    counts = _user_counts(spark, sf_dir)
    sketch = {}
    for uid, n in counts.items():
        for j in range(_CM_D):
            b = ((100003 * j + 31) * (uid % _P) + 12345 * j + 7) % _P % _CM_W
            sketch[(j, b)] = sketch.get((j, b), 0) + n
    want = {}
    for uid, n in counts.items():
        est = min(
            sketch[
                (
                    j,
                    ((100003 * j + 31) * (uid % _P) + 12345 * j + 7)
                    % _P
                    % _CM_W,
                )
            ]
            for j in range(_CM_D)
        )
        want[uid] = (n, est)
    got = q_countmin(spark, sf_dir).collect()
    assert len(got) == len(want) > 0
    for r in got:
        n, est = want[r.user_id]
        assert (r.exact_n, r.est) == (n, est)
        assert r.overcount == est - n
        assert r.never_undercounts and est >= n


def test_ams_f2_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext191 import (
        _AMS_GRID,
        _P,
        q_ams_f2,
    )

    counts = _user_counts(spark, sf_dir)
    z = {}
    for i, g in _AMS_GRID:
        z[i] = sum(
            (1 - 2 * (((100003 * i + 59) * (uid % _P) + 31 * i + 11) % _P % 2))
            * n
            for uid, n in counts.items()
        )
    means = [
        sum(float(z[i]) ** 2 for i, g in _AMS_GRID if g == grp) / 3.0
        for grp in range(3)
    ]
    median = sorted(means)[1]
    exact_f2 = sum(float(n) ** 2 for n in counts.values())
    [r] = q_ams_f2(spark, sf_dir).collect()
    assert r.exact_f2 == exact_f2
    for grp in range(3):
        assert abs(r[f"est_g{grp}"] - round(means[grp], 4)) < 1e-9
    assert abs(r.median_est - round(median, 4)) < 1e-9
    assert abs(r.rel_err - round(abs(median - exact_f2) / exact_f2, 6)) < 1e-9


def test_reservoir_sample_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext191 import (
        _P,
        _RS_ADD,
        _RS_K,
        _RS_MULT,
        q_reservoir_sample,
    )
    from arrow_supercluster_spark.plans.registry_ext import _docs

    rows = (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in rows:
        u = ((_RS_MULT * (r.doc_id % _P) + _RS_ADD) % _P + 1) / float(_P + 1)
        keyed.append((math.log(u) / r.n_chars, r.doc_id, r.n_chars))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = keyed[:_RS_K]
    got = q_reservoir_sample(spark, sf_dir).collect()
    assert len(got) == _RS_K
    for rank, (k, did, nch) in enumerate(want, start=1):
        r = got[rank - 1]
        assert (r.rank, r.doc_id, r.n_chars) == (rank, did, nch)
        assert abs(r.es_key - round(k, 6)) < 1e-9
        assert r.es_key <= 0  # ln(u) <= 0, weights positive
