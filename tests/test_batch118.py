"""Batch-118 tests: LOF, rolling MAU, IV 2SLS — full python oracles."""

import math
from collections import defaultdict


def test_lof_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext123 import (
        _LOF_INV_SCALE,
        _LOF_K,
        q_lof_outliers,
    )

    got = q_lof_outliers(spark, sf_dir).collect()
    emb = {
        e.vec_id: [float(x) for x in e.embedding]
        for e in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def d2i(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return round(acc * 1e6)

    knn = {}
    for i, v in emb.items():
        ds = sorted(
            (d2i(v, w), j) for j, w in emb.items() if j != i
        )[:_LOF_K]
        knn[i] = ds
    kd = {i: max(d for d, _ in ds) for i, ds in knn.items()}
    sr = {
        i: sum(max(d, kd[j]) for d, j in ds) for i, ds in knn.items()
    }
    inv = {i: round(_LOF_INV_SCALE / s) for i, s in sr.items()}
    lof = {
        i: sum(inv[j] for _, j in ds) * sr[i]
        / (_LOF_K * _LOF_INV_SCALE)
        for i, ds in knn.items()
    }
    ranked = sorted(lof.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:15]
    assert len(got) == 15
    for r, (vid, score) in zip(got, ranked):
        assert r.vec_id == vid
        assert abs(r.lof - round(score, 6)) < 1e-9
    # LOF ≈ 1 for in-density points; the TOP outlier must exceed 1 and
    # the list is sorted non-increasing (small fixtures may have tail
    # entries at or below 1)
    assert got[0].lof > 1.0
    assert all(a.lof >= b.lof for a, b in zip(got, got[1:]))


def test_rolling_mau_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext123 import (
        _MAU_DAYS,
        q_rolling_mau,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.window_end: r for r in q_rolling_mau(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    import datetime

    days = {(e.user_id, e.ts.date()) for e in ev}
    mx = max(d for _, d in days)
    users_per_end = defaultdict(set)
    userdays_per_end = defaultdict(int)
    for u, d in days:
        for k in range(_MAU_DAYS):
            we = d + datetime.timedelta(days=k)
            if we <= mx:
                users_per_end[we].add(u)
                userdays_per_end[we] += 1
    assert set(got) == {str(we) for we in users_per_end}
    for we, users in users_per_end.items():
        r = got[str(we)]
        assert r.active_users == len(users)
        assert r.user_days == userdays_per_end[we]
    # a full window late in the range must cover at least one day's users
    assert got[str(mx)].active_users >= max(
        len({u for u, d in days if d == mx}), 1
    )


def test_iv_2sls_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext123 import q_iv_2sls

    [r] = q_iv_2sls(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        u = per_user[e.user_id]
        if e.event_type == "click":
            u[0] += 1
        if e.event_type == "purchase":
            u[1] += round(e.value * 100)
    rows = [(u % 2, x, y) for u, (x, y) in per_user.items()]
    n = len(rows)
    sz = sum(z for z, _, _ in rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    szx = sum(z * x for z, x, _ in rows)
    szy = sum(z * y for z, _, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    sxy = sum(x * y for _, x, y in rows)
    szz = sum(z * z for z, _, _ in rows)
    beta_iv = (szy - sz * sy / n) / (szx - sz * sx / n) / 100.0
    beta_ols = (sxy - sx * sy / n) / (sxx - sx * sx / n) / 100.0
    first = (szx - sz * sx / n) / (szz - sz * sz / n)
    assert r.n == n
    assert abs(r.beta_iv - round(beta_iv, 6)) < 1e-9
    assert abs(r.beta_ols - round(beta_ols, 6)) < 1e-9
    assert abs(r.first_stage - round(first, 6)) < 1e-9
