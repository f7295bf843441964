"""Batch-157 tests: MAP@k python replay, ECE python oracle + a
calibrated-predictor contrast, macro/micro F1 vs sklearn."""

import datetime

import numpy as np


def test_map_at_k_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext162 import (
        _MAP_K,
        q_map_at_k,
    )

    r = q_map_at_k(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array([[float(v) for v in e.embedding] for e in rows])
    y = np.array([e.label for e in rows])
    ids = np.array([e.vec_id for e in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = np.round(Xn @ Xn.T, 6)
    aps = []
    for qi in range(len(rows)):
        order = sorted(
            (j for j in range(len(rows)) if j != qi),
            key=lambda j: (-cos[qi, j], ids[j]),
        )[:_MAP_K]
        rel = [1 if y[j] == y[qi] else 0 for j in order]
        hits = 0
        psum = 0.0
        for rk, v in enumerate(rel, start=1):
            if v:
                hits += 1
                psum += hits / rk
        aps.append(psum / hits if hits else 0.0)
    assert r.n_queries == len(rows)
    assert abs(r.map_at_k - np.mean(aps)) < 1e-4
    assert abs(
        r.frac_zero_ap - np.mean([a == 0 for a in aps])
    ) < 1e-4
    assert 0 < r.map_at_k <= 1


def test_ece_python_oracle_and_calibrated_contrast(
    spark, sf_dir, tmp_path
):
    from arrow_supercluster_spark.plans.registry_ext162 import (
        _ECE_BINS,
        _H_MOD,
        _H_MULT,
        q_ece,
    )
    from pyspark.sql import functions as F

    r = q_ece(spark, sf_dir).collect()[0]
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("y")
        )
        .collect()
    )
    p = np.array([(u.user_id * _H_MULT) % _H_MOD for u in users]) / _H_MOD
    y = np.array([u.y for u in users], float)
    b = np.floor(p * _ECE_BINS).astype(int)
    ece = mce = 0.0
    for k in set(b):
        m = b == k
        gap = abs(y[m].mean() - p[m].mean())
        ece += m.sum() / len(y) * gap
        mce = max(mce, gap)
    assert r.n_users == len(users)
    assert abs(r.ece - ece) < 1e-5
    assert abs(r.mce - mce) < 1e-5

    # a CALIBRATED predictor: y = 1 iff a second independent hash
    # lands below p, so per-bin accuracy tracks confidence
    rows = []
    for u in range(1, 1001):
        pu = ((u * _H_MULT) % _H_MOD) / _H_MOD
        yu = ((u * 7919 + 13) % 1000) / 1000 < pu
        rows.append(
            (
                u,
                datetime.datetime(2024, 1, 5, 12, 0),
                u,
                "purchase",
                100.0 if yu else 10.0,
                "{}",
            )
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    rc = q_ece(spark, str(tmp_path)).collect()[0]
    assert rc.ece < 0.1
    assert rc.ece < r.ece  # fixture's hash predictor is uncalibrated


def test_macro_f1_matches_sklearn(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext162 import q_macro_f1

    rows = q_macro_f1(spark, sf_dir).collect()
    got = {r.lang: r for r in rows}
    # rebuild predictions with the same inline detector
    stop = {
        "en": ("the", "and", "of", "to", "a", "in", "is"),
        "de": ("der", "die", "und", "das", "ist", "ein", "zu"),
        "fr": ("le", "la", "et", "les", "des", "un", "est"),
        "es": ("el", "la", "de", "que", "y", "en", "los"),
        "it": ("il", "di", "che", "e", "la", "un", "per"),
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    t, p = [], []
    for d in docs:
        words = d.text.lower().split(" ")
        best = max(
            sorted(stop),
            key=lambda lang: (
                sum(w in stop[lang] for w in words),
                [-ord(ch) for ch in lang],
            ),
        )
        t.append(d.lang)
        p.append(best)
    classes = sorted(set(t))
    assert set(got) == set(classes)
    for cls in classes:
        tp = sum(1 for a, b in zip(t, p) if a == cls and b == cls)
        n_true = t.count(cls)
        n_pred = p.count(cls)
        assert got[cls].tp == tp
        assert got[cls].n_true == n_true
        assert got[cls].n_pred == n_pred
        f1 = 2 * tp / (n_pred + n_true) if n_pred + n_true else 0.0
        assert abs((got[cls].f1 or 0.0) - f1) < 1e-5
    try:
        from sklearn.metrics import f1_score
    except ImportError:
        return
    macro = f1_score(
        t, p, labels=classes, average="macro", zero_division=0.0
    )
    any_row = rows[0]
    assert abs(any_row.macro_f1 - macro) < 1e-5
    micro = sum(
        1 for a, b in zip(t, p) if a == b
    ) / len(t)
    assert abs(any_row.micro_f1 - micro) < 1e-5
