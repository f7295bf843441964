"""Batch-103 tests: Kalman filter, token entropy, burstiness, decision
stump, naive Bayes — independent python oracles."""

import math
from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.sources.tables import read_events


def _toks(text):
    return " ".join(text.strip().lower().split()).split(" ")


def test_kalman_1d_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext108 import (
        _KAL_Q,
        _KAL_R,
        q_kalman_1d,
    )

    r = q_kalman_1d(spark, sf_dir).collect()[0]
    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .count()
        .orderBy("d")
        .collect()
    )
    ys = [float(x["count"]) for x in rows]
    m, p, k = ys[0], _KAL_R, 0.0
    for y in ys[1:]:
        pp = p + _KAL_Q
        k = pp / (pp + _KAL_R)
        m = m + k * (y - m)
        p = (1 - k) * pp
    assert r.n_days == len(ys)
    assert abs(r.level - m) < 1e-4
    assert abs(r.variance - p) < 1e-4
    assert abs(r.gain - k) < 1e-6
    # the steady-state gain of the scalar filter: k* solves
    # k = (p+q)/(p+q+r) with p = (1-k)(p+q); after hundreds of days the
    # filter must have converged to it
    q_, r_ = _KAL_Q, _KAL_R
    pstar = (q_ + math.sqrt(q_ * q_ + 4 * q_ * r_)) / 2
    assert abs(r.gain - pstar / (pstar + r_)) < 1e-6


def test_token_entropy_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext108 import q_token_entropy

    got = {r.doc_id: r for r in q_token_entropy(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        c = Counter(_toks(d.text))
        n = sum(c.values())
        ent = -sum((v / n) * math.log(v / n) for v in c.values())
        r = got[d.doc_id]
        assert r.n_tokens == n and r.n_distinct == len(c)
        assert abs(r.entropy - ent) < 1e-5
        # 1e-6 headroom: the query rounds entropy at 6 decimals, which
        # can tip a uniform-distribution doc just above ln(n_distinct)
        assert -1e-6 <= r.entropy <= math.log(len(c)) + 1e-6


def test_burstiness_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext108 import (
        _BURST_MIN,
        q_burstiness,
    )

    got = {r.user_id: r for r in q_burstiness(spark, sf_dir).collect()}
    ev = sorted(
        read_events(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r.us)
    for uid, ts in by_user.items():
        gaps = [(b - a) / 1e6 for a, b in zip(ts, ts[1:])]
        if len(gaps) < _BURST_MIN:
            assert uid not in got
            continue
        mu = sum(gaps) / len(gaps)
        sd = math.sqrt(
            sum((g - mu) ** 2 for g in gaps) / (len(gaps) - 1)
        )
        r = got[uid]
        assert r.n_gaps == len(gaps)
        assert abs(r.mean_gap_s - mu) < 1e-4
        assert abs(r.sd_gap_s - sd) < 1e-3
        assert abs(r.burstiness - (sd - mu) / (sd + mu)) < 1e-5
        assert -1.0 <= r.burstiness <= 1.0


def test_decision_stump_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext108 import (
        _STUMP_DIM,
        _STUMP_THRESHOLDS,
        q_decision_stump,
    )

    r = q_decision_stump(spark, sf_dir).collect()[0]
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.element_at(
                F.col("embedding").cast("array<double>"), _STUMP_DIM
            ).alias("x"),
            "label",
        )
        .collect()
    )
    best = None
    n_all = len(rows)
    for thr in _STUMP_THRESHOLDS:
        sides = {True: Counter(), False: Counter()}
        for row in rows:
            sides[row.x <= thr][row.label] += 1
        sum_p2w = 0.0
        for side, c in sides.items():
            n = sum(c.values())
            if n == 0:
                continue
            sum_p2w += (n / n_all) * sum((v / n) ** 2 for v in c.values())
        g = round(1.0 - sum_p2w, 6)
        key = (g, thr)
        if best is None or key < best[0]:
            best = (key, sum(sides[True].values()), sum(sides[False].values()))
    (g, thr), n_left, n_right = best
    assert r.threshold == thr
    assert abs(r.weighted_gini - g) < 1e-6
    assert (r.n_left, r.n_right) == (n_left, n_right)
    assert r.n_left + r.n_right == n_all


def test_naive_bayes_lang_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext108 import (
        q_naive_bayes_lang,
    )

    got = {r.doc_id: r for r in q_naive_bayes_lang(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    lw: dict = {}
    lang_docs, lang_toks = Counter(), Counter()
    vocab = set()
    for d in docs:
        toks = _toks(d.text)
        lang_docs[d.lang] += 1
        lang_toks[d.lang] += len(toks)
        vocab.update(toks)
        cc = lw.setdefault(d.lang, Counter())
        for t in toks:
            cc[t] += 1
    v, total_docs = len(vocab), len(docs)
    n_correct = 0
    for d in docs:
        c = Counter(_toks(d.text))
        scores = {}
        for lang in lang_docs:
            s = math.log(lang_docs[lang] / total_docs)
            for w, k in c.items():
                s += k * math.log(
                    (lw[lang][w] + 1.0) / (lang_toks[lang] + v)
                )
            scores[lang] = s
        mx = max(scores.values())
        pred = min(l for l, s in scores.items() if s >= mx - 1e-9)
        r = got[d.doc_id]
        assert r.true_lang == d.lang
        assert r.pred_lang == pred, (d.doc_id, r.pred_lang, pred, scores)
        assert r.correct == (pred == d.lang)
        n_correct += int(pred == d.lang)
    # resubstitution NB must beat the majority-class baseline
    assert n_correct / len(docs) > max(lang_docs.values()) / total_docs
