"""Batch-175 tests: BLEU/ROUGE python replays, sklearn kappa parity,
Krippendorff hand-formula replay, ICC ANOVA replay, calibration-curve
consistency with ECE."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import functions as F


def _r6(x: float) -> float:
    """Half-up round to 6 — Spark's F.round / DuckDB's round, NOT
    python's banker's round (p3 at sf0.001 lands exactly on
    0.6953125 = 89/128 and the two conventions split)."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"),
                                           rounding=ROUND_HALF_UP))


def _pairs(spark, sf_dir):
    """(doc_id, source, ref_tokens, cand_tokens) replay of the shared
    reference/candidate fixture."""
    from arrow_supercluster_spark.operators.dedup import normalize_text
    from arrow_supercluster_spark.plans.registry_ext180 import _CAND_DROP

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "source",
            normalize_text(F.col("text")).alias("t"),
        )
        .collect()
    )
    out = []
    for r in rows:
        ref = r.t.split(" ")
        cand = [t for i, t in enumerate(ref) if (i + 1) % _CAND_DROP != 0]
        out.append((r.doc_id, r.source, ref, cand))
    return out


def _grams(toks, n):
    return Counter(
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    )


def test_bleu_matches_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import (
        q_bleu_corpus,
    )

    pairs = _pairs(spark, sf_dir)
    by_src = {}
    for _, src, ref, cand in pairs:
        by_src.setdefault(src, []).append((ref, cand))
    want = {}
    for src, ps in by_src.items():
        p = []
        for n in range(1, 5):
            match = tot = 0
            for ref, cand in ps:
                cg, rg = _grams(cand, n), _grams(ref, n)
                match += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
                tot += sum(cg.values())
            p.append(match / tot if tot else 0.0)
        ref_len = sum(len(r) for r, _ in ps)
        cand_len = sum(len(c) for _, c in ps)
        bp = min(1.0, np.exp(1 - ref_len / cand_len))
        bleu = (
            0.0
            if any(x == 0 for x in p)
            else bp * np.exp(sum(np.log(x) for x in p) / 4)
        )
        want[src] = ([_r6(x) for x in p], _r6(float(bp)),
                     _r6(float(bleu)))
    for r in q_bleu_corpus(spark, sf_dir).collect():
        ps, bp, bleu = want[r.source]
        assert [r.p1, r.p2, r.p3, r.p4] == ps
        assert r.brevity_penalty == bp
        assert abs(r.bleu - bleu) < 2e-6
        # candidate deletion only removes grams: precision <= 1, and
        # higher-order precisions cannot exceed p1
        assert r.p1 <= 1.0 and r.p4 <= r.p1 + 1e-9


def test_rouge_matches_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import q_rouge_n

    pairs = _pairs(spark, sf_dir)
    agg = {}
    for _, src, ref, cand in pairs:
        for n in (1, 2):
            if len(ref) < n:
                continue
            rg, cg = _grams(ref, n), _grams(cand, n)
            match = sum(min(c, cg.get(g, 0)) for g, c in rg.items())
            rec = match / sum(rg.values())
            ctot = sum(cg.values())
            prec = match / ctot if ctot else 0.0
            f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
            agg.setdefault((src, n), []).append((rec, prec, f1))
    for r in q_rouge_n(spark, sf_dir).collect():
        vals = agg[(r.source, r.n)]
        assert r.n_docs == len(vals)
        assert abs(r.rouge_recall - np.mean([v[0] for v in vals])) < 2e-6
        assert abs(r.rouge_precision - np.mean([v[1] for v in vals])) < 2e-6
        assert abs(r.rouge_f1 - np.mean([v[2] for v in vals])) < 2e-6
        # deletion-only candidates: recall < 1 unless nothing dropped
        assert r.rouge_recall <= 1.0


def _ratings(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import _KAPPA_CUTS

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    out = []
    for r in rows:
        a = sum(r.n_chars >= c for c in _KAPPA_CUTS)
        b = (
            (a + 1 + r.doc_id % 3) % 4
            if (r.doc_id * 2654435761) % 97 < 19
            else a
        )
        out.append((r.source, a, b))
    return out


def test_cohen_kappa_matches_hand_formula(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import (
        q_cohen_kappa,
    )

    rated = _ratings(spark, sf_dir)
    for r in q_cohen_kappa(spark, sf_dir).collect():
        a = [x[1] for x in rated if x[0] == r.source]
        b = [x[2] for x in rated if x[0] == r.source]
        n = len(a)
        assert r.n_docs == n
        po = sum(x == y for x, y in zip(a, b)) / n
        ca, cb = Counter(a), Counter(b)
        pe = sum(ca[k] * cb.get(k, 0) for k in ca) / (n * n)
        if pe == 1.0:
            assert r.kappa is None
            continue
        kappa = (po - pe) / (1 - pe)
        assert abs(r.kappa - kappa) < 2e-6
        # sklearn cross-check when available
        try:
            from sklearn.metrics import cohen_kappa_score
        except ImportError:
            continue
        assert abs(r.kappa - cohen_kappa_score(a, b)) < 2e-6


def test_kripp_alpha_matches_hand_formula(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import (
        q_kripp_alpha,
    )

    rated = _ratings(spark, sf_dir)
    N = len(rated)
    disagree = sum(1 for _, a, b in rated if a != b)
    pooled = Counter([a for _, a, _ in rated] + [b for _, _, b in rated])
    n = 2 * N
    d_o = disagree / N
    d_e = (n * n - sum(c * c for c in pooled.values())) / (n * (n - 1))
    row = q_kripp_alpha(spark, sf_dir).collect()[0]
    assert row.n_units == N and row.disagree == disagree
    assert abs(row.alpha - (1 - d_o / d_e)) < 2e-6
    assert row.alpha <= 1.0


def test_icc_matches_numpy_anova(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import (
        _ICC_K,
        q_icc_oneway,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    by_src = {}
    for d in docs:
        xs = [
            10.0 * ((d.doc_id * 16807) % 2147483647) / 2147483647.0
            + (((d.doc_id + 7919 * r) * 48271) % 65537) / 65537.0
            - 0.5
            for r in range(1, _ICC_K + 1)
        ]
        by_src.setdefault(d.source, []).append(xs)
    for r in q_icc_oneway(spark, sf_dir).collect():
        X = np.array(by_src[r.source])
        Nd, k = X.shape
        grand = X.mean()
        msb = k * ((X.mean(axis=1) - grand) ** 2).sum() / (Nd - 1)
        msw = ((X - X.mean(axis=1, keepdims=True)) ** 2).sum() / (
            Nd * (k - 1)
        )
        icc = (msb - msw) / (msb + (k - 1) * msw)
        assert r.n_docs == Nd
        assert abs(r.msb - msb) < 1e-5
        assert abs(r.msw - msw) < 1e-5
        assert abs(r.icc1 - icc) < 1e-5
        assert -1.0 / (k - 1) - 1e-9 <= r.icc1 <= 1.0 + 1e-9


def test_calibration_curve_replay_and_coverage(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext180 import (
        _CAL_BINS,
        _H_MOD,
        _H_MULT,
        q_calibration_curve,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("label")
        )
        .collect()
    )
    bins = {}
    for u in users:
        s = ((u.user_id * _H_MULT) % _H_MOD) / _H_MOD
        bins.setdefault(int(s * _CAL_BINS), []).append((s, u.label))
    rows = {r.bin: r for r in q_calibration_curve(spark, sf_dir).collect()}
    assert set(rows) == set(bins)
    total = 0
    for b, vals in bins.items():
        r = rows[b]
        assert r.n == len(vals)
        assert abs(r.mean_pred - np.mean([v[0] for v in vals])) < 2e-6
        assert abs(r.frac_pos - np.mean([v[1] for v in vals])) < 2e-6
        assert abs(r.gap - abs(r.mean_pred - r.frac_pos)) < 2e-6
        total += r.n
    assert total == len(users)
