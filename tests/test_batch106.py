"""Batch-106 tests: portable HLL (python register oracle + accuracy
bound), Kneser-Ney bigram scoring (python oracle + probability
normalization)."""

import math
from collections import Counter, defaultdict


def _toks(text):
    return [t for t in " ".join(text.strip().lower().split()).split(" ") if t]


def _poly(s):
    h = ord(s[0])
    for c in s[1:]:
        h = (h * 31 + ord(c)) % 2147483647
    return h


def test_hll_portable_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext111 import (
        _HLL_ALPHA,
        _HLL_M,
        q_hll_portable,
    )

    r = q_hll_portable(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = [t for d in docs for t in _toks(d.text)]
    regs = defaultdict(int)
    for t in toks:
        h = _poly(t)
        b, w = h % _HLL_M, h // _HLL_M
        rho = 26 if w == 0 else 25 - int(math.floor(math.log2(w)))
        regs[b] = max(regs[b], rho)
    denom = sum(2.0 ** -m for m in regs.values())
    v = _HLL_M - len(regs)
    e = _HLL_ALPHA * _HLL_M * _HLL_M / (denom + v)
    if e <= 2.5 * _HLL_M and v > 0:
        e = _HLL_M * math.log(_HLL_M / v)
    n_exact = len(set(toks))
    assert r.n_exact == n_exact
    assert abs(r.hll_estimate - e) < 1e-3
    # HLL standard error is 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert r.rel_error < 3 * 1.04 / math.sqrt(_HLL_M)


def test_kneser_ney_python_oracle_and_normalization(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext111 import (
        _KN_D,
        q_kneser_ney,
    )

    got = {r.doc_id: r for r in q_kneser_ney(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt2 = Counter()
    for d in docs:
        ts = _toks(d.text)
        for a, b in zip(ts, ts[1:]):
            cnt2[(a, b)] += 1
    c1, n1fw, npc = Counter(), Counter(), Counter()
    for (a, b), c in cnt2.items():
        c1[a] += c
        n1fw[a] += 1
        npc[b] += 1
    nb = len(cnt2)

    def pkn(a, b):
        return (cnt2[(a, b)] - _KN_D) / c1[a] + _KN_D * n1fw[a] / c1[a] * (
            npc[b] / nb
        )

    for d in docs:
        ts = _toks(d.text)
        if len(ts) < 2:
            assert d.doc_id not in got
            continue
        lps = [math.log(pkn(a, b)) for a, b in zip(ts, ts[1:])]
        r = got[d.doc_id]
        assert r.n_bigrams == len(lps)
        assert abs(r.kn_logprob - sum(lps) / len(lps)) < 1e-5
    # KN is a proper conditional distribution: for a few contexts w1,
    # sum over ALL seen w2 of P(w2|w1) + backoff mass of unseen ones
    # must be <= 1 (equality only when every w2 continuation is seen)
    vocab2 = set(npc)
    for a in list(c1)[:5]:
        total = sum(
            (cnt2[(a, b)] - _KN_D) / c1[a] + _KN_D * n1fw[a] / c1[a] * (npc[b] / nb)
            for b in vocab2
            if (a, b) in cnt2
        ) + sum(
            _KN_D * n1fw[a] / c1[a] * (npc[b] / nb)
            for b in vocab2
            if (a, b) not in cnt2
        )
        assert total <= 1.0 + 1e-9
