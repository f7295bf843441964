"""Batch-131 tests: vocabulary richness, join cardinality audit, odds
ratio — python oracles + identities."""

import math
import re
from collections import Counter, defaultdict


def test_vocab_richness_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext136 import (
        q_vocab_richness,
    )

    [r] = q_vocab_richness(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = Counter()
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        vocab.update(x for x in t.split(" ") if x)
    v = len(vocab)
    f1 = sum(1 for c in vocab.values() if c == 1)
    f2 = sum(1 for c in vocab.values() if c == 2)
    n = sum(vocab.values())
    chao1 = v + f1 * f1 / (2.0 * (f2 + 1))
    simpson = sum(c * c for c in vocab.values()) / (n * n)
    clnc = sum(round(c * math.log(c) * 1e9) for c in vocab.values())
    evenness = (math.log(n) - clnc / (1e9 * n)) / math.log(v)
    assert (r.vocab_observed, r.singletons, r.doubletons, r.n) == (
        v, f1, f2, n,
    )
    assert abs(r.chao1 - round(chao1, 4)) < 1e-9
    assert abs(r.simpson_lambda - round(simpson, 6)) < 1e-9
    assert abs(r.shannon_evenness - round(evenness, 6)) < 1e-9
    # structural facts: Chao1 >= observed; evenness and Simpson in (0,1]
    assert r.chao1 >= r.vocab_observed
    assert 0 < r.simpson_lambda <= 1
    assert 0 < r.shannon_evenness <= 1 + 1e-9


def test_join_cardinality_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext136 import (
        q_join_cardinality_est,
    )

    [r] = q_join_cardinality_est(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    keys = [o.o_custkey for o in orders]
    ckeys = Counter(c.c_custkey for c in cust)
    n_r, d_r = len(keys), len(set(keys))
    n_s, d_s = len(cust), len(ckeys)
    n_join = sum(ckeys.get(k, 0) for k in keys)
    est = n_r * n_s / max(d_r, d_s)
    q = max(est / n_join, n_join / est)
    assert (r.n_r, r.d_r, r.n_s, r.d_s, r.n_join) == (
        n_r, d_r, n_s, d_s, n_join,
    )
    assert abs(r.system_r_estimate - round(est, 4)) < 1e-9
    assert abs(r.q_error - round(q, 4)) < 1e-9
    # a pk/fk join with full containment: the formula should be exact
    assert r.q_error < 1.1


def test_odds_ratio_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext136 import (
        _OR_Z,
        q_odds_ratio,
    )

    [r] = q_odds_ratio(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        u = per_user[e.user_id]
        if e.event_type == "click":
            u[0] += 1
        if e.event_type == "purchase":
            u[1] += round(e.value * 100)
    clicks = sorted(u[0] for u in per_user.values())
    spends = sorted(u[1] for u in per_user.values())

    def median(xs):
        m = len(xs)
        return (
            xs[m // 2]
            if m % 2
            else (xs[m // 2 - 1] + xs[m // 2]) / 2.0
        )

    mc, ms = median(clicks), median(spends)
    a = b = c = d = 0
    for cl, sp in per_user.values():
        if cl > mc and sp > ms:
            a += 1
        elif cl > mc:
            b += 1
        elif sp > ms:
            c += 1
        else:
            d += 1
    orx = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
    assert abs(r.odds_ratio - round(orx, 6)) < 1e-9
    assert abs(r.or_ci_low - round(math.exp(math.log(orx) - _OR_Z * se), 6)) < 1e-9
    assert abs(r.or_ci_high - round(math.exp(math.log(orx) + _OR_Z * se), 6)) < 1e-9
    rr = (a / (a + b)) / (c / (c + d))
    assert abs(r.relative_risk - round(rr, 6)) < 1e-9
    # CI brackets the point estimate
    assert r.or_ci_low <= r.odds_ratio <= r.or_ci_high
