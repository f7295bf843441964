"""Batch-112 tests: JL projection, k-means|| init, char-trigram lang
ID — python oracles + quality/property assertions."""

import math
import re
from collections import Counter, defaultdict

_P = 2147483647


def test_jl_projection_python_oracle_and_concentration(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext117 import (
        _JL_IN,
        _JL_OUT,
        q_jl_projection,
    )

    got = {r.vec_id: r for r in q_jl_projection(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    assert set(got) == {e.vec_id for e in emb}
    ratios = []
    for e in emb[:40]:
        v = [float(x) for x in e.embedding]
        y = []
        for j in range(1, _JL_OUT + 1):
            acc = 0.0
            for i in range(1, _JL_IN + 1):
                s = 1 - 2 * (((i * 100003 + j * 31 + 7) * 2654435761 % _P) % 2)
                acc = acc + s * v[i - 1]
            y.append(acc / math.sqrt(_JL_OUT))
        n_orig, n_proj = 0.0, 0.0
        for x in v:
            n_orig += x * x
        for x in y:
            n_proj += x * x
        r = got[e.vec_id]
        assert abs(r.norm_orig - round(math.sqrt(n_orig), 6)) < 1e-9
        assert abs(r.norm_proj - round(math.sqrt(n_proj), 6)) < 1e-9
    ratios = [r.norm_ratio for r in got.values()]
    # JL concentration at k=16: norm² distortion has sd ≈ 1/√k = 0.25,
    # so individual ratios roam but the band is bounded and the mean
    # sits near 1
    assert all(0.15 < x < 3.0 for x in ratios)
    assert abs(sum(ratios) / len(ratios) - 1.0) < 0.2


def test_kmeanspp_init_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext117 import (
        _KPP_L,
        _KPP_ROUNDS,
        q_kmeanspp_init,
    )

    got = {r.cand_id: r.weight for r in q_kmeanspp_init(spark, sf_dir).collect()}
    emb = {
        e.vec_id: [float(x) for x in e.embedding]
        for e in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def d2i(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return round(acc * 1e6)

    c0 = min(emb)
    centers = {c0}
    h1 = {i: ((i % _P) * 2654435761 + 977) % _P for i in emb}
    for rnd in range(_KPP_ROUNDS):
        dist = {
            i: min(d2i(v, emb[c]) for c in centers) for i, v in emb.items()
        }
        tot = sum(dist.values())
        coin = (
            h1 if rnd == 0 else {i: (h1[i] * 31) % _P for i in emb}
        )
        picked = {
            i
            for i in emb
            if coin[i] * 1.0 / _P < _KPP_L * dist[i] / tot
        }
        centers |= picked
    weights = Counter()
    for i, v in emb.items():
        best = min(centers, key=lambda c: (d2i(v, emb[c]), c))
        weights[best] += 1
    want = {c: weights.get(c, 0) for c in centers}
    assert got == want
    # the init actually oversamples: more than 1 center, far fewer than n
    assert 1 < len(got) < len(emb) // 2
    assert sum(got.values()) == len(emb)


def test_charngram_langid_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext117 import (
        q_charngram_langid,
    )

    got = {
        (r.lang, r.predicted): r.n
        for r in q_charngram_langid(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    doc_counts, lang_profile = {}, defaultdict(Counter)
    langs_of = {}
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        c = Counter(t[i : i + 3] for i in range(max(len(t) - 2, 0)))
        doc_counts[d.doc_id] = c
        langs_of[d.doc_id] = d.lang
        lang_profile[d.lang].update(c)
    l2 = {
        lang: sum(v * v for v in prof.values())
        for lang, prof in lang_profile.items()
    }
    conf = Counter()
    for did, c in doc_counts.items():
        d2 = sum(v * v for v in c.values())
        best, best_cos = None, None
        for lang in sorted(lang_profile):
            num = sum(v * lang_profile[lang][g] for g, v in c.items())
            cos = num / (math.sqrt(d2) * math.sqrt(l2[lang]))
            if best_cos is None or cos > best_cos:
                best, best_cos = lang, cos
        conf[(langs_of[did], best)] += 1
    assert got == dict(conf)
