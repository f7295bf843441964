"""Batch-215 tests: python replays of the LM-smoothing completions
(Witten-Bell, OOV rate, stupid backoff) from raw documents."""

import math
import re
from collections import Counter


def _toks(text):
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "text"
    ).collect()


def test_witten_bell_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext220 import _WB_TOP

    rows = _corpus(spark, sf_dir)
    uni, bic = Counter(), Counter()
    for r in rows:
        t = _toks(r.text)
        uni.update(w for w in t if w != "")
        bic.update(zip(t, t[1:]))
    total = sum(uni.values())
    ctx_c = Counter()
    ctx_t = Counter()
    for (w1, _), c in bic.items():
        ctx_c[w1] += c
        ctx_t[w1] += 1
    want = sorted(
        bic.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:_WB_TOP]
    got = REGISTRY["q_witten_bell"].spark(spark, sf_dir).collect()
    assert len(got) == min(_WB_TOP, len(bic))
    for row, ((w1, w2), c) in zip(got, want):
        assert (row.w1, row.w2, row.c_bigram) == (w1, w2, c)
        lam = ctx_c[w1] / (ctx_c[w1] + ctx_t[w1])
        p = lam * (c / ctx_c[w1]) + (1 - lam) * (uni[w2] / total)
        assert abs(row.lambda_w1 - lam) < 1e-5
        assert abs(row.p_wb - p) < 1e-5
        assert 0 < row.p_wb <= 1


def test_oov_rate_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    rows = _corpus(spark, sf_dir)
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, Counter()).update(
            w for w in _toks(r.text) if w != ""
        )
    got = {
        r.source: r
        for r in REGISTRY["q_oov_rate"].spark(spark, sf_dir).collect()
    }
    for src, cnt in per_src.items():
        others = set()
        for s2, c2 in per_src.items():
            if s2 != src:
                others |= set(c2)
        oov_types = [w for w in cnt if w not in others]
        row = got[src]
        assert row.tokens == sum(cnt.values())
        assert row.types == len(cnt)
        assert row.oov_types == len(oov_types)
        assert row.oov_tokens == sum(cnt[w] for w in oov_types)


def test_stupid_backoff_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext220 import _SB_ALPHA

    rows = _corpus(spark, sf_dir)
    uni, bic = Counter(), Counter()
    streams = {}
    for r in rows:
        t = _toks(r.text)
        uni.update(w for w in t if w != "")
        bic.update(zip(t, t[1:]))
        streams.setdefault(r.source, []).extend(zip(t, t[1:]))
    total = sum(uni.values())
    ctx = Counter()
    for (w1, _), c in bic.items():
        ctx[w1] += c
    got = {
        r.source: r
        for r in REGISTRY["q_stupid_backoff"].spark(
            spark, sf_dir
        ).collect()
    }
    for src, pairs in streams.items():
        scores, backed = [], 0
        for w1, w2 in pairs:
            if (w1, w2) in bic:
                scores.append(math.log(bic[(w1, w2)] / ctx[w1]))
            else:
                scores.append(math.log(_SB_ALPHA * uni[w2] / total))
                backed += 1
        row = got[src]
        assert row.bigrams == len(pairs)
        assert abs(row.mean_log_score - sum(scores) / len(scores)) < 1e-5
        assert row.backoff_rate == round(backed / len(pairs), 6)
        # corpus-LM convention: every source bigram is in the global
        # counts, so nothing ever backs off in this construction
        assert row.backoff_rate == 0.0
