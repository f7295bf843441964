"""Batch-127 tests: source Shapley valuation, Haar energy, LZ76
complexity — independent python oracles + axioms."""

import math
import re
from collections import Counter, defaultdict


def test_source_shapley_python_oracle_and_efficiency(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext132 import (
        _SV_SCALE,
        _SV_TOP,
        _sv_weight,
        q_source_shapley_value,
    )

    got = {
        r.source: r.shapley_vocab
        for r in q_source_shapley_value(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(d.source for d in docs)
    players = [
        s
        for s, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_SV_TOP
        ]
    ]
    rk = {s: i for i, s in enumerate(players)}
    tok_masks = defaultdict(lambda: [0, 0])
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        for tok in set(x for x in t.split(" ") if x):
            e = tok_masks[tok]
            if d.source in rk:
                e[0] |= 1 << rk[d.source]
            else:
                e[1] = 1
    v = {}
    for m in range(1 << _SV_TOP):
        v[m] = sum(
            1
            for pmask, in_rest in tok_masks.values()
            if in_rest or (pmask & m)
        )
    shap = {}
    for s in players:
        total = 0
        for m in range(1 << _SV_TOP):
            if m & (1 << rk[s]):
                continue
            t = (v[m | (1 << rk[s])] - v[m]) * _sv_weight(
                bin(m).count("1")
            )
            total += round(t * _SV_SCALE)
        shap[s] = round(total / _SV_SCALE, 4)
    assert got == shap
    # efficiency: Σφ = v(all players) − v(rest only) up to the grid
    assert abs(
        sum(got.values()) - (v[(1 << _SV_TOP) - 1] - v[0])
    ) < 1e-2
    # at least one source must contribute unique vocabulary or all be 0+
    assert all(x >= -1e-9 for x in got.values())


def test_haar_energy_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext132 import (
        _HAAR_LEN,
        q_haar_energy,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.level: r for r in q_haar_energy(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    series = [0] * _HAAR_LEN
    for e in ev:
        series[e.ts.day - 1] += 1
    level = list(series)
    k = 0
    energies = {}
    while len(level) > 1:
        k += 1
        nxt, det = [], []
        for i in range(0, len(level), 2):
            nxt.append(level[i] + level[i + 1])
            det.append(level[i] - level[i + 1])
        energies[k] = (sum(d * d for d in det) / 2**k, len(det))
        level = nxt
    te = sum(e for e, _ in energies.values())
    assert set(got) == set(energies)
    for lv, (en, nc) in energies.items():
        r = got[lv]
        assert abs(r.energy - round(en, 4)) < 1e-9
        assert r.n_coeffs == nc
        assert abs(r.energy_frac - round(en / te, 6)) < 1e-9
    # Parseval sanity: total detail energy equals series variance * n
    # (up to the mean term): Σ levels energy = Σx² − (Σx)²/n
    sx = sum(series)
    sxx = sum(x * x for x in series)
    assert abs(te - (sxx - sx * sx / _HAAR_LEN)) < 1e-6


def _lz76_enumerated(s: str) -> int:
    """Independent re-derivation against the DEFINITION: extend the
    phrase while it matches any explicitly enumerated window of the
    preceding text (no substring operator, no shared code path)."""
    phrases = 0
    i = 0
    n = len(s)
    while i < n:
        l = 1
        while i + l <= n:
            prefix_end = i + l - 1
            cand = s[i : i + l]
            found = False
            for a in range(prefix_end - l + 1):
                if s[a : a + l] == cand:
                    found = True
                    break
            if not found:
                break
            l += 1
        phrases += 1
        i += l
    return phrases


def test_lz76_implementations_agree():
    from arrow_supercluster_spark.plans.registry_ext132 import lz76_phrases

    cases = [
        "", "a", "aa", "ab", "aaaa", "abab", "abcabcabc",
        "aacgacga", "ccvpes" * 4, "cvcvcvcvp", "abcdefg",
    ]
    import random

    rng = random.Random(3)
    for _ in range(60):
        cases.append(
            "".join(rng.choice("cvpse") for _ in range(rng.randint(2, 80)))
        )
    for s in cases:
        assert lz76_phrases(s) == _lz76_enumerated(s), s
    # canonical facts: a constant string parses into ~log-many phrases,
    # and all-distinct symbols into one phrase per symbol
    assert lz76_phrases("aaaaaaaa") <= 3
    assert lz76_phrases("abcde") == 5


def test_lz_complexity_pipeline(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext132 import (
        lz76_phrases,
        q_lz_complexity,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.user_id: r for r in q_lz_complexity(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    sym = {"click": "c", "error": "e", "purchase": "p",
           "signup": "s", "view": "v"}
    seqs = defaultdict(list)
    for e in ev:
        seqs[e.user_id].append((e.ts, e.event_id, sym[e.event_type]))
    assert set(got) == set(seqs)
    for uid, rows in seqs.items():
        rows.sort()
        s = "".join(ch for _, _, ch in rows)
        c = lz76_phrases(s)
        r = got[uid]
        assert r.n_events == len(s)
        assert r.lz_phrases == c
        if len(s) > 1:
            assert abs(
                r.lz_rate - round(c * math.log(len(s), 5) / len(s), 6)
            ) < 1e-9
    # constant sequences compress to almost nothing; the corpus is mixed
    rates = [r.lz_rate for r in got.values() if r.lz_rate is not None]
    assert 0 < sum(rates) / len(rates) < 1.5
