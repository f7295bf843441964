"""Batch-214 tests: python replays of the phonetic blocking + verify
family (soundex blocks, blocked edit distance, trigram Jaccard)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import re
from collections import Counter

from pyspark.sql import functions as F

_SDX_FROM = "abcdefghijklmnopqrstuvwxyz"
_SDX_TO = "01230120022455012623010202"
_MAP = dict(zip(_SDX_FROM, _SDX_TO))


def _soundex(w):
    mapped = "".join(_MAP.get(ch, ch) for ch in w)
    for d in "0123456":
        mapped = re.sub(f"{d}{{2,}}", d, mapped)
    tail = mapped[1:].replace("0", "")
    return w[0].upper() + (tail + "000")[:3]


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _words(spark, sf_dir):
    return sorted(
        r.w
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(F.explode(F.split(F.lower("p_name"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .collect()
    )


def test_soundex_blocks_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    words = _words(spark, sf_dir)
    blocks = Counter(_soundex(w) for w in words)
    row = REGISTRY["q_soundex_blocks"].spark(spark, sf_dir).collect()[0]
    assert row.n_blocks == len(blocks)
    assert row.n_words == len(words)
    assert row.max_block == max(blocks.values())
    assert row.candidate_pairs == sum(
        s * (s - 1) // 2 for s in blocks.values()
    )


def test_edit_blocked_join_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext219 import _EDIT_MAX

    words = _words(spark, sf_dir)
    by_block = {}
    for w in words:
        by_block.setdefault(_soundex(w), []).append(w)
    want = sorted(
        (min(_lev(a, b), 99), a, b)
        for ws in by_block.values()
        for i, a in enumerate(ws)
        for b in ws[i + 1 :]
        if _lev(a, b) <= _EDIT_MAX
    )
    want = [(a, b, e) for e, a, b in sorted(want)][:50]
    got = [
        (r.w1, r.w2, r.ed)
        for r in REGISTRY["q_edit_blocked_join"].spark(
            spark, sf_dir
        ).collect()
    ]
    assert got == want


def test_string_blocking_keys_replay(spark, sf_dir):
    from collections import Counter

    from arrow_supercluster_spark.plans.registry import REGISTRY

    words = _words(spark, sf_dir)
    n = len(words)
    allpairs = n * (n - 1) // 2
    strategies = {
        "first_char": lambda w: w[0],
        "length_band": lambda w: str(len(w) // 3),
        "soundex": _soundex,
    }
    got = {
        r.strategy: r
        for r in REGISTRY["q_string_blocking_keys"].spark(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(strategies)
    for name, keyfn in strategies.items():
        blocks = Counter(keyfn(w) for w in words)
        cand = sum(s * (s - 1) // 2 for s in blocks.values())
        row = got[name]
        assert row.n_blocks == len(blocks), name
        assert row.max_block == max(blocks.values()), name
        assert row.candidate_pairs == cand, name
        assert row.reduction_ratio == round(1.0 - cand / allpairs, 6), name
        # a blocking key must actually prune
        assert row.candidate_pairs < allpairs, name
