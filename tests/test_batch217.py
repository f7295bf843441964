"""Batch-217 tests: python replays of the columnar-encoding estimators
from raw events (block-keyed delta/FOR widths, the encoding advisor)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import defaultdict


def _bits(x):
    return 0 if x <= 0 else math.ceil(math.log2(x + 1) - 1e-9)


def _events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )


def test_delta_bitwidth_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext222 import _BLOCK

    rows = _events(spark, sf_dir)
    blocks = defaultdict(list)
    for r in rows:
        blocks[r.event_id // _BLOCK].append(r.event_id)
    tot_bits = tot_n = 0
    max_delta = 0
    for ids in blocks.values():
        ids.sort()
        deltas = [b - a for a, b in zip(ids, ids[1:])] or [0]
        md = max(deltas) if len(ids) > 1 else 0
        max_delta = max(max_delta, md)
        tot_bits += len(ids) * _bits(md) + 64
        tot_n += len(ids)
    row = REGISTRY["q_delta_bitwidth"].spark(spark, sf_dir).collect()[0]
    assert row.n_blocks == len(blocks)
    assert row.n_values == tot_n
    assert row.max_delta == max_delta
    assert abs(row.bits_per_value - tot_bits / tot_n) < 1e-3
    assert row.bits_per_value < 64  # dense ids must beat plain


def test_for_bitwidth_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext222 import _BLOCK

    rows = [r for r in _events(spark, sf_dir) if r.event_type == "purchase"]
    blocks = defaultdict(list)
    for r in rows:
        blocks[r.event_id // _BLOCK].append(round(r.value * 100))
    tot_bits = tot_n = 0
    for vs in blocks.values():
        rng = max(vs) - min(vs)
        tot_bits += len(vs) * _bits(rng) + 64
        tot_n += len(vs)
    row = REGISTRY["q_for_bitwidth"].spark(spark, sf_dir).collect()[0]
    assert row.n_blocks == len(blocks)
    assert row.n_values == tot_n
    assert abs(row.bits_per_value - tot_bits / tot_n) < 1e-3


def test_encoding_pick_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext222 import _BLOCK

    rows = sorted(_events(spark, sf_dir), key=lambda r: r.event_id)
    cols = {
        "event_type": [r.event_type for r in rows],
        "user_id": [r.user_id for r in rows],
        "value_cents": [round(r.value * 100) for r in rows],
    }
    blks = [r.event_id // _BLOCK for r in rows]
    got = {
        r.col: r
        for r in REGISTRY["q_encoding_pick"].spark(spark, sf_dir).collect()
    }
    n = len(rows)
    for col, vals in cols.items():
        d = len(set(vals))
        runs = sum(
            1
            for i, v in enumerate(vals)
            if i == 0 or blks[i] != blks[i - 1] or v != vals[i - 1]
        )
        dict_bits = float(_bits(d - 1))
        rle_bits = runs * (64.0 + _bits(n - 1)) / n
        row = got[col]
        assert row.n_values == n
        assert abs(row.dict_bits - dict_bits) < 1e-6, col
        assert abs(row.rle_bits - rle_bits) < 1e-3, col
        want = (
            "dict"
            if dict_bits <= rle_bits and dict_bits <= 64.0
            else ("rle" if rle_bits <= 64.0 else "plain")
        )
        assert row.winner == want, col
