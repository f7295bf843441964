"""Batch-111 tests: streaming anomaly ≡ batch, VAD python oracle +
gate-pattern parity, GROUPING SETS python oracle."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import defaultdict

import numpy as np


def test_anomaly_stream_equals_batch(spark, sf_dir):
    """The streaming result (stream-static broadcast join per
    micro-batch) must equal running the same operator as one batch
    query — bit-for-bit, because the baseline moments are integer."""
    from arrow_supercluster_spark.plans.registry_ext116 import (
        q_anomaly_stream,
    )
    from arrow_supercluster_spark.streaming.anomaly import (
        baseline_stats,
        streaming_anomaly_flags,
    )

    got = q_anomaly_stream(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = (
        streaming_anomaly_flags(ev, baseline_stats(ev))
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert len(got) > 0  # threshold actually fires on this corpus


def test_anomaly_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext116 import (
        q_anomaly_stream,
    )
    from arrow_supercluster_spark.streaming.anomaly import Z_THRESHOLD

    got = {r.event_id: r for r in q_anomaly_stream(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type = defaultdict(list)
    for e in ev:
        by_type[e.event_type].append(e)
    flagged = {}
    for t, rows in by_type.items():
        cents = [round(e.value * 100) for e in rows]
        n = len(cents)
        sc, ssq = sum(cents), sum(c * c for c in cents)
        mean = sc / (100.0 * n)
        std = math.sqrt((ssq - sc * sc / n) / (10000.0 * (n - 1)))
        for e in rows:
            z = (e.value - mean) / std
            if abs(z) >= Z_THRESHOLD:
                flagged[e.event_id] = round(z, 4)
    assert set(got) == set(flagged)
    for eid, z in flagged.items():
        assert abs(got[eid].z - z) < 1e-9


def test_vad_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.operators import multimodal as mm
    from arrow_supercluster_spark.plans.registry_ext116 import q_vad_segments

    got = {r.media_id: r for r in q_vad_segments(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert set(got) == {d.doc_id for d in docs}
    for d in docs[:50]:  # full decode oracle on a prefix; parity below on all
        rate, s = mm.decode_wav(mm.synthesize_wav_gated(d.doc_id))
        nf = len(s) // mm._VAD_FRAME
        fr = np.sqrt(
            np.mean(
                s[: nf * mm._VAD_FRAME].reshape(nf, mm._VAD_FRAME) ** 2,
                axis=1,
            )
        )
        voiced = fr >= mm._VAD_THRESHOLD
        n_seg = int(np.sum(voiced[1:] & ~voiced[:-1])) + (
            1 if voiced[0] else 0
        )
        r = got[d.doc_id]
        assert r.ok
        assert r.n_frames == nf
        assert r.voiced_frames == int(np.sum(voiced))
        assert r.n_segments == n_seg
        assert abs(r.voiced_fraction - round(float(np.mean(voiced)), 6)) < 1e-9


def test_vad_segments_match_gate_runs(spark, sf_dir):
    """Ground-truth parity: the detected segment count must equal the
    number of runs of 1s in the synthesis gate pattern — every gap is
    500 samples (≥ 3 silent frames), so runs can never merge, and every
    on-run is ≥ 500 samples (≥ 1 fully-voiced frame), so none can be
    missed."""
    from arrow_supercluster_spark.operators import multimodal as mm
    from arrow_supercluster_spark.plans.registry_ext116 import q_vad_segments

    got = {r.media_id: r for r in q_vad_segments(spark, sf_dir).collect()}

    def runs(pat):
        return sum(
            1 for i, b in enumerate(pat) if b and (i == 0 or not pat[i - 1])
        )

    checked = 0
    for mid, r in got.items():
        pat = mm.vad_gate_pattern(mid)
        assert r.n_segments == runs(pat), (mid, pat, r)
        checked += 1
    assert checked > 100


def test_grouping_sets_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext116 import (
        q_grouping_sets,
    )

    got = q_grouping_sets(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    detail = defaultdict(lambda: [0, 0])
    for d in docs:
        for key, gid in (
            ((d.source, "ALL"), 1),
            (("ALL", d.lang), 2),
            (("ALL", "ALL"), 3),
        ):
            e = detail[(key, gid)]
            e[0] += 1
            e[1] += d.n_chars
    assert len(got) == len(detail)
    for r in got:
        n, tc = detail[((r.source_lvl, r.lang_lvl), r.gid)]
        assert (r.n_docs, r.total_chars) == (n, tc)
