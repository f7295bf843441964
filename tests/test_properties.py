"""Property-based checks (hypothesis) for distributed kernels whose
correctness argument has quantifiers — "for ANY partitioning", "for ANY
interval layout" — that example tests under-cover. Each property runs a
handful of randomized examples against an in-process pandas reference."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
    ivals=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 3000)),
        min_size=1,
        max_size=12,
    ),
    bin_seconds=st.sampled_from([60, 900, 3600]),
)
def test_interval_join_equals_naive(spark, events, ivals, bin_seconds):
    """Bin-bucketed interval join == naive BETWEEN product, for any event
    layout, interval lengths (including zero-length and bin-straddling),
    and bin width."""
    from arrow_supercluster_spark.operators.asof import interval_join

    ev = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(events)],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (j, BASE + dt.timedelta(seconds=s), BASE + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(ivals)
        ],
        "interval_id long, ival_start timestamp, ival_end timestamp",
    )
    got = {
        (r.event_id, r.interval_id)
        for r in interval_join(
            ev, iv, ts="ts", start="ival_start", end="ival_end",
            bin_seconds=bin_seconds,
        ).collect()
    }
    want = {
        (i, j)
        for i, s in enumerate(events)
        for j, (s2, d) in enumerate(ivals)
        if s2 <= s <= s2 + d
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 100)),
        min_size=1,
        max_size=80,
    ),
    nparts=st.sampled_from([1, 3, 7]),
    k=st.sampled_from([1, 3, 5]),
)
def test_two_phase_topk_equals_global_rank(spark, scores, nparts, k):
    """The narrow partial-top-k phase must never change the final result:
    for ANY input partitioning and ANY ties, two-phase == a global pandas
    rank under the same (cos desc, key asc) order."""
    from arrow_supercluster_spark.operators.similarity import _ranked_topk

    pdf = pd.DataFrame(scores, columns=["q_id", "vec_id", "c"]).drop_duplicates(
        ["q_id", "vec_id"]
    )
    pdf["cos"] = pdf["c"] / 100.0
    scored = spark.createDataFrame(
        pdf[["q_id", "vec_id", "cos"]]
    ).repartition(nparts)
    got = {
        (r.q_id, r.rank): r.vec_id
        for r in _ranked_topk(scored, "q_id", "vec_id", k).collect()
    }
    want = {}
    for q, grp in pdf.groupby("q_id"):
        grp = grp.sort_values(["cos", "vec_id"], ascending=[False, True])
        for rank, (_, row) in enumerate(grp.head(k).iterrows(), start=1):
            want[(q, rank)] = row["vec_id"]
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-179.9, 179.9, allow_nan=False),
            st.floats(-84.9, 84.9, allow_nan=False),
        ),
        min_size=2,
        max_size=120,
    )
)
def test_cc_greedy_parity_random_points(spark, pts):
    """mode="cc" == mode="exact" bit-identically for ARBITRARY point
    clouds (hypothesis), not just the LCG fixture — duplicate positions,
    tight clusters, and world-spanning spreads included. Shallow zoom
    range keeps each example fast while still exercising multi-level
    merges and re-ranking."""
    from arrow_supercluster_spark.config import ClusterOptions
    from arrow_supercluster_spark.operators.greedy import greedy_hierarchy

    opts = ClusterOptions(max_zoom=6)
    rows = [(i, float(lng), float(lat)) for i, (lng, lat) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, lng double, lat double")
    cols = ["zoom", "cluster_id", "x", "y", "parent_id", "num_points", "pos"]

    def norm(d):
        return (
            d.select(*cols).toPandas()
            .sort_values(["zoom", "cluster_id", "pos"], kind="mergesort")
            .reset_index(drop=True)
        )

    exact = norm(greedy_hierarchy(df, opts, mode="exact"))
    cc = norm(greedy_hierarchy(df, opts, mode="cc"))
    pd.testing.assert_frame_equal(cc, exact, check_exact=True)


@given(
    mid=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=0, max_value=3000),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(mid, n):
    """Any synthesized WAV decodes to exactly its parameters — including
    n=0 (empty data chunk) and 1-sample files."""
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    rate, s = decode_wav(synthesize_wav(mid, n_samples=n))
    assert rate == 8000 and len(s) == n
    if n:
        amp = 0.5 + (mid % 5) * 0.1
        assert float(np.max(np.abs(s))) <= amp + 1e-3


@given(
    mid=st.integers(min_value=0, max_value=10_000),
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(mid, w, h):
    """Any (width, height) — including the odd widths whose rows need
    4-byte padding — round-trips through encode/decode exactly."""
    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    img = decode_bmp(synthesize_bmp(mid, width=w, height=h))
    assert img.shape == (h, w, 3)
    assert int(img[0, 0, 0]) == (mid * 37) % 256


@given(
    data=st.one_of(
        st.binary(min_size=0, max_size=200),
        # adversarial: valid magic bytes + garbage body, so the chunk
        # walkers actually run instead of bailing at the signature
        st.binary(min_size=0, max_size=120).map(lambda b: b"RIFF" + b),
        st.binary(min_size=8, max_size=120).map(
            lambda b: b"RIFF" + b[:4] + b"WAVE" + b[4:]
        ),
        st.binary(min_size=0, max_size=120).map(lambda b: b"BM" + b),
    ),
)
@settings(max_examples=120, deadline=None)
def test_decoders_reject_garbage_with_valueerror(data):
    """Arbitrary bytes either decode or raise ValueError — never any
    other exception type (the quarantine contract)."""
    import pytest as _pytest

    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
    )

    for dec in (decode_wav, decode_bmp):
        try:
            dec(data)
        except ValueError:
            pass
