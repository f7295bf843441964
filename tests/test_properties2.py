"""Property-based checks (hypothesis) for the batch 12-16 kernels:
bloom no-false-negatives over ANY key sets, interval merging vs a naive
in-process reference over ANY layout, and CMS lower-bound over ANY
token multiset."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bloomfilter, cms

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.text(
    alphabet="abcdefghij0123456789", min_size=1, max_size=12
)


@settings(**_SETTINGS)
@given(
    members=st.sets(_key, min_size=1, max_size=40),
    probes=st.sets(_key, min_size=1, max_size=40),
    m_bits=st.sampled_from([256, 4096, 1 << 16]),
    k=st.sampled_from([2, 4]),
)
def test_bloom_never_false_negative(spark, members, probes, m_bits, k):
    """For ANY member set, probe set, bitmap size (down to saturating-
    small), and hash count: every probe that IS a member survives."""
    mem = spark.createDataFrame(pd.DataFrame({"g": sorted(members)}))
    pr = spark.createDataFrame(pd.DataFrame({"g": sorted(probes)}))
    bloom = bloomfilter.bloom_build(mem, "g", m_bits=m_bits, k=k)
    kept = {
        r.g
        for r in bloomfilter.bloom_prefilter(
            pr, "g", bloom, m_bits=m_bits, k=k
        ).collect()
    }
    assert (probes & members) <= kept


@settings(**_SETTINGS)
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 120)),
        min_size=1,
        max_size=40,
    )
)
def test_interval_merge_equals_naive(spark, spans):
    """The running-max islands construction == naive sequential merge,
    for ANY span layout (nested, duplicate, touching, disjoint)."""
    from pyspark.sql import Window

    iv = spark.createDataFrame(
        pd.DataFrame(
            [(1, s, s + d) for s, d in spans], columns=["user_id", "s", "e"]
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("e").over(w)
    isl = iv.withColumn(
        "ni", F.when(prev.isNull() | (F.col("s") > prev), 1).otherwise(0)
    ).withColumn(
        "island",
        F.sum("ni").over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    got = sorted(
        (r.s, r.e)
        for r in isl.groupBy("island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .collect()
    )

    merged = []
    for s, e in sorted((s, s + d) for s, d in spans):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    assert got == [tuple(m) for m in merged]


@settings(**_SETTINGS)
@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "f1", "g2", "h"]),
        min_size=1,
        max_size=120,
    ),
    width=st.sampled_from([16, 64, 1024]),
)
def test_cms_never_underestimates(spark, toks, width):
    """CMS estimates are a pointwise UPPER bound on true counts for ANY
    token multiset, even with a tiny (collision-heavy) width."""
    df = spark.createDataFrame(pd.DataFrame({"tok": toks}))
    sketch = cms.cms_build(df, "tok", width=width, depth=3)
    keys = spark.createDataFrame(pd.DataFrame({"tok": sorted(set(toks))}))
    est = {
        r.k: r.est
        for r in cms.cms_estimate(
            sketch, keys, "tok", width=width, depth=3
        ).collect()
    }
    true = pd.Series(toks).value_counts().to_dict()
    for tok, n in true.items():
        assert est[tok] >= n, (tok, n, est[tok])
