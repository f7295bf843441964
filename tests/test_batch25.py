"""Batch-25 tests: skyline dominance invariants vs naive, apportionment
sum/rounding properties, conversion-latency non-negativity."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_skyline_matches_naive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        * F.lit(1.0)
        / F.greatest(F.length("text"), F.lit(1)),
        3,
    )
    pts = [
        (r.doc_id, r.n_chars, r.q)
        for r in docs.select("doc_id", "n_chars", quality.alias("q")).collect()
    ]
    naive = set()
    for d, l, q in pts:
        dominated = any(
            (l2 >= l and q2 >= q and (l2 > l or q2 > q)) for _, l2, q2 in pts
        )
        if not dominated:
            naive.add((d, l, q))
    got = {
        (r.doc_id, r.n_chars, r.quality)
        for r in REGISTRY["q_skyline"].spark(spark, sf_dir).collect()
    }
    assert got == naive
    assert got  # frontier is never empty on nonempty input


def test_apportion_exact_budget(spark, sf_dir):
    rows = REGISTRY["q_apportion"].spark(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == 100
    for r in rows:
        # alloc is floor or floor+1 of the exact quota
        assert r.alloc in (r.base, r.base + 1)
        assert abs(r.alloc - r.quota) < 1.0
    # allocation is monotone in counts (Hamilton can violate this across
    # budget changes, not within one: bigger group never gets fewer seats
    # than a smaller one differing by >= 1 whole quota unit)
    by_c = sorted(rows, key=lambda r: (r.c, r.lang))
    for a, b in zip(by_c, by_c[1:]):
        assert b.alloc >= a.alloc - 1


def test_conversion_latency_sane(spark, sf_dir):
    rows = REGISTRY["q_conversion_latency"].spark(spark, sf_dir).collect()
    assert {r.arm for r in rows} <= {0, 1}
    for r in rows:
        assert r.n > 0
        assert 0.0 <= r.p50_h <= r.p90_h
