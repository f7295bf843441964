"""Batch-26 tests: convex hull vs all-points naive chain + partition
invariance + geometric containment; association-rule math invariants."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.hull import convex_hull, monotone_chain
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.points import derived_points


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_hull_matches_allpoints_chain(spark, sf_dir):
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull())
    all_pts = [(r.lng, r.lat) for r in pts.select("lng", "lat").collect()]
    expected = monotone_chain(all_pts)
    got = [
        (r.lng, r.lat)
        for r in convex_hull(pts).orderBy("hull_pos").collect()
    ]
    assert got == expected
    # every input point lies inside or on the hull (cross-product test
    # against each CCW edge)
    h = got
    n = len(h)
    for p in all_pts[:500]:
        for i in range(n):
            assert _cross(h[i], h[(i + 1) % n], p) >= -1e-9


def test_hull_partition_invariant(spark, sf_dir):
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull())
    a = [(r.lng, r.lat) for r in convex_hull(pts).orderBy("hull_pos").collect()]
    b = [
        (r.lng, r.lat)
        for r in convex_hull(pts.repartition(13)).orderBy("hull_pos").collect()
    ]
    assert a == b


def test_hull_degenerate_inputs(spark):
    one = spark.createDataFrame([(0, 1.0, 2.0)], "id long, lng double, lat double")
    assert convex_hull(one).count() == 1
    collinear = spark.createDataFrame(
        [(i, float(i), float(2 * i)) for i in range(5)],
        "id long, lng double, lat double",
    )
    got = [(r.lng, r.lat) for r in convex_hull(collinear).orderBy("hull_pos").collect()]
    assert got == [(0.0, 0.0), (4.0, 8.0)]  # endpoints only


def test_assoc_rules_invariants(spark, sf_dir):
    rows = REGISTRY["q_assoc_rules"].spark(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    from arrow_supercluster_spark.operators.dedup import tokenize

    baskets = [
        set(r.toks)
        for r in docs.select(
            F.array_distinct(tokenize(F.col("text"))).alias("toks")
        ).collect()
    ]
    for r in rows:
        both = sum(1 for b in baskets if r.ante in b and r.cons in b)
        n_a = sum(1 for b in baskets if r.ante in b)
        n_c = sum(1 for b in baskets if r.cons in b)
        # engines round HALF_UP; Python rounds half-to-even -> allow one
        # 6-dp rounding ulp on exact halves (e.g. 303/384 = 0.7890625)
        assert abs(r.support - both / n_docs) < 1.01e-6
        assert abs(r.confidence - both / n_a) < 1.01e-6
        assert abs(r.lift - (both / n_a) / (n_c / n_docs)) < 1.01e-5
        assert r.support >= 0.10 and r.confidence >= 0.50
