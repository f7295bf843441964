"""Partition-count invariance + equivalence tests (SURVEY §5 layer 2 —
the Spark analog of the reference's multi-chunk ≡ single-chunk tests:
results must be identical however the data is partitioned)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
import pytest
from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.operators.filters import apply_mask, drop_null_geometry
from arrow_supercluster_spark.sources.points import derived_points


def canon(df, sort_cols):
    pdf = df.toPandas()
    for c in pdf.columns:
        if pdf[c].dtype == "float64":
            pdf[c] = pdf[c].round(9)
    return pdf.sort_values(sort_cols).reset_index(drop=True)


@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_grid_cluster_partition_invariance(spark, sf_dir, n_parts):
    pts = derived_points(spark, sf_dir).repartition(n_parts)
    nodes = gc.cluster_grid(pts, 6, OPTS).select(
        "zoom", "cell_x", "cell_y", "num_points",
        F.round(F.col("sum_x") / F.col("num_points"), 7).alias("cx"),
    )
    got = canon(nodes, ["cell_x", "cell_y"])
    base = canon(
        gc.cluster_grid(derived_points(spark, sf_dir), 6, OPTS).select(
            "zoom", "cell_x", "cell_y", "num_points",
            F.round(F.col("sum_x") / F.col("num_points"), 7).alias("cx"),
        ),
        ["cell_x", "cell_y"],
    )
    pd.testing.assert_frame_equal(got, base)


def test_mask_equals_prefilter(spark, sf_dir):
    """Masked load ≡ manually pre-filtered table — the reference's own
    equivalence test (filter-mask.test.ts:86-108)."""
    pts = derived_points(spark, sf_dir)
    mask = (F.col("id") % 4) != 0
    a = gc.cluster_grid(apply_mask(pts, mask), 8, OPTS)
    b = gc.cluster_grid(pts.filter(mask), 8, OPTS)
    pd.testing.assert_frame_equal(
        canon(a, ["cell_x", "cell_y"]), canon(b, ["cell_x", "cell_y"])
    )


def test_hierarchy_count_conservation(spark, sf_dir):
    nodes = gc.cluster_hierarchy(derived_points(spark, sf_dir), OPTS)
    totals = (
        nodes.groupBy("zoom").agg(F.sum("num_points").alias("t")).toPandas()
    )
    expected = drop_null_geometry(derived_points(spark, sf_dir)).count()
    assert sorted(totals.zoom) == list(range(OPTS.min_zoom, OPTS.leaf_zoom + 1))
    assert (totals.t == expected).all()


def test_materialize_equals_lazy(spark, sf_dir, tmp_path):
    a = gc.materialize_hierarchy(
        derived_points(spark, sf_dir), str(tmp_path / "h"), OPTS
    )
    b = gc.cluster_hierarchy(derived_points(spark, sf_dir), OPTS)
    cols = ["zoom", "cell_x", "cell_y", "num_points", "min_id"]
    pd.testing.assert_frame_equal(
        canon(a.select(cols), cols), canon(b.select(cols), cols)
    )


def test_finalize_singleton_exact_coords(spark, sf_dir):
    """Singletons must carry ORIGINAL coordinates bit-exactly (the
    reference's no-trig fast path, arrow-cluster-engine.ts:175-180)."""
    pts = derived_points(spark, sf_dir)
    out = gc.finalize_clusters(gc.cluster_grid(pts, 10, OPTS), OPTS)
    singles = out.filter(~F.col("is_cluster")).select("rep_id", "lng", "lat")
    orig = drop_null_geometry(pts).select(
        F.col("id").alias("rep_id"),
        F.col("lng").alias("olng"),
        F.col("lat").alias("olat"),
    )
    joined = singles.join(orig, "rep_id")
    mismatch = joined.filter(
        (F.col("lng") != F.col("olng")) | (F.col("lat") != F.col("olat"))
    ).count()
    assert mismatch == 0


def test_lat_y_poles_do_not_crash(spark):
    """lat=±90 must clamp, not raise DIVIDE_BY_ZERO under ANSI mode
    (reference clamps via the [0,1] bound, mercator.ts:13-18; poles are
    the reference's own edge-case battery, edge-cases.test.ts)."""
    from arrow_supercluster_spark.functions.projection import lat_y

    df = spark.createDataFrame(
        [(90.0,), (-90.0,), (89.999,), (-89.999,)], "lat double"
    )
    rows = {r.lat: r.y for r in df.select("lat", lat_y(F.col("lat")).alias("y")).collect()}
    assert rows[90.0] == 0.0 and rows[-90.0] == 1.0
    assert 0.0 <= rows[89.999] < 0.01 and 0.99 < rows[-89.999] <= 1.0


def test_lat_y_near_pole_sin_saturation(spark):
    """Valid lats within ~7e-7 of a pole make sin() round to exactly ±1.0:
    north side would DIVIDE_BY_ZERO under ANSI, south side would take
    ln(0) → silent NULL. The sin clamp must turn both into the same 0/1
    the reference reaches by riding ±Infinity into its output clamp."""
    from arrow_supercluster_spark.functions.projection import lat_y, sql_lat_y

    lats = [89.9999999, -89.9999999, 89.999999, -89.999999]
    df = spark.createDataFrame([(v,) for v in lats], "lat double")
    rows = {r.lat: r.y for r in df.select("lat", lat_y(F.col("lat")).alias("y")).collect()}
    assert rows[89.9999999] == 0.0
    assert rows[-89.9999999] == 1.0
    assert rows[89.999999] == 0.0
    assert rows[-89.999999] == 1.0
    # SQL twin agrees (DuckDB oracle path)
    import duckdb

    got = duckdb.sql(
        f"SELECT {sql_lat_y('lat')} AS y FROM (VALUES (89.9999999::DOUBLE), "
        "(-89.9999999::DOUBLE)) t(lat)"
    ).fetchall()
    assert [g[0] for g in got] == [0.0, 1.0]


def test_bbox_max_lng_180_no_spurious_split(spark):
    """Reference special case arrow-cluster-engine.ts:133: max_lng of
    exactly 180 stays 180 (no antimeridian split); a wrapped -180 second
    box would over-include points at lng=-180."""
    from arrow_supercluster_spark.operators.filters import bbox_predicate, normalize_bbox

    assert normalize_bbox(0.0, -10.0, 180.0, 10.0) == [(0.0, -10.0, 180.0, 10.0)]
    df = spark.createDataFrame(
        [(-180.0, 0.0), (0.5, 0.0), (179.9, 0.0), (-0.5, 0.0)], "lng double, lat double"
    )
    got = sorted(
        r.lng for r in df.filter(bbox_predicate(0.0, -10.0, 180.0, 10.0)).collect()
    )
    assert got == [0.5, 179.9]  # lng=-180 must NOT be included


def test_cosine_zero_vector_is_zero(spark):
    from arrow_supercluster_spark.operators.similarity import cosine

    e = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in e.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [0.0, 1.0]
