"""Z-order layout tests: the Morton-sorted parquet layout must let a bbox
scan skip a large share of row groups via min/max stats, and must not skip
any row group that actually contains matching rows."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.sources.layout import (
    morton_key,
    rowgroup_prune_fraction,
    write_zordered_points,
)
from arrow_supercluster_spark.sources.points import derived_points


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    # x bits even, y bits odd: (1,0)->1, (0,1)->2, (3,5)=(0b011,0b101)->0b100111=39
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 5): 39}


def test_zordered_layout_prunes_rowgroups(spark, sf_dir, tmp_path):
    pts = gc.with_cells(
        gc.prepare_points(derived_points(spark, sf_dir)), 10, OPTS
    ).select("id", "lng", "lat", "cell_x", "cell_y")
    path = str(tmp_path / "zpts")
    write_zordered_points(pts, path, n_files=4, rows_per_group=64)

    stats = pts.agg(
        F.min("cell_x"), F.max("cell_x"), F.min("cell_y"), F.max("cell_y")
    ).collect()[0]
    # a bbox covering ~1/16 of the occupied cell space
    qx = (stats[0], stats[0] + max(1, (stats[1] - stats[0]) // 4))
    qy = (stats[2], stats[2] + max(1, (stats[3] - stats[2]) // 4))

    frac = rowgroup_prune_fraction(path, qx, qy)
    assert frac >= 0.4, f"only {frac:.0%} of row groups prunable"

    # correctness: the pruned scan returns exactly the same rows
    back = spark.read.parquet(path).filter(
        F.col("cell_x").between(*qx) & F.col("cell_y").between(*qy)
    )
    want = pts.filter(
        F.col("cell_x").between(*qx) & F.col("cell_y").between(*qy)
    )
    assert back.count() == want.count()
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "cell_x" in plan
