"""Z-order (Morton) data layout — the storage-side analog of the
reference's per-zoom KDBush (SURVEY §1.1 spatial-index row: "sort/partition
files by a space-filling-curve key so min/max pruning approximates the
index").

Writing points range-partitioned and sorted by the interleaved-bit Morton
key makes every parquet row group cover a tight spatial rectangle, so a
bbox query's pushed-down min/max predicates on cell_x/cell_y skip most row
groups — the scan-level equivalent of a KDBush range query, with zero
query-time index structure.

At 100 TB this is THE mechanism that keeps getClusters interactive: the
bbox predicate prunes (a) zoom partitions, (b) z-ordered files via
file-level stats, (c) row groups via parquet stats, before any compute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cell_x: Column, cell_y: Column, bits: int = 20) -> Column:
    """Interleave the low `bits` of two non-negative cell coordinates into
    a Morton code (x in even bit positions, y in odd). Pure bit-op
    expression — JVM-side, codegen-friendly.

    bits must cover the coordinate range: default 20 handles cells up to
    ~1M per axis (leaf-zoom cell_scale(17) ≈ 894k with default options) —
    bits too small would silently truncate high bits and destroy the
    spatial locality of the layout."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(cell_x.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(cell_y.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def write_zordered_points(
    points_cells: DataFrame,
    path: str,
    n_files: int = 8,
    rows_per_group: int = 2048,
) -> None:
    """Write a points table (with cell_x/cell_y columns) Z-ordered:
    range-partitioned then sorted by the Morton key, with small row groups
    so pruning granularity is fine. The key itself is dropped — it only
    shapes the layout."""
    keyed = points_cells.withColumn(
        "_z", morton_key(F.col("cell_x"), F.col("cell_y"))
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(rows_per_group * 64))
        .parquet(path)
    )


def rowgroup_prune_fraction(path: str, cell_x_range, cell_y_range) -> float:
    """Fraction of parquet row groups a bbox scan can SKIP based on
    column min/max statistics (what Spark's parquet reader does with the
    pushed-down predicate). Used by tests to prove the layout works."""
    import glob

    import pyarrow.parquet as pq

    total = 0
    skipped = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ix = schema_names.index("cell_x")
        iy = schema_names.index("cell_y")
        for rg in range(md.num_row_groups):
            total += 1
            sx = md.row_group(rg).column(ix).statistics
            sy = md.row_group(rg).column(iy).statistics
            if sx is None or sy is None:
                continue
            if (
                sx.max < cell_x_range[0]
                or sx.min > cell_x_range[1]
                or sy.max < cell_y_range[0]
                or sy.min > cell_y_range[1]
            ):
                skipped += 1
    return skipped / max(total, 1)
