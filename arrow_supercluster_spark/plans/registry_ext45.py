"""Round-2 registry additions, batch 40 — spatial statistics over the
cell grid:

- q_morans_i: Moran's I spatial autocorrelation of per-cell point
  counts (rook-adjacent weights) — is the point field clustered,
  random, or dispersed?;
- q_quadrat_test: quadrat chi-square against complete spatial
  randomness over the occupied-extent grid;
- q_cluster_stability: fraction of zoom-z cell cohabitant pairs that
  remain cohabitant at z+1 — the hierarchy-coherence metric.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import _SQL_XY, _points_xy, register

_MI_ZOOM = 6


def _sql_cell_counts(zoom: int) -> str:
    return f"""
      SELECT cell_x, cell_y, CAST(COUNT(*) AS DOUBLE) AS n
      FROM ({gc.sql_cells(_SQL_XY, zoom, OPTS)})
      GROUP BY 1, 2
    """


@register(
    "q_morans_i",
    f"""
    WITH c AS ({_sql_cell_counts(_MI_ZOOM)}),
    m AS (SELECT AVG(n) AS mu, COUNT(*) AS n_cells FROM c),
    dev AS (
      SELECT cell_x, cell_y, n - mu AS d FROM c CROSS JOIN m
    ),
    pairs AS (
      SELECT a.d AS da, b.d AS db
      FROM dev a JOIN dev b
        ON abs(a.cell_x - b.cell_x) + abs(a.cell_y - b.cell_y) = 1
    ),
    s AS (
      SELECT (SELECT COUNT(*) FROM pairs) AS w_sum,
             (SELECT SUM(da * db) FROM pairs) AS cross_sum,
             (SELECT SUM(d * d) FROM dev) AS ss,
             (SELECT n_cells FROM m) AS n_cells
    )
    SELECT n_cells, w_sum,
           round(n_cells * cross_sum / (w_sum * ss), 6) AS morans_i
    FROM s
    """,
)
def q_morans_i(spark, sf_dir):
    """Spatial stats — Moran's I autocorrelation of per-cell point
    counts at zoom {z} with rook (edge-adjacent, binary) weights:
    I > −1/(n−1) ⇒ clustered, ≈ ⇒ random, < ⇒ dispersed — the
    one-number 'is this point field actually clustered' test underneath
    the whole clustering surface. OCCUPIED cells only (the empty-cell
    universe is unbounded on a world grid; the occupied-cell graph is
    the standard lattice-data treatment). Plan: one cell agg, a
    3×3-style adjacency equi-join on the |cells| table, three tiny
    sums.""".format(z=_MI_ZOOM)
    cells = (
        gc.with_cells(_points_xy(spark, sf_dir), _MI_ZOOM, OPTS)
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    m = cells.agg(F.avg("n").alias("mu"), F.count(F.lit(1)).alias("n_cells"))
    dev = cells.crossJoin(F.broadcast(m)).select(
        "cell_x", "cell_y", (F.col("n") - F.col("mu")).alias("d"), "n_cells"
    )
    # rook adjacency as an EQUI-join: replicate each cell onto its 4
    # neighbor keys and join on the key — never the |cells|² non-equi
    # nested loop (the oracle keeps the naive form; DuckDB IEJoins it)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        ]
    )
    a = dev.select(
        F.col("d").alias("da"), F.explode(offs).alias("o"), "cell_x", "cell_y"
    ).select(
        "da",
        (F.col("cell_x") + F.col("o.dx")).alias("jx"),
        (F.col("cell_y") + F.col("o.dy")).alias("jy"),
    )
    b = dev.select(
        F.col("cell_x").alias("jx"), F.col("cell_y").alias("jy"),
        F.col("d").alias("db"),
    )
    pairs = a.join(b, ["jx", "jy"])
    psum = pairs.agg(
        F.count(F.lit(1)).alias("w_sum"), F.sum(F.col("da") * F.col("db")).alias("cross_sum")
    )
    ssum = dev.agg(
        F.sum(F.col("d") * F.col("d")).alias("ss"), F.first("n_cells").alias("n_cells")
    )
    return psum.crossJoin(F.broadcast(ssum)).select(
        "n_cells", "w_sum",
        F.round(
            F.col("n_cells") * F.col("cross_sum") / (F.col("w_sum") * F.col("ss")), 6
        ).alias("morans_i"),
    )


@register(
    "q_quadrat_test",
    f"""
    WITH c AS ({_sql_cell_counts(_MI_ZOOM)}),
    b AS (
      SELECT MIN(cell_x) AS x0, MAX(cell_x) AS x1,
             MIN(cell_y) AS y0, MAX(cell_y) AS y1,
             SUM(n) AS total
      FROM c
    ),
    grid AS (
      SELECT gx.x AS cell_x, gy.y AS cell_y, total,
             (x1 - x0 + 1) * (y1 - y0 + 1) AS n_quadrats
      FROM b
      CROSS JOIN unnest(generate_series(b.x0, b.x1)) AS gx(x)
      CROSS JOIN unnest(generate_series(b.y0, b.y1)) AS gy(y)
    ),
    filled AS (
      SELECT g.total, g.n_quadrats, coalesce(c.n, 0.0) AS n,
             g.total * 1.0 / g.n_quadrats AS expected
      FROM grid g LEFT JOIN c USING (cell_x, cell_y)
    )
    SELECT ANY_VALUE(n_quadrats) AS n_quadrats,
           round(ANY_VALUE(expected), 6) AS expected,
           round(SUM((n - expected) * (n - expected) / expected), 4) AS chi2
    FROM filled
    """,
)
def q_quadrat_test(spark, sf_dir):
    """Spatial stats — quadrat test of complete spatial randomness:
    chi² = Σ (observed − expected)²/expected over EVERY quadrat of the
    occupied bounding grid (empty cells included — that is what the
    test is about). The dense grid comes from a 1-row bounds agg +
    sequence explode (calendar-gap pattern in 2-D); one left join fills
    zeros; one agg emits the statistic. chi² ≫ df ⇒ reject randomness —
    the formal justification for clustering this field at all."""
    cells = (
        gc.with_cells(_points_xy(spark, sf_dir), _MI_ZOOM, OPTS)
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    b = cells.agg(
        F.min("cell_x").alias("x0"), F.max("cell_x").alias("x1"),
        F.min("cell_y").alias("y0"), F.max("cell_y").alias("y1"),
        F.sum("n").alias("total"),
    )
    grid = (
        b.select(
            "total",
            ((F.col("x1") - F.col("x0") + 1) * (F.col("y1") - F.col("y0") + 1)).alias(
                "n_quadrats"
            ),
            F.explode(F.sequence("x0", "x1")).alias("cell_x"),
            F.col("y0"), F.col("y1"),
        )
        .select(
            "total", "n_quadrats", "cell_x",
            F.explode(F.sequence("y0", "y1")).alias("cell_y"),
        )
    )
    filled = grid.join(cells, ["cell_x", "cell_y"], "left").select(
        "total", "n_quadrats",
        F.coalesce("n", F.lit(0.0)).alias("n"),
        (F.col("total") * 1.0 / F.col("n_quadrats")).alias("expected"),
    )
    return filled.agg(
        F.first("n_quadrats").alias("n_quadrats"),
        F.round(F.first("expected"), 6).alias("expected"),
        F.round(
            F.sum(
                (F.col("n") - F.col("expected"))
                * (F.col("n") - F.col("expected"))
                / F.col("expected")
            ),
            4,
        ).alias("chi2"),
    )


_STAB_Z = 5


@register(
    "q_cluster_stability",
    f"""
    WITH coarse AS (
      SELECT id, cell_x AS cx, cell_y AS cy
      FROM ({gc.sql_cells(_SQL_XY, _STAB_Z, OPTS)})
    ),
    fine AS (
      SELECT id, cell_x AS fx, cell_y AS fy
      FROM ({gc.sql_cells(_SQL_XY, _STAB_Z + 1, OPTS)})
    ),
    j AS (
      SELECT c.id, c.cx, c.cy, f.fx, f.fy
      FROM coarse c JOIN fine f USING (id)
    ),
    pairs AS (
      SELECT CAST(a.fx = b.fx AND a.fy = b.fy AS INTEGER) AS same_fine
      FROM j a JOIN j b
        ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    )
    SELECT COUNT(*) AS n_pairs,
           SUM(same_fine) AS n_stable,
           round(SUM(same_fine) * 1.0 / COUNT(*), 6) AS stability
    FROM pairs
    """,
)
def q_cluster_stability(spark, sf_dir):
    """Hierarchy quality — cluster stability across zooms: of all point
    pairs sharing a zoom-{z} cell, the fraction still sharing a
    zoom-{z1} cell — how much drill-down fragments the groups (1.0 =
    every coarse cluster maps into one fine cluster). The pair join is
    keyed by the COARSE cell (bounded by per-cell population, the
    radius-join shape), never all-pairs; the metric is one agg.""".format(
        z=_STAB_Z, z1=_STAB_Z + 1
    )
    coarse = gc.with_cells(_points_xy(spark, sf_dir), _STAB_Z, OPTS).select(
        "id", F.col("cell_x").alias("cx"), F.col("cell_y").alias("cy")
    )
    fine = gc.with_cells(_points_xy(spark, sf_dir), _STAB_Z + 1, OPTS).select(
        "id", F.col("cell_x").alias("fx"), F.col("cell_y").alias("fy")
    )
    j = coarse.join(fine, "id")
    a = j.select(
        F.col("id").alias("a_id"), "cx", "cy",
        F.col("fx").alias("afx"), F.col("fy").alias("afy"),
    )
    b = j.select(
        F.col("id").alias("b_id"), "cx", "cy",
        F.col("fx").alias("bfx"), F.col("fy").alias("bfy"),
    )
    pairs = a.join(b, ["cx", "cy"]).filter(F.col("a_id") < F.col("b_id"))
    same = ((F.col("afx") == F.col("bfx")) & (F.col("afy") == F.col("bfy"))).cast(
        "int"
    )
    return pairs.select(same.alias("same_fine")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("same_fine").alias("n_stable"),
        F.round(F.sum("same_fine") * 1.0 / F.count(F.lit(1)), 6).alias("stability"),
    )
