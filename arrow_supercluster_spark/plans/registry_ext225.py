"""Round-8 registry additions, batch 220 — spatial-statistics
completions on the zoom-6 occupied-cell lattice (q_morans_i /
q_local_morans ship Moran; these are the two other classical global
statistics plus the deterministic interpolator):

- q_geary_c: Geary's C = (n−1)·Σw(xᵢ−xⱼ)² / (2W·Σ(xᵢ−μ)²) with the
  same rook (edge-adjacent, binary) weights — the difference-based
  twin of Moran (C < 1 clustered, > 1 dispersed); sensitive to local
  structure Moran's cross-product smooths over.
- q_getis_ord_g: the Getis-Ord General G = Σᵢ≠ⱼ wᵢⱼxᵢxⱼ / Σᵢ≠ⱼ xᵢxⱼ —
  concentration of HIGH values among neighbors (hot-spot mass), which
  Moran/Geary cannot distinguish from low-value clustering.
- q_idw_interpolation: inverse-distance-squared density estimate at
  five literal probe cells over the occupied-cell centers (exact
  occupied probes return their own value; zero-distance handled by
  contract) — the deterministic griddata baseline.

At 100 TB: all three run on the occupied-cell table (one cell agg);
the rook pair set is an adjacency join; G's full pair sums come from
the algebraic identity (Σx)² − Σx² — no all-pairs join anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import (
    _SQL_XY,
    _points_xy,
    register,
)
from arrow_supercluster_spark.plans.registry_ext45 import (
    _MI_ZOOM,
    _sql_cell_counts,
)

# five probe cells in the occupied region (the derived points live in a
# narrow strip near x≈0 at z6 — probes chosen inside/around it)
_IDW_PROBES = ((0, 27), (0, 28), (1, 27), (2, 28), (5, 30))
_IDW_POW = 2


def _spark_cells(spark, sf_dir):
    return (
        gc.with_cells(_points_xy(spark, sf_dir), _MI_ZOOM, OPTS)
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )


@register(
    "q_geary_c",
    f"""
    WITH c AS ({_sql_cell_counts(_MI_ZOOM)}),
    m AS (SELECT AVG(n) AS mu, COUNT(*) AS n_cells FROM c),
    dev AS (
      SELECT cell_x, cell_y, n, n - mu AS d FROM c CROSS JOIN m
    ),
    pairs AS (
      SELECT a.n AS na, b.n AS nb
      FROM dev a JOIN dev b
        ON abs(a.cell_x - b.cell_x) + abs(a.cell_y - b.cell_y) = 1
    ),
    s AS (
      SELECT (SELECT COUNT(*) FROM pairs) AS w_sum,
             (SELECT SUM((na - nb) * (na - nb)) FROM pairs) AS diff_sum,
             (SELECT SUM(d * d) FROM dev) AS ss,
             (SELECT n_cells FROM m) AS n_cells
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           CAST(w_sum AS BIGINT) AS w_sum,
           round((n_cells - 1.0) * diff_sum / (2.0 * w_sum * ss), 6)
             AS geary_c
    FROM s
    """,
)
def q_geary_c(spark, sf_dir):
    """R653 — Geary's C of per-cell point counts at zoom {z}, rook
    weights (the q_morans_i lattice): C = (n−1)Σw(xᵢ−xⱼ)²/(2WΣ(x−μ)²).
    C < 1 ⇒ clustered, ≈ 1 ⇒ random, > 1 ⇒ dispersed — the
    difference-based complement of Moran's cross-product (reads local
    roughness Moran smooths).  One cell agg + one adjacency join +
    three tiny sums.""".format(z=_MI_ZOOM)
    cells = _spark_cells(spark, sf_dir)
    m = cells.agg(
        F.avg("n").alias("mu"), F.count(F.lit(1)).alias("n_cells")
    )
    dev = cells.crossJoin(F.broadcast(m)).select(
        "cell_x", "cell_y", "n",
        (F.col("n") - F.col("mu")).alias("d"),
        "n_cells",
    )
    a, b = dev.alias("a"), dev.alias("b")
    pairs = a.join(
        b,
        (
            F.abs(F.col("a.cell_x") - F.col("b.cell_x"))
            + F.abs(F.col("a.cell_y") - F.col("b.cell_y"))
        )
        == 1,
    ).select(F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
    psum = pairs.agg(
        F.count(F.lit(1)).alias("w_sum"),
        F.sum(
            (F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb"))
        ).alias("diff_sum"),
    )
    dsum = dev.agg(
        F.sum(F.col("d") * F.col("d")).alias("ss"),
        F.max("n_cells").alias("n_cells"),
    )
    return (
        psum.crossJoin(F.broadcast(dsum))
        .select(
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("w_sum").cast("long").alias("w_sum"),
            F.round(
                (F.col("n_cells") - 1.0)
                * F.col("diff_sum")
                / (2.0 * F.col("w_sum") * F.col("ss")),
                6,
            ).alias("geary_c"),
        )
    )


@register(
    "q_getis_ord_g",
    f"""
    WITH c AS ({_sql_cell_counts(_MI_ZOOM)}),
    pairs AS (
      SELECT a.n AS na, b.n AS nb
      FROM c a JOIN c b
        ON abs(a.cell_x - b.cell_x) + abs(a.cell_y - b.cell_y) = 1
    ),
    tot AS (
      SELECT SUM(n) AS sx, SUM(n * n) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM c
    ),
    s AS (
      SELECT (SELECT SUM(na * nb) FROM pairs) AS num,
             (SELECT sx * sx - sxx FROM tot) AS den,
             (SELECT n_cells FROM tot) AS n_cells,
             (SELECT COUNT(*) FROM pairs) AS w_sum
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           CAST(w_sum AS BIGINT) AS w_sum,
           round(num / den, 6) AS general_g,
           round(w_sum / (n_cells * 1.0 * (n_cells - 1)), 6)
             AS expected_g
    FROM s
    """,
)
def q_getis_ord_g(spark, sf_dir):
    """R654 — Getis-Ord General G on the same rook lattice:
    G = Σw·xᵢxⱼ / Σᵢ≠ⱼ xᵢxⱼ, with the denominator from the identity
    (Σx)² − Σx² — NO all-pairs join.  E[G] = W/(n(n−1)) under CSR;
    G > E[G] ⇒ high values concentrate among neighbors (hot spots),
    the read Moran/Geary can't separate from cold-spot clustering.""".format()
    cells = _spark_cells(spark, sf_dir)
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.join(
        b,
        (
            F.abs(F.col("a.cell_x") - F.col("b.cell_x"))
            + F.abs(F.col("a.cell_y") - F.col("b.cell_y"))
        )
        == 1,
    ).select(F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
    psum = pairs.agg(
        F.sum(F.col("na") * F.col("nb")).alias("num"),
        F.count(F.lit(1)).alias("w_sum"),
    )
    tot = cells.agg(
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        psum.crossJoin(F.broadcast(tot))
        .select(
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("w_sum").cast("long").alias("w_sum"),
            F.round(
                F.col("num")
                / (F.col("sx") * F.col("sx") - F.col("sxx")),
                6,
            ).alias("general_g"),
            F.round(
                F.col("w_sum")
                / (F.col("n_cells") * 1.0 * (F.col("n_cells") - 1)),
                6,
            ).alias("expected_g"),
        )
    )


_SQL_PROBES = " UNION ALL ".join(
    f"SELECT {px} AS px, {py} AS py" for px, py in _IDW_PROBES
)


@register(
    "q_idw_interpolation",
    f"""
    WITH c AS ({_sql_cell_counts(_MI_ZOOM)}),
    probes AS ({_SQL_PROBES}),
    d AS (
      SELECT p.px, p.py, c.n,
             (p.px - c.cell_x) * (p.px - c.cell_x)
             + (p.py - c.cell_y) * (p.py - c.cell_y) AS d2
      FROM probes p CROSS JOIN c
    ),
    est AS (
      SELECT px, py,
             MAX(CASE WHEN d2 = 0 THEN n END) AS exact_hit,
             SUM(CASE WHEN d2 > 0 THEN n / (d2 * 1.0) END) AS wsum,
             SUM(CASE WHEN d2 > 0 THEN 1.0 / d2 END) AS w
      FROM d GROUP BY px, py
    )
    SELECT CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py,
           round(COALESCE(exact_hit, wsum / w), 6) AS idw_density,
           (exact_hit IS NOT NULL) AS exact
    FROM est ORDER BY px, py
    """,
)
def q_idw_interpolation(spark, sf_dir):
    """R655 — inverse-distance-squared interpolation of cell density at
    {k} literal probe cells over the occupied-cell centers: ŷ(p) =
    Σ nᵢ/d² / Σ 1/d² (squared Euclidean in cell units; a probe ON an
    occupied cell returns that cell's value exactly — the standard IDW
    exact-hit contract).  The probe × cells product is {k}×|cells|,
    collapsed immediately — the deterministic griddata baseline under
    every density heatmap.""".format(k=len(_IDW_PROBES))
    cells = _spark_cells(spark, sf_dir)
    probes = cells.sparkSession.createDataFrame(
        list(_IDW_PROBES), "px int, py int"
    )
    d2 = (
        (F.col("px") - F.col("cell_x"))
        * (F.col("px") - F.col("cell_x"))
        + (F.col("py") - F.col("cell_y"))
        * (F.col("py") - F.col("cell_y"))
    )
    d = F.broadcast(probes).crossJoin(cells).select(
        "px", "py", "n", d2.alias("d2")
    )
    est = d.groupBy("px", "py").agg(
        F.max(F.when(F.col("d2") == 0, F.col("n"))).alias("exact_hit"),
        F.sum(
            F.when(F.col("d2") > 0, F.col("n") / (F.col("d2") * 1.0))
        ).alias("wsum"),
        F.sum(F.when(F.col("d2") > 0, 1.0 / F.col("d2"))).alias("w"),
    )
    return est.select(
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        F.round(
            F.coalesce(F.col("exact_hit"), F.col("wsum") / F.col("w")), 6
        ).alias("idw_density"),
        F.col("exact_hit").isNotNull().alias("exact"),
    ).orderBy("px", "py")
