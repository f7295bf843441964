"""Round-2 registry additions, batch 17 — geospatial depth and
embedding compression:

- q_point_in_polygon: ray-casting point-in-polygon spatial join
  against literal polygons (the reference stops at bboxes; real
  spatial filters are polygons);
- q_pq_encode: product-quantization codes + reconstruction error
  (Jegou et al. 2011 — the ANN compression standard), extending the
  IVF/LSH family with the storage side of vector search.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points


# ===========================================================================
# Point-in-polygon (ray casting, literal polygons)
# ===========================================================================

# Three non-degenerate polygons (lng, lat rings, not closed — the edge
# list wraps). The derived point cloud is a narrow strip at lng≈-180
# (see sources/points.py), so the rings hug the strip — polygons placed
# over the visually "obvious" oceans match nothing.
_POLYGONS = {
    "strip_tri": [(-180.0, -60.0), (-175.5, -55.0), (-179.0, -15.0)],
    "strip_quad": [(-180.0, -5.0), (-175.8, 0.0), (-176.2, 45.0), (-179.8, 40.0)],
    "north_band": [(-180.0, 50.0), (-175.9, 55.0), (-176.5, 80.0), (-179.9, 75.0)],
}


def _edges(ring):
    return [
        (ring[i][0], ring[i][1], ring[(i + 1) % len(ring)][0], ring[(i + 1) % len(ring)][1])
        for i in range(len(ring))
    ]


def _pip_expr(lng, lat, ring) -> F.Column:
    """Odd-crossings ray cast as ONE narrow expression — the polygon
    ships as literals inside the expression tree, so membership is a
    zero-join, zero-shuffle map however many points stream through."""
    crossings = None
    for (x1, y1, x2, y2) in _edges(ring):
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        xcross = (
            (F.lit(x2) - F.lit(x1))
            * (lat - F.lit(y1))
            / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        c = (straddles & (lng < xcross)).cast("int")
        crossings = c if crossings is None else crossings + c
    return (crossings % 2) == 1


def _sql_pip(ring) -> str:
    terms = []
    for (x1, y1, x2, y2) in _edges(ring):
        terms.append(
            f"(CASE WHEN (({y1} > lat) <> ({y2} > lat)) AND "
            f"(lng < ({x2} - {x1}) * (lat - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2) = 1"


@register(
    "q_point_in_polygon",
    "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS polygon, COUNT(*) AS n_inside
        FROM ({SQL_POINTS}) p
        WHERE lng IS NOT NULL AND lat IS NOT NULL AND {_sql_pip(ring)}
        HAVING COUNT(*) > 0"""
        for name, ring in sorted(_POLYGONS.items())
    ),
)
def q_point_in_polygon(spark, sf_dir):
    """Geo depth — ray-casting point-in-polygon spatial join: points per
    polygon for three literal polygons. The reference's only spatial
    predicate is the bbox (F4); real map filters are polygons, and the
    scale-right Spark shape is the one here: each polygon's edge list is
    folded into a single narrow expression (literals in the plan — the
    moral equivalent of broadcasting the tiny geometry side), so the
    point table is scanned once TOTAL, each point evaluating every
    polygon in the same pass, and only the |polygons|-row count
    aggregate shuffles. The identical IEEE double arithmetic
    runs on the oracle side, so the boundary decisions agree bitwise."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    )
    structs = [
        F.when(
            _pip_expr(F.col("lng"), F.col("lat"), ring), F.lit(name)
        ).otherwise(F.lit(None))
        for name, ring in sorted(_POLYGONS.items())
    ]
    exploded = pts.select(
        F.explode(
            F.filter(F.array(*structs), lambda x: x.isNotNull())
        ).alias("polygon")
    )
    return exploded.groupBy("polygon").agg(
        F.count(F.lit(1)).alias("n_inside")
    )


# ===========================================================================
# Product quantization encode
# ===========================================================================

_PQ_M = 4  # sub-blocks
_PQ_KS = 4  # codes per block (seed vectors 0..3)


@register(
    "q_pq_encode",
    f"""
    WITH vec AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT len(v) AS dim FROM vec LIMIT 1),
    seeds AS (
      SELECT vec_id AS sid, v AS sv FROM vec WHERE vec_id < {_PQ_KS}
    ),
    blocks AS (
      SELECT vec.vec_id, b.b, s.sid,
             round(list_sum(list_transform(
               range(1, dims.dim // {_PQ_M} + 1),
               j -> (vec.v[b.b * (dims.dim // {_PQ_M}) + j]
                     - s.sv[b.b * (dims.dim // {_PQ_M}) + j])
                  * (vec.v[b.b * (dims.dim // {_PQ_M}) + j]
                     - s.sv[b.b * (dims.dim // {_PQ_M}) + j])
             )), 6) AS d2
      FROM vec
      CROSS JOIN dims
      CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M} - 1)) AS b) b
      CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, b, sid, d2 FROM (
        SELECT vec_id, b, sid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, sid) AS rk
        FROM blocks
      ) WHERE rk = 1
    )
    SELECT vec_id,
           list(sid ORDER BY b) AS codes,
           round(SUM(d2), 6) AS err
    FROM best GROUP BY vec_id
    """,
)
def q_pq_encode(spark, sf_dir):
    """Embedding ops — product-quantization encoding: the vector splits
    into {m} blocks, each block argmin-assigned to one of {ks}
    deterministic sub-centroids (slices of the lowest-{ks} seed
    vectors); output is the code array plus the total squared
    reconstruction error. PQ is how vector stores fit billions of
    embeddings in RAM (64 dims x 4 bytes -> {m} bytes here). The
    Spark side is a single narrow projection — sub-centroid slices ride
    as literals (k-means-seed pattern), each block's argmin is an
    array_min over {ks} (d2, code) structs, no join, no explode, no
    shuffle at all; the oracle recomputes the same assignment with the
    naive window form."""
    emb = _emb(spark, sf_dir)
    vec = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = sorted(
        vec.filter(F.col("vec_id") < _PQ_KS).collect(), key=lambda r: r.vec_id
    )
    dim = len(seeds[0].v)
    blk = dim // _PQ_M

    def block_d2(b: int, seed_slice) -> F.Column:
        carr = F.array(*[F.lit(float(x)) for x in seed_slice])
        sub = F.slice("v", b * blk + 1, blk)
        return F.round(
            F.aggregate(
                F.zip_with(sub, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            6,
        )

    code_cols = []
    err_cols = []
    for b in range(_PQ_M):
        scored = F.array(
            *[
                F.struct(
                    block_d2(b, r.v[b * blk : (b + 1) * blk]).alias("d2"),
                    F.lit(int(r.vec_id)).alias("code"),
                )
                for r in seeds
            ]
        )
        best = F.array_min(scored)
        code_cols.append(best["code"])
        err_cols.append(best["d2"])
    total_err = err_cols[0]
    for e in err_cols[1:]:
        total_err = total_err + e
    return vec.select(
        "vec_id",
        F.array(*[c.cast("long") for c in code_cols]).alias("codes"),
        F.round(total_err, 6).alias("err"),
    )
