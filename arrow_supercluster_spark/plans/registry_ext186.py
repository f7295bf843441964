"""Round-7 registry additions, batch 181 — geo-domain extensions of
the core clustering surface: tile addressing and the gridded spatial
join.

- q_quadkey_encode: Bing-style quadkeys at zoom 5 over the derived
  point table — web-mercator tile (tx, ty), bits interleaved to a
  base-4 string — with each tile's zoom-3 parent prefix and the
  parent's rolled-up count attached.  Quadkeys are the PREFIX-ordered
  tile address: a dictionary-ordered sort groups every child under
  its parent, which is what makes tile stores range-scannable
  (the same hierarchy the cluster engine's per-zoom grid encodes
  positionally).
- q_spatial_nn_join: nearest-store spatial join — stores derive from
  `supplier` with the same LCG as the point table, explode to their
  3×3 neighbor tiles at zoom 4, broadcast, equi-join points on tile,
  haversine in meters (mm-rounded, the q_haversine_segments
  transcendental discipline), keep the nearest store per point with
  a (dist, store_id) deterministic tiebreak.  THE Spark-first range
  join: gridding turns an O(N·M) distance problem into an equi-join
  whose small side carries the fan-out.

At 100 TB: quadkey is a narrow map + one tile-keyed partial
aggregate; the NN join broadcasts only the exploded store side
(9·|stores| rows) and shuffles nothing on the point side, and the
per-point argmin is a WindowGroupLimit partial top-1.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import (
    LCG_A,
    LCG_M,
    SQL_POINTS_NONULL,
    derived_points,
)

_QK_Z = 5
_QK_PARENT_Z = 3
_NN_Z = 4
_R_EARTH_M = 6371008.8

# web-mercator y in [0, 1] (no f32 snap here — both engines evaluate the
# identical double expression; FLOOR-boundary flips are measure-zero on
# the LCG coordinates)
_SQL_MX = "((lng / 360.0) + 0.5)"
_SQL_MY = (
    "LEAST(GREATEST(0.5 - ln((1.0 + sin(radians(lat)))"
    " / (1.0 - sin(radians(lat)))) / (4 * pi()), 0.0), 1.0)"
)


def _mx():
    return (F.col("lng") / 360.0) + 0.5


def _my():
    s = F.sin(F.radians(F.col("lat")))
    return F.least(
        F.greatest(
            0.5 - F.log((1.0 + s) / (1.0 - s)) / (4 * 3.141592653589793),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )


def _sql_tile(expr: str, z: int) -> str:
    n = 1 << z
    return f"LEAST(CAST(floor({expr} * {n}) AS BIGINT), {n - 1})"


def _tile(col, z: int):
    n = 1 << z
    return F.least(F.floor(col * n).cast("long"), F.lit(n - 1))


# ===========================================================================
# R542 — quadkey encoding with parent rollup
# ===========================================================================

def _sql_quadkey(tx: str, ty: str, z: int) -> str:
    digits = ", ".join(
        f"CAST(((({ty}) >> {z - i}) & 1) * 2"
        f" + ((({tx}) >> {z - i}) & 1) AS VARCHAR)"
        for i in range(1, z + 1)
    )
    return f"concat({digits})"


def _quadkey(tx, ty, z: int):
    parts = [
        (
            (F.shiftright(ty, z - i).bitwiseAND(F.lit(1)) * 2)
            + F.shiftright(tx, z - i).bitwiseAND(F.lit(1))
        ).cast("string")
        for i in range(1, z + 1)
    ]
    return F.concat(*parts)


@register(
    "q_quadkey_encode",
    f"""
    WITH pts AS (
      SELECT id, lng, lat FROM ({SQL_POINTS_NONULL})
    ),
    tiled AS (
      SELECT id,
             {_sql_tile(_SQL_MX, _QK_Z)} AS tx,
             {_sql_tile(_SQL_MY, _QK_Z)} AS ty
      FROM pts
    ),
    keyed AS (
      SELECT {_sql_quadkey('tx', 'ty', _QK_Z)} AS qk FROM tiled
    ),
    leaf AS (
      SELECT qk, CAST(COUNT(*) AS BIGINT) AS n_points FROM keyed
      GROUP BY 1
    )
    SELECT l.qk AS quadkey, l.n_points,
           substr(l.qk, 1, {_QK_PARENT_Z}) AS parent,
           CAST(SUM(l.n_points) OVER (
             PARTITION BY substr(l.qk, 1, {_QK_PARENT_Z})
           ) AS BIGINT) AS n_in_parent
    FROM leaf l ORDER BY quadkey
    """,
)
def q_quadkey_encode(spark, sf_dir):
    """R542 — zoom-5 quadkeys over the derived points with the zoom-3
    parent prefix and its rolled-up count: bit-interleaved base-4 tile
    addresses whose dictionary order IS the hierarchy (substr = parent
    — tested).  One narrow projection + one tile-keyed partial
    aggregate; the parent rollup is a partitioned window over the
    bounded (≤4^z) tile frame."""
    pts = derived_points(spark, sf_dir, with_nulls=False)
    tiled = pts.select(
        _tile(_mx(), _QK_Z).alias("tx"),
        _tile(_my(), _QK_Z).alias("ty"),
    )
    leaf = (
        tiled.select(
            _quadkey(F.col("tx"), F.col("ty"), _QK_Z).alias("qk")
        )
        .groupBy("qk")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    w = Window.partitionBy(F.substring("qk", 1, _QK_PARENT_Z))
    return leaf.select(
        F.col("qk").alias("quadkey"),
        "n_points",
        F.substring("qk", 1, _QK_PARENT_Z).alias("parent"),
        F.sum("n_points").over(w).alias("n_in_parent"),
    ).orderBy("quadkey")


# ===========================================================================
# R543 — gridded nearest-neighbor spatial join
# ===========================================================================

_SQL_STORES = f"""
SELECT
  s_suppkey AS store_id,
  -180.0 + 360.0 * (((s_suppkey * {LCG_A}) % {LCG_M}) / {float(LCG_M)!r}) AS lng,
  -85.0 + 170.0 * ((((s_suppkey * {LCG_A}) % {LCG_M}) * {LCG_A} % {LCG_M}) / {float(LCG_M)!r}) AS lat
FROM supplier
"""


def _stores(spark, sf_dir):
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    x1 = (F.col("s_suppkey") * LCG_A) % LCG_M
    x2 = (x1 * LCG_A) % LCG_M
    return sup.select(
        F.col("s_suppkey").alias("store_id"),
        (F.lit(-180.0) + F.lit(360.0) * (x1 / F.lit(float(LCG_M)))).alias(
            "lng"
        ),
        (F.lit(-85.0) + F.lit(170.0) * (x2 / F.lit(float(LCG_M)))).alias(
            "lat"
        ),
    )


_SQL_HAV = (
    f"round(2 * {_R_EARTH_M!r} * asin(sqrt("
    "pow(sin((radians(s_lat) - radians(p_lat)) / 2), 2)"
    " + cos(radians(p_lat)) * cos(radians(s_lat))"
    "   * pow(sin((radians(s_lng) - radians(p_lng)) / 2), 2))), 3)"
)


@register(
    "q_spatial_nn_join",
    f"""
    WITH pts AS (
      SELECT id, lng AS p_lng, lat AS p_lat,
             {_sql_tile(_SQL_MX, _NN_Z)} AS tx,
             {_sql_tile(_SQL_MY, _NN_Z)} AS ty
      FROM ({SQL_POINTS_NONULL})
    ),
    stores AS (
      SELECT store_id, lng AS s_lng, lat AS s_lat,
             {_sql_tile(_SQL_MX, _NN_Z)} AS tx,
             {_sql_tile(_SQL_MY, _NN_Z)} AS ty
      FROM ({_SQL_STORES})
    ),
    fanned AS (
      SELECT s.store_id, s.s_lng, s.s_lat,
             s.tx + dx.d AS tx, s.ty + dy.d AS ty
      FROM stores s
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
      WHERE s.tx + dx.d BETWEEN 0 AND {(1 << _NN_Z) - 1}
        AND s.ty + dy.d BETWEEN 0 AND {(1 << _NN_Z) - 1}
    ),
    cand AS (
      SELECT p.id, f.store_id, {_SQL_HAV} AS dist_m
      FROM pts p JOIN fanned f ON f.tx = p.tx AND f.ty = p.ty
    ),
    ranked AS (
      SELECT id, store_id, dist_m,
             row_number() OVER (PARTITION BY id
                                ORDER BY dist_m, store_id) AS rn
      FROM cand
    )
    SELECT id, store_id, dist_m FROM ranked WHERE rn = 1
    ORDER BY id
    """,
)
def q_spatial_nn_join(spark, sf_dir):
    """R543 — nearest store per point via zoom-4 grid bucketing:
    stores (LCG-derived from supplier) explode to their clamped 3×3
    neighbor tiles and BROADCAST; points equi-join on tile (no point
    shuffle), haversine meters rounded to mm (so the (dist, store_id)
    argmin order is identical cross-engine), per-point top-1 via the
    WindowGroupLimit partial.  Points whose 3×3 neighborhood holds no
    store drop out — the gridding contract, stated."""
    pts = derived_points(spark, sf_dir, with_nulls=False).select(
        "id",
        F.col("lng").alias("p_lng"),
        F.col("lat").alias("p_lat"),
        _tile(_mx(), _NN_Z).alias("tx"),
        _tile(_my(), _NN_Z).alias("ty"),
    )
    st = _stores(spark, sf_dir).select(
        "store_id",
        F.col("lng").alias("s_lng"),
        F.col("lat").alias("s_lat"),
        _tile((F.col("lng") / 360.0) + 0.5, _NN_Z).alias("stx"),
        _tile(
            F.least(
                F.greatest(
                    0.5
                    - F.log(
                        (1.0 + F.sin(F.radians(F.col("lat"))))
                        / (1.0 - F.sin(F.radians(F.col("lat"))))
                    )
                    / (4 * 3.141592653589793),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ),
            _NN_Z,
        ).alias("sty"),
    )
    d = spark.range(-1, 2).select(F.col("id").alias("d"))
    hi = (1 << _NN_Z) - 1
    fanned = (
        st.crossJoin(d.select(F.col("d").alias("dx")))
        .crossJoin(d.select(F.col("d").alias("dy")))
        .select(
            "store_id", "s_lng", "s_lat",
            (F.col("stx") + F.col("dx")).alias("tx"),
            (F.col("sty") + F.col("dy")).alias("ty"),
        )
        .filter(
            F.col("tx").between(0, hi) & F.col("ty").between(0, hi)
        )
    )
    hav = F.round(
        2
        * _R_EARTH_M
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(
                        (F.radians("s_lat") - F.radians("p_lat")) / 2
                    ),
                    2,
                )
                + F.cos(F.radians("p_lat"))
                * F.cos(F.radians("s_lat"))
                * F.pow(
                    F.sin(
                        (F.radians("s_lng") - F.radians("p_lng")) / 2
                    ),
                    2,
                )
            )
        ),
        3,
    )
    cand = pts.join(F.broadcast(fanned), ["tx", "ty"]).select(
        "id", "store_id", hav.alias("dist_m")
    )
    w = Window.partitionBy("id").orderBy("dist_m", "store_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "store_id", "dist_m")
        .orderBy("id")
    )
