"""Round-2 registry additions: WKB geometry decode (P1 completion).

The reference reads non-GeoArrow geometry encodings through a per-row
fallback (arrow-helpers.ts:52-62); real-world GeoParquet is WKB. The
decode here is the expression-only decoder from functions/wkb.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.wkb import (
    decode_wkb_points,
    encode_wkb_point_udf,
)
from arrow_supercluster_spark.plans.registry import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points


@register(
    "q_unpack_wkb",
    f"SELECT id, lng, lat FROM ({SQL_POINTS}) WHERE lng IS NOT NULL",
)
def q_unpack_wkb(spark, sf_dir):
    """P1 (WKB fallback) — points are packed into little-endian WKB Point
    binaries (struct.pack scaffolding, independent of the decoder) and
    decoded back with the JVM-expression decoder; the oracle is the plain
    coordinates, so the match proves the decode is bit-exact
    (arrow-helpers.ts:52-62)."""
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull())
    enc = encode_wkb_point_udf()
    wkb_df = pts.select("id", enc(F.col("lng"), F.col("lat")).alias("geometry"))
    return decode_wkb_points(wkb_df).select("id", "lng", "lat")
