"""Round-2 registry additions, batch 41 — compressibility, behavioral
entropy, and nearest-neighbor spatial index:

- q_compression_quality: zlib compression ratio per document — the
  classic repetitiveness signal (highly compressible ⇒ boilerplate /
  repeated spans); rows-only (codec runs in the Arrow batch);
- q_user_entropy: Shannon entropy of each user's event-type mix — the
  behavioral-diversity feature;
- q_clark_evans: Clark-Evans nearest-neighbor index over the point
  field (observed mean NN distance vs the CSR expectation) — the
  point-process companion of q_morans_i/q_quadrat_test.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points
from arrow_supercluster_spark.sources.tables import read_events


@register("q_compression_quality", None)
def q_compression_quality(spark, sf_dir):
    """Text quality — zlib compression ratio per document
    (compressed/raw bytes at level 6): the cheap, library-grade
    repetitiveness detector — templated or looping text compresses far
    below prose (pairs with q_repetition_stats' explicit counters).
    Arrow-batched mapInPandas; the codec is CPython's bundled zlib, so
    this is rows-only (no SQL twin) with a direct-zlib parity test in
    tests/test_batch41.py. Payload never shuffles — ratios are computed
    where the text sits."""
    import zlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": [len(b) for b in raw],
                    "zlib_bytes": comp,
                    "ratio": [
                        round(c / len(b), 6) if len(b) else None
                        for c, b in zip(comp, raw)
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, raw_bytes long, zlib_bytes long, ratio double"
    )


@register(
    "q_user_entropy",
    """
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, SUM(c) AS n FROM ut GROUP BY 1)
    SELECT ut.user_id, ANY_VALUE(n) AS n_events,
           COUNT(*) AS n_types,
           round(-SUM((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy
    FROM ut JOIN tot USING (user_id)
    GROUP BY ut.user_id
    """,
)
def q_user_entropy(spark, sf_dir):
    """Behavioral profiling — Shannon entropy (nats) of each user's
    event-type distribution: 0 = single-behavior user, ln(5) ≈ 1.61 =
    uniform across all five types — the diversity feature behind
    engagement segmentation (q_rfm_segments' qualitative sibling). Two
    keyed aggs, both collapsing to at most |users|×|types| rows;
    entropy rounds to 6 (ln + engine sum order)."""
    ev = read_events(spark, sf_dir)
    ut = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = ut.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    return (
        ut.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


# ===========================================================================
# Clark-Evans index
# ===========================================================================

_CE_CELL = 1.0  # degrees; NN search truncated to the 3x3 neighborhood


@register(
    "q_clark_evans",
    f"""
    WITH pts AS (
      SELECT id, lng, lat,
             CAST(floor(lng / {_CE_CELL}) AS BIGINT) AS cx,
             CAST(floor(lat / {_CE_CELL}) AS BIGINT) AS cy
      FROM ({SQL_POINTS}) WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    nn AS (
      SELECT a.id,
             MIN(sqrt((a.lng - b.lng) * (a.lng - b.lng)
                      + (a.lat - b.lat) * (a.lat - b.lat))) AS d
      FROM pts a JOIN pts b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.id <> b.id
      GROUP BY a.id
    ),
    ext AS (
      SELECT (MAX(lng) - MIN(lng)) * (MAX(lat) - MIN(lat)) AS area,
             COUNT(*) AS n
      FROM pts
    )
    SELECT n AS n_points,
           COUNT(*) AS n_with_nn,
           round(AVG(d), 6) AS mean_nn,
           round(0.5 / sqrt(n / area), 6) AS expected_nn,
           round(AVG(d) / (0.5 / sqrt(n / area)), 6) AS ce_index
    FROM nn CROSS JOIN ext
    GROUP BY n, area
    """,
)
def q_clark_evans(spark, sf_dir):
    """Spatial stats — Clark-Evans nearest-neighbor index: observed mean
    NN distance over the CSR expectation 1/(2√λ) (λ = n/extent area) —
    R < 1 clustered, ≈ 1 random, → 2.15 perfectly dispersed; the
    point-process test completing the lattice pair (q_morans_i,
    q_quadrat_test). NN search is the 3×3 cell equi-join (KDBush-within
    shape; 1° cells — points whose true NN lies beyond the neighborhood
    drop out, the standard truncated-search tradeoff, and the coverage
    count is reported). One cell join + per-point min + two tiny
    aggs."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    ).select(
        "id", "lng", "lat",
        F.floor(F.col("lng") / _CE_CELL).cast("long").alias("cx"),
        F.floor(F.col("lat") / _CE_CELL).cast("long").alias("cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("a_id"), F.col("lng").alias("a_lng"),
        F.col("lat").alias("a_lat"), F.explode(offs).alias("o"), "cx", "cy",
    ).select(
        "a_id", "a_lng", "a_lat",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("id").alias("b_id"), F.col("lng").alias("b_lng"),
        F.col("lat").alias("b_lat"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    d = F.sqrt(
        (F.col("a_lng") - F.col("b_lng")) * (F.col("a_lng") - F.col("b_lng"))
        + (F.col("a_lat") - F.col("b_lat")) * (F.col("a_lat") - F.col("b_lat"))
    )
    nn = (
        a.join(b, ["jx", "jy"])
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id")
        .agg(F.min(d).alias("d"))
    )
    ext = pts.agg(
        ((F.max("lng") - F.min("lng")) * (F.max("lat") - F.min("lat"))).alias("area"),
        F.count(F.lit(1)).alias("n"),
    )
    expected = 0.5 / F.sqrt(F.col("n") / F.col("area"))
    return (
        nn.crossJoin(F.broadcast(ext))
        .groupBy("n", "area")
        .agg(
            F.count(F.lit(1)).alias("n_with_nn"),
            F.round(F.avg("d"), 6).alias("mean_nn"),
            F.round(expected, 6).alias("expected_nn"),
            F.round(F.avg("d") / expected, 6).alias("ce_index"),
        )
        .select(
            F.col("n").alias("n_points"), "n_with_nn",
            "mean_nn", "expected_nn", "ce_index",
        )
    )
