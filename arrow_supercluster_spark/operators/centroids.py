"""Embedding-centroid operators: per-label mean vectors and
nearest-centroid assignment.

Extension surface (brief: similarity search / embedding ops beyond the
reference, which has no vector columns). The centroid is the same
count-weighted mean the reference uses for cluster positions (A2,
packages/arrow-supercluster/src/arrow-cluster-engine.ts:375-394),
generalized from 2-D Mercator points to d-dim embeddings.

Scale notes (100 TB of vectors):
- label_centroids: posexplode -> groupBy(label, pos) is ONE shuffle of
  (n_rows × dim) scalar rows with map-side partial aggregation — the
  canonical distributed mean; no per-executor state, no driver collect
  of vectors.
- nearest_centroid: the centroid table is tiny (n_labels rows) ->
  broadcast; scoring is a narrow map (JVM higher-order functions), and
  the output is a confusion-matrix-sized aggregate. The corpus never
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROUND = 6  # centroid components rounded so cross-engine hashes agree


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, dim, centroid) — elementwise mean embedding per label,
    components rounded to 6 decimals."""
    per_pos = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), _ROUND).alias("av"))
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("dim"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "av"))),
                lambda s: s["av"],
            ).alias("centroid"),
        )
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def nearest_centroid(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to the cosine-nearest label centroid; return
    the (true label, assigned label) confusion counts.

    Ties broken by centroid label ascending (deterministic across
    engines): the winner is min(struct(-sim, label)), i.e. argmax by
    similarity with label as tiebreaker — an ordinary partial-aggregable
    min, not a per-vec_id window. Centroids broadcast; only the
    confusion matrix leaves the map stage."""
    cand = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("vec"),
    ).crossJoin(
        F.broadcast(
            cents.select(
                F.col("label").alias("c_label"), F.col("centroid")
            )
        )
    )
    sim = (
        _dot(F.col("vec"), F.col("centroid"))
        / (_norm(F.col("vec")) * _norm(F.col("centroid")))
    )
    best = (
        cand.select(
            "vec_id",
            "label",
            F.struct(
                (-F.round(sim, _ROUND)).alias("neg_sim"),
                F.col("c_label"),
            ).alias("scored"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("scored").alias("best"))
        .select("vec_id", "label", F.col("best.c_label").alias("assigned"))
    )
    return (
        best.groupBy("label", "assigned")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
