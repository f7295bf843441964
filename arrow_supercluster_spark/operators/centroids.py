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


def kmeans_step(emb: DataFrame, k: int = 8) -> DataFrame:
    """One distributed Lloyd iteration (k-means, public algorithm):
    deterministic seeds (the k lowest vec_ids — reproducible, unlike
    random init), squared-L2 assignment against broadcast centroids,
    then the recomputed per-cluster mean. Returns
    (cid, n_vecs, centroid[dim]).

    Scale shape (the IVF index trainer's inner loop, similarity.py):
    - the k seed vectors ride to every task as literals (k × dim
      doubles — Spark ships them once per stage, the moral equivalent
      of a broadcast): assignment is a NARROW map, argmin a per-row
      array_min over the k (d2, cid) structs — no join, no window, no
      corpus shuffle;
    - the mean is posexplode → (cid, pos) partial agg: one shuffle of
      scalar components, map-side combined. The corpus never shuffles
      whole rows. Driver-side iteration over this step converges the
      full algorithm; one step is the differentially-checkable kernel.

    Floats: distances and means are computed in double and rounded
    (_ROUND) before argmin/output so association order can't flip a
    comparison across engines; ties break toward the lower cid."""
    assigned = seed_assign(emb, k)
    per_pos = (
        assigned.select("cid", F.posexplode("vec").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("v"), _ROUND).alias("av"))
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
    cents = per_pos.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "av"))),
            lambda s: s["av"],
        ).alias("centroid")
    )
    return sizes.join(cents, "cid").select("cid", "n_vecs", "centroid")


def dimension_stats(emb: DataFrame) -> DataFrame:
    """Per-dimension corpus statistics (pos, mean, std, min, max) — the
    feature-profiling pass before any standardization/whitening. One
    posexplode → (pos) agg: a shuffle of scalar components with
    map-side combine, keyed by the (tiny) dimension index."""
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.round(F.avg("v"), _ROUND).alias("mu"),
            F.round(F.stddev_samp("v"), _ROUND).alias("sd"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )


def standardize(emb: DataFrame) -> DataFrame:
    """Z-score standardization per dimension (classic ML preprocessing):
    (x - mu)/sd with the corpus stats computed by dimension_stats.

    The stats table is |dims| rows → collected to the driver and shipped
    as literal arrays (same discipline as kmeans_step's seeds): scaling
    becomes a NARROW zip_with map — zero shuffle, zero join on the
    corpus path. Components rounded so cross-engine hashes agree."""
    stats = sorted(dimension_stats(emb).collect(), key=lambda r: r.pos)
    mu = F.array(*[F.lit(float(r.mu)) for r in stats])
    sd = F.array(*[F.lit(float(r.sd)) for r in stats])
    z = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.zip_with(mu, sd, lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
        lambda x, ms: F.round((x - ms["m"]) / ms["s"], _ROUND),
    )
    return emb.select("vec_id", z.alias("z"))


def seed_assign(emb: DataFrame, k: int = 8) -> DataFrame:
    """(vec_id, cid, vec) — squared-L2 argmin assignment against the k
    deterministic seed vectors (lowest vec_ids), the same literal-shipped
    narrow map kmeans_step uses: no join, no shuffle of the corpus.
    Distances rounded to _ROUND before the argmin (ties -> lower cid) so
    the assignment is reproducible cross-engine."""
    vec = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    seeds = sorted(
        vec.filter(F.col("vec_id") < k).collect(), key=lambda r: r.vec_id
    )

    def d2_to(cvec) -> F.Column:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        return F.aggregate(
            F.zip_with("vec", carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = F.array(
        *[
            F.struct(
                F.round(d2_to(r.vec), _ROUND).alias("d2"),
                F.lit(int(r.vec_id)).alias("cid"),
            )
            for r in seeds
        ]
    )
    return vec.select("vec_id", F.array_min(scored)["cid"].alias("cid"), "vec")


def semantic_dedup(emb: DataFrame, k: int = 8, tau: float = 0.9) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): shard the embedding space into k centroid cells, then drop
    any vector that has a LOWER-id near-twin (cosine >= tau) in the SAME
    cell. Returns the kept rows as (vec_id, cid).

    The drop rule "exists y < x in cell(x) with cos(x,y) >= tau" is
    order-free and deterministic — no dependence on scan order, so the
    result is partition-invariant and SQL-expressible (the DuckDB oracle
    runs the same rule as a NOT EXISTS).

    Scale shape: the quadratic pair term is confined WITHIN each
    centroid cell (SemDeDup's whole point — cells are ~n/k vectors, and
    in production k ~ sqrt(n) keeps cells tiny); the pair join is an
    equi-join on cid, never a global cross join. Assignment is the
    narrow seed_assign map. Cosines rounded to _ROUND before the
    threshold so the cut is reproducible cross-engine."""
    assigned = seed_assign(emb, k)
    a = assigned.select(
        F.col("vec_id").alias("a_id"), F.col("cid"), F.col("vec").alias("a_v")
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("cid").alias("b_cid"),
        F.col("vec").alias("b_v"),
    )
    pairs = a.join(
        b, (F.col("cid") == F.col("b_cid")) & (F.col("a_id") < F.col("b_id"))
    )
    cos = F.round(_sim(F.col("a_v"), F.col("b_v")), _ROUND)
    dropped = (
        pairs.select("b_id", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cid")
    )


def _sim(a: F.Column, b: F.Column) -> F.Column:
    """Cosine with the zero-vector guard (0.0, matching
    similarity.cosine — ANSI mode would abort on 0/0)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / denom)
