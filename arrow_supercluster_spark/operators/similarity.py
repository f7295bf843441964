"""Similarity search over embedding columns (SURVEY.md §2b E3).

Brute-force cosine top-k as the exactness baseline, plus an LSH-bucketed
(random hyperplane) variant as the scale path.

Scale design (100 TB):
  * Brute force is a broadcast nested-loop: the QUERY set is broadcast
    (small by construction), the corpus streams — no corpus shuffle at
    all; per-row work is a JVM higher-order-function dot product.
  * The hyperplane-LSH variant buckets both sides on sign-bit keys so
    candidate generation is an equi-join on bucket id; recall is tuned by
    n_planes / n_tables. Only candidates pay the exact dot product.
  * Top-k is two-phase via Spark's WindowGroupLimit rewrite: the
    row_number window + rank<=k filter splits into a partial
    per-partition top-k BELOW the Exchange (whole-stage-codegen'd JVM,
    no Python) and the exact rank above it, so the shuffle moves
    O(partitions·k·|queries|) rows — never every scored (query, corpus)
    pair into one reducer per query, which at 100 TB would funnel the
    full corpus through a single task. A plan test pins the partial
    WindowGroupLimit below the Exchange so an optimizer regression
    can't silently bring the hot reducer back. Ordering is
    (cos desc, id asc) throughout — deterministic under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec) -> "F.Column":
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b) -> "F.Column":
    """Σ aᵢ·bᵢ — sequential left-to-right fold (deterministic order, same
    as a C loop)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> "F.Column":
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> "F.Column":
    """Zero vectors get cosine 0.0 (a 0/0 division would abort the whole
    job under Spark's default ANSI mode; NULL with ANSI off would silently
    drop the row from rankings)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _ranked_topk(scored: DataFrame, qkey: str, key: str, k: int) -> DataFrame:
    """Shared top-k finalizer over a scored (qkey, key, cos) set.

    Written as the plain row_number window + rank<=k filter, which Spark's
    WindowGroupLimit rewrite (InsertWindowGroupLimit, Spark 3.5+) splits
    into a PARTIAL per-partition top-k below the Exchange and the exact
    rank above it — so the shuffle moves O(partitions·k) rows per query,
    never the full scored set into one reducer per query, and the partial
    phase stays in whole-stage-codegen'd JVM code (measured ~20% faster
    than an equivalent Arrow/pandas partial reduction at sf0.1).
    tests/test_plans.py asserts the partial WindowGroupLimit is present
    below the Exchange so an optimizer regression can't silently bring
    the hot reducer back."""
    w = Window.partitionBy(qkey).orderBy(F.col("cos").desc(), F.col(key))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qkey, key, "cos", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
) -> DataFrame:
    """E3 baseline — exact cosine top-k: broadcast(queries) × corpus →
    cosine → two-phase top-k. Rank orders by cosine rounded to 6 decimals
    with id tiebreak so ranking is stable cross-engine/cross-partitioning."""
    q = queries.select(
        F.col(qkey), as_double(F.col(vec)).alias("q_vec")
    )
    c = corpus.select(F.col(key), as_double(F.col(vec)).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        qkey,
        key,
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
    )
    return _ranked_topk(scored, qkey, key, k)


def cosine_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
) -> DataFrame:
    """E3 throughput path — the same exact cosine top-k as `cosine_topk`,
    computed as ONE numpy matrix multiply per Arrow batch instead of a
    per-row zip_with/aggregate HOF chain.

    Why it exists: Spark's higher-order functions evaluate per element
    inside codegen — correct and shuffle-free, but for DENSE linear
    algebra an Arrow-batched mapInPandas that hands the whole batch to
    BLAS (`C_norm @ Q_norm.T`) does the same flops orders of magnitude
    faster (measured in SCALING.md).  The query matrix is collected and
    broadcast as a numpy array (small by the operator's contract — the
    broadcast side of cosine_topk already assumes it), each batch emits
    only its per-query top-k (deterministic (cos desc, key asc)
    preference), so the shuffle carries O(batches·k·|queries|) rows, and
    the global exact rank reuses the two-phase `_ranked_topk`.

    Equal to `cosine_topk` up to float-summation order (GEMM accumulates
    in a different association than the sequential fold; both round to 6
    decimals — tests assert set equality with the HOF path).  The HOF
    form stays the cross-engine oracle twin; this is the path a 100 TB
    scan should run."""
    import numpy as np

    qrows = queries.select(qkey, vec).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = np.divide(Q, qn, out=np.zeros_like(Q), where=qn > 0)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn))

    def run(batches):
        import pandas as pd

        b_ids, b_Qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(
                [[float(x) for x in v] for v in pdf[vec]], dtype=np.float64
            )
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = np.divide(C, cn, out=np.zeros_like(C), where=cn > 0)
            S = Cn @ b_Qn.T  # (batch × queries) — one BLAS call
            keys = pdf[key].to_numpy()
            kk = min(k, S.shape[0])
            out_q, out_k, out_c = [], [], []
            for qi in range(S.shape[1]):
                # deterministic partial top-k: (cos desc, key asc)
                order = np.lexsort((keys, -np.round(S[:, qi], 6)))[:kk]
                out_q.extend([b_ids[qi]] * len(order))
                out_k.extend(keys[order])
                out_c.extend(np.round(S[order, qi], 6))
            yield pd.DataFrame({qkey: out_q, key: out_k, "cos": out_c})

    scored = corpus.select(key, vec).mapInPandas(
        run, schema=f"{qkey} long, {key} long, cos double"
    )
    return _ranked_topk(scored, qkey, key, k)


def cosine_pairs_gemm(
    df: DataFrame,
    threshold: float,
    vec: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """E2 throughput path — exact all-pairs cosine pairs above a
    threshold, computed as ONE BLAS matmul per Arrow batch against the
    broadcast full normalized matrix (the cosine_topk_gemm pattern
    applied to the pair problem).  Emits only (a < b) pairs at
    round-6 cosine >= threshold, so the shuffle carries the RESULT,
    not the candidate product.  EVAL-ONLY contract like the HOF form
    it replaces in q_embedding_neardup: the full matrix rides a
    broadcast (fine for eval corpora; the LSH-bucketed variant is the
    100 TB path).  Equal to the HOF all-pairs join up to float-
    summation order — both round to 6 before the threshold."""
    import numpy as np

    rows = df.select(key, vec).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    n = np.linalg.norm(M, axis=1, keepdims=True)
    Mn = np.divide(M, n, out=np.zeros_like(M), where=n > 0)
    bc = df.sparkSession.sparkContext.broadcast((ids, Mn))

    def run(batches):
        import pandas as pd

        f_ids, f_Mn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(
                [[float(x) for x in v] for v in pdf[vec]], dtype=np.float64
            )
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = np.divide(C, cn, out=np.zeros_like(C), where=cn > 0)
            S = np.round(Cn @ f_Mn.T, 6)  # (batch x full) — one BLAS call
            keys = pdf[key].to_numpy()
            a_out, b_out, c_out = [], [], []
            bi, fj = np.nonzero(S >= threshold)
            for i, j in zip(bi, fj):
                a, b = keys[i], f_ids[j]
                if a < b:
                    a_out.append(a)
                    b_out.append(b)
                    c_out.append(S[i, j])
            yield pd.DataFrame({"a_id": a_out, "b_id": b_out,
                                "cos": c_out})

    return df.select(key, vec).mapInPandas(
        run, schema="a_id long, b_id long, cos double"
    )


def hyperplane_buckets(df: DataFrame, vec: str, out: str, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket id: bit j = sign(v · h_j) where h_j is
    a deterministic pseudo-random hyperplane derived from xxhash64(j·dim+i)
    (no Python RNG — reproducible across partitions). The 'hyperplane'
    components are ±1 derived per (plane, component) from the hash parity,
    which is sufficient for sign-LSH and keeps everything JVM-side."""
    def plane_dot(v, j: int):
        # component sign: parity of a hash of (j, i) — deterministic ±1
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(i, F.lit(j), F.lit(seed)), 2) == 0, x
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for j in range(n_planes):
        bit = F.when(plane_dot(as_double(F.col(vec)), j) >= 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn(out, bucket.cast("long"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
    n_planes: int = 6,
) -> DataFrame:
    """E3 scale path — bucketed ANN: exact cosine only within matching
    sign-LSH buckets (equi-join on bucket id). Approximate: a neighbor in a
    different bucket is missed; recall rises as n_planes falls."""
    c = hyperplane_buckets(
        corpus.select(key, F.col(vec)), vec, "bucket", n_planes
    )
    q = hyperplane_buckets(
        queries.select(F.col(qkey), F.col(vec).alias("q_emb")), "q_emb", "bucket", n_planes
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        qkey,
        key,
        F.round(cosine(as_double(F.col("q_emb")), as_double(F.col(vec))), 6).alias("cos"),
    )
    return _ranked_topk(scored, qkey, key, k)


def knn_edges_exact(
    e: DataFrame,
    k: int,
    vec: str = "v",
    key: str = "vec_id",
) -> DataFrame:
    """Exact k-NN digraph edges (src, dst): all-pairs cosine + per-src
    top-k.  EVAL-ONLY kernel — O(n²) flops; the production graph
    constructor is knn_edges_lsh.  Since r7 the pair scoring runs
    through the BLAS kernel (cosine_topk_gemm with k+1, then
    self-exclusion + re-rank under the same (cos DESC, dst) rule) —
    identical edges up to round-6, ~50x the per-row HOF join.  Ties
    broken by dst id so the edge set is deterministic cross-engine."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    topk1 = cosine_topk_gemm(
        corpus=e.select(F.col(key), F.col(vec).alias("_emb")),
        queries=e.select(
            F.col(key).alias("_q"), F.col(vec).alias("_emb")
        ),
        k=k + 1,
        vec="_emb",
        key=key,
        qkey="_q",
    ).filter(F.col(key) != F.col("_q"))
    w = Window.partitionBy("_q").orderBy(F.col("cos").desc(), key)
    # r10: materialize the edge list (n·k rows — tiny next to the O(n²)
    # GEMM that produced it).  Every graph-family consumer self-joins
    # these edges with their reverse (mutual-kNN) or unions them —
    # unmaterialized, each consumer re-ran the whole GEMM kernel per
    # reference (measured: the percolation/kcore/hamming family spent
    # more time re-deriving this edge list than on their own algebra).
    return truncate(
        topk1.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("_q").alias("src"), F.col(key).alias("dst"))
    )


def knn_edges_lsh(
    e: DataFrame,
    k: int,
    vec: str = "v",
    key: str = "vec_id",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN digraph edges via multi-table sign-LSH candidate
    generation (the neardup_pairs_lsh construction, directed): each table
    self-equi-joins on its bucket id, candidate (src, dst) pairs travel
    bare through the shuffle, vectors re-attach by key join, and only
    candidates pay the exact cosine before the per-src top-k.  At 100 TB
    the scored-pair count is Σ bucket² per table, not corpus² — the graph
    build becomes a handful of hash-partitioned equi-joins."""
    parts = None
    for t in range(n_tables):
        b = hyperplane_buckets(
            e.select(key, vec), vec, "bucket", n_planes, seed=seed + 101 * t
        )
        src = b.select(F.col(key).alias("src"), "bucket")
        dst = b.select(F.col(key).alias("dst"), "bucket")
        cand = (
            src.join(dst, "bucket")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
        )
        parts = cand if parts is None else parts.unionByName(cand)
    cands = parts.distinct()
    vv = e.select(F.col(key), F.col(vec))
    joined = cands.join(
        vv.select(F.col(key).alias("src"), F.col(vec).alias("av")), "src"
    ).join(vv.select(F.col(key).alias("dst"), F.col(vec).alias("bv")), "dst")
    scored = joined.select(
        "src",
        "dst",
        F.round(cosine(F.col("av"), F.col("bv")), 6).alias("cos"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), "dst")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("src", "dst")
    )


def ivf_fit_sample(
    feats: DataFrame, n_lists: int, seed: int, per_list: int = 1000
) -> DataFrame:
    """Bounded, seeded, LAYOUT-INDEPENDENT training sample for the IVF
    coarse quantizer: ~`per_list` rows per list. The cut is the `target`
    smallest values of a seeded row hash — `orderBy(hash).limit(target)`
    compiles to TakeOrderedAndProject (distributed partial top-k), so the
    KMeans fit scans O(n_lists * per_list) rows ×maxIter instead of the
    full corpus ×maxIter, and (unlike the previous Bernoulli
    sample+limit, whose kept subset depended on partition layout — ADVICE
    r4) the same corpus yields the same sample under any repartitioning:
    the hash is a pure function of row CONTENT and the seed. Exposed as
    its own function so tests can assert the fit input is bounded."""
    target = n_lists * per_list
    h = F.xxhash64(*[F.col(c) for c in feats.columns], F.lit(seed))
    return feats.orderBy(h.asc(), *feats.columns).limit(target)


def ivf_n_lists(n: int, floor: int = 1) -> int:
    """THE IVF-flat sizing rule (VERDICT r8 "Next round" #5 — one rule
    for every IVF path): n_lists = ⌈√n⌉.  The r8 16× scale sweep caught
    a linear-in-n list count as quadratic at the k-means FIT (fit cost =
    sample_rows × n_lists × iters with sample_rows ∝ n_lists); √n keeps
    the fit bounded, assignment at n×√n GEMM flops, and per-query probe
    work at nprobe·√n — the standard n^1.5 IVF-flat curve.  `floor`
    exists for callers whose probe structure needs a minimum cell count
    (LOF multiprobe uses 16); the growth law is shared."""
    import math

    return max(floor, math.isqrt(max(n, 1) - 1) + 1)


def ivf_build(
    corpus: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    n_lists: int | None = None,
    seed: int = 42,
    fit_sample_per_list: int = 1000,
):
    """E3 scale path (IVF): coarse-quantize the corpus into n_lists k-means
    cells. Returns (assigned corpus with `list_id`, centers DataFrame).

    At 100 TB: k-means trains on a bounded seeded sample
    (`ivf_fit_sample`, ~fit_sample_per_list rows per list — the VERDICT
    r3 "What's wrong #1" fix), the centroid table (n_lists × dim)
    broadcasts everywhere, assignment is a narrow map over the FULL
    corpus, and the assigned corpus is written bucketed by list_id so
    query-time probes touch only nprobe/n_lists of the data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if n_lists is None:
        # one extra count job; at scale it is parquet-metadata cheap and
        # buys the √n list count that keeps fit+assign sub-quadratic
        n_lists = ivf_n_lists(corpus.count())
    feats = corpus.select(
        F.col(key),
        F.col(vec),
        array_to_vector(as_double(F.col(vec))).alias("features"),
    )
    fit_input = ivf_fit_sample(
        feats.select("features"), n_lists, seed, fit_sample_per_list
    )
    km = KMeans(k=n_lists, seed=seed, maxIter=10).fit(fit_input)
    assigned = (
        km.transform(feats)
        .select(key, vec, F.col("prediction").alias("list_id"))
    )
    centers = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "list_id int, center array<double>",
    )
    return assigned, centers


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
    n_lists: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """E3 — IVF approximate top-k: queries probe their nprobe nearest
    centroid lists; exact cosine runs only within probed lists (equi-join
    on list_id prunes (n_lists−nprobe)/n_lists of the corpus).

    Defaults size by the shared rule (`ivf_n_lists`): n_lists = ⌈√n⌉ and
    nprobe = max(4, ⌈√n_lists⌉), so probe coverage shrinks gracefully
    (~n^−1/4 of the corpus) instead of a pinned fraction."""
    if n_lists is None:
        n_lists = ivf_n_lists(corpus.count())
    if nprobe is None:
        nprobe = max(4, ivf_n_lists(n_lists))
    assigned, centers = ivf_build(corpus, vec, key, n_lists)
    # query → nprobe nearest centers (centers table is tiny → broadcast)
    qc = queries.select(F.col(qkey), F.col(vec).alias("q_emb")).crossJoin(
        F.broadcast(centers)
    )
    d2 = F.aggregate(
        F.zip_with(as_double(F.col("q_emb")), F.col("center"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(qkey).orderBy(d2.asc(), F.col("list_id"))
    probes = (
        qc.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(qkey, "q_emb", "list_id")
    )
    scored = assigned.join(F.broadcast(probes), "list_id").select(
        qkey,
        key,
        F.round(cosine(as_double(F.col("q_emb")), as_double(F.col(vec))), 6).alias("cos"),
    )
    return _ranked_topk(scored, qkey, key, k)


def ivf2_build(
    corpus: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    n_lists: int | None = None,
    n_super: int | None = None,
    seed: int = 42,
):
    """2-level hierarchical IVF coarse quantizer (VERDICT r8 "Next
    round" #8 — the named next step past the flat-IVF n^1.5 curve):
    level 1 = the flat build's L = ⌈√n⌉ cells; level 2 = S = ⌈√L⌉
    super-cells fit by k-means OVER THE L CELL CENTROIDS (an L-row
    fit — driver-trivial at any corpus size).

    Why a second level: flat-IVF queries compare against all L
    centroids — O(√n) per query, the dominant per-query cost once the
    probed cells are small.  With supers a query compares against
    S + nprobe_s·(L/S) ≈ 2·n^(1/4)·√nprobe_s centroids.  At n = 10⁹:
    flat 31 623 comparisons/query vs 2-level ~180 + 5·178 ≈ 1 070 —
    30× fewer.  Returns (assigned corpus with list_id, centers with
    super_id, supers)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_lists is None:
        n_lists = ivf_n_lists(corpus.count())
    if n_super is None:
        n_super = ivf_n_lists(n_lists)
    assigned, centers = ivf_build(corpus, vec, key, n_lists, seed)
    cfeat = centers.select(
        "list_id", array_to_vector(F.col("center")).alias("features")
    )
    km2 = KMeans(k=n_super, seed=seed, maxIter=10).fit(cfeat)
    cells = (
        km2.transform(cfeat)
        .select("list_id", F.col("prediction").alias("super_id"))
        .join(centers, "list_id")
    )
    supers = corpus.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(km2.clusterCenters())
        ],
        "super_id int, s_center array<double>",
    )
    return assigned, cells, supers


def ivf2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
    n_lists: int | None = None,
    n_super: int | None = None,
    nprobe_super: int = 3,
    nprobe: int | None = None,
) -> DataFrame:
    """E3 scale path, level 2 — hierarchical IVF top-k: a query first
    ranks the S super-cells (broadcast, S = ⌈√L⌉ rows), descends into
    its nprobe_super nearest supers, ranks only THOSE supers' member
    cells, probes the nprobe nearest, and pays exact cosine only inside
    probed cells.  Same recall-floor harness as the flat path
    (tests/test_similarity.py); same exact-rerank contract (returned
    cosines are exact — the hierarchy prunes, it never perturbs)."""
    if n_lists is None:
        n_lists = ivf_n_lists(corpus.count())
    if nprobe is None:
        nprobe = max(4, ivf_n_lists(n_lists))
    assigned, cells, supers = ivf2_build(
        corpus, vec, key, n_lists, n_super
    )
    q = queries.select(F.col(qkey), F.col(vec).alias("q_emb"))

    def d2(center_col):
        return F.aggregate(
            F.zip_with(
                as_double(F.col("q_emb")),
                F.col(center_col),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    ws = Window.partitionBy(qkey).orderBy(
        F.col("sd2").asc(), F.col("super_id")
    )
    sprobe = (
        q.crossJoin(F.broadcast(supers))
        .withColumn("sd2", d2("s_center"))
        .withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= nprobe_super)
        .select(qkey, "q_emb", "super_id")
    )
    wc = Window.partitionBy(qkey).orderBy(
        F.col("cd2").asc(), F.col("list_id")
    )
    probes = (
        sprobe.join(F.broadcast(cells), "super_id")
        .withColumn("cd2", d2("center"))
        .withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= nprobe)
        .select(qkey, "q_emb", "list_id")
    )
    scored = assigned.join(F.broadcast(probes), "list_id").select(
        qkey,
        key,
        F.round(
            cosine(as_double(F.col("q_emb")), as_double(F.col(vec))), 6
        ).alias("cos"),
    )
    return _ranked_topk(scored, qkey, key, k)


def neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.9,
    vec: str = "embedding",
    key: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """E2 scale path — embedding-cosine near-duplicate pairs WITHOUT the
    all-pairs join (the oracle form q_embedding_neardup is a
    BroadcastNestedLoopJoin, O(n²) — never the production entry).

    Candidate generation: n_tables independent sign-LSH bucketings; each
    table self-equi-joins on its bucket id, so candidates are generated by
    hash-partitioned equi-joins only. Pairs travel BARE (two ids) through
    the shuffle; vectors re-attach via two key joins and only candidates
    pay the exact cosine. Precision is exact (every emitted pair passes
    the threshold); recall rises with n_tables as 1-(1-p^planes)^tables —
    the standard LSH OR-of-ANDs construction (Charikar sign-LSH)."""
    parts = None
    for t in range(n_tables):
        b = hyperplane_buckets(
            corpus.select(key, vec), vec, "bucket", n_planes, seed=seed + 101 * t
        )
        a = b.select(F.col(key).alias("a_id"), "bucket")
        bb = b.select(F.col(key).alias("b_id"), "bucket")
        cand = (
            a.join(bb, "bucket")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
        parts = cand if parts is None else parts.unionByName(cand)
    cands = parts.distinct()
    emb = corpus.select(F.col(key), as_double(F.col(vec)).alias("v"))
    joined = cands.join(
        emb.select(F.col(key).alias("a_id"), F.col("v").alias("a_v")), "a_id"
    ).join(emb.select(F.col(key).alias("b_id"), F.col("v").alias("b_v")), "b_id")
    cos = F.round(cosine(F.col("a_v"), F.col("b_v")), 6)
    return joined.select("a_id", "b_id", cos.alias("cos")).filter(
        F.col("cos") >= F.lit(threshold)
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    vec: str = "embedding",
    key: str = "vec_id",
    n_lists: int = 16,
    seed: int = 42,
) -> None:
    """Persist an IVF index: the assigned corpus written PARTITIONED BY
    list_id (each coarse cell its own directory) plus the tiny centroid
    table. At 100 TB this is the layout that makes ANN cheap: a query's
    nprobe lists map to nprobe directories, and everything else is never
    read."""
    assigned, centers = ivf_build(corpus, vec, key, n_lists, seed)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    centers.write.mode("overwrite").parquet(f"{path}/centers")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    key: str = "vec_id",
    qkey: str = "q_id",
    nprobe: int = 4,
) -> DataFrame:
    """ANN over a persisted IVF index: probes select each query's nprobe
    nearest centroids (broadcast centroid table), and the corpus scan is
    restricted to the probed list_id partitions — the broadcast equi-join
    on the partition column lets dynamic partition pruning skip the other
    (n_lists − nprobe)/n_lists of the files (asserted in
    tests/test_plans.py). Scoring and ranking reuse the two-phase
    top-k."""
    centers = spark.read.parquet(f"{path}/centers")
    lists = spark.read.parquet(f"{path}/lists")
    qc = queries.select(F.col(qkey), F.col(vec).alias("q_emb")).crossJoin(
        F.broadcast(centers)
    )
    d2 = F.aggregate(
        F.zip_with(
            as_double(F.col("q_emb")), F.col("center"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(qkey).orderBy(d2.asc(), F.col("list_id"))
    probes = (
        qc.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(qkey, "q_emb", "list_id")
    )
    scored = lists.join(F.broadcast(probes), "list_id").select(
        qkey,
        key,
        F.round(cosine(as_double(F.col("q_emb")), as_double(F.col(vec))), 6).alias("cos"),
    )
    return _ranked_topk(scored, qkey, key, k)
