"""Round-5 registry additions, batch 112 — embedding geometry + the
distributed clustering init + the n-gram lang-ID heuristic:

- q_jl_projection: Johnson-Lindenstrauss random projection 64→16 dims
  with a hash-seeded ±1 matrix (no RNG state, no driver matrix — the
  sign is an expression). Per-vector norm ratio certifies the isometry.
- q_kmeanspp_init: k-means|| (scalable k-means++) oversampling init —
  two rounds of "sample with prob ∝ d²(x, C)" against the running
  center set, hash-thresholded so the sample is deterministic. The
  distributed init that replaces k sequential k-means++ passes with
  O(log k) rounds (Bahmani et al., VLDB 2012).
- q_charngram_langid: character-trigram profile language ID — cosine
  between the doc's trigram count vector and per-language corpus
  profiles (the classic Cavnar-Trenkle-style n-gram heuristic, a
  different family from q_naive_bayes_lang's word-multinomial).
  Cosine is scale-invariant, so RAW INTEGER counts replace relative
  frequencies and every sum is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, _docs, _emb

_P = 2147483647
_JL_IN, _JL_OUT = 64, 16
_KPP_L = 8.0  # oversampling factor per round
_KPP_ROUNDS = 2


# ===========================================================================
# R333 — Johnson-Lindenstrauss ±1 random projection
# ===========================================================================

def _sql_jl_sign(i: str, j: str) -> str:
    return f"(1 - 2 * CAST((({i} * 100003 + {j} * 31 + 7) * 2654435761 % {_P}) % 2 AS BIGINT))"


@register(
    "q_jl_projection",
    f"""
    WITH proj AS (
      SELECT vec_id,
             list_transform(range(1, {_JL_OUT} + 1), j ->
               list_sum(list_transform(range(1, {_JL_IN} + 1), i ->
                 {_sql_jl_sign('i', 'j')} * CAST(embedding[i] AS DOUBLE)))
               / sqrt({_JL_OUT})) AS y,
             list_sum(list_transform(embedding,
                                     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
               AS n2_orig
      FROM embeddings
    )
    SELECT vec_id,
           round(sqrt(n2_orig), 6) AS norm_orig,
           round(sqrt(list_sum(list_transform(y, v -> v * v))), 6)
             AS norm_proj,
           round(sqrt(list_sum(list_transform(y, v -> v * v)))
                   / sqrt(n2_orig), 6) AS norm_ratio
    FROM proj
    ORDER BY vec_id
    """,
)
def q_jl_projection(spark, sf_dir):
    """R333 — JL ±1 projection {din}→{dout}: sign(i,j) from the portable
    affine hash (the projection matrix is an EXPRESSION — nothing
    broadcast, nothing random at runtime), y_j = Σ_i s_ij·v_i /√{dout}.
    Per-vector norm ratio ≈ 1 certifies the distance-preserving
    embedding (concentration asserted in tests/test_batch112.py). All
    folds are fixed-order JVM HOFs over one row's array — no cross-row
    float accumulation, so the values are engine- and
    partitioning-exact. The 100 TB use: shrink ANN/dedup embedding
    bytes 4× before the shuffle-heavy stages.""".format(
        din=_JL_IN, dout=_JL_OUT
    )
    sign = lambda i, j: 1 - 2 * (
        ((i * 100003 + j * 31 + 7) * 2654435761 % _P) % 2
    ).cast("long")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    y = F.transform(
        F.sequence(F.lit(1), F.lit(_JL_OUT)),
        lambda j: F.aggregate(
            F.zip_with(
                F.sequence(F.lit(1), F.lit(_JL_IN)),
                v,
                lambda i, x: sign(i, j) * x,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        / F.sqrt(F.lit(float(_JL_OUT))),
    )
    n2 = lambda arr: F.aggregate(
        F.transform(arr, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    proj = _emb(spark, sf_dir).select(
        "vec_id", y.alias("y"), n2(v).alias("n2_orig")
    )
    return proj.select(
        "vec_id",
        F.round(F.sqrt("n2_orig"), 6).alias("norm_orig"),
        F.round(F.sqrt(n2(F.col("y"))), 6).alias("norm_proj"),
        F.round(F.sqrt(n2(F.col("y"))) / F.sqrt("n2_orig"), 6).alias(
            "norm_ratio"
        ),
    ).orderBy("vec_id")


# ===========================================================================
# R334 — k-means|| (scalable k-means++) oversampling init
# ===========================================================================

_SQL_D2 = (
    "list_sum(list_transform(range(1, 65), i -> "
    "(CAST(x.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) "
    "* (CAST(x.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))))"
)
_SQL_KPP_HASH = f"((vec_id % {_P}) * 2654435761 + 977) % {_P}"


@register(
    "q_kmeanspp_init",
    f"""
    WITH c0 AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT 1
    ),
    d1 AS (
      SELECT x.vec_id,
             CAST(round({_SQL_D2} * 1e6) AS BIGINT) AS d2i
      FROM embeddings x CROSS JOIN c0 c
    ),
    pick1 AS (
      SELECT d1.vec_id FROM d1
      CROSS JOIN (SELECT SUM(d2i) AS tot FROM d1) t
      WHERE ({_SQL_KPP_HASH}) * 1.0 / {_P} < {_KPP_L} * d1.d2i / t.tot
    ),
    c1 AS (
      SELECT vec_id, embedding FROM c0
      UNION ALL
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN pick1 USING (vec_id)
    ),
    d2 AS (
      SELECT x.vec_id,
             MIN(CAST(round({_SQL_D2} * 1e6) AS BIGINT)) AS d2i
      FROM embeddings x CROSS JOIN c1 c
      GROUP BY x.vec_id
    ),
    pick2 AS (
      SELECT d2.vec_id FROM d2
      CROSS JOIN (SELECT SUM(d2i) AS tot FROM d2) t
      WHERE (({_SQL_KPP_HASH}) * 31 % {_P}) * 1.0 / {_P}
            < {_KPP_L} * d2.d2i / t.tot
    ),
    cand AS (
      SELECT vec_id FROM c1
      UNION
      SELECT vec_id FROM pick2
    ),
    pairs AS (
      SELECT x.vec_id, c.vec_id AS c_id,
             CAST(round({_SQL_D2} * 1e6) AS BIGINT) AS d2i
      FROM embeddings x
      CROSS JOIN (SELECT e.vec_id, e.embedding FROM embeddings e
                  JOIN cand USING (vec_id)) c
    ),
    mind AS (SELECT vec_id, MIN(d2i) AS md FROM pairs GROUP BY 1),
    nearest AS (
      SELECT pairs.vec_id, MIN(pairs.c_id) AS cand_id
      FROM pairs JOIN mind ON pairs.vec_id = mind.vec_id
                          AND pairs.d2i = mind.md
      GROUP BY pairs.vec_id
    )
    SELECT cand.vec_id AS cand_id,
           CAST(coalesce(n.w, 0) AS BIGINT) AS weight
    FROM cand
    LEFT JOIN (SELECT cand_id, COUNT(*) AS w FROM nearest GROUP BY 1) n
      ON cand.vec_id = n.cand_id
    ORDER BY cand_id
    """,
)
def q_kmeanspp_init(spark, sf_dir):
    """R334 — k-means|| oversampling init (Bahmani et al.): seed with
    the min-id vector, then {r} rounds of "keep x with prob
    min(1, L·d²(x,C)/Σd²)" using the portable hash as the coin — fully
    deterministic, partition-invariant, no RNG state. d² totals are
    integer-micro-scaled so Σd² is an exact BIGINT (no float sum-order
    hazard); per-pair d² is a fixed-order fold over one row's array.
    Output = the weighted coreset (candidate id, #points nearest to
    it) a local k-means consumes. At 100 TB each round is one
    broadcast-join + one agg — O(log k) passes instead of k-means++'s
    k sequential scans; |C| stays ~L·rounds, always broadcastable.
    arg_min ties cannot occur (d² to distinct centers differs in the
    integer micro grid or falls to the lower id via least-id
    tie-break).""".format(r=_KPP_ROUNDS)
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    d2 = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    d2i = lambda a, b: F.round(d2(a, b) * 1e6).cast("long")
    h1 = (F.pmod("vec_id", F.lit(_P)) * 2654435761 + 977) % _P
    c0 = emb.orderBy("vec_id").limit(1)
    centers = c0.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    for rnd in range(_KPP_ROUNDS):
        coin = h1 if rnd == 0 else (h1 * 31) % _P
        dist = (
            emb.crossJoin(F.broadcast(centers))
            .groupBy("vec_id")
            .agg(F.min(d2i(F.col("v"), F.col("cv"))).alias("d2i"))
        )
        tot = dist.agg(F.sum("d2i").alias("tot"))
        picked = (
            dist.crossJoin(F.broadcast(tot))
            .filter(
                coin * F.lit(1.0) / _P
                < F.lit(_KPP_L) * F.col("d2i") / F.col("tot")
            )
            .select("vec_id")
        )
        new_centers = emb.join(picked, "vec_id", "left_semi").select(
            F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
        )
        centers = centers.unionByName(new_centers).dropDuplicates(["c_id"])
    nearest = (
        emb.crossJoin(F.broadcast(centers))
        .groupBy("vec_id")
        .agg(
            F.min_by("c_id", F.struct(d2i(F.col("v"), F.col("cv")), "c_id"))
            .alias("cand_id")
        )
    )
    weights = nearest.groupBy("cand_id").agg(F.count(F.lit(1)).alias("w"))
    return (
        centers.select(F.col("c_id").alias("cand_id"))
        .join(weights, "cand_id", "left")
        .select(
            "cand_id", F.coalesce("w", F.lit(0)).cast("long").alias("weight")
        )
        .orderBy("cand_id")
    )


# ===========================================================================
# R335 — character-trigram profile language ID
# ===========================================================================

_SQL_TRIGRAMS = f"""
    list_transform(range(1, greatest(length({SQL_NORM}) - 2, 0) + 1),
                   i -> substr({SQL_NORM}, i, 3))
"""


@register(
    "q_charngram_langid",
    f"""
    WITH doc_grams AS (
      SELECT doc_id, lang, unnest({_SQL_TRIGRAMS}) AS g FROM documents
    ),
    doc_counts AS (
      SELECT doc_id, lang, g, COUNT(*) AS c
      FROM doc_grams GROUP BY 1, 2, 3
    ),
    lang_profile AS (
      SELECT lang AS plang, g, SUM(c) AS pc
      FROM doc_counts GROUP BY 1, 2
    ),
    lang_norm AS (
      SELECT plang, SUM(pc * pc) AS l2 FROM lang_profile GROUP BY 1
    ),
    doc_norm AS (
      SELECT doc_id, SUM(c * c) AS d2 FROM doc_counts GROUP BY 1
    ),
    scores AS (
      SELECT dc.doc_id, dc.lang, lp.plang,
             SUM(dc.c * lp.pc) AS num
      FROM doc_counts dc JOIN lang_profile lp ON dc.g = lp.g
      GROUP BY 1, 2, 3
    ),
    cosines AS (
      SELECT s.doc_id, s.lang, s.plang,
             s.num / (sqrt(dn.d2) * sqrt(ln.l2)) AS cos
      FROM scores s
      JOIN doc_norm dn USING (doc_id)
      JOIN lang_norm ln USING (plang)
    ),
    maxc AS (
      SELECT doc_id, lang, MAX(cos) AS mc FROM cosines GROUP BY 1, 2
    ),
    best AS (
      SELECT c.doc_id, c.lang, MIN(c.plang) AS predicted
      FROM cosines c JOIN maxc m
        ON c.doc_id = m.doc_id AND c.lang = m.lang AND c.cos = m.mc
      GROUP BY 1, 2
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM best
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
)
def q_charngram_langid(spark, sf_dir):
    """R335 — Cavnar-Trenkle-style character-trigram language ID: cosine
    between each doc's trigram COUNT vector and per-language corpus
    count profiles, argmax over languages (ties to the lexically
    smallest). Cosine is scale-invariant, so raw integer counts stand
    in for relative frequencies — numerator and both norms are exact
    BIGINT sums, immune to float accumulation order; only the final
    per-(doc, lang) division is floating point. The word-free sibling
    of q_naive_bayes_lang (robust to unseen words/tokenization).
    Confusion-matrix rollup out; shape: two keyed count aggs + one
    gram-keyed join + one |langs|-way argmax."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    # sequence() is end-INCLUSIVE (and would descend for len<3), unlike
    # the oracle's exclusive range(); cap at max(len-2, 1) and drop the
    # short tail grams so both engines emit exactly the len-2 trigrams.
    # r10: the normalized text is BOUND as a lambda variable (outer
    # transform over a 1-element array — the shingles() discipline,
    # operators/dedup.py) before the per-position substr uses it: the
    # old inline reference re-ran the regex normalization once per
    # CHARACTER POSITION (O(len²) regex work per doc).
    def tri(nt):
        idx = F.sequence(F.lit(1), F.greatest(F.length(nt) - 2, F.lit(1)))
        return F.filter(
            F.transform(idx, lambda i: F.substr(nt, i, F.lit(3))),
            lambda g: F.length(g) == 3,
        )

    grams = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.explode(
            F.element_at(F.transform(F.array(norm), tri), 1)
        ).alias("g"),
    )
    # r10: doc_counts feeds THREE consumers (the language profile, the
    # doc norm, and the score join) and lang_profile two — without
    # materialization each re-ran the trigram explode over the whole
    # corpus (26 s → ~6 s at sf0.1).
    doc_counts = truncate(
        grams.groupBy("doc_id", "lang", "g").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    lang_profile = truncate(
        doc_counts.groupBy(F.col("lang").alias("plang"), "g").agg(
            F.sum("c").alias("pc")
        )
    )
    lang_norm = lang_profile.groupBy("plang").agg(
        F.sum(F.col("pc") * F.col("pc")).alias("l2")
    )
    doc_norm = doc_counts.groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("d2")
    )
    scores = (
        doc_counts.join(lang_profile, "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.sum(F.col("c") * F.col("pc")).alias("num"))
    )
    best = (
        scores.join(doc_norm, "doc_id")
        .join(F.broadcast(lang_norm), "plang")
        .groupBy("doc_id", "lang")
        .agg(
            F.min_by(
                "plang",
                F.struct(
                    (
                        -(
                            F.col("num")
                            / (F.sqrt("d2") * F.sqrt("l2"))
                        )
                    ).alias("negcos"),
                    F.col("plang").alias("tie"),
                ),
            ).alias("predicted")
        )
    )
    return (
        best.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )
