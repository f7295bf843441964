"""Round-7 registry additions, batch 183 — contrastive-training data
construction (what an embedding-training pipeline runs between corpus
curation and the trainer):

- q_negative_sampling: deterministic in-batch negatives — every
  anchor (doc_id ≡ 0 mod 17) draws 4 candidate negatives by portable
  hash over the dense id space, then CROSS-SOURCE filtering drops
  same-source draws (the standard "random negatives, exclude own
  group" rule).  Pure hash projections + one equi-join to attach the
  negative's source — at corpus scale the candidate fan-out is a
  bounded 4 rows/anchor.
- q_hard_negatives: hard-negative mining over the embeddings table —
  for each query vector (vec_id < 10) the top-5 most-cosine-similar
  corpus vectors OUTSIDE its own stated group (vec_id ≡ query mod
  10), i.e. the near-misses a contrastive loss learns the most from.
  Broadcast-queries exact cosine + group-exclusion filter + the
  WindowGroupLimit partial top-k (the E3 discipline).
- q_curriculum_order: curriculum ordering of token shards — shards
  (doc_id // 50) score by mean quality proxy (chars/token blend),
  order easiest-first, emit rank + cumulative token share: the
  schedule table a curriculum loader consumes.  One shard rollup +
  rank/prefix self-joins on the bounded shard frame.

At 100 TB: negatives are map-side hash arithmetic with one
broadcast-able dimension attach; hard negatives follow the certified
E3 plan (queries broadcast, corpus never shuffles, partial top-k);
curriculum collapses the corpus once to shard scalars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_NS_ANCHOR_MOD = 17
_NS_K = 4
_NS_MULT = 2654435761
_HN_K = 5
_CUR_SHARD = 50


# ===========================================================================
# R547 — deterministic negative sampling
# ===========================================================================

@register(
    "q_negative_sampling",
    f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    anchors AS (
      SELECT doc_id AS anchor_id, source AS anchor_source
      FROM documents WHERE doc_id % {_NS_ANCHOR_MOD} = 0
    ),
    draws AS (
      SELECT a.anchor_id, a.anchor_source, j.j,
             (a.anchor_id * {_NS_MULT} + j.j * 97) % n.n AS neg_id
      FROM anchors a
      CROSS JOIN (SELECT unnest(generate_series(1, {_NS_K})) AS j) j
      CROSS JOIN n
    )
    SELECT d.anchor_id, d.j AS draw, d.neg_id,
           docs.source AS neg_source
    FROM draws d
    JOIN documents docs ON docs.doc_id = d.neg_id
    WHERE docs.source <> d.anchor_source
      AND d.neg_id <> d.anchor_id
    ORDER BY anchor_id, draw
    """,
)
def q_negative_sampling(spark, sf_dir):
    """R547 — deterministic contrastive negatives: anchors (≡0 mod
    17) draw 4 hash-uniform candidates over the dense id space; draws
    landing in the anchor's own source (or on the anchor) are
    filtered — the cross-source exclusion rule, applied exactly the
    same in both engines.  Map-side hash arithmetic + one id-keyed
    attach join; the surviving-draw count is data-dependent by
    design (the replay test reproduces it)."""
    docs = _docs(spark, sf_dir)
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    anchors = docs.filter(
        F.col("doc_id") % _NS_ANCHOR_MOD == 0
    ).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("anchor_source"),
    )
    j = spark.range(1, _NS_K + 1).select(F.col("id").alias("draw"))
    draws = (
        anchors.crossJoin(F.broadcast(j))
        .crossJoin(F.broadcast(n))
        .select(
            "anchor_id", "anchor_source", "draw",
            ((F.col("anchor_id") * _NS_MULT + F.col("draw") * 97)
             % F.col("n")).alias("neg_id"),
        )
    )
    neg = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("neg_source"),
    )
    return (
        draws.join(neg, "neg_id")
        .filter(
            (F.col("neg_source") != F.col("anchor_source"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select("anchor_id", "draw", "neg_id", "neg_source")
        .orderBy("anchor_id", "draw")
    )


# ===========================================================================
# R548 — hard-negative mining
# ===========================================================================

@register(
    "q_hard_negatives",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT q.q_id, c.vec_id,
             round(list_inner_product(q.qv, c.cv)
                   / (sqrt(list_inner_product(q.qv, q.qv))
                      * sqrt(list_inner_product(c.cv, c.cv))), 6)
               AS cos
      FROM q, c
      WHERE c.vec_id % 10 <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rank
      FROM scored
    )
    SELECT q_id, vec_id AS hard_neg_id, cos, CAST(rank AS INTEGER)
             AS rank
    FROM ranked WHERE rank <= {_HN_K} ORDER BY q_id, rank
    """,
)
def q_hard_negatives(spark, sf_dir):
    """R548 — hard-negative mining: per query vector, the top-5 most
    cosine-similar corpus vectors OUTSIDE its stated group (vec_id ≡
    q_id mod 10) — the near-misses contrastive training weights
    hardest.  The certified E3 plan with a group-exclusion predicate:
    queries broadcast, corpus never shuffles, round-6 cosine with
    vec_id tiebreak, WindowGroupLimit partial top-k."""
    from pyspark.sql import Window

    from arrow_supercluster_spark.operators.similarity import as_double, cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", as_double(F.col("embedding")).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") % 10 != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("hard_neg_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("q_id", "rank")
    )


# ===========================================================================
# R549 — curriculum shard ordering
# ===========================================================================

@register(
    "q_curriculum_order",
    f"""
    WITH shards AS (
      SELECT doc_id // {_CUR_SHARD} AS shard_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({SQL_TOKS})) AS BIGINT) AS n_tokens,
             round(AVG(n_chars * 1.0 / len({SQL_TOKS})), 6)
               AS difficulty
      FROM documents GROUP BY 1
    ),
    ranked AS (
      SELECT a.*,
             (SELECT COUNT(*) FROM shards x
              WHERE x.difficulty < a.difficulty
                 OR (x.difficulty = a.difficulty
                     AND x.shard_id <= a.shard_id)) AS phase,
             (SELECT COALESCE(SUM(x.n_tokens), 0) FROM shards x
              WHERE x.difficulty < a.difficulty
                 OR (x.difficulty = a.difficulty
                     AND x.shard_id <= a.shard_id)) AS cum_tokens
      FROM shards a
    )
    SELECT shard_id, n_docs, n_tokens, difficulty,
           CAST(phase AS BIGINT) AS phase,
           round(cum_tokens * 1.0
                 / (SELECT SUM(n_tokens) FROM shards), 6)
             AS cum_token_share
    FROM ranked ORDER BY phase
    """,
)
def q_curriculum_order(spark, sf_dir):
    """R549 — curriculum schedule: shards (doc_id // 50) score by a
    mean chars-per-token difficulty proxy, order easiest-first, and
    ship phase rank + cumulative token share — the table a curriculum
    loader walks.  One corpus collapse to shard scalars; rank/prefix
    via self-joins on the bounded shard frame (no window, no
    collect)."""
    docs = _docs(spark, sf_dir)
    from arrow_supercluster_spark.operators.dedup import tokenize

    ntok = F.size(tokenize(F.col("text")))
    shards = docs.groupBy(
        (F.col("doc_id") / _CUR_SHARD).cast("long").alias("shard_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).alias("n_tokens"),
        F.round(F.avg(F.col("n_chars") * 1.0 / ntok), 6).alias(
            "difficulty"
        ),
    )
    x = shards.select(
        F.col("shard_id").alias("xs"),
        F.col("difficulty").alias("xd"),
        F.col("n_tokens").alias("xt"),
    )
    before = (F.col("xd") < F.col("difficulty")) | (
        (F.col("xd") == F.col("difficulty"))
        & (F.col("xs") <= F.col("shard_id"))
    )
    ranked = (
        shards.join(x, before, "left")
        .groupBy("shard_id", "n_docs", "n_tokens", "difficulty")
        .agg(
            F.count("xs").alias("phase"),
            F.coalesce(F.sum("xt"), F.lit(0)).alias("cum_tokens"),
        )
    )
    tot = shards.agg(F.sum("n_tokens").alias("tt"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "shard_id", "n_docs", "n_tokens", "difficulty",
            F.col("phase"),
            F.round(F.col("cum_tokens") * 1.0 / F.col("tt"), 6).alias(
                "cum_token_share"
            ),
        )
        .orderBy("phase")
    )
