"""Round-7 registry additions, batch 182 — data-placement operators
(the sharding family a 100 TB store lives or dies by):

- q_consistent_hash: ring placement of documents onto 8 shards × 16
  virtual nodes — doc hashes to a ring position, lands on the first
  node clockwise (min node ≥ pos, wrapping to the global min).  The
  row ALSO carries the 9-shard assignment and per-shard moved-away
  counts: the bounded-churn property (≈1/9 of keys move when a shard
  joins) is the whole reason consistent hashing exists, shipped as
  checked output.
- q_rendezvous_hash: highest-random-weight placement — shard =
  argmax_s h(doc, s).  Adding a 9th shard moves EXACTLY the docs
  whose h(doc, 8) beats their previous max (no other key moves —
  tested), the strictly-minimal-churn alternative to the ring.
- q_range_vs_hash_shard: range sharding on the skewed n_chars key
  (exact octile boundaries via percentile ≡ quantile_cont) next to
  hash sharding on the same key — per-shard loads for both
  strategies side by side, the imbalance comparison every
  partitioning decision starts from.

At 100 TB: all three are narrow per-row hash expressions + one
partial-aggregated rollup; the ring/candidate frames are bounded
literals (128/144 ring nodes, 8/9 shard ids) that broadcast, and ties
on ring positions resolve by (pos, shard) struct-min so placement is
deterministic cross-engine even under hash collisions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs

_CH_SHARDS = 8
_CH_REPLICAS = 16
_CH_M = 2147483647
_CH_NODE_MULT = 2654435761
_CH_DOC_MULT = 48271


def _sql_node_pos(s: str, r: str) -> str:
    return f"((({s} * 131 + {r}) * {_CH_NODE_MULT} + 7) % {_CH_M})"


_SQL_DOC_POS = f"((doc_id * {_CH_DOC_MULT}) % {_CH_M})"


def _sql_ring(n_shards: int) -> str:
    return f"""
      SELECT s.s AS shard, {_sql_node_pos('s.s', 'r.r')} AS pos
      FROM (SELECT unnest(generate_series(0, {n_shards - 1})) AS s) s
      CROSS JOIN (SELECT unnest(generate_series(0, {_CH_REPLICAS - 1}))
                  AS r) r
"""


def _sql_assign(ring: str, alias: str) -> str:
    """First node clockwise with (pos, shard) tie-break; wrap to the
    global (pos, shard) min."""
    return f"""
      SELECT d.doc_id,
             COALESCE(
               (SELECT MIN({{'p': n.pos, 's': n.shard}})
                FROM {ring} n WHERE n.pos >= d.pos).s,
               (SELECT MIN({{'p': n.pos, 's': n.shard}})
                FROM {ring} n).s) AS {alias}
      FROM docs_pos d
"""


@register(
    "q_consistent_hash",
    f"""
    WITH ring8 AS MATERIALIZED ({_sql_ring(_CH_SHARDS)}),
    ring9 AS MATERIALIZED ({_sql_ring(_CH_SHARDS + 1)}),
    docs_pos AS (
      SELECT doc_id, {_SQL_DOC_POS} AS pos FROM documents
    ),
    a8 AS ({_sql_assign('ring8', 's8')}),
    a9 AS ({_sql_assign('ring9', 's9')})
    SELECT a8.s8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs_8,
           CAST(SUM(CASE WHEN a9.s9 <> a8.s8 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_on_expand,
           round(SUM(CASE WHEN a9.s9 <> a8.s8 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS moved_frac
    FROM a8 JOIN a9 ON a9.doc_id = a8.doc_id
    GROUP BY 1 ORDER BY 1
    """,
)
def q_consistent_hash(spark, sf_dir):
    """R544 — consistent-hash ring placement (8 shards × 16 vnodes)
    with the expand-to-9 churn accounting: per 8-shard shard, how many
    of its docs move when shard 8 joins (ring theory says ≈1/9
    overall, and ONLY to the new shard's arcs).  The ring is a
    bounded literal frame (broadcast); assignment is min-(pos, shard)
    over nodes clockwise with deterministic tie-break; the corpus
    does one narrow hash projection + one rollup."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        ((F.col("doc_id") * _CH_DOC_MULT) % _CH_M).alias("pos"),
    )

    def ring(n_shards):
        s = spark.range(n_shards).select(F.col("id").alias("s"))
        r = spark.range(_CH_REPLICAS).select(F.col("id").alias("r"))
        return s.crossJoin(r).select(
            F.col("s").alias("shard"),
            (
                ((F.col("s") * 131 + F.col("r")) * _CH_NODE_MULT + 7)
                % _CH_M
            ).alias("pos"),
        )

    def assign(ring_df, alias):
        rp = ring_df.select(
            F.col("shard").alias("n_shard"), F.col("pos").alias("n_pos")
        )
        cand = docs.crossJoin(F.broadcast(rp))
        ge = (
            cand.filter(F.col("n_pos") >= F.col("pos"))
            .groupBy("doc_id")
            .agg(F.min(F.struct("n_pos", "n_shard")).alias("w"))
            .select("doc_id", F.col("w.n_shard").alias("ge_shard"))
        )
        wrap = (
            ring_df.agg(F.min(F.struct("pos", "shard")).alias("w"))
            .select(F.col("w.shard").alias("wrap_shard"))
        )
        return (
            docs.join(ge, "doc_id", "left")
            .crossJoin(F.broadcast(wrap))
            .select(
                "doc_id",
                F.coalesce(F.col("ge_shard"), F.col("wrap_shard")).alias(
                    alias
                ),
            )
        )

    a8 = assign(ring(_CH_SHARDS), "s8")
    a9 = assign(ring(_CH_SHARDS + 1), "s9")
    j = a8.join(a9, "doc_id")
    moved = F.sum(
        F.when(F.col("s9") != F.col("s8"), 1).otherwise(0)
    )
    return (
        j.groupBy(F.col("s8").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs_8"),
            moved.alias("n_moved_on_expand"),
            F.round(moved * 1.0 / F.count(F.lit(1)), 6).alias(
                "moved_frac"
            ),
        )
        .orderBy("shard")
    )


# ===========================================================================
# R545 — rendezvous (highest-random-weight) hashing
# ===========================================================================

def _sql_hrw(doc: str, s: str) -> str:
    return f"((({doc} * 31 + {s}) * {_CH_NODE_MULT}) % {_CH_M})"


@register(
    "q_rendezvous_hash",
    f"""
    WITH weights AS (
      SELECT d.doc_id, s.s,
             {_sql_hrw('d.doc_id', 's.s')} AS w
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_CH_SHARDS})) AS s) s
    ),
    best AS (
      SELECT doc_id,
             (MAX(CASE WHEN s < {_CH_SHARDS}
                       THEN {{'w': w, 'ns': -s}} END)).ns * -1 AS s8,
             (MAX({{'w': w, 'ns': -s}})).ns * -1 AS s9
      FROM weights GROUP BY doc_id
    )
    SELECT CAST(s8 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs_8,
           CAST(SUM(CASE WHEN s9 <> s8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved_on_expand,
           BOOL_AND(s9 = s8 OR s9 = {_CH_SHARDS}) AS moves_only_to_new
    FROM best GROUP BY 1 ORDER BY 1
    """,
)
def q_rendezvous_hash(spark, sf_dir):
    """R545 — HRW placement: shard = argmax_s h(doc, s) over 8 shards
    (tie-break to the LOWEST shard via max-(w, −s)); adding shard 8
    moves exactly the docs whose new weight beats their old max —
    `moves_only_to_new` ships as a checked boolean.  One bounded
    candidate explode (9 rows/doc) + one partial-aggregated argmax."""
    docs = _docs(spark, sf_dir).select("doc_id")
    s = spark.range(_CH_SHARDS + 1).select(F.col("id").alias("s"))
    weights = docs.crossJoin(F.broadcast(s)).select(
        "doc_id", "s",
        (((F.col("doc_id") * 31 + F.col("s")) * _CH_NODE_MULT) % _CH_M)
        .alias("w"),
    )
    best = weights.groupBy("doc_id").agg(
        (
            -F.max(
                F.when(
                    F.col("s") < _CH_SHARDS,
                    F.struct(F.col("w"), (-F.col("s")).alias("ns")),
                )
            )["ns"]
        ).alias("s8"),
        (-F.max(F.struct(F.col("w"), (-F.col("s")).alias("ns")))["ns"])
        .alias("s9"),
    )
    return (
        best.groupBy(F.col("s8").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs_8"),
            F.sum(
                F.when(F.col("s9") != F.col("s8"), 1).otherwise(0)
            ).alias("n_moved_on_expand"),
            F.bool_and(
                (F.col("s9") == F.col("s8"))
                | (F.col("s9") == _CH_SHARDS)
            ).alias("moves_only_to_new"),
        )
        .orderBy("shard")
    )


# ===========================================================================
# R546 — range sharding vs hash sharding on a skewed key
# ===========================================================================

@register(
    "q_range_vs_hash_shard",
    f"""
    WITH cuts AS (
      SELECT [{', '.join(f'quantile_cont(n_chars, {i / _CH_SHARDS})'
                         for i in range(1, _CH_SHARDS))}] AS b
      FROM documents
    ),
    assigned AS (
      SELECT d.doc_id, d.n_chars,
             len(list_filter(cuts.b, x -> x < d.n_chars)) AS range_shard,
             (d.n_chars * {_CH_NODE_MULT}) % {_CH_SHARDS} AS hash_shard
      FROM documents d CROSS JOIN cuts
    )
    SELECT 'range' AS strategy, CAST(range_shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS key_lo,
           CAST(MAX(n_chars) AS BIGINT) AS key_hi
    FROM assigned GROUP BY 2
    UNION ALL
    SELECT 'hash', CAST(hash_shard AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(MIN(n_chars) AS BIGINT), CAST(MAX(n_chars) AS BIGINT)
    FROM assigned GROUP BY 2
    ORDER BY strategy, shard
    """,
)
def q_range_vs_hash_shard(spark, sf_dir):
    """R546 — the partitioning-decision table: range shards on the
    skewed n_chars key (exact octile boundaries, `percentile` ≡
    `quantile_cont`; shard = count of boundaries strictly below the
    key) next to hash shards on the same key — per-shard loads and
    key ranges for both.  Range keeps keys contiguous (scannable)
    but inherits the key's tie mass; hash flattens load but scatters
    ranges.  One percentile pass + one narrow projection + rollup."""
    docs = _docs(spark, sf_dir)
    cuts = docs.agg(
        F.array(
            *[
                F.expr(f"percentile(n_chars, {i / _CH_SHARDS})")
                for i in range(1, _CH_SHARDS)
            ]
        ).alias("b")
    )
    assigned = docs.crossJoin(F.broadcast(cuts)).select(
        "n_chars",
        F.size(
            F.filter(F.col("b"), lambda x: x < F.col("n_chars"))
        ).cast("long").alias("range_shard"),
        ((F.col("n_chars") * _CH_NODE_MULT) % _CH_SHARDS).alias(
            "hash_shard"
        ),
    )
    r = assigned.groupBy("range_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("key_lo"),
        F.max("n_chars").alias("key_hi"),
    ).select(
        F.lit("range").alias("strategy"),
        F.col("range_shard").alias("shard"),
        "n_docs", "key_lo", "key_hi",
    )
    h = assigned.groupBy("hash_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("key_lo"),
        F.max("n_chars").alias("key_hi"),
    ).select(
        F.lit("hash").alias("strategy"),
        F.col("hash_shard").alias("shard"),
        "n_docs", "key_lo", "key_hi",
    )
    return r.unionByName(h).orderBy("strategy", "shard")
