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
partial-aggregated rollup.  The ring is a pure constant, compiled
into a sorted branch chain (no joins, no row amplification); HRW's
candidate explode is a bounded 9 rows/doc collapsing map-side; ties
resolve by (pos, shard) order so placement is deterministic
cross-engine even under hash collisions.
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


_SQL_DOC_POS = f"((doc_id * {_CH_DOC_MULT}) % {_CH_M})"


def _ring_nodes(n_shards: int) -> list[tuple[int, int]]:
    """The ring is a pure constant (no data dependency): (pos, shard)
    for every virtual node, sorted by (pos, shard) — the clockwise
    scan order.  Computed once at plan-build time and compiled into a
    branch chain, so assignment is a zero-join, zero-amplification
    per-row expression in BOTH engines."""
    return sorted(
        (((s * 131 + r) * _CH_NODE_MULT + 7) % _CH_M, s)
        for s in range(n_shards)
        for r in range(_CH_REPLICAS)
    )


def _sql_assign_case(n_shards: int) -> str:
    nodes = _ring_nodes(n_shards)
    branches = " ".join(
        f"WHEN pos <= {p} THEN {sh}" for p, sh in nodes
    )
    return f"CASE {branches} ELSE {nodes[0][1]} END"


@register(
    "q_consistent_hash",
    f"""
    WITH assigned AS (
      SELECT {_sql_assign_case(_CH_SHARDS)} AS s8,
             {_sql_assign_case(_CH_SHARDS + 1)} AS s9
      FROM (SELECT {_SQL_DOC_POS} AS pos FROM documents)
    )
    SELECT CAST(s8 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs_8,
           CAST(SUM(CASE WHEN s9 <> s8 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_on_expand,
           round(SUM(CASE WHEN s9 <> s8 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS moved_frac
    FROM assigned GROUP BY 1 ORDER BY 1
    """,
)
def q_consistent_hash(spark, sf_dir):
    """R544 — consistent-hash ring placement (8 shards × 16 vnodes)
    with the expand-to-9 churn accounting: per 8-shard shard, how many
    of its docs move when shard 8 joins (≈1/9 overall, and ONLY to
    the new shard's arcs — tested).  The ring is a pure constant, so
    assignment compiles to a sorted 128-branch CASE chain evaluated
    per row inside whole-stage codegen: NO joins, NO candidate
    explode, one narrow projection + one partial-aggregated rollup —
    the plan is a single scan at any corpus size."""

    def case_col(n_shards):
        nodes = _ring_nodes(n_shards)
        c = F.when(F.col("pos") <= nodes[0][0], F.lit(nodes[0][1]))
        for p, sh in nodes[1:]:
            c = c.when(F.col("pos") <= p, F.lit(sh))
        return c.otherwise(F.lit(nodes[0][1]))

    docs = _docs(spark, sf_dir).select(
        ((F.col("doc_id") * _CH_DOC_MULT) % _CH_M).alias("pos")
    )
    assigned = docs.select(
        case_col(_CH_SHARDS).alias("s8"),
        case_col(_CH_SHARDS + 1).alias("s9"),
    )
    moved = F.sum(F.when(F.col("s9") != F.col("s8"), 1).otherwise(0))
    return (
        assigned.groupBy(F.col("s8").cast("long").alias("shard"))
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
