"""Round-6 registry additions, batch 153 — graph centrality and
absorbing-chain analytics:

- q_katz_centrality: Katz centrality on the mutual embedding 5-NN
  graph (the q_kcore graph) — x ← αAx + 1 iterated to the fixed
  point's 12-step truncation (α=0.05 ≪ 1/λ_max, so the Neumann
  series converges fast and the truncation error is < 1e-9 of the
  score). The prestige measure that, unlike q_pagerank, counts ALL
  walks (damped by length) rather than distributing a unit budget.
  Rows-only: iterative matrix-vector products; python oracle replays
  the identical iteration.
- q_jaccard_link_pred: neighborhood-Jaccard link prediction over the
  user×item bipartite projection (the q_adamic_adar frame) —
  |N(i)∩N(j)| / |N(i)∪N(j)| for item pairs. The set-overlap baseline
  AA improves on; shipping both makes the ranking disagreement
  inspectable.
- q_absorbing_markov: the session journey as an absorbing chain —
  transition matrix over event types with CONV/NULL terminals (the
  q_markov_attribution estimates), fundamental-matrix solve
  t = (I−Q)⁻¹·1 for the EXPECTED NUMBER OF STEPS to absorption from
  each state, plus each state's conversion probability. Rows-only:
  the |states|² cell table collapses to the driver (bounded — event
  types are a fixed enum) and the ≤5×5 solve is numpy.

At 100 TB: Katz is k sparse matrix-vector joins (each a shuffle on
node id — the pagerank shape); Jaccard shares q_adamic_adar's single
user-key self-join; the absorbing chain is one cell aggregation.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.tables import read_events

_KATZ_ALPHA = 0.05
_KATZ_ITERS = 12
_KATZ_K = 5
_JL_ITEMS = 40


# ===========================================================================
# R452 — Katz centrality (mutual 5-NN graph)
# ===========================================================================

def mutual_knn_edges(emb, k):
    """Undirected mutual k-NN edges as BOTH directed rows (u,v) and
    (v,u) — the adjacency the matrix-vector product needs."""
    from arrow_supercluster_spark.operators.similarity import (
        knn_edges_exact,
    )

    ed = knn_edges_exact(emb, k)
    rev = ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return ed.intersect(rev)  # a->b kept iff b->a also present


@register("q_katz_centrality", None)
def q_katz_centrality(spark, sf_dir):
    """R452 — Katz on the mutual {k}-NN graph: x⁰ = 1, xᵗ⁺¹ = αAxᵗ + 1
    for {it} iterations at α = {a} (the Neumann truncation of
    (I−αA)⁻¹·1; with max degree ≤ {k}, αλ_max ≤ {k}·{a} = 0.25 and the
    tail is < 0.25¹² ≈ 6e-8). Each iteration is one edge-join +
    groupBy — the pagerank plan shape, k bounded joins total. Output:
    every node's truncated Katz score, 6dp.""".format(
        k=_KATZ_K, it=_KATZ_ITERS, a=_KATZ_ALPHA
    )
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    edges = mutual_knn_edges(emb, _KATZ_K).persist()
    nodes = emb.select(F.col("vec_id").alias("id"))
    x = nodes.select("id", F.lit(1.0).alias("x"))
    for _ in range(_KATZ_ITERS):
        msg = (
            edges.join(x, edges.dst == x.id)
            .groupBy("src")
            .agg(F.sum("x").alias("s"))
        )
        x = (
            nodes.join(msg, nodes.id == msg.src, "left")
            .select(
                "id",
                (
                    _KATZ_ALPHA * F.coalesce(F.col("s"), F.lit(0.0)) + 1.0
                ).alias("x"),
            )
        )
    out = x.select(
        F.col("id").alias("vec_id"), F.round("x", 6).alias("katz")
    ).orderBy("vec_id")
    out = out.localCheckpoint()  # cut the 12-join lineage before reuse
    edges.unpersist()
    return out


# ===========================================================================
# R453 — neighborhood-Jaccard link prediction
# ===========================================================================

@register(
    "q_jaccard_link_pred",
    f"""
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT)
               % {_JL_ITEMS} AS item
      FROM events
    ),
    deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS d FROM ui GROUP BY 1),
    common AS (
      SELECT a.item AS item_i, b.item AS item_j,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT common.item_i, common.item_j, common.c AS common_users,
           round(common.c * 1.0 / (da.d + db.d - common.c), 6)
             AS jaccard
    FROM common
    JOIN deg da ON da.item = common.item_i
    JOIN deg db ON db.item = common.item_j
    ORDER BY jaccard DESC, item_i, item_j
    LIMIT 25
    """,
)
def q_jaccard_link_pred(spark, sf_dir):
    """R453 — neighborhood Jaccard for item pairs on the user×item
    bipartite frame (item = props.k mod {m}, the q_adamic_adar graph):
    J(i,j) = |N(i)∩N(j)| / (|N(i)|+|N(j)|−|N(i)∩N(j)|). Same single
    user-key self-join as AA; degrees broadcast; TakeOrdered top-25.
    The unweighted set-overlap baseline to read against AA's
    rarity-weighted ranking.""".format(m=_JL_ITEMS)
    ev = read_events(spark, sf_dir)
    ui = ev.select(
        "user_id",
        F.pmod(
            F.get_json_object("props", "$.k").cast("bigint"),
            F.lit(_JL_ITEMS),
        ).alias("item"),
    ).distinct()
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("d"))
    a, b = ui.alias("a"), ui.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_i"),
            F.col("b.item").alias("item_j"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(F.col("item").alias("item_i"), F.col("d").alias("da"))
    db = deg.select(F.col("item").alias("item_j"), F.col("d").alias("db"))
    return (
        common.join(F.broadcast(da), "item_i")
        .join(F.broadcast(db), "item_j")
        .select(
            "item_i",
            "item_j",
            F.col("c").alias("common_users"),
            F.round(
                F.col("c") * 1.0 / (F.col("da") + F.col("db") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "item_i", "item_j")
        .limit(25)
    )


# ===========================================================================
# R454 — absorbing Markov chain (expected steps to absorption)
# ===========================================================================

@register("q_absorbing_markov", None)
def q_absorbing_markov(spark, sf_dir):
    """R454 — the session journey as an absorbing chain: per-user
    event sequences ordered by (ts, event_id), transitions between
    event types; the final event absorbs into CONV iff it is a
    purchase, else into NULL. Transition probabilities are the
    MLE cell ratios; Q = transient block, fundamental solve
    t = (I−Q)⁻¹·1 gives each state's expected steps to absorption and
    B = (I−Q)⁻¹R the absorption probabilities — conversion probability
    per starting state. The |states|² cell table is bounded by the
    event-type enum (collect-gate allowlisted); the solve is a ≤5×5
    numpy system. Rows-only; python oracle re-derives the chain from
    raw rows."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.select(
            F.col("cur").alias("a"),
            F.when(
                F.col("nxt").isNotNull(), F.col("nxt")
            ).otherwise(
                F.when(F.col("cur") == "purchase", "CONV").otherwise("NULL")
            ).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    states = sorted({r.a for r in trans})
    absorbing = ["CONV", "NULL"]
    n = len(states)
    counts = {(r.a, r.b): r.c for r in trans}
    row_tot = {
        s: sum(c for (a, _), c in counts.items() if a == s) for s in states
    }
    Q = np.zeros((n, n))
    R = np.zeros((n, 2))
    for i, s in enumerate(states):
        for j, t in enumerate(states):
            Q[i, j] = counts.get((s, t), 0) / row_tot[s]
        for j, t in enumerate(absorbing):
            R[i, j] = counts.get((s, t), 0) / row_tot[s]
    Ninv = np.linalg.inv(np.eye(n) - Q)
    steps = Ninv @ np.ones(n)
    absorb = Ninv @ R
    rows = [
        (
            s,
            int(row_tot[s]),
            round(float(steps[i]), 4),
            round(float(absorb[i, 0]), 6),
            round(float(absorb[i, 1]), 6),
        )
        for i, s in enumerate(states)
    ]
    return spark.createDataFrame(
        rows,
        "state string, n_transitions long, expected_steps double, "
        "p_conversion double, p_null double",
    )
