"""Round-5 registry additions, batch 121 — matryoshka embedding
truncation, graph robustness, and the deterministic heavy-hitter
sketch:

- q_matryoshka_eval: retrieval quality of TRUNCATED embedding prefixes
  (8/16/32 of 64 dims) vs the full vector — recall@10 of the prefix
  ranking against the full ranking, per prefix width. The evaluation
  behind Matryoshka-style representations and every "can we ship the
  cheap first half of the vector" decision; 4× fewer bytes through
  the ANN shuffle if recall holds.
- q_percolation_curve: targeted-attack robustness of the mutual 5-NN
  graph — remove the top-k highest-degree nodes (k = 0/5/10/20) and
  re-measure the largest connected component. The
  hub-dependence diagnostic: a steep curve means retrieval routes
  through a few hub vectors. Rows-only (iterative cc per k).
- q_misra_gries: Misra-Gries heavy hitters as a MERGEABLE sketch —
  per-partition k-counter summaries (Arrow-batched), merged by the
  standard counter-sum-then-decrement rule, with the deterministic
  guarantee |est − true| ≤ n/k VERIFIED against exact counts in the
  output. Completes the sketch family (MinHash/SimHash/HLL/KMV/CMS)
  with the one that gives deterministic error bounds. Rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs, _emb

_MAT_WIDTHS = (8, 16, 32)
_MAT_FULL = 64
_MAT_QUERIES = 10  # vec_id < 10
_MAT_K = 10
_MG_K = 16


# ===========================================================================
# R357 — matryoshka truncation retrieval eval
# ===========================================================================

def _sql_cos(width: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {width} + 1), i -> "
        f"CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform(range(1, {width} + 1), i -> "
        f"CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform(range(1, {width} + 1), i -> "
        f"CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))"
    )


def _sql_topk(width: int, name: str) -> str:
    return f"""
    {name} AS (
      SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY CAST(round(({_sql_cos(width)}) * 1e9) AS BIGINT)
                          DESC, c.vec_id
               ) AS rk
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_MAT_QUERIES}
      ) WHERE rk <= {_MAT_K}
    )"""


@register(
    "q_matryoshka_eval",
    f"""
    WITH {_sql_topk(_MAT_FULL, "full_rank")},
    {','.join(_sql_topk(w, f"trunc_{w}") for w in _MAT_WIDTHS)}
    SELECT width, round(SUM(hits) * 1.0 / ({_MAT_QUERIES} * {_MAT_K}), 4)
             AS mean_recall,
           CAST(SUM(hits) AS BIGINT) AS total_hits
    FROM (
      {' UNION ALL '.join(
        f'''SELECT {w} AS width, f.qid,
                   SUM(CASE WHEN t.cid IS NOT NULL THEN 1 ELSE 0 END) AS hits
            FROM full_rank f LEFT JOIN trunc_{w} t
              ON f.qid = t.qid AND f.cid = t.cid
            GROUP BY f.qid'''
        for w in _MAT_WIDTHS)}
    ) u
    GROUP BY width
    ORDER BY width
    """,
)
def q_matryoshka_eval(spark, sf_dir):
    """R357 — matryoshka truncation eval: for each query vector
    (vec_id < {q}), rank the corpus by cosine on the FULL {d} dims and
    on the first 8/16/32 dims; recall@{k} = |top-{k} overlap| / {k},
    averaged over queries per width. Scores are integer-scaled
    (×1e9) before ranking so the top-{k} cut is engine-stable; all
    folds are fixed-order per-row HOFs. Monotone-in-width recall is
    asserted in tests. The decision query for prefix-truncatable
    embeddings: if recall@10 at width 16 is ~1, the ANN shuffle moves
    4× fewer bytes.""".format(
        q=_MAT_QUERIES, d=_MAT_FULL, k=_MAT_K
    )
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    queries = emb.filter(F.col("vec_id") < _MAT_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = queries.join(
        emb.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")),
        F.col("qid") != F.col("cid"),
    )

    def dot(a, b, width):
        return F.aggregate(
            F.zip_with(
                F.slice(a, 1, width), F.slice(b, 1, width),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    def topk(width, name):
        score = F.round(
            dot(F.col("qv"), F.col("cv"), width)
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv"), width))
                * F.sqrt(dot(F.col("cv"), F.col("cv"), width))
            )
            * 1e9
        ).cast("long")
        w = Window.partitionBy("qid").orderBy(
            F.col("_s").desc(), "cid"
        )
        return (
            pairs.withColumn("_s", score)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _MAT_K)
            .select("qid", F.col("cid").alias(name))
        )

    full = topk(_MAT_FULL, "f_cid")
    out = None
    for wdt in _MAT_WIDTHS:
        t = topk(wdt, "t_cid")
        hits = (
            full.join(
                t,
                (full["qid"] == t["qid"]) & (full["f_cid"] == t["t_cid"]),
                "left",
            )
            .groupBy(full["qid"])
            .agg(
                F.sum(
                    F.when(t["t_cid"].isNotNull(), 1).otherwise(0)
                ).alias("hits")
            )
        )
        row = hits.agg(
            F.lit(wdt).alias("width"),
            F.round(
                F.sum("hits") * 1.0 / (_MAT_QUERIES * _MAT_K), 4
            ).alias("mean_recall"),
            F.sum("hits").cast("long").alias("total_hits"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("width")


# ===========================================================================
# R358 — percolation (targeted-attack robustness) curve
# ===========================================================================

@register("q_percolation_curve", None)
def q_percolation_curve(spark, sf_dir):
    """R358 — targeted-attack percolation over the mutual 5-NN
    embedding graph: for k ∈ {{0, 5, 10, 20}}, delete the k
    highest-degree nodes (ties to lowest id) and recompute the largest
    connected component via min-label contraction. Output per k:
    nodes/edges surviving, largest-component size and fraction. A
    fast-collapsing curve = hub-routed connectivity (the ANN hubness
    pathology measured structurally). Rows-only (iterative cc); exact
    union-find python oracle in tests/test_batch121.py."""
    from arrow_supercluster_spark.operators.dedup import (
        connected_components_adaptive,
    )
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact

    ed = knn_edges_exact(_emb(spark, sf_dir), 5)
    rev = ed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    edges = (
        ed.join(rev, ["a", "b"])  # mutual: both directions present
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("a_id"), F.col("b").alias("b_id"))
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("a_id").alias("n"))
        .unionByName(edges.select(F.col("b_id").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    out = None
    for k in (0, 5, 10, 20):
        removed = (
            deg.orderBy(F.col("d").desc(), "n").limit(k).select("n")
            if k
            else None
        )
        surv = edges
        if removed is not None:
            surv = (
                edges.join(
                    removed, edges["a_id"] == removed["n"], "left_anti"
                ).join(removed, F.col("b_id") == removed["n"], "left_anti")
            )
        n_edges = surv.count()
        if n_edges == 0:
            row = spark.createDataFrame(
                [(k, 0, 0, 0)],
                "k_removed int, n_edges long, n_nodes long, largest_cc long",
            )
        else:
            # r11 (guide §5 driver / §2.6 latency): the mutual-5NN graph
            # at the eval grain is a few thousand edges — the adaptive
            # operator labels it driver-side (exact min-id union-find,
            # identical labels) instead of 4 × a multi-round distributed
            # fixpoint; > 200k edges still take the distributed path
            comps = connected_components_adaptive(surv, "a_id", "b_id")
            sizes = comps.groupBy("component_id").agg(
                F.count(F.lit(1)).alias("sz")
            )
            row = sizes.agg(
                F.lit(k).alias("k_removed"),
                F.lit(n_edges).cast("long").alias("n_edges"),
                F.sum("sz").cast("long").alias("n_nodes"),
                F.max("sz").cast("long").alias("largest_cc"),
            )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "k_removed",
        "n_edges",
        "n_nodes",
        "largest_cc",
        F.round(
            F.col("largest_cc") * 1.0 / F.greatest(F.col("n_nodes"), F.lit(1)),
            4,
        ).alias("largest_frac"),
    ).orderBy("k_removed")


# ===========================================================================
# R359 — Misra-Gries mergeable heavy-hitter sketch
# ===========================================================================

def misra_gries_partition(tokens, k):
    """Textbook MG over one partition's token stream: ≤ k−1 counters;
    decrement-all when full. Returns the counter dict."""
    counters = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k - 1:
            counters[t] = 1
        else:
            dead = [c for c in counters if counters[c] == 1]
            for c in counters:
                counters[c] -= 1
            for c in dead:
                del counters[c]
    return counters


def merge_mg(summaries, k):
    """MG merge (Agarwal et al.): sum counters, then subtract the k-th
    largest value and drop non-positives — the merged sketch keeps the
    n/k guarantee."""
    total = {}
    for s in summaries:
        for t, c in s.items():
            total[t] = total.get(t, 0) + c
    if len(total) >= k:
        kth = sorted(total.values(), reverse=True)[k - 1]
        total = {t: c - kth for t, c in total.items() if c - kth > 0}
    return total


@register("q_misra_gries", None)
def q_misra_gries(spark, sf_dir):
    """R359 — Misra-Gries heavy hitters (k={k}) over the token stream
    as a MERGEABLE sketch: each partition runs textbook MG in an
    Arrow-batched mapInPandas (≤ k−1 counters, decrement-all on
    overflow), the ≤ P·(k−1) summary rows collect (structurally
    bounded — the sketch IS the bound), and the driver merge
    (counter-sum, subtract the k-th largest, drop non-positives)
    preserves the deterministic guarantee true − n/k ≤ est ≤ true.
    The output joins exact token counts and VERIFIES the bound per
    row — the sketch certifies itself. The deterministic-bound member
    of the sketch family (vs CMS's probabilistic one); rows-only
    (stateful stream algorithm has no SQL form).""".format(k=_MG_K)
    import pandas as pd

    from arrow_supercluster_spark.operators.dedup import tokenize

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters = {}
        for pdf in batches:
            for t in pdf["tok"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < _MG_K - 1:
                    counters[t] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame(
            {
                "pid": [pid] * len(counters),
                "tok": list(counters),
                "est": list(counters.values()),
            }
        )

    summaries = toks.mapInPandas(
        run, schema="pid int, tok string, est long"
    ).collect()
    by_pid = {}
    for r in summaries:
        by_pid.setdefault(r.pid, {})[r.tok] = r.est
    merged = merge_mg(list(by_pid.values()), _MG_K)
    n_total = toks.count()
    # Exact verification counts only for the ≤ _MG_K merged sketch tokens
    # (VERDICT r5 "What's wrong #2"): semi-filter the token stream against
    # the bounded key list BEFORE aggregating, so the collect is capped at
    # _MG_K rows regardless of corpus vocabulary size.
    exact = {
        r.tok: r.c
        for r in toks.filter(F.col("tok").isin(list(merged)))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    rows = [
        (
            t,
            int(est),
            int(exact[t]),
            int(exact[t] - est),
            bool(exact[t] - n_total / _MG_K <= est <= exact[t]),
        )
        for t, est in sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "tok string, mg_estimate long, true_count long, "
        "underestimate long, bound_holds boolean",
    )
