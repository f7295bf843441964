"""Round-4 registry additions, batch 97 — relational matrix factoring,
temporal data splits, and marginal raking:

- q_lsa_rank1: the leading singular pair of the doc×token TF-IDF matrix
  by ALTERNATING POWER ITERATION expressed relationally — u ∝ M v,
  v ∝ Mᵀ u are each one join + one keyed aggregate over the sparse
  (doc, token, weight) triplets; normalization is a 1-row broadcast.
  Rank-1 LSA = the simplest "train embeddings on the engine" kernel
  (power iteration on AᵀA without ever materializing it). SQL-backed
  since round 9 (unrolled MATERIALIZED-CTE twin); numpy SVD parity in
  tests.
- q_temporal_split: time-based train/test split with the LEAKAGE AUDIT
  a temporal split needs (the hash split R184 can't leak by
  construction; a time split can — the same user on both sides):
  per-split stats + cross-split user overlap.
- q_ipf_raking: iterative proportional fitting (= Sinkhorn matrix
  scaling) of the source×lang count table to uniform target marginals
  — the survey-weighting / OT-adjacent rebalancing primitive. The cell
  table is |sources|×|langs| (driver-scale); rows-only with python
  parity + marginal-convergence tests.

At 100 TB: LSA iterations touch only sparse triplets + two dense
vectors (docs- and vocab-sized frames); the split audit is two
aggregates + one semi-join; IPF's distributed part is the one corpus
collapse to cells.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_LSA_ITERS = 12




def _sql_lsa_rank1() -> str:
    """Unrolled alternating-power-iteration twin (round 9 — the
    q_power_iteration / eigenvector-centrality pattern): 12 iterations
    of v ∝ Mᵀu, u ∝ Mv as chained MATERIALIZED CTEs (each step
    references the previous frame twice — the DuckDB inlining-doubling
    rule), with the same uniform init and the same ln(n_docs/df)
    TF-IDF weights.  Power iteration is a contraction onto the leading
    singular pair, so per-step float-association differences DECAY
    instead of compounding; loadings compare at round(6), σ at
    round(4) — the same budget the eigencentrality twin certified."""
    head = f"""
    WITH tf AS MATERIALIZED (
      SELECT doc_id, g AS tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS g FROM documents)
      GROUP BY 1, 2
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    m AS MATERIALIZED (
      SELECT tf.doc_id, tf.tok,
             tf.c * ln(nd.n_docs * 1.0 / dfreq.df) AS w
      FROM tf JOIN dfreq ON dfreq.tok = tf.tok CROSS JOIN nd
    ),
    u0 AS MATERIALIZED (
      SELECT DISTINCT doc_id, 1.0 AS u FROM m
    )"""
    steps = []
    for t in range(1, _LSA_ITERS + 1):
        steps.append(f""",
    vr{t} AS MATERIALIZED (
      SELECT m.tok, SUM(m.w * u{t - 1}.u) AS v
      FROM m JOIN u{t - 1} ON u{t - 1}.doc_id = m.doc_id
      GROUP BY m.tok
    ),
    vn{t} AS MATERIALIZED (SELECT sqrt(SUM(v * v)) AS n FROM vr{t}),
    v{t} AS MATERIALIZED (
      SELECT tok, v / (SELECT n FROM vn{t}) AS v FROM vr{t}
    ),
    ur{t} AS MATERIALIZED (
      SELECT m.doc_id, SUM(m.w * v{t}.v) AS u
      FROM m JOIN v{t} ON v{t}.tok = m.tok
      GROUP BY m.doc_id
    ),
    un{t} AS MATERIALIZED (SELECT sqrt(SUM(u * u)) AS n FROM ur{t}),
    u{t} AS MATERIALIZED (
      SELECT doc_id, u / (SELECT n FROM un{t}) AS u FROM ur{t}
    )""")
    tail = f""",
    outv AS MATERIALIZED (
      SELECT m.tok, SUM(m.w * u{_LSA_ITERS}.u) AS v
      FROM m JOIN u{_LSA_ITERS} ON u{_LSA_ITERS}.doc_id = m.doc_id
      GROUP BY m.tok
    ),
    outn AS (SELECT sqrt(SUM(v * v)) AS n FROM outv)
    SELECT outv.tok,
           round(outv.v / outn.n, 6) AS loading,
           round((SELECT n FROM un{_LSA_ITERS}), 4) AS sigma
    FROM outv CROSS JOIN outn
    ORDER BY round(outv.v / outn.n, 6) DESC, outv.tok
    """
    return head + "".join(steps) + tail


@register("q_lsa_rank1", _sql_lsa_rank1())
def q_lsa_rank1(spark, sf_dir):
    """Leading singular triple (σ, u, v) of the TF-IDF matrix via
    alternating power iteration: v ← normalize(Mᵀu), u ← normalize(Mv),
    σ = |Mv|. Deterministic uniform init; 12 iterations (the spectral
    gap on this corpus converges it to float precision — numpy parity
    tested). Returns the token-side vector with loadings — the "topic"
    axis. Every step is a join + agg on the sparse triplets; the dense
    vectors live as DataFrames (vocab- and corpus-sized, never
    collected until the final vocab-sized output)."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    docs = _docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_docs = docs.count()
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    m = truncate(
        tf.join(dfreq, "tok").select(
            "doc_id", "tok",
            (F.col("c") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
                "w"
            ),
        )
    )
    u = truncate(
        m.select("doc_id").distinct().select(
            "doc_id", F.lit(1.0).alias("u")
        )
    )
    sigma = None
    for _ in range(_LSA_ITERS):
        # v ∝ Mᵀ u  (token-keyed agg)
        # (r10 note: truncating v_raw/u_raw per half-step was tried and
        # REVERTED — the two extra eager jobs per iteration cost more
        # than the duplicate m-join they saved; measured 9.4 → 16.6 s.)
        v_raw = (
            m.join(u, "doc_id")
            .groupBy("tok")
            .agg(F.sum(F.col("w") * F.col("u")).alias("v"))
        )
        vn = v_raw.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n"))
        v = truncate(
            v_raw.crossJoin(F.broadcast(vn)).select(
                "tok", (F.col("v") / F.col("n")).alias("v")
            )
        )
        # u ∝ M v  (doc-keyed agg); |Mv| is the current σ estimate
        u_raw = (
            m.join(v, "tok")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("v")).alias("u"))
        )
        un = u_raw.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("n"))
        sigma = un.first()[0]
        u = truncate(
            u_raw.crossJoin(F.broadcast(un)).select(
                "doc_id", (F.col("u") / F.col("n")).alias("u")
            )
        )
    out_v = (
        m.join(u, "doc_id")
        .groupBy("tok")
        .agg(F.sum(F.col("w") * F.col("u")).alias("v"))
    )
    vn = out_v.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n"))
    return (
        out_v.crossJoin(F.broadcast(vn))
        .select(
            "tok",
            F.round(F.col("v") / F.col("n"), 6).alias("loading"),
            F.round(F.lit(sigma), 4).alias("sigma"),
        )
        .orderBy(F.col("loading").desc(), "tok")
    )


@register(
    "q_temporal_split",
    """
    WITH bounds AS (
      SELECT epoch_us(MIN(ts))
             + CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 0.8 AS BIGINT)
               AS cut
      FROM events
    ),
    tagged AS (
      SELECT CASE WHEN epoch_us(ts) < (SELECT cut FROM bounds)
                  THEN 'train' ELSE 'test' END AS split,
             user_id, event_id
      FROM events
    ),
    stats AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM tagged GROUP BY split
    ),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_leaking_users FROM (
        SELECT user_id FROM tagged GROUP BY user_id
        HAVING COUNT(DISTINCT split) = 2
      )
    )
    SELECT s.split, s.n_events, s.n_users,
           (SELECT n_leaking_users FROM leak) AS n_leaking_users,
           ROUND((SELECT n_leaking_users FROM leak) * 1.0 / s.n_users, 4)
             AS leak_share
    FROM stats s
    """,
)
def q_temporal_split(spark, sf_dir):
    """Temporal 80/20 split with the leakage audit: events before the
    80%-time cut train, the rest test; leaking users = users appearing
    on BOTH sides (temporal splits leak entities by construction —
    unlike the hash split q_holdout_split — and a training pipeline
    must know how much). Two aggregates + one user-keyed collapse."""
    ev = read_events(spark, sf_dir)
    b = ev.agg(
        F.min("ts").cast("long").alias("lo"),
        F.max("ts").cast("long").alias("hi"),
    ).select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) * 0.8).cast("long")
        ).alias("cut")
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.col("ts").cast("long") < F.col("cut"), "train")
        .otherwise("test")
        .alias("split"),
        "user_id",
    )
    stats = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    leak = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") == 2)
        .agg(F.count(F.lit(1)).alias("n_leaking_users"))
    )
    return stats.crossJoin(F.broadcast(leak)).select(
        "split", "n_events", "n_users", "n_leaking_users",
        F.round(F.col("n_leaking_users") / F.col("n_users"), 4).alias(
            "leak_share"
        ),
    )


_IPF_ITERS = 10


def _ipf_step_sql(prev: str, cur: str, axis: str) -> str:
    """One IPF scaling pass as a CTE: divide each cell by its current
    {axis} marginal, multiply by the uniform target, round to 9 (the
    q_pagerank per-round drift discipline).  MATERIALIZED is load-
    bearing: each step references {prev} twice (cells + marginal
    subquery); DuckDB's default CTE inlining would make the 20-step
    chain 2^20 scans of documents.parquet (observed as a
    too-many-open-files abort at sf0.01)."""
    tgt = "tr" if axis == "source" else "tc"
    return f"""
    {cur} AS MATERIALIZED (
      SELECT c.source, c.lang, c.n,
             round(c.w * tgt.{tgt} / ms.s, 9) AS w
      FROM {prev} c
      JOIN (SELECT {axis}, SUM(w * n) AS s FROM {prev} GROUP BY {axis})
        ms ON ms.{axis} = c.{axis}
      CROSS JOIN tgt
    )"""


_IPF_STEPS = []
for _i in range(_IPF_ITERS):
    _prev = "w0" if _i == 0 else f"c{_i}"
    _IPF_STEPS.append(_ipf_step_sql(_prev, f"r{_i + 1}", "source"))
    _IPF_STEPS.append(_ipf_step_sql(f"r{_i + 1}", f"c{_i + 1}", "lang"))

_IPF_SQL = (
    """
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    tgt AS (
      SELECT SUM(n) * 1.0 / COUNT(DISTINCT source) AS tr,
             SUM(n) * 1.0 / COUNT(DISTINCT lang) AS tc
      FROM cells
    ),
    w0 AS (SELECT source, lang, n, 1.0 AS w FROM cells),"""
    + ",".join(_IPF_STEPS)
    + f"""
    SELECT source, lang, n AS n_docs, round(w, 6) AS weight
    FROM c{_IPF_ITERS} ORDER BY source, lang
    """
)


@register("q_ipf_raking", _IPF_SQL)
def q_ipf_raking(spark, sf_dir):
    """IPF / Sinkhorn raking: scale the (source, lang) count table so
    BOTH marginals become uniform — alternately divide rows then
    columns by their current marginal ratio, 10 rounds. The corpus
    collapses once to the cell table (|sources|×|langs| — driver
    scale, like the Markov/BPE loops); weights are the multiplier each
    cell's documents would carry in a rebalanced training mix.
    SQL twin since r7: the oracle unrolls the identical 10 row+column
    scaling passes as generated CTEs (the q_pagerank/q_katz pattern),
    each pass re-rounded to 9 so summation order cannot compound;
    the Spark side applies the same per-pass round."""
    docs = _docs(spark, sf_dir)
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    sources = sorted({r.source for r in cells})
    langs = sorted({r.lang for r in cells})
    n = {(r.source, r.lang): r.n for r in cells}
    total = sum(n.values())
    t_row = total / len(sources)   # uniform source marginal target
    t_col = total / len(langs)     # uniform lang marginal target
    w = {k: 1.0 for k in n}
    for _ in range(_IPF_ITERS):
        for s in sources:
            cur = sum(w[(s, l)] * n[(s, l)] for l in langs if (s, l) in n)
            if cur > 0:
                for l in langs:
                    if (s, l) in n:
                        # same association + per-pass round as the
                        # unrolled SQL twin: (w * target) / marginal
                        w[(s, l)] = round(w[(s, l)] * t_row / cur, 9)
        for l in langs:
            cur = sum(w[(s, l)] * n[(s, l)] for s in sources if (s, l) in n)
            if cur > 0:
                for s in sources:
                    if (s, l) in n:
                        w[(s, l)] = round(w[(s, l)] * t_col / cur, 9)
    rows = [
        (s, l, int(n[(s, l)]), round(w[(s, l)], 6))
        for (s, l) in sorted(n)
    ]
    return spark.createDataFrame(
        rows, "source string, lang string, n_docs long, weight double"
    )
