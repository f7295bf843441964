"""Round-7 registry additions, batch 176 — MT-eval completion, sketch-
family completion, and the data-mix allocation primitive:

- q_chrf: chrF2 per source — character n-gram (n=1..6) corpus-level
  precision/recall with per-doc clipping over the same deterministic
  drop-every-7th-token candidate as q_bleu_corpus, combined as the
  β=2 F-score of the n-averaged P and R (Popović 2015 definition).
  The character-level twin of BLEU: robust to tokenization, the
  default secondary metric of every MT/paraphrase eval suite.
- q_kmv_distinct: K-minimum-values distinct sketch per event type —
  keep the k=64 smallest portable-hash values of user_id; estimate
  distinct users as (k−1)/u_(k).  Completes the sketch family (HLL,
  CMS, theta, bloom, minhash already registered) with the one sketch
  whose estimator is EXACTLY reproducible cross-engine (order
  statistics of a deterministic hash — no register merge order, no
  float accumulation).  True distinct + relative error ship in the
  row (eval-style output; production would drop the truth column).
- q_waterfill_alloc: water-filling token-budget allocation — given a
  budget B = 50% of corpus tokens, find the level λ with
  Σ min(c_i, λ) = B over per-source token counts and allocate
  a_i = min(c_i, λ): the max-min-fair data-mix primitive (small
  sources keep everything, large sources are capped at a common
  level).  The unique saturation boundary k* is found CLOSED-FORM by
  rank/prefix self-joins over the ≤|sources| count frame — no
  iteration, no window, no collect.

At 100 TB: chrF shuffles (doc_id, char-gram) count frames (grams
hash-distribute; the 6 n-orders are independent joins feeding one
20-row rollup); KMV's per-type top-k runs as the WindowGroupLimit
partial top-k (O(partitions·k) rows shuffle, never the user set);
water-filling collapses the corpus once to per-source counts and does
O(S²) arithmetic on a 20-row frame.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# R528 — chrF2 per source
# ===========================================================================

_CHRF_MAX_N = 6
_CHRF_BETA2 = 4.0  # β = 2

# whitespace-free character streams (chrF ignores spaces)
_SQL_REF_S = f"replace({SQL_NORM}, ' ', '')"
_SQL_CAND_S = (
    f"array_to_string(list_filter({SQL_TOKS}, (x, i) -> i % 7 != 0), '')"
)


def _sql_chargram_counts(s_expr: str, n: int, alias: str) -> str:
    return f"""
      SELECT doc_id, source, g, CAST(COUNT(*) AS BIGINT) AS {alias}
      FROM (
        SELECT doc_id, source,
               unnest(list_transform(
                 generate_series(1, length(s) - {n} + 1),
                 i -> s[i:i+{n}-1])) AS g
        FROM (SELECT doc_id, source, {s_expr} AS s FROM documents) t
        WHERE length(s) >= {n}
      ) GROUP BY 1, 2, 3"""


def _sql_chrf_n(n: int) -> str:
    return f"""
    cc{n} AS ({_sql_chargram_counts(_SQL_CAND_S, n, 'cc')}),
    cr{n} AS ({_sql_chargram_counts(_SQL_REF_S, n, 'rc')}),
    cm{n} AS (
      SELECT COALESCE(c.source, r.source) AS source,
             SUM(LEAST(COALESCE(c.cc, 0), COALESCE(r.rc, 0))) AS match,
             SUM(COALESCE(c.cc, 0)) AS ctot,
             SUM(COALESCE(r.rc, 0)) AS rtot
      FROM cc{n} c FULL JOIN cr{n} r
        ON r.doc_id = c.doc_id AND r.g = c.g
      GROUP BY 1
    )"""


_CHRF_SQL = (
    "WITH "
    + ",".join(_sql_chrf_n(n) for n in range(1, _CHRF_MAX_N + 1))
    + f""",
    avgs AS (
      SELECT cm1.source,
             ({' + '.join(f'cm{n}.match * 1.0 / cm{n}.ctot'
                          for n in range(1, _CHRF_MAX_N + 1))})
               / {_CHRF_MAX_N} AS p,
             ({' + '.join(f'cm{n}.match * 1.0 / cm{n}.rtot'
                          for n in range(1, _CHRF_MAX_N + 1))})
               / {_CHRF_MAX_N} AS r
      FROM cm1
      {' '.join(f'JOIN cm{n} ON cm{n}.source = cm1.source'
                for n in range(2, _CHRF_MAX_N + 1))}
    )
    SELECT source, round(p, 6) AS chrf_precision,
           round(r, 6) AS chrf_recall,
           round(CASE WHEN {_CHRF_BETA2} * p + r = 0 THEN 0.0
                      ELSE (1 + {_CHRF_BETA2}) * p * r
                           / ({_CHRF_BETA2} * p + r) END, 6) AS chrf2
    FROM avgs ORDER BY source
    """
)


def _chargrams(col, n: int):
    return F.expr(
        f"CASE WHEN length({col}) >= {n} THEN "
        f"transform(sequence(1, length({col}) - {n} + 1), "
        f"i -> substring({col}, i, {n})) ELSE array() END"
    )


@register("q_chrf", _CHRF_SQL)
def q_chrf(spark, sf_dir):
    """R528 — chrF2 per source (Popović 2015): character 1..6-gram
    corpus precisions/recalls with per-doc clipping, averaged over n,
    combined as F_{β=2}.  Reference/candidate = the q_bleu_corpus
    pairs with whitespace removed.  P_n/R_n are ratios of identical
    BIGINT sums, so the only cross-engine surface is the final 20-row
    arithmetic — round-6 absorbs it."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    # r10: materialize the normalized reference/candidate strings once —
    # the 1..6-gram loop below explodes this frame 12 times (6 n-orders
    # × 2 sides), and unmaterialized each explode re-ran the regex
    # normalization + tokenize + concat over the whole corpus
    # (12.9 s → ~7 s at sf0.1).
    docs = truncate(
        _docs(spark, sf_dir).select(
            "doc_id", "source",
            F.regexp_replace(normalize_text(F.col("text")), " ", "").alias(
                "rs"
            ),
            F.concat_ws(
                "",
                F.filter(
                    tokenize(F.col("text")),
                    lambda x, i: (i + 1) % 7 != 0,
                ),
            ).alias("cs"),
        )
    )
    acc = None
    for n in range(1, _CHRF_MAX_N + 1):
        c = (
            docs.select(
                "doc_id", "source",
                F.explode(_chargrams("cs", n)).alias("g"),
            )
            .groupBy("doc_id", "source", "g")
            .agg(F.count(F.lit(1)).alias("cc"))
        )
        r = (
            docs.select(
                "doc_id", "source",
                F.explode(_chargrams("rs", n)).alias("g"),
            )
            .groupBy("doc_id", "source", "g")
            .agg(F.count(F.lit(1)).alias("rc"))
        )
        m = (
            c.withColumnRenamed("source", "csource")
            .join(
                r.select(
                    "doc_id", "g", "rc",
                    F.col("source").alias("rsource"),
                ),
                ["doc_id", "g"],
                "full",
            )
            .groupBy(
                F.coalesce(F.col("csource"), F.col("rsource")).alias(
                    "source"
                )
            )
            .agg(
                F.sum(
                    F.least(
                        F.coalesce(F.col("cc"), F.lit(0)),
                        F.coalesce(F.col("rc"), F.lit(0)),
                    )
                ).alias("match"),
                F.sum(F.coalesce(F.col("cc"), F.lit(0))).alias("ctot"),
                F.sum(F.coalesce(F.col("rc"), F.lit(0))).alias("rtot"),
            )
            .select(
                "source",
                (F.col("match") / F.col("ctot")).alias(f"p{n}"),
                (F.col("match") / F.col("rtot")).alias(f"r{n}"),
            )
        )
        acc = m if acc is None else acc.join(m, "source")
    p = sum(
        [F.col(f"p{n}") for n in range(2, _CHRF_MAX_N + 1)],
        F.col("p1"),
    ) / _CHRF_MAX_N
    r = sum(
        [F.col(f"r{n}") for n in range(2, _CHRF_MAX_N + 1)],
        F.col("r1"),
    ) / _CHRF_MAX_N
    return acc.select(
        "source",
        F.round(p, 6).alias("chrf_precision"),
        F.round(r, 6).alias("chrf_recall"),
        F.round(
            F.when(_CHRF_BETA2 * p + r == 0, F.lit(0.0)).otherwise(
                (1 + _CHRF_BETA2) * p * r / (_CHRF_BETA2 * p + r)
            ),
            6,
        ).alias("chrf2"),
    ).orderBy("source")


# ===========================================================================
# R529 — K-minimum-values distinct sketch
# ===========================================================================

_KMV_K = 64
_KMV_MULT, _KMV_MOD = 2654435761, 2147483647

_SQL_KMV_U = f"((user_id * {_KMV_MULT}) % {_KMV_MOD}) * 1.0 / {_KMV_MOD}"


@register(
    "q_kmv_distinct",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type, {_SQL_KMV_U} AS u FROM events
    ),
    ranked AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM hashed
    )
    SELECT event_type,
           CAST(MAX(cnt) AS BIGINT) AS n_distinct_true,
           CAST(LEAST({_KMV_K}, MAX(cnt)) AS BIGINT) AS k_used,
           round(MAX(CASE WHEN rk = LEAST({_KMV_K}, cnt) THEN u END), 9)
             AS kth_u,
           round(CASE WHEN MAX(cnt) < {_KMV_K} THEN MAX(cnt) * 1.0
                      ELSE ({_KMV_K} - 1)
                           / MAX(CASE WHEN rk = {_KMV_K} THEN u END)
                 END, 4) AS est_distinct,
           round(abs(CASE WHEN MAX(cnt) < {_KMV_K} THEN MAX(cnt) * 1.0
                          ELSE ({_KMV_K} - 1)
                               / MAX(CASE WHEN rk = {_KMV_K} THEN u END)
                     END - MAX(cnt)) / MAX(cnt), 6) AS rel_err
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def q_kmv_distinct(spark, sf_dir):
    """R529 — KMV distinct sketch per event type: k=64 smallest
    portable Knuth-hash values of user_id, estimator (k−1)/u_(k)
    (Bar-Yossef et al. 2002).  The per-type k-smallest runs as the
    WindowGroupLimit partial top-k (the _ranked_topk discipline:
    O(partitions·k) rows shuffle, never the distinct-user set into one
    reducer).  Order statistics of a deterministic hash — bit-exact
    cross-engine, unlike register-merge sketches (the q_hll family),
    which is why this one carries a strict twin.  Truth + rel_err ship
    in the row for eval; a production sketch would drop them."""
    ev = read_events(spark, sf_dir)
    u = ((F.col("user_id") * _KMV_MULT) % _KMV_MOD) * 1.0 / _KMV_MOD
    hashed = ev.select("event_type", u.alias("u")).distinct()
    w = Window.partitionBy("event_type").orderBy("u")
    cnt = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # rank <= k keeps the WindowGroupLimit partial below the exchange;
    # the k-th value and the (bounded) count attach afterwards
    topk = (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .join(F.broadcast(cnt), "event_type")
    )
    k_used = F.least(F.lit(_KMV_K), F.col("cnt"))
    return (
        topk.groupBy("event_type")
        .agg(
            F.max("cnt").alias("n_distinct_true"),
            F.max(k_used).alias("k_used"),
            F.round(
                F.max(
                    F.when(
                        F.col("rk")
                        == F.least(F.lit(_KMV_K), F.col("cnt")),
                        F.col("u"),
                    )
                ),
                9,
            ).alias("kth_u"),
            F.round(
                F.when(
                    F.max("cnt") < _KMV_K, F.max("cnt") * 1.0
                ).otherwise(
                    (_KMV_K - 1)
                    / F.max(
                        F.when(F.col("rk") == _KMV_K, F.col("u"))
                    )
                ),
                4,
            ).alias("est_distinct"),
            F.round(
                F.abs(
                    F.when(
                        F.max("cnt") < _KMV_K, F.max("cnt") * 1.0
                    ).otherwise(
                        (_KMV_K - 1)
                        / F.max(
                            F.when(F.col("rk") == _KMV_K, F.col("u"))
                        )
                    )
                    - F.max("cnt")
                )
                / F.max("cnt"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R530 — water-filling token-budget allocation
# ===========================================================================

_WF_BUDGET_FRAC = 0.5


@register(
    "q_waterfill_alloc",
    f"""
    WITH counts AS (
      SELECT source, CAST(SUM(len({SQL_TOKS})) AS BIGINT) AS c
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(c) AS BIGINT) AS total,
             floor(SUM(c) * {_WF_BUDGET_FRAC}) AS b
      FROM counts
    ),
    ranked AS (
      SELECT a.source, a.c,
             (SELECT COUNT(*) FROM counts x
              WHERE x.c < a.c OR (x.c = a.c AND x.source <= a.source))
               AS rk,
             (SELECT COALESCE(SUM(x.c), 0) FROM counts x
              WHERE x.c < a.c OR (x.c = a.c AND x.source <= a.source))
               AS pref
      FROM counts a
    ),
    levels AS (
      -- candidate boundary after the rk smallest sources: level
      -- lam_k = (B - prefix_k)/(S - k); valid iff the boundary source
      -- saturates (c_(k) <= lam_k) and the next one does not
      SELECT r.rk AS k, (tot.b - r.pref) * 1.0 / (tot.s - r.rk) AS lam,
             r.c AS ck
      FROM ranked r CROSS JOIN tot WHERE r.rk < tot.s
      UNION ALL
      SELECT 0 AS k, tot.b * 1.0 / tot.s AS lam, 0 AS ck FROM tot
    ),
    chosen AS (
      SELECT l.lam FROM levels l CROSS JOIN tot
      WHERE l.ck <= l.lam
        AND NOT EXISTS (
          SELECT 1 FROM ranked nx
          WHERE nx.rk = l.k + 1 AND nx.c <= l.lam
        )
      ORDER BY l.k DESC LIMIT 1
    )
    SELECT c.source, c.c AS tokens,
           round(LEAST(c.c * 1.0, ch.lam), 4) AS alloc,
           c.c <= ch.lam AS keeps_all,
           round(ch.lam, 4) AS level
    FROM counts c CROSS JOIN chosen ch
    ORDER BY c.source
    """,
)
def q_waterfill_alloc(spark, sf_dir):
    """R530 — water-filling data-mix allocation: level λ with
    Σ min(c_i, λ) = B over per-source token counts, B = 50% of the
    corpus.  The saturation boundary is found closed-form — every
    candidate boundary k gets λ_k = (B − prefix_k)/(S − k) and the
    unique k* with c_(k) ≤ λ_k < c_(k+1) wins — via rank/prefix
    self-joins on the ≤|sources| frame.  Distributed part = ONE corpus
    collapse to counts; everything after is 20-row arithmetic (no
    iteration, no window, no collect)."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).alias("c")
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("s"),
        F.sum("c").alias("total"),
        F.floor(F.sum("c") * _WF_BUDGET_FRAC).alias("b"),
    )
    x = counts.select(
        F.col("source").alias("xs"), F.col("c").alias("xc")
    )
    before = (F.col("xc") < F.col("c")) | (
        (F.col("xc") == F.col("c")) & (F.col("xs") <= F.col("source"))
    )
    ranked = (
        counts.join(x, before, "left")
        .groupBy("source", "c")
        .agg(
            F.count("xs").alias("rk"),
            F.coalesce(F.sum("xc"), F.lit(0)).alias("pref"),
        )
    )
    lv = ranked.crossJoin(F.broadcast(tot)).filter(
        F.col("rk") < F.col("s")
    ).select(
        F.col("rk").alias("k"),
        ((F.col("b") - F.col("pref")) * 1.0 / (F.col("s") - F.col("rk")))
        .alias("lam"),
        F.col("c").alias("ck"),
    ).unionByName(
        tot.select(
            F.lit(0).cast("long").alias("k"),
            (F.col("b") * 1.0 / F.col("s")).alias("lam"),
            F.lit(0).cast("long").alias("ck"),
        )
    )
    nxt = ranked.select(
        (F.col("rk")).alias("nk"), F.col("c").alias("nc")
    )
    chosen = (
        lv.join(
            nxt,
            (F.col("nk") == F.col("k") + 1) & (F.col("nc") <= F.col("lam")),
            "left_anti",
        )
        .filter(F.col("ck") <= F.col("lam"))
        .orderBy(F.col("k").desc())
        .limit(1)
        .select("lam")
    )
    return (
        counts.crossJoin(F.broadcast(chosen))
        .select(
            "source",
            F.col("c").alias("tokens"),
            F.round(F.least(F.col("c") * 1.0, F.col("lam")), 4).alias(
                "alloc"
            ),
            (F.col("c") <= F.col("lam")).alias("keeps_all"),
            F.round(F.col("lam"), 4).alias("level"),
        )
        .orderBy("source")
    )
