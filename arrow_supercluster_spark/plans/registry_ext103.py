"""Round-4 registry additions, batch 98 — regime decoding, budgeted
selection, and sequence-entropy profiling:

- q_hmm_regimes: 2-state HMM Viterbi decode of the daily event-volume
  series into low/high regimes — emissions are Poisson with rates set
  deterministically from the series' terciles, sticky transitions
  (0.9/0.1). The |days|-length decode is driver-scale (the daily
  collapse is the distributed part); CUSUM (R129) finds ONE change
  point, the HMM labels every day's regime. Rows-only; independent
  Viterbi parity in tests.
- q_budget_knapsack: greedy ratio knapsack — select parts by
  value/cost ratio until a cost budget is hit. The running cost uses
  functions/distrank.zip_scan (the scale-safe global scan), while the
  oracle keeps the plain window cumsum — so the differential ALSO
  re-certifies distrank against a sequential scan on a fresh shape.
- q_entropy_rate: the Markov entropy rate of the event stream,
  Ĥ = −Σ_i f_i Σ_j p_ij ln p_ij with plug-in state frequencies — how
  predictable user behavior is per step (0 = deterministic chains).
  Complements the per-user sequence likelihood (R253) with the
  corpus-level rate.

At 100 TB: the HMM and entropy frames are |days| / |types|²; the
knapsack scan is the distrank two-pass with no single-reducer stage.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_STICKY = 0.9
_HMM_UNROLL = 62  # calendar frame is ≤31 days; 2× margin on the unroll


def _hmm_sql(unroll: int = _HMM_UNROLL) -> str:
    """Generate the bounded-unroll Viterbi twin (VERDICT r7 "Next
    round" #5 family): the 2-state decode as `unroll` generated step
    CTEs over the day-indexed series — each step one candidate
    cross-join (2×2 rows) + the tuple-max argmax (max value, then max
    prev state, matching python's max-on-tuple), then a recursive
    backpointer walk from the final argmax (ties → state 0, matching
    `score[0] >= score[1]`).  Every float expression mirrors the python
    association, including ln(1.0 - 0.9) evaluated as written (the
    IEEE value differs from ln(0.1)).  Steps past the last day add no
    rows, so the 62-step unroll is exact for any ≤62-day frame."""
    steps = []
    for t in range(2, unroll + 1):
        steps.append(f""",
    cand{t} AS MATERIALIZED (
      SELECT st.s, d.s AS p,
             d.score + (CASE WHEN d.s = st.s THEN ln({_STICKY})
                        ELSE ln(1.0 - {_STICKY}) END) AS v
      FROM dp{t - 1} d CROSS JOIN states st
      WHERE d.rn = {t - 1}
    ),
    bv{t} AS MATERIALIZED (
      SELECT s, MAX(v) AS bv FROM cand{t} GROUP BY s
    ),
    dp{t} AS MATERIALIZED (
      SELECT rn, s, score, bp FROM dp{t - 1}
      UNION ALL
      SELECT CAST({t} AS BIGINT) AS rn, c.s,
             b.bv + (i.n * ln(CASE WHEN c.s = 0 THEN r.lo ELSE r.hi END)
                     - (CASE WHEN c.s = 0 THEN r.lo ELSE r.hi END)
                     - lgamma(i.n + 1)) AS score,
             MAX(c.p) AS bp
      FROM cand{t} c
      JOIN bv{t} b ON b.s = c.s AND c.v = b.bv
      JOIN idx i ON i.rn = {t}
      CROSS JOIN rates r
      GROUP BY c.s, b.bv, i.n, r.lo, r.hi
    )""")
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
    ),
    byn AS MATERIALIZED (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS ra,
             ROW_NUMBER() OVER (ORDER BY n DESC) AS rd
      FROM idx
    ),
    kk AS MATERIALIZED (
      SELECT COUNT(*) AS k,
             GREATEST(1, COUNT(*) // 3) AS m
      FROM idx
    ),
    rates0 AS MATERIALIZED (
      SELECT (SELECT SUM(n) * 1.0 / kk.m FROM byn WHERE ra <= kk.m) AS lo,
             (SELECT SUM(n) * 1.0 / kk.m FROM byn WHERE rd <= kk.m) AS hi
      FROM kk
    ),
    rates AS MATERIALIZED (
      SELECT lo, CASE WHEN lo = hi THEN lo + 1.0 ELSE hi END AS hi
      FROM rates0
    ),
    states AS (SELECT 0 AS s UNION ALL SELECT 1),
    dp1 AS MATERIALIZED (
      SELECT CAST(1 AS BIGINT) AS rn, st.s,
             ln(0.5) + (i.n * ln(CASE WHEN st.s = 0 THEN r.lo ELSE r.hi END)
                        - (CASE WHEN st.s = 0 THEN r.lo ELSE r.hi END)
                        - lgamma(i.n + 1)) AS score,
             CAST(NULL AS INTEGER) AS bp
      FROM states st CROSS JOIN rates r JOIN idx i ON i.rn = 1
    ){"".join(steps)},
    fin AS MATERIALIZED (
      SELECT d.rn,
             CASE WHEN MAX(CASE WHEN s = 0 THEN score END)
                    >= MAX(CASE WHEN s = 1 THEN score END)
                  THEN 0 ELSE 1 END AS s
      FROM dp{unroll} d
      WHERE d.rn = (SELECT MAX(rn) FROM dp{unroll})
      GROUP BY d.rn
    ),
    path AS (
      SELECT rn, s FROM fin
      UNION ALL
      SELECT p.rn - 1, d.bp
      FROM path p JOIN dp{unroll} d ON d.rn = p.rn AND d.s = p.s
      WHERE p.rn > 1
    )
    SELECT strftime(i.day, '%Y-%m-%d') AS day,
           i.n AS n_events, CAST(p.s AS INTEGER) AS regime,
           round(CASE WHEN p.s = 0 THEN r.lo ELSE r.hi END, 4)
             AS regime_rate
    FROM path p JOIN idx i ON i.rn = p.rn CROSS JOIN rates r
    ORDER BY i.day
    """


@register("q_hmm_regimes", _hmm_sql())
def q_hmm_regimes(spark, sf_dir):
    """Viterbi regime labels for the daily total-volume series: Poisson
    emission rates = means of the bottom/top tercile days (deterministic
    plug-in), transition matrix [[.9,.1],[.1,.9]], uniform prior. The
    decode runs over the collected |days| series (calendar-bounded);
    output (day, n_events, regime). Independent DP parity in
    tests/test_batch98.py."""
    ev = read_events(spark, sf_dir)
    daily = sorted(
        (r.day, r.n)
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = sorted(n for _, n in daily)
    k = len(ns)
    lo_rate = sum(ns[: max(1, k // 3)]) / max(1, k // 3)
    hi_rate = sum(ns[-max(1, k // 3):]) / max(1, k // 3)
    if lo_rate == hi_rate:
        hi_rate = lo_rate + 1.0

    def logpois(n, lam):
        return n * math.log(lam) - lam - math.lgamma(n + 1)

    lt = {
        (0, 0): math.log(_STICKY), (0, 1): math.log(1 - _STICKY),
        (1, 0): math.log(1 - _STICKY), (1, 1): math.log(_STICKY),
    }
    rates = [lo_rate, hi_rate]
    score = [math.log(0.5) + logpois(daily[0][1], rates[s]) for s in (0, 1)]
    back = []
    for _, n in daily[1:]:
        nxt, bp = [], []
        for s in (0, 1):
            cands = [(score[p] + lt[(p, s)], p) for p in (0, 1)]
            best = max(cands)  # ties → higher prev state (max on tuple)
            nxt.append(best[0] + logpois(n, rates[s]))
            bp.append(best[1])
        score = nxt
        back.append(bp)
    state = 0 if score[0] >= score[1] else 1
    path = [state]
    for bp in reversed(back):
        state = bp[state]
        path.append(state)
    path.reverse()
    rows = [
        (str(day), int(n), int(s), round(rates[s], 4))
        for (day, n), s in zip(daily, path)
    ]
    # day as ISO string on BOTH sides (the q_rolling_mau convention):
    # Spark DateType and DuckDB DATE stringify differently through the
    # driver's pandas bridge (date vs datetime64), so date-valued oracle
    # outputs standardize on VARCHAR
    return spark.createDataFrame(
        rows, "day string, n_events long, regime int, regime_rate double"
    )


_BUDGET_CENTS = 3_000_000_000  # 30M currency units in cents (~18 parts)


@register(
    "q_budget_knapsack",
    f"""
    WITH parts AS (
      SELECT l_partkey AS part,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cost_cents,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS value_units
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT part, cost_cents, value_units,
             value_units * 1.0 / cost_cents AS ratio,
             CAST(SUM(cost_cents) OVER (
               ORDER BY value_units * 1.0 / cost_cents DESC, part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_cost
      FROM parts
    )
    SELECT part, cost_cents, value_units, ROUND(ratio, 8) AS ratio,
           cum_cost
    FROM ranked WHERE cum_cost <= {_BUDGET_CENTS}
    """,
)
def q_budget_knapsack(spark, sf_dir):
    """Greedy ratio knapsack: parts ordered by value/cost, taken while
    the running cost stays within budget. The Spark running sum is
    functions/distrank.zip_scan (range-partitioned two-pass — no
    single-reducer window), the oracle a sequential window cumsum: the
    match re-certifies the scan's exactness on integer costs. Ratio
    ties break on part id."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cost_cents"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias(
            "value_units"
        ),
    ).select(
        "part", "cost_cents", "value_units",
        (F.col("value_units") / F.col("cost_cents")).alias("ratio"),
        (-(F.col("value_units") / F.col("cost_cents"))).alias("neg_ratio"),
    )
    scanned, _, _ = zip_scan(
        parts,
        ["neg_ratio", "part"],
        out="idx",
        scan_col="cost_cents",
        scan_out="cum_cost",
    )
    return (
        scanned.filter(F.col("cum_cost") <= _BUDGET_CENTS)
        .select(
            "part", "cost_cents", "value_units",
            F.round("ratio", 8).alias("ratio"),
            F.col("cum_cost").cast("long").alias("cum_cost"),
        )
    )


@register(
    "q_entropy_rate",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    tr AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c
           FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur),
    tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS t FROM tr GROUP BY prev),
    all_t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tr),
    terms AS (
      SELECT tr.prev, tr.c, tot.t,
             (tot.t * 1.0 / (SELECT n FROM all_t))
               * (tr.c * 1.0 / tot.t)
               * ln(tr.c * 1.0 / tot.t) AS term
      FROM tr JOIN tot ON tot.prev = tr.prev
    )
    SELECT CAST((SELECT n FROM all_t) AS BIGINT) AS n_transitions,
           ROUND(-SUM(term), 6) AS entropy_rate_nats,
           ROUND(-SUM(term) / ln(2.0), 6) AS entropy_rate_bits
    FROM terms
    """,
)
def q_entropy_rate(spark, sf_dir):
    """Markov entropy rate with plug-in state frequencies: Ĥ =
    −Σ_i f̂_i Σ_j p̂_ij ln p̂_ij over the |types|² transition table —
    the per-step unpredictability of the event stream (upper-bounded by
    ln|types|). One user-keyed window + two tiny aggregates."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    tr = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    tot = tr.groupBy("prev").agg(F.sum("c").alias("t"))
    alln = tr.agg(F.sum("c").alias("n"))
    terms = (
        tr.join(tot, "prev")
        .crossJoin(F.broadcast(alln))
        .select(
            "n",
            (
                (F.col("t") / F.col("n"))
                * (F.col("c") / F.col("t"))
                * F.log(F.col("c") / F.col("t"))
            ).alias("term"),
        )
    )
    return terms.groupBy("n").agg(
        F.round(-F.sum("term"), 6).alias("entropy_rate_nats"),
        F.round(-F.sum("term") / F.log(F.lit(2.0)), 6).alias(
            "entropy_rate_bits"
        ),
    ).select(
        F.col("n").cast("long").alias("n_transitions"),
        "entropy_rate_nats", "entropy_rate_bits",
    )
