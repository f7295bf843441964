"""Round-10 registry additions, batch 237 — LATERAL semantics, landmark
betweenness, local differential privacy, serial-number estimation; all
SQL-backed:

- q_lateral_join: the LATERAL (correlated table subquery) shape —
  top-2 orders per customer.  The oracle keeps DuckDB's literal
  LATERAL (... ORDER BY ... LIMIT 2); the Spark side is the rewrite
  engines actually execute: a per-key ranked window (row_number ≤ 2).
  The differential proves LATERAL ≡ window-rank on real data,
  including customers with < 2 orders and exact tie-breaks.
- q_betweenness_khop: Brandes betweenness (Brandes 2001) restricted to
  ≤ 3 hops from 32 hash-ranked landmark sources — the standard
  landmark approximation that makes betweenness feasible at scale.
  Forward pass: three BFS layers carrying shortest-path counts σ
  (integer); backward pass: two dependency accumulations
  δ(v) = Σ_w σ(v)/σ(w)·(1+δ(w)).  All layers are edge-keyed joins +
  (source, node)-keyed aggs; state is O(#landmarks · nodes) — the
  landmark cap is a FIXED 32 (hash-rank LIMIT, deterministic in both
  engines), so state grows linearly with nodes, never quadratically.
  Completes the centrality suite (degree/PageRank/Katz/eigen/
  harmonic/HITS shipped; betweenness was the one missing).
- q_ldp_frequency: local-differential-privacy frequency estimation by
  randomized response (Warner 1965; the RAPPOR primitive): each event
  reports its true type w.p. 3/4, else a pseudo-uniform type — coin
  AND replacement drawn from the portable affine hash of event_id, so
  both engines build the identical "privatized" table.  Debias:
  n̂_t = (4·c_t·K − n)/(3K)... with K=5 event types: numerator
  20·c_t − n is exact-integer; the true counts ship beside the
  estimate so the differential also certifies the debias algebra.
- q_german_tank: the serial-number (German tank) population estimator
  — max-spacing MVUE N̂ = m(k+1)/k − 1 over a deterministic hash
  sample of o_orderkey.  The key-space cardinality audit: estimate a
  table's span from a tiny sample, compare to the true max.  Exact
  integer numerator (m1·(k+1) − k) beside the rounded estimate.

At 100 TB: the lateral/window rewrite is one shuffle on the customer
key; betweenness state is capped by the fixed landmark count; LDP and
the tank estimator are single-pass keyed aggs over hash projections.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext235 import (
    _WL_EDGES_SQL,
    _wl_edges,
)
from arrow_supercluster_spark.sources.tables import read_events, read_table

_P = 2147483647

# ===========================================================================
# R697 — LATERAL correlated subquery ≡ window rank
# ===========================================================================


@register(
    "q_lateral_join",
    """
    SELECT c.c_custkey, t.o_orderkey, t.cents
    FROM customer c,
    LATERAL (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY cents DESC, o_orderkey
      LIMIT 2
    ) t
    ORDER BY c.c_custkey, t.cents DESC, t.o_orderkey
    """,
)
def q_lateral_join(spark, sf_dir):
    """R697 — LATERAL shape: the oracle runs DuckDB's literal
    correlated LATERAL ... LIMIT 2; here it is the rewrite engines
    execute — row_number over (custkey / cents desc, orderkey) ≤ 2.
    Per-group rank only (no global window); one shuffle on o_custkey."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("c_custkey", "o_orderkey", "cents")
        .orderBy("c_custkey", F.col("cents").desc(), "o_orderkey")
    )


# ===========================================================================
# R698 — landmark k-hop Brandes betweenness
# ===========================================================================

_BC_SRC = 32  # fixed landmark count — state stays O(32·nodes) at any scale

_BC_SQL = f"""
    WITH {_WL_EDGES_SQL},
    srcs AS MATERIALIZED (
      SELECT src AS s FROM (SELECT DISTINCT src FROM edges)
      ORDER BY (48271 * src + 11) % {_P}, src LIMIT {_BC_SRC}
    ),
    d1 AS MATERIALIZED (
      SELECT srcs.s, e.dst AS v FROM srcs JOIN edges e ON e.src = srcs.s
    ),
    d2 AS MATERIALIZED (
      SELECT d1.s, e.dst AS w, CAST(COUNT(*) AS BIGINT) AS sigma2
      FROM d1 JOIN edges e ON e.src = d1.v
      WHERE e.dst <> d1.s
        AND NOT EXISTS (SELECT 1 FROM d1 i
                        WHERE i.s = d1.s AND i.v = e.dst)
      GROUP BY d1.s, e.dst
    ),
    d3 AS MATERIALIZED (
      SELECT d2.s, e.dst AS x, CAST(SUM(d2.sigma2) AS BIGINT) AS sigma3
      FROM d2 JOIN edges e ON e.src = d2.w
      WHERE e.dst <> d2.s
        AND NOT EXISTS (SELECT 1 FROM d1 i
                        WHERE i.s = d2.s AND i.v = e.dst)
        AND NOT EXISTS (SELECT 1 FROM d2 i
                        WHERE i.s = d2.s AND i.w = e.dst)
      GROUP BY d2.s, e.dst
    ),
    delta2 AS MATERIALIZED (
      SELECT d2.s, d2.w,
             SUM(d2.sigma2 * 1.0 / d3.sigma3) AS delta
      FROM d2 JOIN edges e ON e.src = d2.w
              JOIN d3 ON d3.s = d2.s AND d3.x = e.dst
      GROUP BY d2.s, d2.w
    ),
    delta1 AS MATERIALIZED (
      SELECT d1.s, d1.v,
             SUM((1.0 + COALESCE(dl.delta, 0.0)) / d2.sigma2) AS delta
      FROM d1 JOIN edges e ON e.src = d1.v
              JOIN d2 ON d2.s = d1.s AND d2.w = e.dst
              LEFT JOIN delta2 dl ON dl.s = d2.s AND dl.w = d2.w
      GROUP BY d1.s, d1.v
    ),
    contrib AS MATERIALIZED (
      SELECT v AS node, delta FROM delta1
      UNION ALL
      SELECT w AS node, delta FROM delta2
    )
    SELECT node, COUNT(*) AS n_contribs,
           ROUND(SUM(delta), 6) AS betweenness
    FROM contrib GROUP BY node ORDER BY node
"""


@register("q_betweenness_khop", _BC_SQL)
def q_betweenness_khop(spark, sf_dir):
    """R698 — Brandes betweenness, ≤ 3 hops from 32 hash-ranked
    landmarks over the user co-occurrence graph.  Forward σ counts are
    exact integers; backward δ is the only float stage and is rounded
    once after the final SUM.  Every stage is an edge-keyed join +
    (s, node) agg — no pairwise fact stage, state capped by the fixed
    landmark count."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    # r10 (guide §2.4 / §3.3 "materialise an intermediate"): every
    # frontier below is consumed several times — d1 five times, d2 four,
    # delta2 twice — and without materialization each consumer re-ran
    # the ENTIRE upstream subtree (d2 alone is 3 joins + an agg over the
    # cohort self-join), blowing the plan up combinatorially: 210 s at
    # sf0.1.  Eager truncate() after each frontier caps every subtree at
    # one execution (the Brandes forward/backward passes each run once,
    # like the SQL twin's MATERIALIZED CTEs); measured 210 s → ~25 s,
    # identical output.  truncate also replaces the session-lifetime
    # edges.persist() (never unpersisted — the r3 ADVICE leak class).
    edges = truncate(_wl_edges(spark, sf_dir))
    srcs = (
        edges.select("src")
        .distinct()
        .orderBy(F.pmod(F.lit(48271) * F.col("src") + 11, F.lit(_P)), "src")
        .limit(_BC_SRC)
        .select(F.col("src").alias("s"))
    )
    d1 = truncate(
        srcs.join(edges, srcs.s == edges.src).select("s", F.col("dst").alias("v"))
    )
    e2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    d2 = truncate(
        d1.join(e2, "v")
        .filter(F.col("w") != F.col("s"))
        .join(
            d1.select("s", F.col("v").alias("w")), ["s", "w"], "leftanti"
        )
        .groupBy("s", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("sigma2"))
    )
    e3 = edges.select(F.col("src").alias("w"), F.col("dst").alias("x"))
    d3 = (
        d2.join(e3, "w")
        .filter(F.col("x") != F.col("s"))
        .join(d1.select("s", F.col("v").alias("x")), ["s", "x"], "leftanti")
        .join(d2.select("s", F.col("w").alias("x")), ["s", "x"], "leftanti")
        .groupBy("s", "x")
        .agg(F.sum("sigma2").cast("long").alias("sigma3"))
    )
    delta2 = truncate(
        d2.join(e3, "w")
        .join(d3, ["s", "x"])
        .groupBy("s", "w", "sigma2")
        .agg(
            F.sum(F.col("sigma2") * 1.0 / F.col("sigma3")).alias("delta")
        )
        .select("s", "w", "delta")
    )
    e_back = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    delta1 = (
        d1.join(e_back, "v")
        .join(d2.select("s", "w", "sigma2"), ["s", "w"])
        .join(delta2.select("s", "w", F.col("delta").alias("dl")), ["s", "w"], "left")
        .groupBy("s", "v")
        .agg(
            F.sum(
                (1.0 + F.coalesce(F.col("dl"), F.lit(0.0))) / F.col("sigma2")
            ).alias("delta")
        )
    )
    contrib = delta1.select(F.col("v").alias("node"), "delta").unionAll(
        delta2.select(F.col("w").alias("node"), "delta")
    )
    return (
        contrib.groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_contribs"),
            F.round(F.sum("delta"), 6).alias("betweenness"),
        )
        .orderBy("node")
    )


# ===========================================================================
# R699 — local-DP randomized-response frequency estimation
# ===========================================================================

_LDP_TYPES = ["click", "error", "purchase", "signup", "view"]
_LDP_K = len(_LDP_TYPES)
_LDP_IDX_SQL = " ".join(
    f"WHEN {i} THEN '{t}'" for i, t in enumerate(_LDP_TYPES)
)


@register(
    "q_ldp_frequency",
    f"""
    WITH h AS MATERIALIZED (
      SELECT event_type,
             (48271 * event_id + 11) % {_P} AS hv
      FROM events
    ),
    reported AS MATERIALIZED (
      SELECT CASE WHEN hv % 4 <> 0 THEN event_type
                  ELSE CASE (hv // 4) % {_LDP_K} {_LDP_IDX_SQL} END
             END AS rtype
      FROM h
    ),
    counts AS MATERIALIZED (
      SELECT rtype, CAST(COUNT(*) AS BIGINT) AS c FROM reported GROUP BY rtype
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    truth AS MATERIALIZED (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM events GROUP BY event_type
    )
    SELECT t.event_type, c.c AS reported_count,
           4 * {_LDP_K} * c.c - n.n AS n_est_x{3 * _LDP_K},
           ROUND((4 * {_LDP_K} * c.c - n.n) / {3.0 * _LDP_K}, 2) AS n_est,
           t.true_count
    FROM truth t JOIN counts c ON c.rtype = t.event_type
    CROSS JOIN n
    ORDER BY t.event_type
    """,
)
def q_ldp_frequency(spark, sf_dir):
    """R699 — randomized-response LDP: report true type w.p. 3/4 else a
    hash-pseudo-uniform type (coin + replacement both from the portable
    affine hash of event_id, so the privatized table is identical in
    both engines).  Debias n̂_t = (4Kc_t − n)/(3K) with the numerator
    exact-integer; true counts ship beside for the error story."""
    ev = read_events(spark, sf_dir).select("event_id", "event_type")
    h = ev.withColumn(
        "hv", F.pmod(F.lit(48271) * F.col("event_id") + 11, F.lit(_P))
    )
    idx_map = F.create_map(
        *[x for i, t in enumerate(_LDP_TYPES) for x in (F.lit(i), F.lit(t))]
    )
    reported = h.select(
        F.when(F.pmod(F.col("hv"), F.lit(4)) != 0, F.col("event_type"))
        .otherwise(idx_map[F.pmod(F.expr("hv div 4"), F.lit(_LDP_K))])
        .alias("rtype")
    )
    counts = reported.groupBy("rtype").agg(F.count(F.lit(1)).alias("c"))
    n = ev.agg(F.count(F.lit(1)).alias("n"))
    truth = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    est_num = F.lit(4 * _LDP_K) * F.col("c") - F.col("n")
    return (
        truth.join(counts, truth.event_type == counts.rtype)
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("c").alias("reported_count"),
            est_num.alias(f"n_est_x{3 * _LDP_K}"),
            F.round(est_num / F.lit(3.0 * _LDP_K), 2).alias("n_est"),
            "true_count",
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R700 — German-tank key-space estimator
# ===========================================================================


@register(
    "q_german_tank",
    f"""
    WITH sample AS MATERIALIZED (
      SELECT o_orderkey FROM orders
      WHERE (48271 * o_orderkey + 11) % {_P} % 50 = 0
    ),
    st AS (
      SELECT CAST(MAX(o_orderkey) + 1 AS BIGINT) AS m1,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM sample
    ),
    truth AS (
      SELECT CAST(MAX(o_orderkey) + 1 AS BIGINT) AS true_n FROM orders
    )
    SELECT st.m1, st.k,
           st.m1 * (st.k + 1) - st.k AS n_hat_times_k,
           ROUND((st.m1 * (st.k + 1) - st.k) * 1.0 / st.k, 2) AS n_hat,
           truth.true_n
    FROM st CROSS JOIN truth
    """,
)
def q_german_tank(spark, sf_dir):
    """R700 — serial-number (German tank) population estimate of the
    0-based o_orderkey space from a deterministic 2% hash sample:
    MVUE N̂ = m1(k+1)/k − 1 with m1 = max+1; exact-integer numerator
    beside the rounded estimate and the true span."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    sample = o.filter(
        F.pmod(
            F.pmod(F.lit(48271) * F.col("o_orderkey") + 11, F.lit(_P)),
            F.lit(50),
        )
        == 0
    )
    st = sample.agg(
        (F.max("o_orderkey") + 1).cast("long").alias("m1"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    truth = o.agg((F.max("o_orderkey") + 1).cast("long").alias("true_n"))
    num = F.col("m1") * (F.col("k") + 1) - F.col("k")
    return st.crossJoin(F.broadcast(truth)).select(
        "m1",
        "k",
        num.alias("n_hat_times_k"),
        F.round(num * 1.0 / F.col("k"), 2).alias("n_hat"),
        "true_n",
    )
