"""Round-10 registry additions, batch 235 — quantile-sketch completion
+ graph refinement + corpus blocklisting, all SQL-backed (an AMS F2
sibling was drafted and dropped on finding q_ams_f2 already in
registry_ext191 — the sketch family there already covers F2/CMS/KMV):

- q_hdr_quantiles: relative-error-bounded quantile sketch in the
  HdrHistogram style (public hdrhistogram.org design; DDSketch's
  log-bucket idea with EXACT-INTEGER buckets): bucket = (base-2
  exponent of price-cents, 3 mantissa bits), giving ≤ 1/8 relative
  width per bucket.  Exponents come from a 41-row power-of-two table
  joined by range (broadcast nested loop over 41 rows — NOT
  floor(log2(x)), whose float rounding can flip a boundary bucket
  between engines).  p50/p95/p99 per order priority read off the
  cumulative bucket counts (window at BUCKET grain, ≤ 328 rows per
  priority).  Mergeability is the bucket-count SUM itself; accuracy
  (≤ 12.5% by construction) is pinned by a numpy replay test.
- q_wl_refinement: two rounds of Weisfeiler-Lehman color refinement
  (the graph-isomorphism workhorse, Weisfeiler & Lehman 1968; the WL
  kernel of Shervashidze et al. 2011) over the user co-occurrence
  graph q_pagerank/q_triangle_count walk.  Portable commutative
  neighbor-multiset hash: c' = (A·c + Σ_N h(c_u) + B) mod p — the
  neighbor SUM is order-independent, so the distributed groupBy and
  DuckDB's aggregation agree exactly.  Reports colors-per-round: the
  refinement curve (how fast structural roles separate).
- q_blocklist_filter: multi-phrase blocklist scan (the
  banned-phrase / compliance filter every corpus pipeline runs):
  K phrases broadcast against the documents table, token-boundary
  matching via space-padding, per-phrase document and occurrence
  counts plus the distinct-documents-flagged total row.  One corpus
  pass, K tiny → broadcast nested loop; no shuffle until the K+1-row
  agg.  (Adjacent overlapping repeats share their boundary space and
  count once — identical left-to-right non-overlapping REPLACE
  semantics in both engines, documented here.)

At 100 TB: q_hdr_quantiles aggregates facts once to bucket
grain then windows over ≤ 328 buckets; q_wl_refinement's rounds are
edge-keyed joins + node-keyed aggs (linear in edges per round);
q_blocklist_filter is a single projection scan.  Nothing collects,
nothing pairs fact rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_P = 2147483647

# ===========================================================================
# R689 — HDR-histogram sketch quantiles (relative-error-bounded)
# ===========================================================================

_HDR_MAX_EXP = 41


@register(
    "q_hdr_quantiles",
    f"""
    WITH pows AS MATERIALIZED (
      SELECT r, CAST(power(2, r) AS BIGINT) AS pw
      FROM (SELECT unnest(range(3, {_HDR_MAX_EXP})) AS r)
    ),
    cents AS MATERIALIZED (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    bucketed AS MATERIALIZED (
      SELECT priority, r, ((c * 8) // pw) % 8 AS sub,
             COUNT(*) AS n
      FROM cents JOIN pows ON c >= pw AND c < pw * 2
      GROUP BY 1, 2, 3
    ),
    cum AS MATERIALIZED (
      SELECT priority, r, sub, n,
             (8 + sub) * (pw // 8) AS lb_cents,
             CAST(SUM(n) OVER (PARTITION BY priority ORDER BY r, sub)
                  AS BIGINT) AS cum_n,
             CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS total_n
      FROM bucketed JOIN pows USING (r)
    )
    SELECT priority,
           MAX(total_n) AS n_orders,
           COUNT(*) AS n_buckets,
           MIN(CASE WHEN cum_n * 100 >= total_n * 50 THEN lb_cents END)
             AS p50_cents,
           MIN(CASE WHEN cum_n * 100 >= total_n * 95 THEN lb_cents END)
             AS p95_cents,
           MIN(CASE WHEN cum_n * 100 >= total_n * 99 THEN lb_cents END)
             AS p99_cents
    FROM cum GROUP BY priority ORDER BY priority
    """,
)
def q_hdr_quantiles(spark, sf_dir):
    """R689 — HDR log-bucket quantile sketch per order priority: facts
    agg once to (priority, exponent, 3-mantissa-bit) bucket grain; the
    window runs over ≤ 328 buckets per priority (window-gate
    allowlisted).  Bucket lower bound (8+sub)·2^(r−3) is the estimate;
    worst-case relative error 1/8.  Order cents ≥ ~90 000 so the r ≥ 3
    power table always matches."""
    pows = (
        spark.range(3, _HDR_MAX_EXP)
        .select(F.col("id").cast("int").alias("r"))
        .withColumn("pw", F.pow(F.lit(2.0), F.col("r")).cast("long"))
    )
    cents = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    # r10 (guide §3 "avoid accidental exploding joins"): the exponent
    # r = floor(log2(c)) was found with a range-condition broadcast
    # nested-loop join against the power table — |orders| × ~38
    # predicate evaluations (9.5 s at sf0.1).  Compute it per row
    # instead: seed from libm log2 and self-correct ±1 with exact
    # integer shift comparisons (libm alone can be off by one ulp at
    # exact powers of two), then keep the join's range semantics with
    # the identical r-window filter.  The tiny power table remains only
    # as the lb_cents lookup below.
    bucketed = (
        cents.filter(F.col("c") > 0)
        .withColumn("r0", F.floor(F.log2("c")).cast("int"))
        .withColumn(
            "r",
            F.expr(
                "CASE WHEN c < shiftleft(CAST(1 AS BIGINT), r0) THEN r0 - 1 "
                "WHEN c >= shiftleft(CAST(1 AS BIGINT), r0 + 1) THEN r0 + 1 "
                "ELSE r0 END"
            ),
        )
        .filter((F.col("r") >= 3) & (F.col("r") < _HDR_MAX_EXP))
        .withColumn("pw", F.expr("shiftleft(CAST(1 AS BIGINT), r)"))
        .groupBy(
            "priority",
            "r",
            F.expr("pmod((c * 8) div pw, 8)").cast("long").alias("sub"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("r", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("priority")
    cum = (
        bucketed.join(F.broadcast(pows), "r")
        .withColumn("lb_cents", F.expr("(sub + 8) * (pw div 8)"))
        .withColumn("cum_n", F.sum("n").over(w_cum))
        .withColumn("total_n", F.sum("n").over(w_all))
    )

    def pick(q100):
        return F.min(
            F.when(
                F.col("cum_n") * 100 >= F.col("total_n") * q100,
                F.col("lb_cents"),
            )
        )

    return (
        cum.groupBy("priority")
        .agg(
            F.max("total_n").alias("n_orders"),
            F.count(F.lit(1)).alias("n_buckets"),
            pick(50).alias("p50_cents"),
            pick(95).alias("p95_cents"),
            pick(99).alias("p99_cents"),
        )
        .orderBy("priority")
    )


# ===========================================================================
# R690 — Weisfeiler-Lehman color refinement (2 rounds, portable hash)
# ===========================================================================

_WL_A = 12345
_WL_B = 7


_WL_COHORT_CAP = 32  # max users per (type, hour) bucket — see below


def _wl_edges(spark, sf_dir):
    """Symmetric neighbor list of the q_pagerank-style co-occurrence
    graph (same event type, same hour, distinct users) — with the
    per-bucket cohort CAPPED at 32 users by hash rank.  The cap is the
    r10 16× sweep catch: uncapped, each (type, hour) bucket pairs all
    its members, so 16× more users per bucket = 256× more edges (the
    sweep watchdog timed out q_wl_refinement and q_betweenness_khop).
    A deterministic hash-rank cap bounds edges at 32²/bucket — linear
    in buckets at any scale — and is mirrored verbatim in the SQL
    twins, so both engines see the identical graph."""
    memb = (
        read_events(spark, sf_dir)
        .select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("event_type", "h").orderBy(
        F.pmod(F.lit(48271) * F.col("user_id") + 11, F.lit(_P)), "user_id"
    )
    capped = (
        memb.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WL_COHORT_CAP)
        .select("user_id", "event_type", "h")
    )
    a = capped.select(F.col("user_id").alias("src"), "event_type", "h")
    b = capped.select(F.col("user_id").alias("dst"), "event_type", "h")
    return (
        a.join(b, ["event_type", "h"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


_WL_EDGES_SQL = f"""
    memb AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type,
             date_trunc('hour', ts) AS h
      FROM events
    ),
    capped AS MATERIALIZED (
      SELECT user_id, event_type, h FROM (
        SELECT user_id, event_type, h,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type, h
                 ORDER BY (48271 * user_id + 11) % {_P}, user_id
               ) AS rk
        FROM memb
      ) WHERE rk <= {_WL_COHORT_CAP}
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      FROM capped a JOIN capped b
        ON a.event_type = b.event_type AND a.h = b.h
       AND a.user_id <> b.user_id
    )
"""


def _wl_round_sql(prev: str, out: str) -> str:
    """One unrolled WL round: c' = (A·c + Σ_N h(c_u) + B) mod p with
    h(c) = (48271·c + 11) mod p — the neighbor SUM is commutative so
    both engines agree regardless of aggregation order."""
    return f"""
    {out} AS MATERIALIZED (
      SELECT e.src AS node,
             ({_WL_A} * MAX(p0.color)
              + CAST(SUM((48271 * pn.color + 11) % {_P}) AS BIGINT)
              + {_WL_B}) % {_P} AS color
      FROM edges e
      JOIN {prev} p0 ON p0.node = e.src
      JOIN {prev} pn ON pn.node = e.dst
      GROUP BY e.src
    )
    """


@register(
    "q_wl_refinement",
    f"""
    WITH {_WL_EDGES_SQL},
    c0 AS MATERIALIZED (
      SELECT src AS node, COUNT(*) % {_P} AS color
      FROM edges GROUP BY src
    ),
    {_wl_round_sql("c0", "c1")},
    {_wl_round_sql("c1", "c2")}
    SELECT * FROM (
      SELECT 0 AS round, COUNT(DISTINCT color) AS n_colors,
             COUNT(*) AS n_nodes FROM c0
      UNION ALL
      SELECT 1, COUNT(DISTINCT color), COUNT(*) FROM c1
      UNION ALL
      SELECT 2, COUNT(DISTINCT color), COUNT(*) FROM c2
    ) ORDER BY round
    """,
)
def q_wl_refinement(spark, sf_dir):
    """R690 — two WL refinement rounds: init color = degree; each round
    re-hashes (own color, neighbor color multiset) with the commutative
    portable hash.  Rounds are edge-keyed joins + node aggs — linear in
    edges at any scale.  n_colors per round is the refinement curve."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    # r10: c0 feeds three consumers and c1 three more (summary + both
    # sides of the next round's join) — unmaterialized, c2's lineage
    # re-ran the edge self-join pipeline combinatorially (15 s at
    # sf0.1).  truncate caps each round at one execution and replaces
    # the never-unpersisted session-lifetime persist().
    edges = truncate(_wl_edges(spark, sf_dir))
    c0 = truncate(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.pmod(F.count(F.lit(1)), F.lit(_P)).alias("color")
        )
    )

    def wl_round(prev):
        p0 = prev.select(F.col("node").alias("src"), F.col("color").alias("own"))
        pn = prev.select(F.col("node").alias("dst"), F.col("color").alias("nc"))
        return (
            edges.join(p0, "src")
            .join(pn, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.pmod(
                    F.lit(_WL_A) * F.max("own")
                    + F.sum(F.pmod(F.lit(48271) * F.col("nc") + 11, F.lit(_P)))
                    + F.lit(_WL_B),
                    F.lit(_P),
                ).alias("color")
            )
        )

    c1 = truncate(wl_round(c0))
    c2 = wl_round(c1)

    def summary(df, rnd):
        return df.agg(
            F.countDistinct("color").alias("n_colors"),
            F.count(F.lit(1)).alias("n_nodes"),
        ).select(
            F.lit(rnd).cast("int").alias("round"), "n_colors", "n_nodes"
        )

    return (
        summary(c0, 0).unionAll(summary(c1, 1)).unionAll(summary(c2, 2))
    ).orderBy("round")


# ===========================================================================
# R691 — multi-phrase blocklist filter
# ===========================================================================

_BLOCK_PHRASES = [
    "hash join", "table scan", "sort merge",
    "window agg", "batch stream", "slow query",
]
_BLOCK_VALUES = ", ".join(f"('{p}')" for p in _BLOCK_PHRASES)


@register(
    "q_blocklist_filter",
    f"""
    WITH phrases AS (SELECT * FROM (VALUES {_BLOCK_VALUES}) t(phrase)),
    padded AS MATERIALIZED (
      SELECT doc_id, ' ' || text || ' ' AS ptext FROM documents
    ),
    hits AS MATERIALIZED (
      SELECT p.phrase, d.doc_id,
             CAST((length(d.ptext)
                   - length(replace(d.ptext, ' ' || p.phrase || ' ', '')))
                  / (length(p.phrase) + 2) AS BIGINT) AS n_occ
      FROM padded d CROSS JOIN phrases p
      WHERE position(' ' || p.phrase || ' ' IN d.ptext) > 0
    )
    SELECT phrase, COUNT(*) AS n_docs,
           CAST(SUM(n_occ) AS BIGINT) AS n_occurrences
    FROM hits GROUP BY phrase
    UNION ALL
    SELECT '__any__', COUNT(DISTINCT doc_id), CAST(SUM(n_occ) AS BIGINT)
    FROM hits
    ORDER BY phrase
    """,
)
def q_blocklist_filter(spark, sf_dir):
    """R691 — blocklist scan: K phrases broadcast against documents,
    token-boundary match on space-padded text, per-phrase doc +
    occurrence counts and an __any__ distinct-docs row.  One corpus
    pass; the only shuffle moves ≤ K+1 rows of partial counts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("ptext")
    )
    phrases = spark.createDataFrame(
        [(p,) for p in _BLOCK_PHRASES], "phrase string"
    )
    needle = F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
    hits = (
        docs.crossJoin(F.broadcast(phrases))
        .filter(F.contains(F.col("ptext"), needle))
        .select(
            "phrase",
            "doc_id",
            (
                (F.length("ptext") - F.length(F.replace(F.col("ptext"), needle, F.lit(""))))
                / (F.length("phrase") + 2)
            )
            .cast("long")
            .alias("n_occ"),
        )
    )
    per_phrase = hits.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_occ").alias("n_occurrences"),
    )
    any_row = hits.agg(
        F.lit("__any__").alias("phrase"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_occ").alias("n_occurrences"),
    )
    return per_phrase.unionAll(any_row).orderBy("phrase")
