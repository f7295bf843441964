"""Round-10 registry additions, batch 239 — execution-planning audits
(the decisions a 100 TB Spark job gets right or pays for), all
SQL-backed:

- q_shuffle_partition_plan: the spark.sql.shuffle.partitions sizing
  decision, measured: for P ∈ {8, 32, 128, 512}, hash the fact table's
  join key into P buckets (portable affine hash — the same modulo both
  engines), sum deterministic row-byte stand-ins per bucket, and
  report max-bucket bytes, the ideal (total/P), the skew ratio and the
  count of buckets over 2× ideal.  The table IS the tuning curve: P
  too low → buckets exceed executor memory; P too high → per-task
  overhead; skew ratio ~1 → safe.  One pass (4-row crossJoin, keyed
  agg at (P, bucket) grain).
- q_checkpoint_interval: Young's optimal checkpoint interval
  T = √(2δ·MTBF) (Young 1974; Daly 2006) with δ = 60 s and MTBF
  measured from the error-event stream (span/(n−1) mean interarrival).
  Division and square root are IEEE correctly-rounded, so both engines
  agree bit-for-bit before the final round.
- q_broadcast_choice: the broadcast-vs-shuffle join decision audited
  per dimension table: estimated bytes = measured string bytes +
  8 B/numeric column, strategy = broadcast iff est ≤ 100 KB (a
  test-scale stand-in for spark.sql.autoBroadcastJoinThreshold, chosen
  so the decision actually splits the test dims).  The five
  single-table stat aggs union to a 5-row plan.

At 100 TB: all three are single-pass keyed aggs over hash/stat
projections; none touches a pairwise stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

_P = 2147483647

# ===========================================================================
# R705 — shuffle-partition sizing plan
# ===========================================================================

_SPP_PS = [8, 32, 128, 512]
_SPP_ROWB = "64 + CAST(round(l_extendedprice * 100) AS BIGINT) % 256"


@register(
    "q_shuffle_partition_plan",
    f"""
    WITH ps AS (SELECT unnest({_SPP_PS!r}::INT[]) AS p),
    rows_ AS MATERIALIZED (
      SELECT l_partkey, {_SPP_ROWB} AS rb FROM lineitem
    ),
    buckets AS MATERIALIZED (
      SELECT ps.p,
             (48271 * l_partkey + 11) % {_P} % ps.p AS bucket,
             CAST(SUM(rb) AS BIGINT) AS b_bytes
      FROM rows_ CROSS JOIN ps
      GROUP BY ps.p, (48271 * l_partkey + 11) % {_P} % ps.p
    )
    SELECT p,
           CAST(SUM(b_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(b_bytes) // p AS BIGINT) AS ideal_bytes,
           CAST(MAX(b_bytes) AS BIGINT) AS max_bucket_bytes,
           ROUND(MAX(b_bytes) * 1.0 * p / SUM(b_bytes), 2) AS skew_ratio
    FROM buckets GROUP BY p ORDER BY p
    """,
)
def q_shuffle_partition_plan(spark, sf_dir):
    """R705 — shuffle.partitions tuning curve: P-bucket byte loads from
    the portable key hash; max/ideal skew ratio per P.  (The over-2×
    bucket count is derived in the test from the same frame — keeping
    the query itself window-free.)"""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            64
            + F.pmod(
                F.round(F.col("l_extendedprice") * 100).cast("long"),
                F.lit(256),
            )
        ).alias("rb"),
    )
    ps = spark.createDataFrame([(p,) for p in _SPP_PS], "p int")
    buckets = (
        li.crossJoin(F.broadcast(ps))
        .groupBy(
            "p",
            F.pmod(
                F.pmod(F.lit(48271) * F.col("l_partkey") + 11, F.lit(_P)),
                F.col("p"),
            ).alias("bucket"),
        )
        .agg(F.sum("rb").alias("b_bytes"))
    )
    return (
        buckets.groupBy("p")
        .agg(
            F.sum("b_bytes").alias("total_bytes"),
            F.expr("sum(b_bytes) div p").alias("ideal_bytes"),
            F.max("b_bytes").alias("max_bucket_bytes"),
            F.round(
                F.max("b_bytes") * 1.0 * F.col("p") / F.sum("b_bytes"), 2
            ).alias("skew_ratio"),
        )
        .select(
            "p", "total_bytes", "ideal_bytes", "max_bucket_bytes",
            "skew_ratio",
        )
        .orderBy("p")
    )


# ===========================================================================
# R706 — Young-Daly checkpoint interval
# ===========================================================================


@register(
    "q_checkpoint_interval",
    """
    WITH err AS MATERIALIZED (
      -- floor BEFORE the cast: epoch() is DOUBLE with sub-second
      -- fraction, and DuckDB's double->bigint cast ROUNDS where
      -- Spark's unix_timestamp truncates (the established gotcha)
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
      WHERE event_type = 'error'
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_errors,
             CAST(MAX(t) - MIN(t) AS BIGINT) AS span_sec
      FROM err
    )
    SELECT n_errors, span_sec,
           ROUND(span_sec * 1.0 / (n_errors - 1), 2) AS mtbf_sec,
           ROUND(sqrt(120.0 * span_sec / (n_errors - 1)), 2)
             AS t_opt_sec
    FROM st
    """,
)
def q_checkpoint_interval(spark, sf_dir):
    """R706 — Young's T = √(2δ·MTBF), δ = 60 s, MTBF = error-stream
    span/(n−1).  Division and sqrt are IEEE correctly-rounded → both
    engines agree exactly before the final round(2)."""
    err = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.unix_timestamp("ts").cast("long").alias("t"))
    )
    st = err.agg(
        F.count(F.lit(1)).alias("n_errors"),
        (F.max("t") - F.min("t")).cast("long").alias("span_sec"),
    )
    return st.select(
        "n_errors",
        "span_sec",
        F.round(F.col("span_sec") * 1.0 / (F.col("n_errors") - 1), 2).alias(
            "mtbf_sec"
        ),
        F.round(
            F.sqrt(F.lit(120.0) * F.col("span_sec") / (F.col("n_errors") - 1)),
            2,
        ).alias("t_opt_sec"),
    )


# ===========================================================================
# R707 — broadcast-vs-shuffle choice audit
# ===========================================================================

_BC_THRESHOLD = 100_000  # test-scale stand-in for autoBroadcastJoinThreshold

# (table, string columns, numeric column count) — the width model
_BC_DIMS = [
    ("nation", ["n_name"], 2),
    ("region", ["r_name"], 1),
    ("supplier", ["s_name"], 3),
    ("part", ["p_name", "p_brand", "p_type"], 3),
    ("customer", ["c_name", "c_mktsegment"], 3),
]


def _bc_sql_one(table: str, strs: list[str], nnum: int) -> str:
    slen = " + ".join(f"length({c})" for c in strs) if strs else "0"
    return f"""
      SELECT '{table}' AS tbl,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM({slen}) + COUNT(*) * {8 * nnum} AS BIGINT)
               AS est_bytes,
             CASE WHEN SUM({slen}) + COUNT(*) * {8 * nnum}
                       <= {_BC_THRESHOLD}
                  THEN 'broadcast' ELSE 'shuffle' END AS strategy
      FROM {table}
    """


@register(
    "q_broadcast_choice",
    " UNION ALL ".join(_bc_sql_one(t, s, n) for t, s, n in _BC_DIMS)
    + " ORDER BY tbl",
)
def q_broadcast_choice(spark, sf_dir):
    """R707 — per-dimension broadcast decision: measured string bytes +
    8 B per numeric column vs the 100 KB threshold.  Five single-table
    stat aggs unioned — the plan a join compiler would consult before
    picking sides."""
    outs = []
    for table, strs, nnum in _BC_DIMS:
        df = read_table(spark, sf_dir, table)
        slen = None
        for c in strs:
            term = F.length(F.col(c))
            slen = term if slen is None else slen + term
        est = (
            F.sum(slen) + F.count(F.lit(1)) * (8 * nnum)
        ).cast("long")
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                est.alias("est_bytes"),
            ).select(
                F.lit(table).alias("tbl"),
                "n_rows",
                "est_bytes",
                F.when(F.col("est_bytes") <= _BC_THRESHOLD, "broadcast")
                .otherwise("shuffle")
                .alias("strategy"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("tbl")
