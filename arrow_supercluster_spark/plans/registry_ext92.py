"""Round-4 registry additions, batch 87 — CDC log application,
higher-moment profiling, and corpus concordance:

- q_cdc_apply: change-data-capture materialization — an ordered op log
  (upserts + deletes, synthesized deterministically from orders) folded
  to final table state: last op per key wins, a trailing delete removes
  the key. The lakehouse MERGE primitive underlying Delta/Iceberg/Hudi
  "apply CDC" jobs; distinct from R37's upsert (no deletes) and R249's
  SCD2 (history retained, not folded).
- q_higher_moments: per-group skewness and EXCESS KURTOSIS from
  explicit raw→central moment algebra (E[x⁴] - 4μE[x³] + 6μ²E[x²] -
  3μ⁴ …) rather than either engine's built-in (whose bias corrections
  differ) — the distribution-shape completion of the mean/var/quantile
  profiling set.
- q_kwic: keyword-in-context concordance (every occurrence of a term
  with ±2 tokens of context) — the corpus-linguistics inspection tool;
  array-slice arithmetic with boundary clamping on both engines.

At 100 TB: CDC apply is one bounded-key window per entity; moments are
one agg with map-side partials; KWIC is a narrow explode filtered to
the term's postings before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_cdc_apply",
    """
    WITH ops AS (
      SELECT o_custkey AS k,
             CASE WHEN o_orderkey % 10 >= 8 THEN 'D' ELSE 'U' END AS op,
             o_totalprice AS val, o_orderdate AS ts, o_orderkey AS seq
      FROM orders
    ),
    ranked AS (
      SELECT k, op, val, ts,
             row_number() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_ops
      FROM ops
    )
    SELECT k AS custkey, ROUND(val, 2) AS last_value, ts AS last_ts, n_ops
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
)
def q_cdc_apply(spark, sf_dir):
    """CDC materialization: op log (deterministic synthesis — orderkey
    % 10 ≥ 8 is a delete, else upsert) folded per entity in (ts, seq)
    order; final state = the last op when it's an upsert, nothing when
    it's a delete. One window PARTITIONED by entity key (bounded by a
    customer's op count) — at scale this is the standard merge-on-read
    compaction kernel, shuffling (key, op) rows once."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ops = o.select(
        F.col("o_custkey").alias("k"),
        F.when(F.col("o_orderkey") % 10 >= 8, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
    )
    w = Window.partitionBy("k").orderBy(F.col("ts").desc(), F.col("seq").desc())
    wn = Window.partitionBy("k")
    ranked = ops.select(
        "k", "op", "val", "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_ops"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") == "U")).select(
        F.col("k").alias("custkey"),
        F.round("val", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
        "n_ops",
    )


@register(
    "q_higher_moments",
    """
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS m1,
             AVG(value * value) AS r2,
             AVG(value * value * value) AS r3,
             AVG(value * value * value * value) AS r4
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT event_type, n, m1,
             r2 - m1 * m1 AS m2,
             r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
             r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
               AS m4
      FROM m
    )
    SELECT event_type, n,
           ROUND(m1, 4) AS mean,
           ROUND(m2, 4) AS variance,
           ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM c
    """,
)
def q_higher_moments(spark, sf_dir):
    """Distribution-shape profiling: population skewness m3/m2^1.5 and
    excess kurtosis m4/m2² - 3 from explicit raw-moment algebra — NOT
    the engines' built-ins, whose sample-bias corrections differ
    between Spark and DuckDB. One aggregate with map-side partials; the
    moment frame is |event_types| rows."""
    ev = read_events(spark, sf_dir)
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("m1"),
        F.avg(v * v).alias("r2"),
        F.avg(v * v * v).alias("r3"),
        F.avg(v * v * v * v).alias("r4"),
    )
    m1 = F.col("m1")
    m2 = F.col("r2") - m1 * m1
    m3 = F.col("r3") - 3 * m1 * F.col("r2") + 2 * m1 * m1 * m1
    m4 = (
        F.col("r4")
        - 4 * m1 * F.col("r3")
        + 6 * m1 * m1 * F.col("r2")
        - 3 * m1 * m1 * m1 * m1
    )
    return m.select(
        "event_type", "n",
        F.round(m1, 4).alias("mean"),
        F.round(m2, 4).alias("variance"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    )


_KWIC_TERM = "window"
_KWIC_CTX = 2


@register(
    "q_kwic",
    f"""
    WITH toked AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    pos AS (
      SELECT doc_id, toks, i AS pos, len(toks) AS n
      FROM toked, unnest(generate_series(1, len(toks))) AS u(i)
      WHERE toks[i] = '{_KWIC_TERM}'
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           -- DuckDB yields NULL (not '') for an inverted slice at the
           -- doc boundary; Spark's empty slice joins to '' — coalesce
           coalesce(array_to_string(
             toks[greatest(pos - {_KWIC_CTX}, 1):pos - 1], ' '), '')
             AS left_ctx,
           coalesce(array_to_string(
             toks[pos + 1:least(pos + {_KWIC_CTX}, n)], ' '), '')
             AS right_ctx
    FROM pos
    """,
)
def q_kwic(spark, sf_dir):
    """Concordance (KWIC): each occurrence of "{0}" with ±{1} tokens of
    context, boundaries clamped. The term filter lands directly on the
    exploded postings (predicate above the generator, before any
    shuffle) — at scale this scans only the term's posting list
    share of the corpus.""".format(_KWIC_TERM, _KWIC_CTX)
    docs = _docs(spark, sf_dir)
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    pos = (
        toked.select(
            "doc_id", "toks", F.size("toks").alias("n"),
            F.posexplode("toks").alias("pos0", "tok"),
        )
        .filter(F.col("tok") == _KWIC_TERM)
        .select("doc_id", "toks", "n", (F.col("pos0") + 1).alias("pos"))
    )
    lstart = F.greatest(F.col("pos") - _KWIC_CTX, F.lit(1))
    return pos.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(
            F.slice("toks", lstart, F.col("pos") - lstart), " "
        ).alias("left_ctx"),
        F.array_join(
            F.slice(
                "toks",
                F.col("pos") + 1,
                F.greatest(
                    F.least(F.col("pos") + _KWIC_CTX, F.col("n"))
                    - F.col("pos"),
                    F.lit(0),
                ),
            ),
            " ",
        ).alias("right_ctx"),
    )
