"""Round-2 registry additions, batch 26 — computational geometry and
market-basket mining:

- q_convex_hull: exact distributed convex hull of the point set
  (hull-of-local-hulls reduction; rows-only — sequential chain is not
  SQL-expressible — with an all-points naive parity test);
- q_assoc_rules: Apriori association rules over document token baskets
  (support/confidence/lift), frequent-item pruned before any pair work.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.operators.hull import convex_hull
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.points import derived_points


@register("q_convex_hull", None)
def q_convex_hull(spark, sf_dir):
    """Geometry — exact convex hull of the derived points: each
    partition reduces to its local hull (Andrew's monotone chain inside
    one Arrow-batched pass — tens of vertices leave each executor, the
    points never shuffle), the driver chains the tiny union. Output CCW
    from the lexicographic minimum, deterministic under any partition
    count (tested); rows-only (sequential chain; parity vs an
    all-points naive hull in tests/test_batch26.py)."""
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull())
    return convex_hull(pts)


# ===========================================================================
# Association rules
# ===========================================================================

_AR_MIN_SUPPORT = 0.10   # fraction of docs
_AR_MIN_CONF = 0.50


@register(
    "q_assoc_rules",
    f"""
    WITH baskets AS (
      SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM baskets),
    item AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM baskets)
      GROUP BY 1
    ),
    freq AS (
      SELECT tok, c FROM item CROSS JOIN n
      WHERE c * 1.0 / n_docs >= {_AR_MIN_SUPPORT}
    ),
    dt AS (
      SELECT b.doc_id, t.tok
      FROM (SELECT doc_id, unnest(toks) AS tok FROM baskets) b
      JOIN freq t USING (tok)
    ),
    pair AS (
      SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS c12
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
    ),
    rules AS (
      SELECT t1 AS ante, t2 AS cons, c12, f1.c AS c_a, f2.c AS c_c
      FROM pair JOIN freq f1 ON f1.tok = t1 JOIN freq f2 ON f2.tok = t2
      UNION ALL
      SELECT t2, t1, c12, f2.c, f1.c
      FROM pair JOIN freq f1 ON f1.tok = t1 JOIN freq f2 ON f2.tok = t2
    )
    SELECT ante, cons,
           round(c12 * 1.0 / n_docs, 6) AS support,
           round(c12 * 1.0 / c_a, 6) AS confidence,
           round((c12 * 1.0 / c_a) / (c_c * 1.0 / n_docs), 6) AS lift
    FROM rules CROSS JOIN n
    WHERE c12 * 1.0 / n_docs >= {_AR_MIN_SUPPORT}
      AND c12 * 1.0 / c_a >= {_AR_MIN_CONF}
    """,
)
def q_assoc_rules(spark, sf_dir):
    """Market-basket mining — Apriori association rules (Agrawal &
    Srikant 1994) over document token baskets: A→B with support ≥ 10%,
    confidence ≥ 50%, plus lift. The Apriori prune does the scale work:
    tokens below min-support are discarded BEFORE any pair generation
    (one token agg + a broadcast semi-join), so the doc_id-keyed pair
    self-join runs on |docs|×|frequent| rows, never the raw token
    stream; pair counts, marginals and N are tiny broadcast-side
    tables. Floats rounded before hashing."""
    docs = _docs(spark, sf_dir)
    baskets = docs.select(
        "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
    )
    n_docs = baskets.count()
    item = (
        baskets.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    freq = item.filter(F.col("c") * 1.0 / n_docs >= _AR_MIN_SUPPORT)
    dt = (
        baskets.select("doc_id", F.explode("toks").alias("tok"))
        .join(F.broadcast(freq.select("tok")), "tok", "leftsemi")
    )
    a = dt.select("doc_id", F.col("tok").alias("t1"))
    b = dt.select("doc_id", F.col("tok").alias("t2"))
    pair = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    f1 = freq.select(F.col("tok").alias("t1"), F.col("c").alias("c_a1"))
    f2 = freq.select(F.col("tok").alias("t2"), F.col("c").alias("c_c2"))
    joined = pair.join(F.broadcast(f1), "t1").join(F.broadcast(f2), "t2")
    fwd = joined.select(
        F.col("t1").alias("ante"), F.col("t2").alias("cons"),
        "c12", F.col("c_a1").alias("c_a"), F.col("c_c2").alias("c_c"),
    )
    rev = joined.select(
        F.col("t2").alias("ante"), F.col("t1").alias("cons"),
        "c12", F.col("c_c2").alias("c_a"), F.col("c_a1").alias("c_c"),
    )
    rules = fwd.unionByName(rev)
    support = F.col("c12") * 1.0 / F.lit(n_docs)
    conf = F.col("c12") * 1.0 / F.col("c_a")
    lift = conf / (F.col("c_c") * 1.0 / F.lit(n_docs))
    return (
        rules.filter((support >= _AR_MIN_SUPPORT) & (conf >= _AR_MIN_CONF))
        .select(
            "ante", "cons",
            F.round(support, 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )
