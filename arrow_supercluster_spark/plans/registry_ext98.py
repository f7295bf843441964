"""Round-4 registry additions, batch 93 — multiset set operators,
UNPIVOT reshaping, and bipartite motif counting:

- q_set_operators: INTERSECT ALL / EXCEPT ALL with true MULTISET
  semantics — occurrence bags of two probe tokens (doc_id repeated per
  occurrence): intersect keeps min(multiplicity), except keeps the
  surplus. The two set operators were the last untouched relational
  surface (UNION/joins/aggregates are everywhere).
- q_unpivot: wide→long reshaping (DataFrame.unpivot / SQL UNPIVOT) of
  per-priority order metrics — the inverse of R45's PIVOT.
- q_butterfly_count: butterflies (2×2 bicliques, the bipartite analogue
  of triangles) in the customer×priority graph: wedge join on the
  priority side, ΣC(shared, 2) over customer pairs. Complements the
  unipartite motif set (triangles R72, clustering coefficient R123).

At 100 TB: set ops hash on (id, multiplicity) like any distinct; melt
is a narrow explode; butterfly wedges are bounded by per-priority
posting lengths (the standard vertex-priority optimization applies
when postings skew).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_TOK_A, _TOK_B = "table", "value"


@register(
    "q_set_operators",
    f"""
    WITH occ AS (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents),
    a AS (SELECT doc_id FROM occ WHERE tok = '{_TOK_A}'),
    b AS (SELECT doc_id FROM occ WHERE tok = '{_TOK_B}'),
    i AS (SELECT 'intersect_all' AS op, doc_id
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
    e AS (SELECT 'except_all' AS op, doc_id
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
    SELECT op, doc_id, CAST(COUNT(*) AS BIGINT) AS multiplicity
    FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
    GROUP BY op, doc_id
    """,
)
def q_set_operators(spark, sf_dir):
    """Multiset set operators over occurrence bags: bag A = one doc_id
    row per '{0}' occurrence, bag B likewise for '{1}'.
    INTERSECT ALL keeps min(mult_A, mult_B) copies per doc; EXCEPT ALL
    keeps max(mult_A − mult_B, 0) — semantics no join/aggregate
    combination expresses directly. Spark: intersectAll /
    exceptAll.""".format(_TOK_A, _TOK_B)
    docs = _docs(spark, sf_dir)
    occ = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    a = occ.filter(F.col("tok") == _TOK_A).select("doc_id")
    b = occ.filter(F.col("tok") == _TOK_B).select("doc_id")
    i = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "doc_id")
    e = a.exceptAll(b).select(F.lit("except_all").alias("op"), "doc_id")
    return (
        i.unionByName(e)
        .groupBy("op", "doc_id")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


@register(
    "q_unpivot",
    """
    WITH wide AS (
      SELECT o_orderpriority AS priority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS revenue,
             ROUND(AVG(o_totalprice), 4) AS avg_price
      FROM orders GROUP BY 1
    )
    UNPIVOT wide ON n_orders, revenue, avg_price
    INTO NAME metric VALUE value
    """,
)
def q_unpivot(spark, sf_dir):
    """Wide→long reshaping: three per-priority metrics melt into
    (priority, metric, value) rows — DataFrame.unpivot, the inverse of
    q_pivot_counts' PIVOT. A narrow 3× row expansion, no shuffle
    beyond the aggregate that builds the wide frame."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    wide = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    return wide.unpivot(
        ["priority"],
        ["n_orders", "revenue", "avg_price"],
        "metric",
        "value",
    )


@register(
    "q_butterfly_count",
    """
    WITH bp AS (
      SELECT DISTINCT o_custkey AS c, o_orderpriority AS p FROM orders
    ),
    wedges AS (
      SELECT a.c AS c1, b.c AS c2, CAST(COUNT(*) AS BIGINT) AS shared
      FROM bp a JOIN bp b ON a.p = b.p AND a.c < b.c
      GROUP BY a.c, b.c
    )
    SELECT shared,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(shared * (shared - 1) / 2) AS BIGINT) AS butterflies
    FROM wedges GROUP BY shared
    """,
)
def q_butterfly_count(spark, sf_dir):
    """Bipartite butterflies: customer pairs sharing k priorities form
    C(k,2) butterflies each; since r7 the pair distribution is computed
    CLOSED FORM over the bounded priority-set mask frame (<= 2^|P|
    masks): one (c, bit) rollup collapses the corpus, then same-mask
    and cross-mask pair counts give every shared-count bucket without
    enumerating a single customer pair.  Σ butterflies over rows = the
    graph's butterfly count (conservation-tested)."""
    from itertools import chain

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bp = o.select(
        F.col("o_custkey").alias("c"), F.col("o_orderpriority").alias("p")
    ).distinct()
    # r7: the priority domain is a bounded enum (<= 64 by probe), so
    # every customer's priority SET is one small bitmask — collapse
    # customers to (mask, count) and the whole shared-count
    # distribution is CLOSED FORM over <= 2^|P| mask pairs: same-mask
    # pairs share popcount(m) (C(cnt,2) of them), cross-mask pairs
    # share popcount(m1&m2) (cnt1*cnt2 of them).  This replaces the
    # Sigma cnt_p^2 wedge join (8.5e8 rows at sf0.1, 553 s) with one
    # partial-aggregated mask rollup + driver-side arithmetic on the
    # bounded mask frame (the q_setsim_join bitmask discipline).
    prios = sorted(
        r.p for r in bp.select("p").distinct().limit(64).collect()
    )
    bit_map = F.create_map(
        *chain.from_iterable(
            (F.lit(p), F.lit(1 << i).cast("long"))
            for i, p in enumerate(prios)
        )
    )
    mcnt = (
        bp.select("c", F.element_at(bit_map, F.col("p")).alias("bit"))
        .groupBy("c")
        .agg(F.sum("bit").alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = mcnt.collect()  # <= 2^|prios| - 1 = 31 rows, bounded
    dist = {}
    for i, r1 in enumerate(rows):
        s_same = bin(r1.mask).count("1")
        dist[s_same] = dist.get(s_same, 0) + r1.cnt * (r1.cnt - 1) // 2
        for r2 in rows[i + 1:]:
            sh = bin(r1.mask & r2.mask).count("1")
            if sh > 0:
                dist[sh] = dist.get(sh, 0) + r1.cnt * r2.cnt
    out = [
        (s, int(n), int(n * (s * (s - 1) // 2)))
        for s, n in sorted(dist.items())
        if n > 0
    ]
    return spark.createDataFrame(
        out, "shared long, n_pairs long, butterflies long"
    )
