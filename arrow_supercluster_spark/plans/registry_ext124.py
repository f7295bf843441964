"""Round-5 registry additions, batch 119 — storage-layout zone maps,
entity-resolution clustering, and topical text segmentation:

- q_zone_map_skipping: zone-map (file min/max) effectiveness report —
  bucket the orders fact into simulated files under two layouts
  (arrival-hash vs sort-clustered on the predicate column), compute
  per-file min/max, and measure what fraction of files a range
  predicate can SKIP in each. The why-you-sort-your-lake query: the
  number this reports is the scan cost a real cluster avoids at
  100 TB (Spark parquet row-group pruning, Delta/Iceberg data
  skipping all run on exactly these stats).
- q_er_clusters: entity resolution end-to-end — the Fellegi-Sunter
  link pairs (q_record_linkage's 'link' verdicts) resolved into
  ENTITY CLUSTERS via connected components, with cluster-size
  histogram out. Links are pairwise; entities are transitive — the
  step every MDM pipeline runs after scoring. SQL-backed since round 9
  (bounded min-label-propagation unroll); union-find python oracle in
  tests.
- q_texttiling: TextTiling-style topical segmentation — adjacent
  fixed-size token blocks compared by integer-count cosine; a
  boundary wherever the valley depth exceeds the doc's mean depth
  (all moments integer-scaled). Per-doc segment counts: the
  long-document chunking signal that length-blind chunkers
  (q_doc_chunks) lack.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_ZM_FILES = 32
_ZM_LO, _ZM_HI = 50000.0, 60000.0  # totalprice range predicate
_TT_BLOCK = 10  # tokens per TextTiling block
_TT_SCALE = 1_000_000


# ===========================================================================
# R351 — zone-map skipping report
# ===========================================================================

@register(
    "q_zone_map_skipping",
    f"""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1
               AS rk,
             COUNT(*) OVER () AS n
      FROM orders
    ),
    files AS (
      SELECT 'hash' AS layout, o_orderkey % {_ZM_FILES} AS file_id,
             o_totalprice
      FROM orders
      UNION ALL
      SELECT 'sorted', rk * {_ZM_FILES} // n, o_totalprice FROM ranked
    ),
    zones AS (
      SELECT layout, file_id,
             MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
             COUNT(*) AS n_rows
      FROM files GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN mx < {_ZM_LO} OR mn > {_ZM_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
           round(SUM(CASE WHEN mx < {_ZM_LO} OR mn > {_ZM_HI}
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS skip_fraction,
           CAST(SUM(CASE WHEN mx < {_ZM_LO} OR mn > {_ZM_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_skipped
    FROM zones
    GROUP BY layout
    ORDER BY layout
    """,
)
def q_zone_map_skipping(spark, sf_dir):
    """R351 — zone-map effectiveness under two physical layouts: the
    orders fact split into {f} simulated files by (a) arrival hash and
    (b) sort-clustering on o_totalprice; per-file min/max zones; a
    range predicate [{lo}, {hi}] then skips a file iff its zone misses
    the range. Hash layout skips ~0 (every file spans the domain);
    sorted layout skips all but the overlapping run — THE argument for
    sort/z-order clustering, quantified. This simulation is exactly
    the stat parquet row-group pruning and lakehouse data skipping
    evaluate at scan time; at 100 TB the skip_fraction is the fraction
    of the corpus you never read. Sorted file ids come from the
    distributed rank (oracle mirrors with a window).""".format(
        f=_ZM_FILES, lo=_ZM_LO, hi=_ZM_HI
    )
    from arrow_supercluster_spark.functions import distrank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    hash_files = orders.select(
        F.lit("hash").alias("layout"),
        F.pmod("o_orderkey", F.lit(_ZM_FILES)).alias("file_id"),
        "o_totalprice",
    )
    ranked, n_rows, _ = distrank.zip_scan(
        orders, ["o_totalprice", "o_orderkey"], out="rk"
    )
    sorted_files = ranked.select(
        F.lit("sorted").alias("layout"),
        # integer DIV, not double-divide-then-cast: a double quotient can
        # land a hair under the exact integer and truncate off-by-one
        F.expr(f"rk * {_ZM_FILES} DIV {int(n_rows)}").alias("file_id"),
        "o_totalprice",
    )
    zones = (
        hash_files.unionByName(sorted_files)
        .groupBy("layout", "file_id")
        .agg(
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    skipped = F.when(
        (F.col("mx") < _ZM_LO) | (F.col("mn") > _ZM_HI), 1
    ).otherwise(0)
    return (
        zones.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(skipped).cast("long").alias("files_skipped"),
            F.round(
                F.sum(skipped) * 1.0 / F.count(F.lit(1)), 4
            ).alias("skip_fraction"),
            F.sum(
                F.when(
                    (F.col("mx") < _ZM_LO) | (F.col("mn") > _ZM_HI),
                    F.col("n_rows"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rows_skipped"),
        )
        .orderBy("layout")
    )


# ===========================================================================
# R352 — entity-resolution clusters (FS links → connected components)
# ===========================================================================

# SQL twin (round 9, rows-only reduction): the link-pair construction
# is q_record_linkage's SQL verbatim; the cc fixpoint unrolls as
# _ER_ROUNDS min-label propagation steps (label(v) ← min(label(v),
# min over neighbors) — ALL-INTEGER, so the unroll is exact).  Simple
# propagation converges in graph-diameter rounds; tests/test_batch227.py
# asserts labels are stable at round _ER_ROUNDS-1 == _ER_ROUNDS on the
# fixture data (diameter margin >2×), and the size histogram is
# representative-agnostic, so the Spark side keeps the production
# O(log n) min-label CONTRACTION fixpoint (operators/dedup.py) — the
# two agree whenever propagation converged, which the hash check then
# certifies per run.  MATERIALIZED per step: each round references the
# previous labels twice (the DuckDB CTE-inlining doubling rule).
_ER_ROUNDS = 12


def _sql_er_clusters() -> str:
    head = """
    WITH b AS MATERIALIZED (
      SELECT c_custkey AS b_id,
             c_nationkey AS b_nation,
             CASE WHEN c_custkey % 10 = 0 THEN c_custkey + 1000000
                  ELSE c_custkey END AS b_digits,
             c_acctbal + ((c_custkey * 7) % 21 - 10) AS b_bal,
             CASE WHEN c_custkey % 17 = 0 THEN 'BUILDING'
                  ELSE c_mktsegment END AS b_seg
      FROM customer
    ),
    edges AS MATERIALIZED (
      SELECT a.c_custkey AS u, b.b_id + 10000000 AS v
      FROM customer a JOIN b ON a.c_nationkey = b.b_nation
      WHERE (CASE WHEN a.c_custkey = b.b_digits THEN 9.813781 ELSE -3.320485 END
             + CASE WHEN abs(a.c_acctbal - b.b_bal) <= 5.5 THEN 1.662965 ELSE -3.807355 END)
             + CASE WHEN a.c_mktsegment = b.b_seg THEN 1.970854 ELSE -5.228819 END
            >= 6.0
    ),
    und AS MATERIALIZED (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT u AS id, u AS lbl FROM und
    )"""
    steps = []
    for t in range(1, _ER_ROUNDS + 1):
        steps.append(f""",
    l{t} AS MATERIALIZED (
      SELECT id, MIN(lbl) AS lbl FROM (
        SELECT id, lbl FROM l{t - 1}
        UNION ALL
        SELECT und.u AS id, p.lbl
        FROM und JOIN l{t - 1} p ON p.id = und.v
      ) GROUP BY id
    )""")
    # Self-check (r10, ADVICE r9 item 2): the unroll is only exact when
    # propagation CONVERGED inside _ER_ROUNDS; emit the l{N-1}-vs-l{N}
    # mismatch count as a column.  The Spark side (a true contraction
    # fixpoint) emits literal 0, so any non-convergence at a larger
    # scale factor fails the hash check LOUDLY instead of silently
    # shipping unconverged labels.
    tail = f""",
    conv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS unconverged
      FROM l{_ER_ROUNDS} a JOIN l{_ER_ROUNDS - 1} b
        ON a.id = b.id AND a.lbl <> b.lbl
    )
    SELECT size, CAST(COUNT(*) AS BIGINT) AS n_entities,
           (SELECT unconverged FROM conv) AS unconverged
    FROM (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS size
      FROM l{_ER_ROUNDS} GROUP BY lbl
    ) GROUP BY size ORDER BY size
    """
    return head + "".join(steps) + tail


@register("q_er_clusters", _sql_er_clusters())
def q_er_clusters(spark, sf_dir):
    """R352 — entity resolution end to end: q_record_linkage's 'link'
    -verdict pairs feed operators.dedup.connected_components (min-label
    contraction — O(log n) rounds on any graph shape), and the result
    rolls up to a cluster-size histogram plus singleton/entity counts.
    Pairwise links say 'same'; transitivity makes ENTITIES — a chain
    a—b—c is one entity even when (a, c) never scored. SQL-backed since
    round 9: the twin unrolls min-label propagation (_ER_ROUNDS exact
    integer steps — see _sql_er_clusters above); the union-find python
    oracle in tests/test_batch119.py still re-derives the clusters from
    the same link pairs, and test_batch227 asserts propagation converges
    well inside the unroll."""
    from arrow_supercluster_spark.operators.dedup import (
        connected_components_adaptive,
    )

    # q_record_linkage returns the verdict ROLLUP; rebuild the pair
    # frame at link grain here (same construction, pre-rollup)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    from arrow_supercluster_spark.plans.registry_ext115 import (
        _FS_LINK,
        _WB_A,
        _WB_D,
        _WN_A,
        _WN_D,
        _WS_A,
        _WS_D,
    )

    b = cust.select(
        F.col("c_custkey").alias("b_id"),
        F.col("c_nationkey").alias("b_nation"),
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_custkey") + 1000000)
        .otherwise(F.col("c_custkey"))
        .alias("b_digits"),
        (F.col("c_acctbal") + ((F.col("c_custkey") * 7) % 21 - 10)).alias(
            "b_bal"
        ),
        F.when(F.col("c_custkey") % 17 == 0, F.lit("BUILDING"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
    )
    score = (
        (
            F.when(F.col("c_custkey") == F.col("b_digits"), F.lit(_WN_A))
            .otherwise(F.lit(_WN_D))
            + F.when(
                F.abs(F.col("c_acctbal") - F.col("b_bal")) <= 5.5,
                F.lit(_WB_A),
            ).otherwise(F.lit(_WB_D))
        )
        + F.when(F.col("c_mktsegment") == F.col("b_seg"), F.lit(_WS_A))
        .otherwise(F.lit(_WS_D))
    )
    # B-side records live in their own node-id space (offset) so the
    # graph is bipartite A-records × B-records
    link_pairs = (
        cust.join(b, cust["c_nationkey"] == b["b_nation"])
        .filter(score >= _FS_LINK)
        .select(
            F.col("c_custkey").alias("a_id"),
            (F.col("b_id") + 10_000_000).alias("b_id"),
        )
    )
    # r11: adaptive CC — exact min-id union-find driver-side under 200k
    # edges (the bipartite link graph is nation-bounded), distributed
    # fixpoint above
    comps = connected_components_adaptive(link_pairs, "a_id", "b_id")
    sizes = comps.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        # the contraction fixpoint ITERATES TO convergence, so its
        # unconverged count is 0 by construction; the twin computes the
        # real l{N-1}-vs-l{N} mismatch count — hash equality therefore
        # certifies the unroll converged (see _sql_er_clusters tail)
        .withColumn("unconverged", F.lit(0).cast("long"))
        .orderBy("size")
    )


# ===========================================================================
# R353 — TextTiling topical segmentation
# ===========================================================================

@register(
    "q_texttiling",
    f"""
    WITH toks AS (
      SELECT doc_id, tok,
             CAST(pos AS BIGINT) // {_TT_BLOCK} AS blk
      FROM (
        SELECT doc_id, unnest({SQL_TOKS}) AS tok,
               unnest(range(0, len({SQL_TOKS}))) AS pos
        FROM documents
      ) WHERE tok != ''
    ),
    counts AS (
      SELECT doc_id, blk, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3
    ),
    norms AS (
      SELECT doc_id, blk, SUM(c * c) AS n2 FROM counts GROUP BY 1, 2
    ),
    adj AS (
      SELECT a.doc_id, a.blk AS gap,
             CAST(round(SUM(a.c * b.c) * 1.0
                        / (sqrt(na.n2) * sqrt(nb.n2)) * {_TT_SCALE})
                  AS BIGINT) AS cos_s
      FROM counts a
      JOIN counts b ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
                   AND a.tok = b.tok
      JOIN norms na ON na.doc_id = a.doc_id AND na.blk = a.blk
      JOIN norms nb ON nb.doc_id = a.doc_id AND nb.blk = a.blk + 1
      GROUP BY a.doc_id, a.blk, na.n2, nb.n2
    ),
    stats AS (
      SELECT doc_id, COUNT(*) AS n_gaps,
             SUM(cos_s) * 1.0 / COUNT(*) AS mean_s
      FROM adj GROUP BY doc_id
    ),
    bounds AS (
      SELECT adj.doc_id,
             SUM(CASE WHEN adj.cos_s < stats.mean_s THEN 1 ELSE 0 END)
               AS n_bounds
      FROM adj JOIN stats USING (doc_id)
      GROUP BY adj.doc_id
    )
    SELECT stats.doc_id,
           CAST(stats.n_gaps AS BIGINT) AS n_gaps,
           CAST(coalesce(bounds.n_bounds, 0) + 1 AS BIGINT) AS n_segments,
           round(stats.mean_s / {_TT_SCALE}.0, 6) AS mean_cohesion
    FROM stats LEFT JOIN bounds USING (doc_id)
    ORDER BY stats.doc_id
    """,
)
def q_texttiling(spark, sf_dir):
    """R353 — TextTiling-style topical segmentation: tokens in blocks
    of {b}, adjacent blocks compared by INTEGER-count cosine (scale
    -invariant, exact sums), the cosine scaled to ints before the
    per-doc mean, and a segment boundary wherever a gap's cohesion
    falls below the doc's mean. Per-doc: cohesive-gap count (adjacent
    pairs sharing ≥1 token — zero-overlap gaps contribute no adj row
    in either engine, identically), segment count, mean cohesion.
    Keyed aggs + one adjacent-block self-join; no windows.""".format(b=_TT_BLOCK)
    from arrow_supercluster_spark.operators.dedup import tokenize

    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "tok",
            (F.col("pos").cast("long") / _TT_BLOCK)
            .cast("long")
            .alias("blk"),
        )
    )
    counts = toks.groupBy("doc_id", "blk", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    norms = counts.groupBy("doc_id", "blk").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    a, bqc = counts.alias("a"), counts.alias("b")
    na, nb = norms.alias("na"), norms.alias("nb")
    adj = (
        a.join(
            bqc,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.blk") == F.col("a.blk") + 1)
            & (F.col("a.tok") == F.col("b.tok")),
        )
        .join(
            na,
            (F.col("na.doc_id") == F.col("a.doc_id"))
            & (F.col("na.blk") == F.col("a.blk")),
        )
        .join(
            nb,
            (F.col("nb.doc_id") == F.col("a.doc_id"))
            & (F.col("nb.blk") == F.col("a.blk") + 1),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.blk").alias("gap"),
            F.col("na.n2").alias("na2"),
            F.col("nb.n2").alias("nb2"),
        )
        .agg(
            F.round(
                F.sum(F.col("a.c") * F.col("b.c"))
                * 1.0
                / (F.sqrt("na2") * F.sqrt("nb2"))
                * _TT_SCALE
            )
            .cast("long")
            .alias("cos_s")
        )
    )
    stats = adj.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("cos_s") * 1.0 / F.count(F.lit(1))).alias("mean_s"),
    )
    bounds = (
        adj.join(stats, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("cos_s") < F.col("mean_s"), 1).otherwise(0)
            ).alias("n_bounds")
        )
    )
    return (
        stats.join(bounds, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            (F.coalesce("n_bounds", F.lit(0)) + 1)
            .cast("long")
            .alias("n_segments"),
            F.round(F.col("mean_s") / float(_TT_SCALE), 6).alias(
                "mean_cohesion"
            ),
        )
        .orderBy("doc_id")
    )
