"""Round-2 registry additions, batch 20 — density clustering and
tokenizer application:

- q_dbscan: relational DBSCAN over the derived points — eps-cell
  equi-join neighborhood counts, core/border/noise roles, min-label
  components over core-core edges (oracle: recursive transitive
  closure, a different algorithm — the q_dup_components discipline);
- q_bpe_encode: APPLY the learned BPE merge table to the corpus (the
  companion of q_bpe_merges' training): per-document token counts under
  the trained tokenizer, computed in-row with zero extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bpe
from arrow_supercluster_spark.operators.dbscan import dbscan
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.plans.registry_ext21 import (
    _BPE_ITERS,
    _SQL_VOCAB,
    _sql_merge,
    _sql_pairs,
    _sql_winner,
)
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points

# ===========================================================================
# DBSCAN
# ===========================================================================

_DB_EPS = 2.0
_DB_MINPTS = 4


@register(
    "q_dbscan",
    f"""
    WITH RECURSIVE pts AS (
      SELECT id, lng, lat FROM ({SQL_POINTS})
      WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    c AS (
      SELECT id, lng, lat,
             CAST(floor(lng / {_DB_EPS}) AS BIGINT) AS cx,
             CAST(floor(lat / {_DB_EPS}) AS BIGINT) AS cy
      FROM pts
    ),
    pairs AS (
      SELECT a.id AS a_id, b.id AS b_id
      FROM c a JOIN c b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.id <> b.id
      WHERE (a.lng - b.lng) * (a.lng - b.lng)
            + (a.lat - b.lat) * (a.lat - b.lat) <= {_DB_EPS * _DB_EPS}
    ),
    ncnt AS (SELECT a_id AS id, COUNT(*) AS n FROM pairs GROUP BY 1),
    cores AS (SELECT id FROM ncnt WHERE n + 1 >= {_DB_MINPTS}),
    core_edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      WHERE a_id IN (SELECT id FROM cores) AND b_id IN (SELECT id FROM cores)
    ),
    reach(a, b) AS (
      SELECT u, v FROM core_edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN core_edges e ON r.b = e.u
    ),
    core_labels AS (
      SELECT c1.id, least(c1.id, coalesce(min(r.b), c1.id)) AS cluster
      FROM cores c1 LEFT JOIN reach r ON r.a = c1.id
      GROUP BY c1.id
    ),
    border AS (
      SELECT p.a_id AS id, MIN(cl.cluster) AS cluster
      FROM pairs p JOIN core_labels cl ON cl.id = p.b_id
      WHERE p.a_id NOT IN (SELECT id FROM cores)
      GROUP BY 1
    ),
    labeled AS (
      SELECT id, 'core' AS role, cluster FROM core_labels
      UNION ALL
      SELECT id, 'border' AS role, cluster FROM border
    )
    SELECT p.id, coalesce(l.role, 'noise') AS role,
           coalesce(l.cluster, -1) AS cluster
    FROM pts p LEFT JOIN labeled l ON l.id = p.id
    """,
)
def q_dbscan(spark, sf_dir):
    """Geo depth — relational DBSCAN (eps=2.0°, minPts=4): density
    clustering with core/border/noise roles over the derived points.
    Plan: eps-sized 3×3-cell equi-join for the neighborhood counts (the
    radius_cluster KDBush-within shape — never all-pairs), one agg for
    the core flag, min-label propagation + pointer jumping over
    CORE-CORE edges only (O(log n) rounds, operators/dedup.
    connected_components), one join for border labels. Labels = min core
    id of the component and min-cluster border assignment — fully
    deterministic under any partitioning, unlike textbook first-come
    border assignment. Oracle resolves the same components by recursive
    transitive closure — a genuinely different algorithm."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    ).select("id", "lng", "lat")
    return dbscan(pts, eps=_DB_EPS, min_pts=_DB_MINPTS)


# ===========================================================================
# BPE encode (apply the trained tokenizer)
# ===========================================================================

_BPE_CTES = (
    _SQL_VOCAB
    + ","
    + ",".join(
        _sql_pairs(f"s{i}", f"p{i}")
        + ","
        + _sql_winner(f"p{i}", f"w{i}")
        + ","
        + _sql_merge(f"s{i}", f"w{i}", f"s{i + 1}")
        for i in range(_BPE_ITERS)
    )
)

_BPE_ENCODE_SQL = f"""
    WITH {_BPE_CTES},
    m AS (
      SELECT w0.x AS x0, w0.y AS y0, w1.x AS x1, w1.y AS y1,
             w2.x AS x2, w2.y AS y2
      FROM w0, w1, w2
    ),
    dw AS (
      SELECT doc_id, list_filter({SQL_TOKS}, w -> w != '') AS ws
      FROM documents
    )
    SELECT doc_id,
           len(ws) AS n_words,
           CAST(coalesce(list_sum(list_transform(ws, w ->
             len(string_split(trim(
               replace(replace(replace(
                 ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ',
                 ' ' || x0 || ' ' || y0 || ' ', ' ' || x0 || y0 || ' '),
                 ' ' || x1 || ' ' || y1 || ' ', ' ' || x1 || y1 || ' '),
                 ' ' || x2 || ' ' || y2 || ' ', ' ' || x2 || y2 || ' ')
             ), ' '))
           )), 0) AS BIGINT) AS n_bpe
    FROM dw, m
"""


@register("q_bpe_encode", _BPE_ENCODE_SQL)
def q_bpe_encode(spark, sf_dir):
    """Pipeline — BPE tokenizer APPLICATION: learn the 3-rule merge table
    (q_bpe_merges), then encode every document and report its token
    count under the trained tokenizer — the real "token counting with a
    real tokenizer" upgrade over whitespace estimates. The merge rules
    arrive as driver literals (k-means-seed-scale state), so encoding is
    a pure narrow map: per word, char-split → the 3 ordered greedy
    replaces → symbol count, summed in-row over the doc's words. Zero
    shuffle beyond the training agg; at 100 TB encoding cost is one
    codegen'd pass over the corpus. Oracle re-learns the same merges via
    the unrolled CTEs and re-encodes with identical left-to-right
    replace semantics."""
    docs = _docs(spark, sf_dir)
    merges, _ = bpe.learn_merges(docs, n_merges=_BPE_ITERS)
    toks = F.filter(tokenize(F.col("text")), lambda w: w != F.lit(""))

    def enc(w):
        seq = F.concat(
            F.lit(" "), F.trim(F.regexp_replace(w, "(.)", "$1 ")), F.lit(" ")
        )
        for x, y, _cnt in merges:
            seq = F.replace(seq, F.lit(f" {x} {y} "), F.lit(f" {x}{y} "))
        return F.size(F.split(F.trim(seq), " ")).cast("long")

    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(toks, enc), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_bpe"),
    )
