"""Round-2 registry additions, batch 51 — kNN-graph shape and PII
density:

- q_knn_graph_stats: the 5-NN digraph over the embeddings summarized —
  reciprocity and in-degree spread (hub detection: high max in-degree
  = hubness, the known curse-of-dimensionality failure of ANN
  retrieval);
- q_pii_density: per-source PII density (emails/phones per 1k chars) —
  the governance rollup over the q_pii_scrub detector.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import decontam, similarity
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext9 import _SQL_PII_TEXT

_KG_K = 5


@register(
    "q_knn_graph_stats",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM scored
      ) WHERE rk <= {_KG_K}
    ),
    mutual AS (
      SELECT COUNT(*) AS n_mutual
      FROM knn a JOIN knn b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src < a.dst
    ),
    indeg AS (
      SELECT dst, COUNT(*) AS d FROM knn GROUP BY dst
    ),
    nodes AS (SELECT COUNT(*) AS n_nodes FROM e)
    SELECT n_nodes,
           (SELECT COUNT(*) FROM knn) AS n_directed,
           (SELECT n_mutual FROM mutual) AS n_mutual,
           round((SELECT n_mutual FROM mutual) * 2.0
                 / (SELECT COUNT(*) FROM knn), 6) AS reciprocity,
           (SELECT MAX(d) FROM indeg) AS max_indegree,
           (SELECT COUNT(*) FROM (
              SELECT e2.vec_id FROM e e2
              LEFT JOIN indeg i ON i.dst = e2.vec_id WHERE i.dst IS NULL
           )) AS n_never_retrieved
    FROM nodes
    """,
)
def q_knn_graph_stats(spark, sf_dir):
    """Embedding eval — the 5-NN digraph's shape: reciprocity (mutual
    neighbor fraction — low reciprocity + high max in-degree = HUBNESS,
    the high-dimensional failure mode where a few vectors crowd
    everyone's neighbor lists) and the never-retrieved count (its dual:
    vectors no one points at — unreachable by graph-walk retrieval).
    The exact kernel scores pairs once and ranks per source (the
    q_knn_accuracy shape); summary stats are tiny aggs."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", similarity.as_double(F.col("embedding")).alias("v"))
    knn = similarity.knn_edges_exact(e, k=_KG_K, vec="v", key="vec_id")
    # ONE scoring pass: the O(n²) cosine kernel materializes here once;
    # every downstream stat reads the stored edge blocks (round-2 shipped a
    # 5-action ladder that re-ran the kernel per action — 4× the wall time)
    knn = knn.localCheckpoint()
    return _knn_graph_summary(e, knn)


def _knn_graph_summary(e, knn):
    """All graph-shape stats in ONE returned DataFrame (single action):
    three 1-row aggregates cross-joined — no collect, no count ladder."""
    knn_rev = knn.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    directed = knn.agg(F.count(F.lit(1)).alias("n_directed"))
    mutual = (
        knn.join(knn_rev, ["src", "dst"], "leftsemi")
        .filter(F.col("src") < F.col("dst"))
        .agg(F.count(F.lit(1)).alias("n_mutual"))
    )
    indeg = knn.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    nodes = (
        e.select("vec_id")
        .join(indeg, e.vec_id == indeg.dst, "left")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("d").alias("max_indegree"),
            F.count(F.when(F.col("d").isNull(), 1)).alias("n_never_retrieved"),
        )
    )
    return nodes.crossJoin(directed).crossJoin(mutual).select(
        "n_nodes",
        "n_directed",
        "n_mutual",
        F.round(F.col("n_mutual") * 2.0 / F.col("n_directed"), 6).alias(
            "reciprocity"
        ),
        "max_indegree",
        "n_never_retrieved",
    )


@register("q_knn_graph_lsh", None)
def q_knn_graph_lsh(spark, sf_dir):
    """Embedding eval, production path — the same 5-NN graph summary with
    candidate generation through multi-table sign-LSH buckets instead of
    the all-pairs kernel (the q_knn_graph_stats form stays eval-only, the
    exact/approx split q_cosine_topk vs q_cosine_topk_lsh already uses).
    Candidates come from hash-partitioned equi-joins on bucket ids, so at
    100 TB the scored-pair count is corpus·bucket_occupancy, not corpus².
    Rows-only: approximate by construction (recall floor asserted in
    tests/test_similarity.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", similarity.as_double(F.col("embedding")).alias("v"))
    knn = similarity.knn_edges_lsh(
        e, k=_KG_K, vec="v", key="vec_id", n_planes=4, n_tables=8
    ).localCheckpoint()
    return _knn_graph_summary(e, knn)


@register(
    "q_pii_density",
    f"""
    WITH scrub AS (
      SELECT source, length(t) AS n_chars,
             len(regexp_extract_all(t, '{decontam.EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(
                 regexp_replace(t, '{decontam.EMAIL_RE}', '<EMAIL>', 'g'),
                 '{decontam.PHONE_RE}')) AS n_phones
      FROM (SELECT doc_id, source, {_SQL_PII_TEXT} AS t FROM documents) src
    )
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(n_emails) AS n_emails,
           SUM(n_phones) AS n_phones,
           round((SUM(n_emails) + SUM(n_phones)) * 1000.0 / SUM(n_chars), 6)
             AS pii_per_1k_chars
    FROM scrub GROUP BY source
    """,
)
def q_pii_density(spark, sf_dir):
    """Governance — PII density per source: detected emails/phones per
    1000 characters (q_pii_scrub's detector rolled up to the
    acquisition decision grain — a source with 10× the PII density
    needs different handling before it enters a training mix). Narrow
    regex counting + one |sources|-row agg."""
    docs = _docs(spark, sf_dir).withColumn(
        "t",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    # reuse the proven detector (F.lit-wrapped REs — embedding the
    # patterns in an expr string mangles the phone RE's escapes)
    counts = decontam.pii_scrub(docs.withColumn("text", F.col("t")))
    scrub = docs.select("doc_id", "source", F.length("t").alias("n_chars")).join(
        counts.select("doc_id", "n_emails", "n_phones"), "doc_id"
    )
    return scrub.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.round(
            (F.sum("n_emails") + F.sum("n_phones")) * 1000.0 / F.sum("n_chars"),
            6,
        ).alias("pii_per_1k_chars"),
    )
