"""Round-4 registry additions, batch 80 — corpus economics + FIM prep:

- q_theil_index: Theil T inequality of document lengths, decomposed
  into within-source and between-source terms (T = T_within +
  T_between holds exactly) — the decomposable alternative to q_gini
  for "which sources drive corpus concentration";
- q_jsd_sources: pairwise Jensen-Shannon divergence between sources'
  language distributions — the SYMMETRIC, bounded sibling of
  q_source_lang_kl (JSD ∈ [0, ln 2]); one tiny |sources|² frame;
- q_fim_split: fill-in-the-middle prefix/middle/suffix splits with
  deterministic per-doc pivot draws (portable Lehmer arithmetic, the
  q_temperature_mix pattern) — the FIM transform every code-model
  pipeline applies, as pure substring arithmetic.

All oracle-checked; logs rounded at 6 on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table

_H_MULT, _H_MOD = 48271, 65537  # portable Lehmer draw (same as ext83)


@register(
    "q_theil_index",
    """
    WITH d AS (
      SELECT source, n_chars * 1.0 AS x FROM documents WHERE n_chars > 0
    ),
    tot AS (SELECT COUNT(*) AS n, AVG(x) AS mu FROM d),
    per_src AS (
      SELECT source, COUNT(*) AS n_g, AVG(x) AS mu_g
      FROM d GROUP BY source
    ),
    within AS (
      SELECT d.source,
             SUM(x / (n_g * mu_g) * ln(x / mu_g)) AS t_g
      FROM d JOIN per_src USING (source)
      GROUP BY d.source, n_g, mu_g
    )
    SELECT round(SUM(p.n_g * p.mu_g / (t.n * t.mu) * w.t_g), 6)
             AS t_within,
           round(SUM(p.n_g * p.mu_g / (t.n * t.mu)
                     * ln(p.mu_g / t.mu)), 6) AS t_between,
           round(SUM(p.n_g * p.mu_g / (t.n * t.mu) * w.t_g)
                 + SUM(p.n_g * p.mu_g / (t.n * t.mu)
                       * ln(p.mu_g / t.mu)), 6) AS t_total
    FROM per_src p JOIN within w USING (source) CROSS JOIN tot t
    GROUP BY t.n, t.mu
    """,
)
def q_theil_index(spark, sf_dir):
    """Corpus economics — Theil T index of document-length inequality
    with its exact within/between-source decomposition (T_total =
    T_within + T_between, the property Gini lacks): says not just HOW
    concentrated the corpus is but WHERE — inside sources or across
    them. One doc-keyed agg per term, everything after runs on
    |sources| rows; shares computed in identical association on both
    engines (rounded at 6)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    d = docs.select("source", (F.col("n_chars") * 1.0).alias("x"))
    tot = d.agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("mu")
    )
    dt = d.crossJoin(F.broadcast(tot))
    per_src = dt.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.avg("x").alias("mu_g"),
        F.first("n").alias("n"),
        F.first("mu").alias("mu"),
    )
    within = (
        dt.join(
            F.broadcast(per_src.select("source", "n_g", "mu_g")), "source"
        )
        .groupBy("source", "n_g", "mu_g")
        .agg(
            F.sum(
                F.col("x") / (F.col("n_g") * F.col("mu_g"))
                * F.log(F.col("x") / F.col("mu_g"))
            ).alias("t_g")
        )
        .select("source", "t_g")
    )
    joined = per_src.join(F.broadcast(within), "source")
    share = F.col("n_g") * F.col("mu_g") / (F.col("n") * F.col("mu"))
    return joined.groupBy("n", "mu").agg(
        F.round(F.sum(share * F.col("t_g")), 6).alias("t_within"),
        F.round(
            F.sum(share * F.log(F.col("mu_g") / F.col("mu"))), 6
        ).alias("t_between"),
        F.round(
            F.sum(share * F.col("t_g"))
            + F.sum(share * F.log(F.col("mu_g") / F.col("mu"))),
            6,
        ).alias("t_total"),
    ).drop("n", "mu")


@register(
    "q_jsd_sources",
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, SUM(n) AS tn FROM c GROUP BY 1),
    p AS (
      SELECT c.source, c.lang, c.n * 1.0 / t.tn AS p
      FROM c JOIN tot t USING (source)
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             coalesce(pa.p, 0.0) AS pa, coalesce(pb.p, 0.0) AS pb
      FROM (SELECT DISTINCT source FROM documents) a
      JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
      CROSS JOIN (SELECT DISTINCT lang FROM documents) l
      LEFT JOIN p pa ON pa.source = a.source AND pa.lang = l.lang
      LEFT JOIN p pb ON pb.source = b.source AND pb.lang = l.lang
    )
    SELECT src_a, src_b,
           round(SUM(
             CASE WHEN pa > 0
                  THEN 0.5 * pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
             + CASE WHEN pb > 0
                    THEN 0.5 * pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END
           ), 6) AS jsd
    FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_jsd_sources(spark, sf_dir):
    """Distribution profiling — pairwise Jensen-Shannon divergence
    between sources' language mixes: the symmetric, always-finite
    sibling of q_source_lang_kl (KL explodes on disjoint support; JSD
    is bounded by ln 2), the standard "how different are two corpus
    slices" number. The corpus collapses to a |sources|×|langs| count
    table in one agg; the pairwise frame is |sources|²·|langs| tiny
    rows, broadcast throughout."""
    docs = read_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("tn"))
    p = c.join(tot, "source").select(
        "source", "lang", (F.col("n") * 1.0 / F.col("tn")).alias("p")
    )
    srcs = docs.select("source").distinct()
    langs = docs.select("lang").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("src_b"))),
            F.col("src_a") < F.col("src_b"),
        )
        .crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(
                p.select(
                    F.col("source").alias("src_a"), "lang",
                    F.col("p").alias("pa"),
                )
            ),
            ["src_a", "lang"],
            "left",
        )
        .join(
            F.broadcast(
                p.select(
                    F.col("source").alias("src_b"), "lang",
                    F.col("p").alias("pb"),
                )
            ),
            ["src_b", "lang"],
            "left",
        )
        .select(
            "src_a", "src_b",
            F.coalesce(F.col("pa"), F.lit(0.0)).alias("pa"),
            F.coalesce(F.col("pb"), F.lit(0.0)).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = (
        F.when(F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m))
        .otherwise(0.0)
        + F.when(F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m))
        .otherwise(0.0)
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.round(F.sum(term), 6).alias("jsd"))
        .orderBy("src_a", "src_b")
    )


@register(
    "q_fim_split",
    f"""
    WITH base AS (
      SELECT doc_id, text, length(text) AS n,
             ((doc_id + 1) * {_H_MULT} % {_H_MOD}) AS h1,
             ((doc_id + 1) * {_H_MULT} % {_H_MOD}) * {_H_MULT} % {_H_MOD}
               AS h2
      FROM documents WHERE length(text) >= 20
    ),
    cuts AS (
      SELECT doc_id, text, n,
             1 + CAST(floor((h1 % 1000) * 1.0 / 1000 * (n // 2)) AS BIGINT) AS c1,
             1 + (n // 2)
               + CAST(floor((h2 % 1000) * 1.0 / 1000 * (n - n // 2 - 1))
                      AS BIGINT) AS c2
      FROM base
    )
    SELECT doc_id,
           length(substr(text, 1, c1 - 1)) AS n_prefix,
           length(substr(text, c1, c2 - c1)) AS n_middle,
           length(substr(text, c2)) AS n_suffix,
           substr(text, 1, 12) AS prefix_head,
           substr(text, c1, 12) AS middle_head
    FROM cuts
    """,
)
def q_fim_split(spark, sf_dir):
    """Training-data prep — fill-in-the-middle (FIM) splits: each doc is
    cut into (prefix, middle, suffix) at two deterministic pivots drawn
    with portable Lehmer arithmetic (c1 uniform over the first half, c2
    over the second — so the middle is never empty and the split is
    reproducible across engines and runs, the property a FIM pipeline
    needs for stable epochs). Pure substring arithmetic, narrow
    projection, no shuffle; lengths must sum back to n (invariant
    checked by the oracle via the three length columns)."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.filter(F.length("text") >= 20).select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        ((F.col("doc_id") + 1) * _H_MULT % _H_MOD).alias("h1"),
        (((F.col("doc_id") + 1) * _H_MULT % _H_MOD) * _H_MULT % _H_MOD)
        .alias("h2"),
    )
    half = F.floor(F.col("n") / 2)
    # floor() explicitly on BOTH engines: DuckDB's double->BIGINT cast
    # ROUNDS half-away while Spark's truncates -- without the floor the
    # pivots disagree by one on half the docs
    c1 = (
        1
        + F.floor((F.col("h1") % 1000) * 1.0 / 1000 * half).cast("long")
    ).alias("c1")
    c2 = (
        1
        + half
        + F.floor(
            (F.col("h2") % 1000) * 1.0 / 1000 * (F.col("n") - half - 1)
        ).cast("long")
    ).alias("c2")
    cuts = base.select("doc_id", "text", "n", c1, c2)
    return cuts.select(
        "doc_id",
        F.length(F.expr("substr(text, 1, c1 - 1)")).alias("n_prefix"),
        F.length(F.expr("substr(text, c1, c2 - c1)")).alias("n_middle"),
        F.length(F.expr("substr(text, c2)")).alias("n_suffix"),
        F.expr("substr(text, 1, 12)").alias("prefix_head"),
        F.expr("substr(text, c1, 12)").alias("middle_head"),
    )
