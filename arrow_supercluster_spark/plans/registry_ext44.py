"""Round-2 registry additions, batch 39 — corpus-growth and attribution
analytics:

- q_ngram_novelty: per-document novelty — the fraction of its word
  3-grams that FIRST appear in it (doc-id order): the data-value attribution
  signal behind dedup-aware acquisition;
- q_heaps_law: vocabulary-growth curve (cumulative distinct tokens per
  corpus decile) + the Heaps'-law log-log slope;
- q_stylometry_delta: Burrows' Delta between sources over the top-20
  tokens — the stylometric distance used for authorship/domain drift.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

# ===========================================================================
# N-gram novelty
# ===========================================================================

_SQL_GRAMS3 = f"""
    list_distinct(list_filter(
      list_transform(
        generate_series(0, greatest(len({SQL_TOKS}) - 3, 0)),
        i -> array_to_string(list_slice({SQL_TOKS}, i + 1, i + 3), ' ')
      ), s -> s != ''))
"""


@register(
    "q_ngram_novelty",
    f"""
    WITH g AS (
      SELECT doc_id, unnest({_SQL_GRAMS3}) AS gram FROM documents
    ),
    first_seen AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
    ),
    per_doc AS (
      SELECT g.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM g JOIN first_seen f USING (gram)
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, n_novel,
           round(n_novel * 1.0 / n_grams, 6) AS novelty
    FROM per_doc
    """,
)
def q_ngram_novelty(spark, sf_dir):
    """Pipeline — n-gram NOVELTY attribution: for each document (in
    doc-id ingestion order), the fraction of its distinct word-3-grams
    that first appear in it — 1.0 = all-new content, →0 = re-hash of
    what the corpus already holds. This is the marginal-value signal
    behind dedup-aware data acquisition (buy/crawl what adds novelty).
    Plan: distinct grams in-row, one gram-keyed min-agg for first
    occurrence (the only wide shuffle, carrying grams once), one
    doc-keyed count — no pair joins anywhere."""
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))

    def inner(arr):
        n = F.size(arr)
        idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
        return F.transform(idx, lambda i: F.array_join(F.slice(arr, i + 1, 3), " "))

    grams = F.array_distinct(
        F.filter(
            F.element_at(F.transform(F.array(toks), inner), 1),
            lambda s: s != F.lit(""),
        )
    )
    g = docs.select("doc_id", F.explode(grams).alias("gram"))
    first = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        g.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("int")
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id", "n_grams", "n_novel",
        F.round(F.col("n_novel") * 1.0 / F.col("n_grams"), 6).alias("novelty"),
    )


# ===========================================================================
# Heaps' law
# ===========================================================================

@register(
    "q_heaps_law",
    f"""
    WITH t AS (
      SELECT doc_id, unnest(list_distinct(list_filter({SQL_TOKS}, x -> x != '')))
               AS tok
      FROM documents
    ),
    first_seen AS (SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY tok),
    n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
    decile_vocab AS (
      SELECT CAST(least(floor(first_doc * 10.0 / n_docs), 9) AS INTEGER) + 1
               AS decile,
             COUNT(*) AS new_types
      FROM first_seen CROSS JOIN n GROUP BY 1
    )
    SELECT decile, new_types,
           CAST(SUM(new_types) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_size
    FROM decile_vocab
    """,
)
def q_heaps_law(spark, sf_dir):
    """Corpus growth — Heaps'-law curve: cumulative distinct-token
    (vocabulary) count after each decile of the corpus in ingestion
    order — sub-linear growth (V ∝ nᵝ, β<1) is the natural-language
    signature, and the curve's flattening is the 'diminishing novelty'
    readout at acquisition time (q_ngram_novelty's aggregate view).
    One token-keyed min-agg for first occurrence, a 10-row decile agg,
    and a 10-row cumulative window."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    toks = F.array_distinct(
        F.filter(tokenize(F.col("text")), lambda x: x != F.lit(""))
    )
    t = docs.select("doc_id", F.explode(toks).alias("tok"))
    first = t.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    decile = (
        F.least(F.floor(F.col("first_doc") * 10.0 / n_docs), F.lit(9)).cast("int")
        + 1
    )
    dv = first.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dv.select(
        "decile", "new_types",
        F.sum("new_types").over(w).cast("long").alias("vocab_size"),
    )


# ===========================================================================
# Burrows' Delta
# ===========================================================================

_STYLO_TOP = 20


@register(
    "q_stylometry_delta",
    f"""
    WITH toks AS (
      SELECT source, unnest(list_filter({SQL_TOKS}, x -> x != '')) AS tok
      FROM documents
    ),
    src_len AS (SELECT source, COUNT(*) AS n_toks FROM toks GROUP BY 1),
    top AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= {_STYLO_TOP}
    ),
    freq AS (
      SELECT t.source, t.tok, COUNT(*) * 1.0 / ANY_VALUE(s.n_toks) AS f
      FROM toks t JOIN top USING (tok) JOIN src_len s ON s.source = t.source
      GROUP BY t.source, t.tok
    ),
    grid AS (
      SELECT s.source, top.tok, coalesce(f.f, 0.0) AS f
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN top
      LEFT JOIN freq f ON f.source = s.source AND f.tok = top.tok
    ),
    stats AS (
      SELECT tok, AVG(f) AS mu, stddev_samp(f) AS sd FROM grid GROUP BY tok
    ),
    z AS (
      SELECT g.source, g.tok,
             CASE WHEN s.sd > 0 THEN (g.f - s.mu) / s.sd ELSE 0.0 END AS z
      FROM grid g JOIN stats s USING (tok)
    )
    SELECT a.source AS src_a, b.source AS src_b,
           round(AVG(abs(a.z - b.z)), 6) AS delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q_stylometry_delta(spark, sf_dir):
    """Stylometry — Burrows' Delta between sources: z-score each
    source's relative frequency of the corpus's top-{t} tokens, Delta =
    mean |z difference| per source pair — the standard authorship /
    register-drift distance (a source whose function-word profile
    diverges is a different text population, whatever its label says).
    Everything after the token agg runs on |sources|×{t} rows; the pair
    join is over that tiny grid.""".format(t=_STYLO_TOP)
    docs = _docs(spark, sf_dir)
    toks_col = F.filter(tokenize(F.col("text")), lambda x: x != F.lit(""))
    toks = docs.select("source", F.explode(toks_col).alias("tok"))
    src_len = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_toks"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "tok"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= _STYLO_TOP)
        .select("tok")
    )
    freq = (
        toks.join(F.broadcast(top), "tok")
        .join(F.broadcast(src_len), "source")
        .groupBy("source", "tok")
        .agg((F.count(F.lit(1)) * 1.0 / F.first("n_toks")).alias("f"))
    )
    grid = (
        docs.select("source")
        .distinct()
        .crossJoin(F.broadcast(top))
        .join(freq, ["source", "tok"], "left")
        .select("source", "tok", F.coalesce("f", F.lit(0.0)).alias("f"))
    )
    stats = grid.groupBy("tok").agg(
        F.avg("f").alias("mu"), F.stddev_samp("f").alias("sd")
    )
    z = grid.join(F.broadcast(stats), "tok").select(
        "source", "tok",
        F.when(F.col("sd") > 0, (F.col("f") - F.col("mu")) / F.col("sd"))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    a = z.select(F.col("source").alias("src_a"), "tok", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("src_b"), "tok", F.col("z").alias("zb"))
    return (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"))
    )
