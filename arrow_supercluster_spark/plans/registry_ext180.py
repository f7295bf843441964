"""Round-7 registry additions, batch 175 — generation-eval and
annotation-quality metrics (what a training pipeline runs AFTER the
model exists, over engine-scale eval corpora):

- q_bleu_corpus: corpus-level BLEU per source between each document
  (reference) and a deterministic degraded candidate (every 7th token
  dropped) — modified n-gram precisions n=1..4 with per-doc clipping,
  corpus brevity penalty, geometric mean. The canonical MT/eval-suite
  metric, expressed as gram-keyed joins + source aggregates.
- q_rouge_n: ROUGE-1/ROUGE-2 per source over the same pairs —
  macro-averaged per-doc recall / precision / F1 on clipped n-gram
  matches (the summarization-eval counterpart of BLEU's
  micro-averaged precision).
- q_cohen_kappa: inter-annotator agreement per source — annotator A
  buckets documents by length (fixed literal cut points), annotator B
  is A with a deterministic ~20% hash-flip; observed vs chance
  agreement, kappa = (po − pe)/(1 − pe). THE label-quality gate of
  every human-annotation pipeline.
- q_kripp_alpha: Krippendorff's alpha (nominal, 2 raters) over the
  same ratings — 1 − Do/De from the coincidence-matrix identities
  (Do = 2·disagreements/n, De = (n² − Σ n_c²)/(n(n−1)), n = 2N
  ratings), the agreement coefficient that generalizes kappa.
- q_icc_oneway: intraclass correlation ICC(1,1) per source over 3
  deterministic synthetic raters per doc (shared Lehmer base +
  rater-keyed noise) — one-way ANOVA mean squares, the continuous-
  rating counterpart of kappa.
- q_calibration_curve: the reliability diagram behind q_ece — 10
  equal-width score bins × (count, mean predicted, empirical rate,
  |gap|), per-user purchase labels and a Lehmer-hash score (the
  q_isotonic_calibration derivation).

At 100 TB: BLEU/ROUGE shuffle (doc_id, gram) count frames — grams
hash-distribute, text never moves after tokenization, and the per-
source reductions are partial-aggregated; kappa/alpha/ICC/calibration
are pure one-or-two-level aggregates (map-side combine, bounded
output). No collects, no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.decontam import _ngram_expr
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

# every 7th token dropped (1-based) — the deterministic "candidate"
_CAND_DROP = 7
_BLEU_MAX_N = 4

# DuckDB candidate token list (1-based lambda index)
_SQL_CAND = f"list_filter({SQL_TOKS}, (x, i) -> i % {_CAND_DROP} != 0)"


def _cand_toks():
    # Spark filter lambda index is 0-based: keep (i+1) % 7 != 0
    return F.filter(
        tokenize(F.col("text")),
        lambda x, i: (i + 1) % _CAND_DROP != 0,
    )


def _sql_gram_counts(toks_expr: str, n: int, alias: str) -> str:
    """Per-(doc, gram) counts CTE body over a token-list expression."""
    return f"""
      SELECT doc_id, source, g, CAST(COUNT(*) AS BIGINT) AS {alias}
      FROM (
        SELECT doc_id, source,
               unnest(list_transform(
                 generate_series(1, len(toks) - {n} + 1),
                 i -> array_to_string(toks[i:i+{n}-1], ' '))) AS g
        FROM (SELECT doc_id, source, {toks_expr} AS toks FROM documents) t
        WHERE len(toks) >= {n}
      ) GROUP BY 1, 2, 3"""


def _gram_counts(df, toks_col, n: int, alias: str):
    """Spark mirror of _sql_gram_counts: per-(doc, source, gram) counts."""
    return (
        df.select(
            "doc_id", "source",
            F.explode(_ngram_expr(toks_col, n)).alias("g"),
        )
        .groupBy("doc_id", "source", "g")
        .agg(F.count(F.lit(1)).alias(alias))
    )


# ===========================================================================
# R522 — corpus BLEU per source
# ===========================================================================

def _sql_bleu_n(n: int) -> str:
    return f"""
    c{n} AS ({_sql_gram_counts(_SQL_CAND, n, 'cc')}),
    r{n} AS ({_sql_gram_counts(SQL_TOKS, n, 'rc')}),
    m{n} AS (
      SELECT c.source,
             CAST(SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS BIGINT) AS match,
             CAST(SUM(c.cc) AS BIGINT) AS total
      FROM c{n} c LEFT JOIN r{n} r
        ON r.doc_id = c.doc_id AND r.g = c.g
      GROUP BY 1
    )"""


_BLEU_SQL = (
    "WITH "
    + ",".join(_sql_bleu_n(n) for n in range(1, _BLEU_MAX_N + 1))
    + f""",
    lens AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({SQL_TOKS})) AS BIGINT) AS ref_len,
             CAST(SUM(len({_SQL_CAND})) AS BIGINT) AS cand_len
      FROM documents GROUP BY 1
    ),
    joined AS (
      SELECT lens.source, lens.n_docs, lens.ref_len, lens.cand_len,
             {', '.join(
                 f'm{n}.match * 1.0 / m{n}.total AS p{n}'
                 for n in range(1, _BLEU_MAX_N + 1))}
      FROM lens
      {' '.join(f'JOIN m{n} ON m{n}.source = lens.source'
                for n in range(1, _BLEU_MAX_N + 1))}
    )
    SELECT source, n_docs,
           {', '.join(f'round(p{n}, 6) AS p{n}'
                      for n in range(1, _BLEU_MAX_N + 1))},
           round(LEAST(1.0, exp(1.0 - ref_len * 1.0 / cand_len)), 6)
             AS brevity_penalty,
           round(CASE WHEN p1 * p2 * p3 * p4 = 0 THEN 0.0
                      ELSE LEAST(1.0, exp(1.0 - ref_len * 1.0 / cand_len))
                           * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4))
                                 / {_BLEU_MAX_N})
                 END, 6) AS bleu
    FROM joined ORDER BY source
    """
)


@register("q_bleu_corpus", _BLEU_SQL)
def q_bleu_corpus(spark, sf_dir):
    """R522 — corpus BLEU per source: candidate = reference with every
    7th token dropped.  Clipped modified precisions p1..p4 are gram-
    keyed joins of per-(doc, gram) count frames — grams hash-
    distribute, so the heavy stage is an equi-join + partial-aggregated
    source rollup; the BP and geometric mean are 20-row arithmetic.
    Both engines form p_n as ratios of identical BIGINT sums, so
    ln/exp see bit-identical inputs and round-6 absorbs libm ulps."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source",
        tokenize(F.col("text")).alias("rt"),
        _cand_toks().alias("ct"),
    )
    parts = None
    for n in range(1, _BLEU_MAX_N + 1):
        c = _gram_counts(docs, "ct", n, "cc")
        r = _gram_counts(docs, "rt", n, "rc")
        m = (
            c.join(r.select("doc_id", "g", "rc"), ["doc_id", "g"], "left")
            .groupBy("source")
            .agg(
                F.sum(
                    F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0)))
                ).alias("match"),
                F.sum("cc").alias("total"),
            )
            .select(
                "source",
                (F.col("match") / F.col("total")).alias(f"p{n}"),
            )
        )
        parts = m if parts is None else parts.join(m, "source")
    lens = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("rt")).alias("ref_len"),
        F.sum(F.size("ct")).alias("cand_len"),
    )
    j = lens.join(parts, "source")
    bp = F.least(
        F.lit(1.0), F.exp(1.0 - F.col("ref_len") / F.col("cand_len"))
    )
    prod = F.col("p1") * F.col("p2") * F.col("p3") * F.col("p4")
    logsum = sum(
        F.log(F.col(f"p{n}")) for n in range(2, _BLEU_MAX_N + 1)
    ) + F.log(F.col("p1"))
    return j.select(
        "source", "n_docs",
        *[F.round(F.col(f"p{n}"), 6).alias(f"p{n}")
          for n in range(1, _BLEU_MAX_N + 1)],
        F.round(bp, 6).alias("brevity_penalty"),
        F.round(
            F.when(prod == 0, F.lit(0.0)).otherwise(
                bp * F.exp(logsum / _BLEU_MAX_N)
            ),
            6,
        ).alias("bleu"),
    ).orderBy("source")


# ===========================================================================
# R523 — ROUGE-1 / ROUGE-2 per source (macro-averaged)
# ===========================================================================

def _sql_rouge_n(n: int) -> str:
    return f"""
    rc{n} AS ({_sql_gram_counts(_SQL_CAND, n, 'cc')}),
    rr{n} AS ({_sql_gram_counts(SQL_TOKS, n, 'rc')}),
    rd{n} AS (
      SELECT r.doc_id, r.source,
             SUM(LEAST(COALESCE(c.cc, 0), r.rc)) * 1.0 / SUM(r.rc)
               AS rec,
             SUM(LEAST(COALESCE(c.cc, 0), r.rc)) * 1.0
               / NULLIF((SELECT SUM(cc) FROM rc{n} c2
                         WHERE c2.doc_id = r.doc_id), 0) AS prec
      FROM rr{n} r LEFT JOIN rc{n} c
        ON c.doc_id = r.doc_id AND c.g = r.g
      GROUP BY 1, 2
    ),
    rs{n} AS (
      SELECT source, CAST({n} AS INTEGER) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             round(AVG(rec), 6) AS rouge_recall,
             round(AVG(COALESCE(prec, 0.0)), 6) AS rouge_precision,
             round(AVG(CASE WHEN COALESCE(prec, 0.0) + rec = 0 THEN 0.0
                            ELSE 2 * COALESCE(prec, 0.0) * rec
                                 / (COALESCE(prec, 0.0) + rec) END), 6)
               AS rouge_f1
      FROM rd{n} GROUP BY 1
    )"""


_ROUGE_SQL = (
    "WITH "
    + ",".join(_sql_rouge_n(n) for n in (1, 2))
    + """
    SELECT * FROM rs1 UNION ALL SELECT * FROM rs2
    ORDER BY source, n
    """
)


@register("q_rouge_n", _ROUGE_SQL)
def q_rouge_n(spark, sf_dir):
    """R523 — ROUGE-1/2 per source, macro-averaged per-doc clipped
    recall/precision/F1 over the same reference/candidate pairs as
    q_bleu_corpus.  Per-doc ratios divide identical BIGINT counts, so
    the only cross-engine surface is the AVG summation order —
    absorbed by round-6."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source",
        tokenize(F.col("text")).alias("rt"),
        _cand_toks().alias("ct"),
    )
    outs = []
    for n in (1, 2):
        c = _gram_counts(docs, "ct", n, "cc")
        r = _gram_counts(docs, "rt", n, "rc")
        ctot = c.groupBy("doc_id").agg(F.sum("cc").alias("ctot"))
        per_doc = (
            r.join(c.select("doc_id", "g", "cc"), ["doc_id", "g"], "left")
            .groupBy("doc_id", "source")
            .agg(
                F.sum(
                    F.least(F.coalesce(F.col("cc"), F.lit(0)), F.col("rc"))
                ).alias("match"),
                F.sum("rc").alias("rtot"),
            )
            .join(ctot, "doc_id", "left")
            .select(
                "source",
                (F.col("match") / F.col("rtot")).alias("rec"),
                F.when(
                    F.coalesce(F.col("ctot"), F.lit(0)) == 0, F.lit(None)
                )
                .otherwise(F.col("match") / F.col("ctot"))
                .alias("prec"),
            )
        )
        prec0 = F.coalesce(F.col("prec"), F.lit(0.0))
        outs.append(
            per_doc.groupBy("source").agg(
                F.lit(n).cast("int").alias("n"),
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("rec"), 6).alias("rouge_recall"),
                F.round(F.avg(prec0), 6).alias("rouge_precision"),
                F.round(
                    F.avg(
                        F.when(prec0 + F.col("rec") == 0, F.lit(0.0))
                        .otherwise(
                            2 * prec0 * F.col("rec")
                            / (prec0 + F.col("rec"))
                        )
                    ),
                    6,
                ).alias("rouge_f1"),
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("source", "n")


# ===========================================================================
# R524/R525 — annotator agreement: Cohen's kappa + Krippendorff alpha
# ===========================================================================

# annotator A: fixed length buckets (sf-independent literal cut points,
# near the corpus quartiles); annotator B: A with a ~20% hash-flip
_KAPPA_CUTS = (180, 300, 420)
_SQL_RATE_A = (
    "CASE WHEN n_chars < 180 THEN 0 WHEN n_chars < 300 THEN 1 "
    "WHEN n_chars < 420 THEN 2 ELSE 3 END"
)
_SQL_RATE_B = (
    f"CASE WHEN (doc_id * 2654435761) % 97 < 19 "
    f"THEN (({_SQL_RATE_A}) + 1 + doc_id % 3) % 4 ELSE {_SQL_RATE_A} END"
)


def _rate_a():
    return (
        F.when(F.col("n_chars") < _KAPPA_CUTS[0], 0)
        .when(F.col("n_chars") < _KAPPA_CUTS[1], 1)
        .when(F.col("n_chars") < _KAPPA_CUTS[2], 2)
        .otherwise(3)
    )


def _rate_b():
    return F.when(
        (F.col("doc_id") * 2654435761) % 97 < 19,
        (_rate_a() + 1 + F.col("doc_id") % 3) % 4,
    ).otherwise(_rate_a())


@register(
    "q_cohen_kappa",
    f"""
    WITH rated AS (
      SELECT source, {_SQL_RATE_A} AS a, {_SQL_RATE_B} AS b
      FROM documents
    ),
    base AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
               AS agree
      FROM rated GROUP BY 1
    ),
    ma AS (SELECT source, a AS k, COUNT(*) AS na FROM rated GROUP BY 1, 2),
    mb AS (SELECT source, b AS k, COUNT(*) AS nb FROM rated GROUP BY 1, 2),
    pe AS (
      SELECT ma.source, CAST(SUM(na * nb) AS BIGINT) AS ss
      FROM ma JOIN mb ON mb.source = ma.source AND mb.k = ma.k
      GROUP BY 1
    )
    SELECT b.source, b.n AS n_docs,
           round(b.agree * 1.0 / b.n, 6) AS po,
           round(pe.ss * 1.0 / (b.n * b.n), 6) AS pe,
           round((b.agree * 1.0 / b.n - pe.ss * 1.0 / (b.n * b.n))
                 / NULLIF(1.0 - pe.ss * 1.0 / (b.n * b.n), 0), 6)
             AS kappa
    FROM base b JOIN pe ON pe.source = b.source
    ORDER BY b.source
    """,
)
def q_cohen_kappa(spark, sf_dir):
    """R524 — Cohen's kappa per source: po = agreements/n, pe =
    Σ_k na_k·nb_k / n² from the two category-marginal frames joined on
    (source, category).  Distributed: three partial-aggregated
    groupBys over a ≤4-value category domain — marginal frames are
    tiny, the join is broadcast-sized, text never moves."""
    docs = _docs(spark, sf_dir).select(
        "source", _rate_a().alias("a"), _rate_b().alias("b")
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("a") == F.col("b"), 1).otherwise(0)
        ).alias("agree"),
    )
    ma = docs.groupBy("source", F.col("a").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mb = docs.groupBy("source", F.col("b").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    pe_f = (
        ma.join(mb, ["source", "k"])
        .groupBy("source")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("ss"))
    )
    po = F.col("agree") * 1.0 / F.col("n")
    pe = F.col("ss") * 1.0 / (F.col("n") * F.col("n"))
    return (
        base.join(pe_f, "source")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.round(
                (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6
            ).alias("kappa"),
        )
        .orderBy("source")
    )


@register(
    "q_kripp_alpha",
    f"""
    WITH rated AS (
      SELECT {_SQL_RATE_A} AS a, {_SQL_RATE_B} AS b FROM documents
    ),
    vals AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS nc FROM (
        SELECT a AS v FROM rated UNION ALL SELECT b FROM rated
      ) GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT)
               AS disagree
      FROM rated
    ),
    de AS (
      SELECT (SUM(nc) * SUM(nc) - SUM(nc * nc)) * 1.0
             / (SUM(nc) * (SUM(nc) - 1)) AS d_e
      FROM vals
    )
    SELECT t.n_units, t.disagree,
           round(t.disagree * 1.0 / t.n_units, 6) AS d_o,
           round(de.d_e, 6) AS d_e,
           round(1.0 - (t.disagree * 1.0 / t.n_units) / de.d_e, 6)
             AS alpha
    FROM tot t CROSS JOIN de
    """,
)
def q_kripp_alpha(spark, sf_dir):
    """R525 — Krippendorff's alpha, nominal / 2 complete raters.  For
    this design the coincidence matrix collapses to closed forms:
    Do = disagreeing units / N (each unit contributes 2 ordered pairs,
    2/2N per disagreement) and De = (n² − Σ nc²)/(n(n−1)) with n = 2N
    pooled ratings.  Three global aggregates — nothing shuffles but
    4-row value counts."""
    docs = _docs(spark, sf_dir).select(
        _rate_a().alias("a"), _rate_b().alias("b")
    )
    vals = (
        docs.select(F.col("a").alias("v"))
        .unionAll(docs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("nc"))
        .agg(
            (
                (F.sum("nc") * F.sum("nc") - F.sum(F.col("nc") * F.col("nc")))
                * 1.0
                / (F.sum("nc") * (F.sum("nc") - 1))
            ).alias("d_e")
        )
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.when(F.col("a") != F.col("b"), 1).otherwise(0)).alias(
            "disagree"
        ),
    )
    return tot.crossJoin(F.broadcast(vals)).select(
        "n_units", "disagree",
        F.round(F.col("disagree") * 1.0 / F.col("n_units"), 6).alias("d_o"),
        F.round(F.col("d_e"), 6).alias("d_e"),
        F.round(
            1.0 - (F.col("disagree") * 1.0 / F.col("n_units")) / F.col("d_e"),
            6,
        ).alias("alpha"),
    )


# ===========================================================================
# R526 — one-way ICC(1,1) over 3 synthetic raters
# ===========================================================================

_ICC_K = 3

# rating(doc, r) = 10·Lehmer(doc) + (Lehmer(doc + 7919·r) − 0.5):
# a shared per-doc base plus rater-keyed noise, all integer-derived so
# both engines build bit-identical doubles
_SQL_RATING = (
    "10.0 * ((doc_id * 16807) % 2147483647) / 2147483647.0"
    " + (((doc_id + 7919 * r) * 48271) % 65537) / 65537.0 - 0.5"
)


@register(
    "q_icc_oneway",
    f"""
    WITH ratings AS (
      SELECT d.source, d.doc_id, r.r, {_SQL_RATING} AS x
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(1, {_ICC_K})) AS r) r
    ),
    per_doc AS (
      SELECT source, doc_id, AVG(x) AS mu,
             SUM(x * x) AS sxx, SUM(x) AS sx
      FROM ratings GROUP BY 1, 2
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(sx) / ({_ICC_K} * COUNT(*)) AS grand,
             SUM(sxx - sx * sx / {_ICC_K}) AS ssw,
             SUM(mu * mu) AS smm, SUM(mu) AS sm
      FROM per_doc GROUP BY 1
    )
    SELECT source, n_docs,
           round({_ICC_K} * (smm - sm * sm / n_docs) / (n_docs - 1), 6)
             AS msb,
           round(ssw / (n_docs * ({_ICC_K} - 1)), 6) AS msw,
           round(({_ICC_K} * (smm - sm * sm / n_docs) / (n_docs - 1)
                  - ssw / (n_docs * ({_ICC_K} - 1)))
                 / ({_ICC_K} * (smm - sm * sm / n_docs) / (n_docs - 1)
                    + ({_ICC_K} - 1) * ssw / (n_docs * ({_ICC_K} - 1))), 6)
             AS icc1
    FROM per_src ORDER BY source
    """,
)
def q_icc_oneway(spark, sf_dir):
    """R526 — ICC(1,1), one-way random effects, per source: MSB/MSW
    from the two-level (doc → source) aggregate of 3 deterministic
    ratings per doc.  Ratings are integer-derived (bit-identical
    across engines); mean squares use the Σx² − (Σx)²/k identity so
    each level is a single partial-aggregated groupBy."""
    docs = _docs(spark, sf_dir)
    raters = spark.range(1, _ICC_K + 1).select(F.col("id").alias("r"))
    x = (
        10.0 * ((F.col("doc_id") * 16807) % 2147483647) / 2147483647.0
        + (((F.col("doc_id") + 7919 * F.col("r")) * 48271) % 65537)
        / 65537.0
        - 0.5
    )
    ratings = docs.select("source", "doc_id").crossJoin(
        F.broadcast(raters)
    ).select("source", "doc_id", x.alias("x"))
    per_doc = ratings.groupBy("source", "doc_id").agg(
        F.avg("x").alias("mu"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("sx") / (_ICC_K * F.count(F.lit(1)))).alias("grand"),
        F.sum(
            F.col("sxx") - F.col("sx") * F.col("sx") / _ICC_K
        ).alias("ssw"),
        F.sum(F.col("mu") * F.col("mu")).alias("smm"),
        F.sum("mu").alias("sm"),
    )
    msb = (
        _ICC_K
        * (F.col("smm") - F.col("sm") * F.col("sm") / F.col("n_docs"))
        / (F.col("n_docs") - 1)
    )
    msw = F.col("ssw") / (F.col("n_docs") * (_ICC_K - 1))
    return per_src.select(
        "source", "n_docs",
        F.round(msb, 6).alias("msb"),
        F.round(msw, 6).alias("msw"),
        F.round((msb - msw) / (msb + (_ICC_K - 1) * msw), 6).alias("icc1"),
    ).orderBy("source")


# ===========================================================================
# R527 — calibration curve (reliability diagram)
# ===========================================================================

_CAL_BINS = 10
_H_MULT, _H_MOD = 48271, 65537  # the q_isotonic_calibration score rule


@register(
    "q_calibration_curve",
    f"""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                 THEN 1 ELSE 0 END) AS label
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT ((user_id * {_H_MULT}) % {_H_MOD}) / {_H_MOD}.0 AS score,
             label
      FROM users
    )
    SELECT CAST(floor(score * {_CAL_BINS}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(AVG(score), 6) AS mean_pred,
           round(AVG(label * 1.0), 6) AS frac_pos,
           round(abs(AVG(score) - AVG(label * 1.0)), 6) AS gap
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def q_calibration_curve(spark, sf_dir):
    """R527 — reliability diagram: 10 equal-width score bins × (count,
    mean predicted, empirical rate, |gap|) — the curve q_ece summarizes
    into one number.  One user collapse + one 10-key aggregate."""
    ev = read_events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90),
                1,
            ).otherwise(0)
        ).alias("label")
    )
    score = ((F.col("user_id") * _H_MULT) % _H_MOD) / F.lit(float(_H_MOD))
    return (
        users.select(score.alias("score"), "label")
        .groupBy(F.floor(F.col("score") * _CAL_BINS).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("score"), 6).alias("mean_pred"),
            F.round(F.avg(F.col("label") * 1.0), 6).alias("frac_pos"),
            F.round(
                F.abs(F.avg("score") - F.avg(F.col("label") * 1.0)), 6
            ).alias("gap"),
        )
        .orderBy("bin")
    )
