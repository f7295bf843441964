"""Round-5 registry additions, batch 139 — cluster validity, corpus
keyness, and zero-inflation:

- q_silhouette: silhouette coefficient of the embedding labels —
  s(i) = (b(i) − a(i))/max(a, b) with a = mean intra-cluster distance
  and b = the nearest other cluster's mean distance; per-label means
  and the global mean reported. Pairwise distances integer-scale
  (micro grid) so every per-(point, cluster) mean is an exact-integer
  sum over an exact count — THE cluster-validity number, joining
  ARI (external) and cluster-stability (hierarchical) with the
  internal geometric view.
- q_keyness_g2: Dunning log-likelihood (G²) keyness between the 'en'
  subcorpus and the rest — per token, the 2×2 G² of its usage rates;
  the corpus-linguistics standard for 'what words CHARACTERIZE this
  subcorpus' (PMI overweights rare words, TF-IDF ignores the
  comparison corpus; G² is the calibrated test). Top terms by G².
- q_zero_inflation: van den Broek score test for zero inflation
  against Poisson — are there more zero-activity (user, week) cells
  than e^(−λ̂) predicts? The quantitative follow-through on
  q_negbin_fit: overdispersion can come from fat tails OR excess
  zeros, and the treatments differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs, _emb
from arrow_supercluster_spark.sources.tables import read_events

_SIL_SCALE = 1_000_000
_KEY_TOP = 15
_KEY_SCALE = 1_000_000


# ===========================================================================
# R410 — silhouette coefficient
# ===========================================================================

_SQL_SIL_D = (
    "CAST(round(sqrt(list_sum(list_transform(range(1, 65), i -> "
    "(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) "
    "* (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))) "
    "* 1e6) AS BIGINT)"
)


@register(
    "q_silhouette",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
             {_SQL_SIL_D} AS d_s
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    pc AS (
      SELECT i, li, lj, SUM(d_s) AS sd, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY i, li, lj
    ),
    a_term AS (
      SELECT i, li, sd * 1.0 / (c * {_SIL_SCALE}) AS a FROM pc
      WHERE li = lj
    ),
    b_term AS (
      SELECT i, MIN(sd * 1.0 / (c * {_SIL_SCALE})) AS b FROM pc
      WHERE li != lj GROUP BY i
    ),
    s AS (
      SELECT p.label AS label,
             CASE WHEN a_term.a IS NULL OR b_term.b IS NULL THEN 0.0
                  ELSE (b_term.b - a_term.a) / greatest(a_term.a, b_term.b)
             END AS s
      FROM (SELECT vec_id AS i, label FROM embeddings) p
      LEFT JOIN a_term ON a_term.i = p.i
      LEFT JOIN b_term ON b_term.i = p.i
    ),
    per_label AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(round(s * {_SIL_SCALE}) AS BIGINT)) AS s_s
      FROM s GROUP BY label
    ),
    overall AS (
      SELECT SUM(s_s) * 1.0 / ({_SIL_SCALE} * 1.0 * SUM(n)) AS o
      FROM per_label
    )
    SELECT per_label.label, per_label.n,
           round(per_label.s_s * 1.0
                 / ({_SIL_SCALE} * 1.0 * per_label.n), 6) AS mean_silhouette,
           round(overall.o, 6) AS overall_silhouette
    FROM per_label CROSS JOIN overall
    ORDER BY per_label.label
    """,
)
def q_silhouette(spark, sf_dir):
    """R410 — silhouette of the embedding labels: micro-scaled integer
    pairwise distances → per-(point, cluster) EXACT integer sums and
    counts → a(i) (own cluster) and b(i) (min other-cluster mean) →
    s(i) = (b−a)/max(a,b), integer-scaled again before the label and
    corpus means. s ≈ +1 compact/separated, 0 overlapping, < 0
    misassigned — the internal-validity headline (ARI R369 needs
    truth; silhouette doesn't). Points in singleton clusters take the
    sklearn convention s(i)=0 (no same-label pairs => a(i) undefined):
    both twins left-join the point universe and coalesce to 0, so
    singletons count in the label/corpus means instead of silently
    dropping (ADVICE r5). The all-pairs frame is the demo grain;
    at scale the b-term restricts to candidate clusters from the
    centroid assignment, identical math."""
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # r11 (VERDICT r10 #8, guide §4.2): the n²/2 join + interpreted HOF
    # fold + eager checkpoint becomes a block-pair NumPy kernel (same
    # family as q_energy_distance/q_dunn_index).  fold_d2 reproduces the
    # zip_with left fold bit-for-bit, np.sqrt is correctly rounded like
    # java.lang.Math.sqrt, and half_up reproduces F.round's HALF_UP, so
    # every d_s is identical to the pair-join form (exceptAll = 0 at all
    # three SFs).  Each block pair emits per-(point, other-cluster)
    # partial integer sums; the (i, li, lj) agg below combines them
    # exactly — replacing the old per-direction mirror union.
    import numpy as np
    import pandas as pd

    from arrow_supercluster_spark.functions import blockpairs as bp

    def _sil_fn(pdf):
        pa, pb = int(pdf["pa"].iat[0]), int(pdf["pb"].iat[0])
        a = pdf[pdf["p"] == pa]
        b_ = pdf[pdf["p"] == pb]
        cols = ["i", "li", "lj", "sd", "c"]
        if a.empty or b_.empty:
            return pd.DataFrame({c: [] for c in cols})
        A = np.stack(a["v"].to_numpy())
        B = np.stack(b_["v"].to_numpy())
        d_s = bp.half_up(np.sqrt(bp.fold_d2(A, B)) * _SIL_SCALE)
        ia, ib = a["vec_id"].to_numpy(), b_["vec_id"].to_numpy()
        la, lb = a["label"].to_numpy(), b_["label"].to_numpy()
        mask = bp.pair_mask(ia, ib, pa == pb)
        if pa == pb:
            # same-block: the ia<ib half-matrix carries each unordered
            # pair once; accumulate BOTH directions from it
            mask = mask | mask.T
        out = []
        for lab in np.unique(lb):
            cm = lb == lab
            m = mask[:, cm]
            c = m.sum(axis=1)
            sd = np.where(m, d_s[:, cm], 0).sum(axis=1)
            keep = c > 0
            out.append(
                pd.DataFrame(
                    {"i": ia[keep], "li": la[keep], "lj": lab,
                     "sd": sd[keep], "c": c[keep]}
                )
            )
        if pa != pb:
            for lab in np.unique(la):
                rm = la == lab
                m = mask[rm, :]
                c = m.sum(axis=0)
                sd = np.where(m, d_s[rm, :], 0).sum(axis=0)
                keep = c > 0
                out.append(
                    pd.DataFrame(
                        {"i": ib[keep], "li": lb[keep], "lj": lab,
                         "sd": sd[keep], "c": c[keep]}
                    )
                )
        return pd.concat(out, ignore_index=True)

    # label keeps its source type (int in the parquet corpus, string in
    # the operator-contract tests)
    _lt = emb.schema["label"].dataType.simpleString()
    partials = bp.block_pair_groups(
        emb, _sil_fn, f"i long, li {_lt}, lj {_lt}, sd long, c long"
    )
    pc = partials.groupBy("i", "li", "lj").agg(
        F.sum("sd").alias("sd"), F.sum("c").alias("c")
    )
    a_term = pc.filter(F.col("li") == F.col("lj")).select(
        "i", "li", (F.col("sd") * 1.0 / (F.col("c") * _SIL_SCALE)).alias("a")
    )
    b_term = (
        pc.filter(F.col("li") != F.col("lj"))
        .groupBy("i")
        .agg(
            F.min(
                F.col("sd") * 1.0 / (F.col("c") * _SIL_SCALE)
            ).alias("b")
        )
    )
    pts = emb.select(F.col("vec_id").alias("i"), F.col("label").alias("li"))
    s = (
        pts.join(a_term, ["i", "li"], "left")
        .join(b_term, "i", "left")
        .select(
            F.col("li").alias("label"),
            F.when(
                F.col("a").isNull() | F.col("b").isNull(), F.lit(0.0)
            ).otherwise(
                (F.col("b") - F.col("a"))
                / F.greatest(F.col("a"), F.col("b"))
            ).alias("s"),
        )
    )
    per_label = s.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("s") * _SIL_SCALE).cast("long")).alias("s_s"),
    )
    overall = per_label.agg(
        (
            F.sum("s_s") * 1.0 / (_SIL_SCALE * 1.0 * F.sum("n"))
        ).alias("o")
    )
    return (
        per_label.crossJoin(F.broadcast(overall))
        .select(
            "label",
            "n",
            F.round(
                F.col("s_s") * 1.0 / (_SIL_SCALE * 1.0 * F.col("n")), 6
            ).alias("mean_silhouette"),
            F.round("o", 6).alias("overall_silhouette"),
        )
        .orderBy("label")
    )


# ===========================================================================
# R411 — Dunning G² keyness
# ===========================================================================

@register(
    "q_keyness_g2",
    f"""
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             unnest({SQL_TOKS}) AS tok
      FROM documents
    ),
    clean AS (SELECT * FROM toks WHERE tok != ''),
    counts AS (
      SELECT tok,
             CAST(SUM(grp) AS BIGINT) AS a,
             CAST(SUM(1 - grp) AS BIGINT) AS b
      FROM clean GROUP BY tok
    ),
    tot AS (
      SELECT SUM(a) AS ca, SUM(b) AS cb FROM counts
    ),
    g2 AS (
      SELECT tok, a, b,
             round(2.0 * (
               CASE WHEN a > 0
                    THEN a * ln(a * 1.0 * (tot.ca + tot.cb)
                                / ((a + b) * 1.0 * tot.ca)) ELSE 0 END
               + CASE WHEN b > 0
                      THEN b * ln(b * 1.0 * (tot.ca + tot.cb)
                                  / ((a + b) * 1.0 * tot.cb)) ELSE 0 END
             ), 4) AS g2,
             (a * 1.0 / tot.ca > b * 1.0 / tot.cb) AS en_favored
      FROM counts CROSS JOIN tot
    )
    SELECT tok, a AS count_en, b AS count_rest, g2, en_favored
    FROM g2
    ORDER BY g2 DESC, tok
    LIMIT {_KEY_TOP}
    """,
)
def q_keyness_g2(spark, sf_dir):
    """R411 — Dunning log-likelihood keyness of the 'en' subcorpus vs
    the rest: per token, G² = 2Σ O·ln(O/E) over the 2×2 usage table
    (the two observed cells carry the whole statistic in this
    signed-keyness form; E from the pooled rate). Integer counts in,
    one ln per populated cell, top-{t} by the rounded statistic —
    which words CHARACTERIZE the subcorpus, calibrated as a test (the
    corpus-linguistics standard over PMI's rare-word bias). All keyed
    aggs on the token frame.""".format(t=_KEY_TOP)
    from arrow_supercluster_spark.operators.dedup import tokenize

    clean = (
        _docs(spark, sf_dir)
        .select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
            F.explode(tokenize(F.col("text"))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = clean.groupBy("tok").agg(
        F.sum("grp").alias("a"),
        F.sum(1 - F.col("grp")).alias("b"),
    )
    tot = counts.agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    j = counts.crossJoin(F.broadcast(tot))
    term_a = F.when(
        F.col("a") > 0,
        F.col("a")
        * F.log(
            F.col("a")
            * 1.0
            * (F.col("ca") + F.col("cb"))
            / ((F.col("a") + F.col("b")) * 1.0 * F.col("ca"))
        ),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("b") > 0,
        F.col("b")
        * F.log(
            F.col("b")
            * 1.0
            * (F.col("ca") + F.col("cb"))
            / ((F.col("a") + F.col("b")) * 1.0 * F.col("cb"))
        ),
    ).otherwise(F.lit(0.0))
    return (
        j.select(
            "tok",
            F.col("a").cast("long").alias("count_en"),
            F.col("b").cast("long").alias("count_rest"),
            F.round(2.0 * (term_a + term_b), 4).alias("g2"),
            (
                F.col("a") * 1.0 / F.col("ca")
                > F.col("b") * 1.0 / F.col("cb")
            ).alias("en_favored"),
        )
        .orderBy(F.col("g2").desc(), "tok")
        .limit(_KEY_TOP)
    )


# ===========================================================================
# R412 — zero-inflation score test
# ===========================================================================

@register(
    "q_zero_inflation",
    """
    WITH uw AS (
      SELECT u.user_id, wk.w,
             CAST(coalesce(x.c, 0) AS BIGINT) AS c
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT DISTINCT
                    (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w
                  FROM events) wk
      LEFT JOIN (
        SELECT user_id,
               (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w,
               COUNT(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      ) x ON x.user_id = u.user_id AND x.w = wk.w
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             SUM(c) AS sc
      FROM uw
    )
    SELECT n, n0,
           round(sc * 1.0 / n, 6) AS lambda_hat,
           round(n * exp(-sc * 1.0 / n), 4) AS expected_zeros,
           round((n0 - n * exp(-sc * 1.0 / n))
                 * (n0 - n * exp(-sc * 1.0 / n))
                 / (n * exp(-sc * 1.0 / n)
                    * (1.0 - exp(-sc * 1.0 / n))
                    - n * (sc * 1.0 / n)
                      * exp(-2.0 * sc * 1.0 / n)), 4) AS score_stat
    FROM s
    """,
)
def q_zero_inflation(spark, sf_dir):
    """R412 — van den Broek score test for zero inflation: over the
    densified (user, week) purchase-count grid, compare observed zeros
    n₀ against the Poisson prediction n·e^(−λ̂) with the score
    statistic (n₀ − ne^(−λ̂))²/(ne^(−λ̂)(1 − e^(−λ̂)) − nλ̂e^(−2λ̂)) ~
    χ²₁. All counts exact integers; λ̂ one division; the statistic a
    closed form. Splits q_negbin_fit's 'overdispersed' verdict into
    its two causes — excess zeros (hurdle/ZIP models) vs fat tails
    (NB) — which demand different fixes."""
    ev = read_events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    weeks = ev.select(
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w")
    ).distinct()
    x = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id",
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w"),
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = (
        users.crossJoin(F.broadcast(weeks))
        .join(x, ["user_id", "w"], "left")
        .select(F.coalesce("c", F.lit(0)).alias("c"))
    )
    s = grid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).alias("n0"),
        F.sum("c").alias("sc"),
    )
    lam = F.col("sc") * 1.0 / F.col("n")
    ez = F.col("n") * F.exp(-lam)
    denom = ez * (1.0 - F.exp(-lam)) - F.col("n") * lam * F.exp(-2.0 * lam)
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("n0").cast("long").alias("n0"),
        F.round(lam, 6).alias("lambda_hat"),
        F.round(ez, 4).alias("expected_zeros"),
        F.round(
            (F.col("n0") - ez) * (F.col("n0") - ez) / denom, 4
        ).alias("score_stat"),
    )
