"""Round-2 registry additions, batch 68 — code-switching detection and
behavioral sequence mining:

- q_lang_purity: language-vote purity per document — mixed-language
  (code-switched) docs score low even when the argmax label looks
  confident (q_lang_id reports the winner; this reports the margin);
- q_behavior_trigrams: the most common 3-event behavioral sequences
  per user stream — one step beyond q_event_transitions' pairs.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import textops
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _SQL_LANG_SCORES, _docs
from arrow_supercluster_spark.sources.tables import read_events

_LANGS = sorted(textops.STOPWORDS)


@register(
    "q_lang_purity",
    f"""
    SELECT doc_id,
           best, total_votes,
           CASE WHEN total_votes > 0
                THEN round(best * 1.0 / total_votes, 6)
                ELSE 0.0 END AS purity,
           CAST(total_votes > 0 AND best * 1.0 / total_votes < 0.8
                AS INTEGER) AS mixed
    FROM (
      SELECT doc_id,
             greatest({", ".join(f"s_{l}" for l in _LANGS)}) AS best,
             ({" + ".join(f"s_{l}" for l in _LANGS)}) AS total_votes
      FROM (SELECT doc_id, {_SQL_LANG_SCORES} FROM documents) t
    ) s
    """,
)
def q_lang_purity(spark, sf_dir):
    """Text quality — language-vote PURITY: the winning language's
    stopword votes over all language votes — q_lang_id reports the
    argmax, this reports the margin, and a low margin is the
    code-switching / mixed-language signal that a confident-looking
    label hides (purity < 0.8 flags). Same in-row vote exprs, zero
    shuffle."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)

    # token array bound once (the lang_id_expr idiom); each language's
    # vote is an array_contains filter over the bound array
    def inner(toks):
        def hits(ws):
            lits = F.array(*[F.lit(w) for w in ws])
            return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))

        scores = [hits(ws) for _, ws in sorted(textops.STOPWORDS.items())]
        best = F.greatest(*scores)
        total = scores[0]
        for sc in scores[1:]:
            total = total + sc
        purity = F.when(total > 0, F.round(best * 1.0 / total, 6)).otherwise(0.0)
        return F.struct(
            best.cast("long").alias("best"),
            total.cast("long").alias("total_votes"),
            purity.alias("purity"),
            ((total > 0) & (best * 1.0 / total < 0.8))
            .cast("int")
            .alias("mixed"),
        )

    st = F.element_at(F.transform(F.array(tokenize(F.col("text"))), inner), 1)
    return docs.select(
        "doc_id",
        st["best"].alias("best"),
        st["total_votes"].alias("total_votes"),
        st["purity"].alias("purity"),
        st["mixed"].alias("mixed"),
    )


@register(
    "q_behavior_trigrams",
    """
    WITH seq AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a, b, c, COUNT(*) AS n FROM seq
    WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY a, b, c
    ORDER BY n DESC, a, b, c
    LIMIT 15
    """,
)
def q_behavior_trigrams(spark, sf_dir):
    """Sequence mining — the top 15 behavioral TRIGRAMS (3-event
    user-stream sequences): the step beyond q_event_transitions' pair
    matrix that distinguishes view→click→purchase from
    view→click→error. Two lead windows on the user-partitioned stream,
    one ≤|types|³-key agg, TakeOrdered for the top slice."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        seq.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "a", "b", "c")
        .limit(15)
    )
