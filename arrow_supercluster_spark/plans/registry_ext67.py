"""Round-2 registry additions, batch 62 — contingency testing and
operating-point curves:

- q_chi2_independence: chi-square independence of the (source ×
  language) contingency table — is language mix independent of source?
  (the hypothesis-test form of q_source_lang_kl's divergence);
- q_pr_curve: precision/recall at decile score thresholds — the
  operating-point table completing the model-eval family
  (q_auc / q_calibration / q_lift_chart).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_chi2_independence",
    """
    WITH cell AS (
      SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ),
    rs AS (SELECT source, SUM(o) AS r FROM cell GROUP BY 1),
    cs AS (SELECT lang, SUM(o) AS c FROM cell GROUP BY 1),
    n AS (SELECT SUM(o) AS n FROM cell),
    dense AS (
      SELECT rs.source, cs.lang, rs.r, cs.c, n.n,
             coalesce(cell.o, 0) AS o,
             rs.r * cs.c * 1.0 / n.n AS e
      FROM rs CROSS JOIN cs CROSS JOIN n
      LEFT JOIN cell ON cell.source = rs.source AND cell.lang = cs.lang
    )
    SELECT COUNT(*) AS n_cells,
           ANY_VALUE((SELECT COUNT(*) FROM rs) - 1)
             * ANY_VALUE((SELECT COUNT(*) FROM cs) - 1) AS dof,
           round(SUM((o - e) * (o - e) / e), 6) AS chi2
    FROM dense
    """,
)
def q_chi2_independence(spark, sf_dir):
    """Hypothesis testing — chi-square independence over the full
    (source × language) contingency grid, ZERO cells included (the
    expected count rᵢcⱼ/n is what the test compares against — dropping
    empty cells biases χ² down): the significance footing under
    q_source_lang_kl's divergences. Margins are two tiny aggs; the
    dense grid is |sources|×|langs| rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cell = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rs = cell.groupBy("source").agg(F.sum("o").alias("r"))
    cs = cell.groupBy("lang").agg(F.sum("o").alias("c"))
    # margins as broadcast 1-row aggregates — NOT driver-side .count()
    # actions (round 2 ran a 3-job count ladder here; the whole query is
    # now one action, asserted lazy in tests/test_plans_round3.py)
    margins = rs.agg(
        F.count(F.lit(1)).alias("n_sources"), F.sum("r").alias("n")
    )
    lang_cnt = cs.agg(F.count(F.lit(1)).alias("n_langs"))
    dense = (
        rs.crossJoin(cs)
        .join(cell, ["source", "lang"], "left")
        .crossJoin(F.broadcast(margins))
        .crossJoin(F.broadcast(lang_cnt))
        .select(
            "source", "lang", "n_sources", "n_langs",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("r") * F.col("c") * 1.0 / F.col("n")).alias("e"),
        )
    )
    return dense.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max((F.col("n_sources") - 1) * (F.col("n_langs") - 1))
        .cast("long")
        .alias("dof"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
    )


_PR_SQL_SCORED = """
    scored AS (
      SELECT user_id, round(SUM(value), 4) AS score,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                      THEN 1 ELSE 0 END) AS label
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
"""

_PR_PS = [i / 10 for i in range(1, 10)]


@register(
    "q_pr_curve",
    f"""
    WITH {_PR_SQL_SCORED},
    cuts AS (
      SELECT {", ".join(f"round(quantile_cont(score, {p}), 6) AS c{i}" for i, p in enumerate(_PR_PS))}
      FROM scored
    ),
    thresholds AS (
      {" UNION ALL ".join(f"SELECT {i + 1} AS t_id, c{i} AS threshold FROM cuts" for i in range(len(_PR_PS)))}
    ),
    conf AS (
      SELECT t.t_id, t.threshold,
             SUM(CASE WHEN s.score > t.threshold AND s.label = 1
                      THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN s.score > t.threshold AND s.label = 0
                      THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN s.score <= t.threshold AND s.label = 1
                      THEN 1 ELSE 0 END) AS fn
      FROM scored s CROSS JOIN thresholds t
      GROUP BY t.t_id, t.threshold
    )
    SELECT t_id, threshold, tp, fp, fn,
           CASE WHEN tp + fp > 0 THEN round(tp * 1.0 / (tp + fp), 6) END
             AS precision_,
           CASE WHEN tp + fn > 0 THEN round(tp * 1.0 / (tp + fn), 6) END
             AS recall
    FROM conf
    """,
)
def q_pr_curve(spark, sf_dir):
    """Model eval — the precision/recall OPERATING-POINT table: confusion
    counts at the nine score deciles ('flag everyone above the p-th
    percentile'), with precision and recall per threshold — the curve
    the one-number AUC (q_auc) integrates, and the table an alerting
    threshold is actually chosen from. Cuts come from one percentile
    agg; the 9-threshold cross join runs on the |users| collapse."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    scored = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("label"),
    )
    cuts = scored.agg(
        *[
            F.round(F.expr(f"percentile(score, {p})"), 6).alias(f"c{i}")
            for i, p in enumerate(_PR_PS)
        ]
    )
    # unpivot the 1-row cuts into (t_id, threshold) INSIDE the plan — no
    # driver collect, so the whole curve is one action and the scored
    # aggregate is computed once
    stack_args = ", ".join(
        f"{i + 1}, c{i}" for i in range(len(_PR_PS))
    )
    thresholds = cuts.select(
        F.expr(
            f"stack({len(_PR_PS)}, {stack_args}) AS (t_id, threshold)"
        )
    )
    conf = (
        scored.crossJoin(F.broadcast(thresholds))
        .groupBy("t_id", "threshold")
        .agg(
            F.sum(
                F.when((F.col("score") > F.col("threshold")) & (F.col("label") == 1), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when((F.col("score") > F.col("threshold")) & (F.col("label") == 0), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when((F.col("score") <= F.col("threshold")) & (F.col("label") == 1), 1)
                .otherwise(0)
            ).alias("fn"),
        )
    )
    return conf.select(
        "t_id", "threshold", "tp", "fp", "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6),
        ).alias("precision_"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6),
        ).alias("recall"),
    )
