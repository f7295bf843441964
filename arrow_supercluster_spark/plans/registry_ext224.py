"""Round-8 registry additions, batch 219 — product-analytics and
rule-quality completions:

- q_stickiness: daily DAU / trailing-7-day WAU (the engagement
  "stickiness" ratio) — each (user, day) fact explodes into the ≤7
  trailing window-ends it serves (the q_rolling_mau construction), so
  there is NO stateful window, just keyed distinct counts.
- q_arpu: daily ARPU / ARPPU / paying share from exact purchase cents
  over daily actives — the revenue normalizations every dashboard
  pairs with DAU.
- q_rule_quality: leverage (supp(AB) − supp(A)·supp(B)), conviction
  ((1 − supp(B)) / (1 − conf), NULL at conf = 1) and rule Jaccard for
  the q_frequent_itemsets apriori-2 rules — the interestingness
  measures support/confidence/lift miss (leverage is symmetric-scale,
  conviction grades implication strength).

At 100 TB: stickiness/ARPU are keyed day aggs (×7 bounded explode);
rule quality reuses the bounded ≤|types|² pair frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_WAU_DAYS = 7
_RQ_MIN_SUPPORT = 0.05


@register(
    "q_stickiness",
    f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    dau AS (
      SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM days GROUP BY d
    ),
    exploded AS (
      SELECT user_id, d + CAST(k AS INTEGER) AS window_end
      FROM days CROSS JOIN (SELECT unnest(range(0, {_WAU_DAYS})) AS k) t
    ),
    bounds AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
    wau AS (
      SELECT window_end,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM exploded CROSS JOIN bounds
      WHERE window_end <= bounds.mx
      GROUP BY window_end
    )
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.window_end = dau.d
    ORDER BY dau.d
    """,
)
def q_stickiness(spark, sf_dir):
    """R650 — daily stickiness DAU/WAU₇: the trailing-7-day active set
    comes from the q_rolling_mau ×{d} explode (each user-day serves the
    ≤{d} window-ends it belongs to — keyed distinct counts, no state),
    then one day-keyed join.  Stickiness → 1 means every weekly-active
    user shows up daily.""".format(d=_WAU_DAYS)
    ev = read_events(spark, sf_dir)
    days = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = days.groupBy("d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    exploded = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), _WAU_DAYS - 1))
        ).alias("window_end"),
    )
    bounds = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    wau = (
        exploded.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_end") <= F.col("mx"))
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau["d"] == wau["window_end"])
        .select(
            F.col("d").cast("string").alias("day"),
            "dau", "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "q_arpu",
    """
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
             CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                        THEN user_id END) AS BIGINT) AS payers,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS rev_cents
      FROM events GROUP BY 1
    )
    SELECT CAST(d AS VARCHAR) AS day, dau, payers, rev_cents,
           round(rev_cents / (100.0 * dau), 6) AS arpu,
           round(CASE WHEN payers > 0
                 THEN rev_cents / (100.0 * payers) END, 6) AS arppu,
           round(payers * 1.0 / dau, 6) AS paying_share
    FROM per_day ORDER BY d
    """,
)
def q_arpu(spark, sf_dir):
    """R651 — daily ARPU / ARPPU / paying share from exact integer
    purchase cents: revenue per active, per payer (NULL on no-payer
    days), and the conversion denominator linking them
    (ARPU = ARPPU × paying_share).  One day-keyed agg."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_day = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("payers"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("rev_cents"),
    )
    return per_day.select(
        F.col("d").cast("string").alias("day"),
        "dau", "payers", "rev_cents",
        F.round(F.col("rev_cents") / (100.0 * F.col("dau")), 6).alias(
            "arpu"
        ),
        F.round(
            F.when(
                F.col("payers") > 0,
                F.col("rev_cents") / (100.0 * F.col("payers")),
            ),
            6,
        ).alias("arppu"),
        F.round(F.col("payers") * 1.0 / F.col("dau"), 6).alias(
            "paying_share"
        ),
    ).orderBy("day")


@register(
    "q_rule_quality",
    f"""
    WITH basket AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM basket),
    item AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM basket GROUP BY 1
    ),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM basket a JOIN basket b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT pair.ante, pair.cons,
           round(pair.c * 1.0 / nu.n, 6) AS support,
           round(pair.c * 1.0 / ia.c, 6) AS confidence,
           round(pair.c * 1.0 / nu.n
                 - (ia.c * 1.0 / nu.n) * (ic.c * 1.0 / nu.n), 6)
             AS leverage,
           round(CASE WHEN pair.c < ia.c
                 THEN (1.0 - ic.c * 1.0 / nu.n)
                      / (1.0 - pair.c * 1.0 / ia.c) END, 6) AS conviction,
           round(pair.c * 1.0 / (ia.c + ic.c - pair.c), 6)
             AS rule_jaccard
    FROM pair
    JOIN item ia ON ia.event_type = pair.ante
    JOIN item ic ON ic.event_type = pair.cons
    CROSS JOIN nu
    WHERE pair.c * 1.0 / nu.n >= {_RQ_MIN_SUPPORT}
    ORDER BY pair.ante, pair.cons
    """,
)
def q_rule_quality(spark, sf_dir):
    """R652 — rule-interestingness completions for the apriori-2 frame
    (q_frequent_itemsets ships support/confidence/lift): leverage =
    supp(AB) − supp(A)·supp(B) (symmetric additive scale), conviction =
    (1−supp(B))/(1−conf) (implication strength; NULL at conf = 1,
    stated) and rule Jaccard.  Same bounded within-user pair frame; two
    broadcast item joins."""
    ev = read_events(spark, sf_dir)
    basket = ev.select("user_id", "event_type").distinct()
    nu = basket.agg(F.countDistinct("user_id").alias("n"))
    item = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ia = item.select(
        F.col("event_type").alias("ante"), F.col("c").alias("ca")
    )
    ic = item.select(
        F.col("event_type").alias("cons"), F.col("c").alias("cc")
    )
    n = F.col("n")
    conf = F.col("c") * 1.0 / F.col("ca")
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(nu))
        .filter(F.col("c") * 1.0 / n >= _RQ_MIN_SUPPORT)
        .select(
            "ante", "cons",
            F.round(F.col("c") * 1.0 / n, 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                F.col("c") * 1.0 / n
                - (F.col("ca") * 1.0 / n) * (F.col("cc") * 1.0 / n),
                6,
            ).alias("leverage"),
            F.round(
                F.when(
                    F.col("c") < F.col("ca"),
                    (1.0 - F.col("cc") * 1.0 / n) / (1.0 - conf),
                ),
                6,
            ).alias("conviction"),
            F.round(
                F.col("c") * 1.0
                / (F.col("ca") + F.col("cc") - F.col("c")),
                6,
            ).alias("rule_jaccard"),
        )
        .orderBy("ante", "cons")
    )
