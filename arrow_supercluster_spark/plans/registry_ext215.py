"""Round-8 registry additions, batch 210 — classical-test completions
(the exact/likelihood counterparts of the Pearson χ² family):

- q_fisher_exact: Fisher's exact test on the 2×2 (user parity ×
  converted) table — the hypergeometric two-sided p-value that stays
  valid when expected cells are small, where χ²'s asymptotics lie.
  The support sum is margin-bounded; pmfs assemble from lgamma.
- q_g_test: the G-test (likelihood-ratio) of independence over the
  full source × lang grid — G = 2 Σ O·ln(O/E), the LR twin of
  q_chi2_independence (zero cells contribute 0 to G but DO shape E).
- q_negative_binomial: method-of-moments NB fit of per-user event
  counts — size r = m²/(s²−m), p = m/s², dispersion index s²/m; the
  standard overdispersion readout (Poisson ⇒ index 1) that decides
  between Poisson and NB count models.

At 100 TB: the 2×2 and the contingency grid collapse with one keyed
agg each; the Fisher support sum explodes a ≤min(margin) literal range
on a 1-row frame; NB moments are one aggregation of exact integer
sums.  Nothing is corpus-dimension beyond the first collapse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# scipy's two-sided rule: count tables whose pmf ≤ pmf(observed)·(1+ε)
_FISHER_EPS = 1e-7


def _SQL_LNFACT(expr: str) -> str:
    """DuckDB twin of the Spark lnfact fold: ln(x!) = Σ ln(i), same
    left-fold order over the same sequence; x ≤ 1 ⇒ 0 (empty range)."""
    return (
        f"COALESCE(list_sum(list_transform("
        f"range(1, CAST({expr} AS BIGINT) + 1), i -> ln(i))), 0.0)"
    )



@register(
    "q_fisher_exact",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(strftime(ts, '%w') AS INTEGER) AS dow,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS purchases
      FROM events GROUP BY 1, 2
    ),
    mu AS (SELECT AVG(purchases * 1.0) AS m FROM daily),
    flags AS (
      SELECT CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END AS weekend,
             CASE WHEN purchases * 1.0 >= mu.m THEN 1 ELSE 0 END AS hot
      FROM daily CROSS JOIN mu
    ),
    m AS (
      SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
             b + d AS c2, a + b + c + d AS n
      FROM (
        SELECT CAST(SUM(CASE WHEN weekend = 1 AND hot = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN weekend = 1 AND hot = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN weekend = 0 AND hot = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN weekend = 0 AND hot = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM flags
      )
    ),
    support AS (
      SELECT m.*, CAST(k AS BIGINT) AS k FROM m,
        UNNEST(range(GREATEST(0, m.r1 + m.c1 - m.n), LEAST(m.r1, m.c1) + 1))
          AS t(k)
    ),
    pmf AS (
      SELECT k, a,
             exp(({_SQL_LNFACT('r1')} - {_SQL_LNFACT('k')}
                  - {_SQL_LNFACT('r1 - k')})
                 + ({_SQL_LNFACT('r2')} - {_SQL_LNFACT('c1 - k')}
                    - {_SQL_LNFACT('r2 - c1 + k')})
                 - ({_SQL_LNFACT('n')} - {_SQL_LNFACT('c1')}
                    - {_SQL_LNFACT('n - c1')})) AS p
      FROM support
    ),
    obs AS (SELECT p AS p_obs FROM pmf WHERE k = a)
    SELECT m.a, m.b, m.c, m.d,
           round((SELECT p FROM pmf WHERE k = m.a), 8) AS pmf_observed,
           round((SELECT SUM(p) FROM pmf, obs
                  WHERE p <= obs.p_obs * (1 + {_FISHER_EPS})), 6)
             AS p_two_sided,
           round(CASE WHEN m.b * m.c = 0 THEN NULL
                 ELSE m.a * 1.0 * m.d / (m.b * 1.0 * m.c) END, 6)
             AS odds_ratio
    FROM m
    """,
)
def q_fisher_exact(spark, sf_dir):
    """R623 — Fisher's exact test on the calendar 2×2 (weekend day ×
    above-mean purchase day): the margin-bounded (n ≤ 31) exact
    hypergeometric test, used exactly where its asymptotic-free p-value
    matters — tiny tables.  ln k! is an explicit Σ ln i over a ≤31-term
    sequence, MIRRORED in both engines (Spark has no lgamma builtin;
    using DuckDB's lgamma on one side would desynchronize the floats);
    two-sided p by scipy's pmf ≤ pmf_obs·(1+1e-7) rule; sample odds
    ratio alongside.  Day collapse is one agg; the support explode is
    ≤ 16 rows on a 1-row frame."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.dayofweek("ts") - 1).alias("dow"),  # 0=Sunday, like %w
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purchases")
    )
    mu = daily.agg(F.avg(F.col("purchases") * 1.0).alias("m"))
    flags = daily.crossJoin(F.broadcast(mu)).select(
        F.when(F.col("dow").isin(0, 6), 1).otherwise(0).alias("weekend"),
        F.when(F.col("purchases") * 1.0 >= F.col("m"), 1)
        .otherwise(0)
        .alias("hot"),
    )
    m = flags.agg(
        F.sum(
            F.when((F.col("weekend") == 1) & (F.col("hot") == 1), 1)
            .otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("weekend") == 1) & (F.col("hot") == 0), 1)
            .otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("weekend") == 0) & (F.col("hot") == 1), 1)
            .otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("weekend") == 0) & (F.col("hot") == 0), 1)
            .otherwise(0)
        ).alias("d"),
    ).select(
        "a", "b", "c", "d",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("c") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("c")).alias("c1"),
        (F.col("b") + F.col("d")).alias("c2"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
    )
    support = m.select(
        "*",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("r1") + F.col("c1") - F.col("n")),
                F.least(F.col("r1"), F.col("c1")),
            )
        ).alias("k"),
    )

    def lnfact(expr):
        # ln(x!) = Σ_{i=1..x} ln(i); x ≤ 31 here, left-fold order mirrors
        # DuckDB's list_sum over the same range
        return (
            f"if(bigint({expr}) < 1, cast(0.0 as double), "
            f"aggregate(sequence(1, bigint({expr})), cast(0.0 as double), "
            f"(acc, i) -> acc + ln(i)))"
        )

    pmf = support.select(
        "a", "k",
        F.expr(
            f"exp(({lnfact('r1')} - {lnfact('k')} - {lnfact('r1 - k')}) "
            f"+ ({lnfact('r2')} - {lnfact('c1 - k')} "
            f"- {lnfact('r2 - c1 + k')}) "
            f"- ({lnfact('n')} - {lnfact('c1')} - {lnfact('n - c1')}))"
        ).alias("p"),
    )
    obs = pmf.filter(F.col("k") == F.col("a")).select(
        F.col("p").alias("p_obs")
    )
    psum = (
        pmf.crossJoin(F.broadcast(obs))
        .filter(F.col("p") <= F.col("p_obs") * (1 + _FISHER_EPS))
        .agg(F.sum("p").alias("p_two"))
    )
    return (
        m.crossJoin(F.broadcast(obs))
        .crossJoin(F.broadcast(psum))
        .select(
            "a", "b", "c", "d",
            F.round("p_obs", 8).alias("pmf_observed"),
            F.round("p_two", 6).alias("p_two_sided"),
            F.round(
                F.when(
                    F.col("b") * F.col("c") == 0, F.lit(None)
                ).otherwise(
                    F.col("a") * 1.0 * F.col("d")
                    / (F.col("b") * 1.0 * F.col("c"))
                ),
                6,
            ).alias("odds_ratio"),
        )
    )


@register(
    "q_g_test",
    """
    WITH grid AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    rm AS (SELECT source, SUM(o) AS r FROM grid GROUP BY 1),
    cm AS (SELECT lang, SUM(o) AS c FROM grid GROUP BY 1),
    n AS (SELECT SUM(o) AS n FROM grid),
    g AS (
      SELECT SUM(2.0 * grid.o * ln(grid.o * n.n * 1.0 / (rm.r * cm.c)))
               AS g_stat
      FROM grid JOIN rm ON rm.source = grid.source
      JOIN cm ON cm.lang = grid.lang CROSS JOIN n
      WHERE grid.o > 0
    ),
    df AS (
      SELECT ((SELECT CAST(COUNT(*) AS BIGINT) FROM rm) - 1)
             * ((SELECT CAST(COUNT(*) AS BIGINT) FROM cm) - 1) AS df
    )
    SELECT round(g.g_stat, 6) AS g_stat, df.df,
           round(g.g_stat / df.df, 6) AS g_over_df
    FROM g CROSS JOIN df
    """,
)
def q_g_test(spark, sf_dir):
    """R624 — G-test of independence (likelihood-ratio χ²) over the
    source × lang grid: G = 2 Σ O·ln(O·n/(r·c)) with zero cells
    contributing 0 (but shaping the margins), df = (r−1)(c−1).  The LR
    twin of q_chi2_independence — the two agree asymptotically and
    diverge exactly where small expected counts matter.  Margins are
    two tiny keyed aggs; the grid is |sources|×|langs| rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grid = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rm = grid.groupBy("source").agg(F.sum("o").alias("r"))
    cm = grid.groupBy("lang").agg(F.sum("o").alias("c"))
    n = grid.agg(F.sum("o").alias("n"))
    g = (
        grid.join(F.broadcast(rm), "source")
        .join(F.broadcast(cm), "lang")
        .crossJoin(F.broadcast(n))
        .filter(F.col("o") > 0)
        .agg(
            F.sum(
                2.0
                * F.col("o")
                * F.log(
                    F.col("o") * F.col("n") * 1.0 / (F.col("r") * F.col("c"))
                )
            ).alias("g_stat")
        )
    )
    df = (
        rm.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(cm.agg(F.count(F.lit(1)).alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("df"))
    )
    return g.crossJoin(F.broadcast(df)).select(
        F.round("g_stat", 6).alias("g_stat"),
        "df",
        F.round(F.col("g_stat") / F.col("df"), 6).alias("g_over_df"),
    )


@register(
    "q_negative_binomial",
    """
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(k) AS sk, SUM(k * k) AS skk
      FROM per_user
    ),
    mom AS (
      SELECT n,
             sk * 1.0 / n AS m,
             (skk - sk * 1.0 * sk / n) / (n - 1) AS v
      FROM s
    )
    SELECT n AS n_users, round(m, 6) AS mean_events,
           round(v, 6) AS var_events,
           round(v / m, 6) AS dispersion_index,
           round(CASE WHEN v > m THEN m * m / (v - m) END, 6) AS nb_size_r,
           round(CASE WHEN v > m THEN m / v END, 6) AS nb_p,
           (v > m) AS overdispersed
    FROM mom
    """,
)
def q_negative_binomial(spark, sf_dir):
    """R625 — method-of-moments negative-binomial fit of per-user event
    counts: r = m²/(s²−m), p = m/s², dispersion index s²/m (Poisson ⇒
    1; NULL fit when not overdispersed).  Decides the count-model family
    before anything fancier — one user-grain agg then one 1-row closed
    form from exact integer sums."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("k"))
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    )
    m = F.col("sk") * 1.0 / F.col("n")
    v = (F.col("skk") - F.col("sk") * 1.0 * F.col("sk") / F.col("n")) / (
        F.col("n") - 1
    )
    return s.select(
        F.col("n").alias("n_users"),
        F.round(m, 6).alias("mean_events"),
        F.round(v, 6).alias("var_events"),
        F.round(v / m, 6).alias("dispersion_index"),
        F.round(F.when(v > m, m * m / (v - m)), 6).alias("nb_size_r"),
        F.round(F.when(v > m, m / v), 6).alias("nb_p"),
        (v > m).alias("overdispersed"),
    )
