"""Round-7 registry additions, batch 196 — proper scoring rules for
probabilistic forecasts (Gneiting & Raftery 2007):

The forecaster under evaluation is stated and deterministic: the
per-hour-of-day empirical distribution of event values on the TRAIN
split (ts < 2024-01-22) predicting the TEST split (ts ≥ 2024-01-22).

- q_pinball_loss: quantile loss at τ ∈ {0.1, 0.5, 0.9} of the train
  type-1 τ-quantile per hour.  τ = k/10 keeps the loss an exact
  integer (k·(y−q)⁺ + (10−k)·(q−y)⁺ in cents·10), so the per-τ means
  are ratios of exact integer folds.
- q_crps_empirical: the CRPS of the empirical forecast distribution,
  CRPS(F, y) = E|X−y| − ½E|X−X′|, per hour — E|X−y| from a
  test×train-distinct-values join, E|X−X′| from the sorted-pair
  identity Σ|xᵢ−xⱼ| = 2Σ_v x_v c_v (B_v − A_v) over the value-collapsed
  frame with PARTITIONED (per-hour) running counts.
- q_interval_score: the Winkler score of the central 80% interval
  [q₀.₁, q₀.₉]: (u−l) + (2/α)(l−y)⁺ + (2/α)(y−u)⁺ with 2/α = 10
  exactly, plus empirical coverage — the calibration readout.

At 100 TB: the train side collapses to distinct cent values per hour
(bounded by the [0,1000) 2-decimal domain × 24), the running count
windows are hour-partitioned (never global), and the scoring joins
are test×(per-hour distinct values) — domain-bounded, not n².  Every
loss is an exact integer before the final division; outputs round 6.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_FS_SPLIT = "2024-01-22"
_FS_TAUS = (1, 5, 9)  # tau = k/10

_SQL_BASE = f"""
    labeled AS (
      SELECT EXTRACT(hour FROM ts) AS h,
             CAST(round(value * 100) AS BIGINT) AS y,
             ts < TIMESTAMP '{_FS_SPLIT}' AS is_train
      FROM events
    ),
    train AS (SELECT h, y FROM labeled WHERE is_train),
    test AS (SELECT h, y FROM labeled WHERE NOT is_train),
    tn AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY 1),
    tv AS (
      SELECT h, y, CAST(COUNT(*) AS BIGINT) AS c FROM train GROUP BY 1, 2
    ),
    cum AS (
      SELECT h, y, c,
             CAST(SUM(c) OVER (PARTITION BY h ORDER BY y) AS BIGINT)
               AS cb
      FROM tv
    )
"""


def _sql_quantile(k: int, name: str) -> str:
    return f"""{name} AS (
      SELECT cum.h, MIN(cum.y) AS q
      FROM cum JOIN tn ON tn.h = cum.h
      WHERE 10 * cum.cb >= {k} * tn.n
      GROUP BY 1
    )"""


def _spark_base(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    labeled = ev.select(
        F.hour("ts").alias("h"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        (F.col("ts") < F.lit(_FS_SPLIT).cast("timestamp")).alias(
            "is_train"
        ),
    )
    train = labeled.filter("is_train").select("h", "y")
    test = labeled.filter(~F.col("is_train")).select("h", "y")
    tn = train.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    tv = train.groupBy("h", "y").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("h").orderBy("y")
    cum = tv.select("h", "y", "c", F.sum("c").over(w).alias("cb"))
    return train, test, tn, tv, cum


def _spark_quantile(cum, tn, k: int):
    return (
        cum.join(
            tn.select(F.col("h").alias("tnh"), "n"),
            F.col("tnh") == F.col("h"),
        )
        .filter(10 * F.col("cb") >= k * F.col("n"))
        .groupBy("h")
        .agg(F.min("y").alias("q"))
    )


# ===========================================================================
# R584 — pinball (quantile) loss at tau in {0.1, 0.5, 0.9}
# ===========================================================================

@register(
    "q_pinball_loss",
    f"""
    WITH {_SQL_BASE},
    {', '.join(_sql_quantile(k, f'q{k}') for k in _FS_TAUS)},
    scored AS (
      {' UNION ALL '.join(
          f'''SELECT {k} AS k,
                 CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(SUM({k} * GREATEST(t.y - q{k}.q, 0)
                      + (10 - {k}) * GREATEST(q{k}.q - t.y, 0))
                      AS BIGINT) AS loss10
              FROM test t JOIN q{k} ON q{k}.h = t.h'''
          for k in _FS_TAUS)}
    )
    SELECT k * 0.1 AS tau, n_test,
           round(loss10 / (10.0 * 100.0 * n_test), 6) AS mean_pinball
    FROM scored ORDER BY tau
    """,
)
def q_pinball_loss(spark, sf_dir):
    """R584 — pinball_τ(y, q) = τ(y−q)⁺ + (1−τ)(q−y)⁺ with the train
    per-hour type-1 τ-quantile as q (integer-exact cut: 10·cum ≥ k·n);
    losses fold as exact cents·10 integers."""
    train, test, tn, tv, cum = _spark_base(spark, sf_dir)
    parts = []
    for k in _FS_TAUS:
        qk = _spark_quantile(cum, tn, k).select(
            F.col("h").alias("qh"), "q"
        )
        scored = test.join(F.broadcast(qk), F.col("qh") == F.col("h"))
        loss10 = k * F.greatest(
            F.col("y") - F.col("q"), F.lit(0)
        ) + (10 - k) * F.greatest(F.col("q") - F.col("y"), F.lit(0))
        parts.append(
            scored.agg(
                F.lit(k).alias("k"),
                F.count(F.lit(1)).alias("n_test"),
                F.sum(loss10).alias("loss10"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        (F.col("k") * 0.1).alias("tau"),
        "n_test",
        F.round(
            F.col("loss10") / (10.0 * 100.0 * F.col("n_test")), 6
        ).alias("mean_pinball"),
    ).orderBy("tau")


# ===========================================================================
# R585 — empirical CRPS per hour
# ===========================================================================

@register(
    "q_crps_empirical",
    f"""
    WITH {_SQL_BASE},
    exx AS (
      -- Σ|xi−xj| over ordered pairs = 2 Σ_v y·c·(B_v − A_v)
      SELECT cum.h,
             CAST(SUM(2 * cum.y * cum.c
                      * ((cum.cb - cum.c) - (tn.n - cum.cb)))
                  AS BIGINT) AS e2
      FROM cum JOIN tn ON tn.h = cum.h
      GROUP BY 1
    ),
    tm AS (
      SELECT h, y, CAST(COUNT(*) AS BIGINT) AS m FROM test GROUP BY 1, 2
    ),
    eabs AS (
      SELECT tm.h,
             CAST(SUM(tm.m * tv.c * abs(tv.y - tm.y)) AS BIGINT) AS a
      FROM tv JOIN tm ON tm.h = tv.h
      GROUP BY 1
    ),
    mt AS (
      SELECT h, CAST(SUM(m) AS BIGINT) AS m_tot FROM tm GROUP BY 1
    )
    SELECT e.h AS hour, tn.n AS n_train, mt.m_tot AS n_test,
           round((CAST(ea.a AS DOUBLE) / (tn.n * mt.m_tot)
                  - CAST(e.e2 AS DOUBLE) / (2.0 * tn.n * tn.n))
                 / 100.0, 6) AS mean_crps
    FROM exx e
    JOIN tn ON tn.h = e.h
    JOIN eabs ea ON ea.h = e.h
    JOIN mt ON mt.h = e.h
    ORDER BY hour
    """,
)
def q_crps_empirical(spark, sf_dir):
    """R585 — CRPS(F̂_h, y) = E|X−y| − ½E|X−X′| averaged over the
    hour's test points: E|X−y| folds m·c·|x−y| integers over the
    test×train-distinct join; E|X−X′| is the exact sorted-pair
    identity on the hour-partitioned cum frame.  Every per-hour
    number derives from that hour's integers alone — no cross-hour
    double sums exist."""
    train, test, tn, tv, cum = _spark_base(spark, sf_dir)
    exx = (
        cum.join(
            tn.select(F.col("h").alias("th"), "n"),
            F.col("th") == F.col("h"),
        )
        .groupBy("h")
        .agg(
            F.sum(
                2
                * F.col("y")
                * F.col("c")
                * (
                    (F.col("cb") - F.col("c"))
                    - (F.col("n") - F.col("cb"))
                )
            ).alias("e2")
        )
    )
    tm = test.groupBy("h", "y").agg(F.count(F.lit(1)).alias("m"))
    tvv = tv.select(
        F.col("h").alias("vh"), F.col("y").alias("vy"), "c"
    )
    # m_tot per hour: count each test value's m exactly once — join
    # multiplicity is |distinct train values|, so divide via min-rank
    joined = tm.join(F.broadcast(tvv), F.col("vh") == F.col("h"))
    eabs = joined.groupBy("h").agg(
        F.sum(
            F.col("m") * F.col("c") * F.abs(F.col("vy") - F.col("y"))
        ).alias("a"),
    )
    m_tot = tm.groupBy("h").agg(F.sum("m").alias("m_tot"))
    return (
        exx.join(
            tn.select(F.col("h").alias("nh"), "n"),
            F.col("nh") == F.col("h"),
        )
        .join(
            eabs.select(F.col("h").alias("ah"), "a"),
            F.col("ah") == F.col("h"),
        )
        .join(
            m_tot.select(F.col("h").alias("mh"), "m_tot"),
            F.col("mh") == F.col("h"),
        )
        .select(
            F.col("h").alias("hour"),
            F.col("n").alias("n_train"),
            F.col("m_tot").alias("n_test"),
            F.round(
                (
                    F.col("a").cast("double")
                    / (F.col("n") * F.col("m_tot"))
                    - F.col("e2").cast("double")
                    / (2.0 * F.col("n") * F.col("n"))
                )
                / 100.0,
                6,
            ).alias("mean_crps"),
        )
        .orderBy("hour")
    )


# ===========================================================================
# R586 — Winkler interval score of the central 80% interval
# ===========================================================================

@register(
    "q_interval_score",
    f"""
    WITH {_SQL_BASE},
    {_sql_quantile(1, 'lo')},
    {_sql_quantile(9, 'hi')},
    scored AS (
      SELECT t.h,
             (hi.q - lo.q)
             + 10 * GREATEST(lo.q - t.y, 0)
             + 10 * GREATEST(t.y - hi.q, 0) AS w_score,
             CASE WHEN t.y BETWEEN lo.q AND hi.q THEN 1 ELSE 0 END
               AS covered
      FROM test t
      JOIN lo ON lo.h = t.h
      JOIN hi ON hi.h = t.h
    )
    SELECT h AS hour, CAST(COUNT(*) AS BIGINT) AS n_test,
           round(SUM(w_score) / (100.0 * COUNT(*)), 6)
             AS mean_interval_score,
           round(SUM(covered) * 1.0 / COUNT(*), 6) AS coverage
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def q_interval_score(spark, sf_dir):
    """R586 — Winkler score of [q₀.₁, q₀.₉] (α=0.2, 2/α=10 exact):
    width + 10·(miss distance); coverage should sit near 0.8 for a
    calibrated forecaster (asserted loosely in tests).  Integer
    cents throughout."""
    train, test, tn, tv, cum = _spark_base(spark, sf_dir)
    lo = _spark_quantile(cum, tn, 1).select(
        F.col("h").alias("lh"), F.col("q").alias("lq")
    )
    hi = _spark_quantile(cum, tn, 9).select(
        F.col("h").alias("hh"), F.col("q").alias("hq")
    )
    scored = test.join(
        F.broadcast(lo), F.col("lh") == F.col("h")
    ).join(F.broadcast(hi), F.col("hh") == F.col("h"))
    w_score = (
        (F.col("hq") - F.col("lq"))
        + 10 * F.greatest(F.col("lq") - F.col("y"), F.lit(0))
        + 10 * F.greatest(F.col("y") - F.col("hq"), F.lit(0))
    )
    covered = F.when(
        (F.col("y") >= F.col("lq")) & (F.col("y") <= F.col("hq")), 1
    ).otherwise(0)
    return (
        scored.select("h", w_score.alias("ws"), covered.alias("cv"))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum("ws").alias("sw"),
            F.sum("cv").alias("sc"),
        )
        .select(
            F.col("h").alias("hour"),
            "n_test",
            F.round(
                F.col("sw") / (100.0 * F.col("n_test")), 6
            ).alias("mean_interval_score"),
            F.round(
                F.col("sc") * 1.0 / F.col("n_test"), 6
            ).alias("coverage"),
        )
        .orderBy("hour")
    )
