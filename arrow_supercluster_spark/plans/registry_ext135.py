"""Round-5 registry additions, batch 130 — repeated-measures ranks,
measurement reliability, and index numbers:

- q_friedman_test: Friedman rank test — within each day (the block),
  rank the five event types by count, then χ²_F = 12/(nk(k+1))·ΣR_j²
  − 3n(k+1) over the per-type rank sums (midranks for ties, kept as
  integer 2·rank sums). The repeated-measures cousin of
  Kruskal-Wallis: blocks remove the day-to-day level so only the
  within-day ORDERING of types is tested.
- q_cronbach_alpha: Cronbach's α over the per-user event-type count
  "items" — α = k/(k−1)·(1 − Σσ²_item/σ²_total); all variances from
  exact integer moments. The does-this-battery-measure-one-thing
  reliability coefficient, here applied to whether the five activity
  counters track a single engagement trait.
- q_price_index: Laspeyres, Paasche, and Fisher price indices between
  two periods of the lineitem fact (unit price = extendedprice /
  quantity; baskets = per-part quantities) — the index-number family
  (base-weighted vs current-weighted vs their geometric mean), with
  every Σp·q in exact integer cents·units.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_PI_SPLIT = "1996-01-01"  # period 0 before, period 1 from this date


# ===========================================================================
# R383 — Friedman rank test
# ===========================================================================

@register(
    "q_friedman_test",
    """
    WITH raw AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cells AS (
      -- complete blocks: a type absent on a day is a true zero
      SELECT g.d, g.event_type, coalesce(raw.c, 0) AS c
      FROM (SELECT dd.d, tt.event_type
            FROM (SELECT DISTINCT d FROM raw) dd
            CROSS JOIN (SELECT DISTINCT event_type FROM raw) tt) g
      LEFT JOIN raw ON raw.d = g.d AND raw.event_type = g.event_type
    ),
    ranked AS (
      -- 2*midrank stays integral under ties: 2*#less + #equal + 1
      SELECT c1.d, c1.event_type,
             2 * SUM(CASE WHEN c2.c < c1.c THEN 1 ELSE 0 END)
             + SUM(CASE WHEN c2.c = c1.c THEN 1 ELSE 0 END) + 1 AS r2
      FROM cells c1 JOIN cells c2 ON c1.d = c2.d
      GROUP BY c1.d, c1.event_type, c1.c
    ),
    sums AS (
      SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum
      FROM ranked GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM cells
    )
    SELECT sums.event_type, sums.r2_sum,
           round(12.0 / (dims.n * dims.k * (dims.k + 1))
                 * (SELECT SUM((s2.r2_sum / 2.0) * (s2.r2_sum / 2.0))
                    FROM sums s2)
                 - 3.0 * dims.n * (dims.k + 1), 4) AS chi2_f,
           CAST(dims.k - 1 AS BIGINT) AS df
    FROM sums CROSS JOIN dims
    ORDER BY sums.event_type
    """,
)
def q_friedman_test(spark, sf_dir):
    """R383 — Friedman test: days are blocks, event types are
    treatments; within each day the types get midranks by count
    (2·midrank = 2·#less + #equal + 1 — integral under ties, the
    q_kruskal_wallis device at block grain), and χ²_F =
    12/(nk(k+1))·Σ(R_j)² − 3n(k+1) rides the exact integer rank sums.
    Every within-block comparison is a ≤k×k lateral count — no
    windows, no sort. Detects consistent within-day ordering of the
    types even when absolute volumes drift day to day (the pairing
    Kruskal-Wallis would dilute). Per-type rank sums + the statistic
    stapled to each row."""
    ev = read_events(spark, sf_dir)
    raw = ev.groupBy(
        F.dayofmonth("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    days = raw.select("d").distinct()
    tps = raw.select("event_type").distinct()
    cells = (
        days.crossJoin(F.broadcast(tps))
        .join(raw, ["d", "event_type"], "left")
        .select("d", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    c1 = cells.select(
        F.col("d").alias("d1"),
        F.col("event_type").alias("t1"),
        F.col("c").alias("cv1"),
    )
    c2 = cells.select(F.col("d").alias("d2"), F.col("c").alias("cv2"))
    ranked = (
        c1.join(c2, F.col("d1") == F.col("d2"))
        .groupBy("d1", "t1", "cv1")
        .agg(
            (
                2
                * F.sum(
                    F.when(F.col("cv2") < F.col("cv1"), 1).otherwise(0)
                )
                + F.sum(
                    F.when(F.col("cv2") == F.col("cv1"), 1).otherwise(0)
                )
                + 1
            ).alias("r2")
        )
    )
    sums = ranked.groupBy(F.col("t1").alias("event_type")).agg(
        F.sum("r2").cast("long").alias("r2_sum")
    )
    dims = cells.agg(
        F.countDistinct("d").alias("n"),
        F.countDistinct("event_type").alias("k"),
    )
    ssq = sums.agg(
        F.sum(
            (F.col("r2_sum") / 2.0) * (F.col("r2_sum") / 2.0)
        ).alias("sq")
    )
    return (
        sums.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(ssq))
        .select(
            "event_type",
            "r2_sum",
            F.round(
                12.0
                / (F.col("n") * F.col("k") * (F.col("k") + 1))
                * F.col("sq")
                - 3.0 * F.col("n") * (F.col("k") + 1),
                4,
            ).alias("chi2_f"),
            (F.col("k") - 1).cast("long").alias("df"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R384 — Cronbach's alpha
# ===========================================================================

@register(
    "q_cronbach_alpha",
    """
    WITH items AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (
      SELECT u.user_id, t.event_type, coalesce(i.c, 0) AS c
      FROM users u CROSS JOIN types t
      LEFT JOIN items i ON i.user_id = u.user_id
                       AND i.event_type = t.event_type
    ),
    item_var AS (
      SELECT event_type,
             (SUM(c * c) - SUM(c) * 1.0 * SUM(c) / COUNT(*))
               / (COUNT(*) - 1) AS v
      FROM grid GROUP BY event_type
    ),
    totals AS (
      SELECT user_id, SUM(c) AS tot FROM grid GROUP BY user_id
    ),
    tot_var AS (
      SELECT (SUM(tot * tot) - SUM(tot) * 1.0 * SUM(tot) / COUNT(*))
               / (COUNT(*) - 1) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM totals
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM types)
    SELECT k.k AS n_items, tot_var.n_users,
           round((SELECT SUM(v) FROM item_var), 4) AS sum_item_var,
           round(tot_var.v, 4) AS total_var,
           round(k.k * 1.0 / (k.k - 1)
                 * (1.0 - (SELECT SUM(v) FROM item_var) / tot_var.v), 6)
             AS alpha
    FROM k CROSS JOIN tot_var
    """,
)
def q_cronbach_alpha(spark, sf_dir):
    """R384 — Cronbach's α with the five per-user event-type counts as
    items: α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total). The user×item grid is
    densified (absent counts are true zeros), every variance assembles
    from exact integer Σc and Σc² (the one division per variance is
    the only float op), and Σ item variances over k=5 rows cannot
    reorder. α near 1 ⇒ the counters co-move (one 'engagement'
    trait); near 0 ⇒ independent behaviors — the
    internal-consistency check before anyone averages the five
    counters into a score."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    items = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(items, ["user_id", "event_type"], "left")
        .select(
            "user_id", "event_type", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    item_var = grid.groupBy("event_type").agg(
        (
            (
                F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * 1.0 * F.sum("c") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("v")
    )
    totals = grid.groupBy("user_id").agg(F.sum("c").alias("tot"))
    tot_var = totals.agg(
        (
            (
                F.sum(F.col("tot") * F.col("tot"))
                - F.sum("tot") * 1.0 * F.sum("tot") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
        F.count(F.lit(1)).alias("n_users"),
    )
    siv = item_var.agg(F.sum("v").alias("siv"))
    k = types.agg(F.count(F.lit(1)).alias("k"))
    return (
        k.crossJoin(F.broadcast(tot_var))
        .crossJoin(F.broadcast(siv))
        .select(
            F.col("k").alias("n_items"),
            "n_users",
            F.round("siv", 4).alias("sum_item_var"),
            F.round("v", 4).alias("total_var"),
            F.round(
                F.col("k") * 1.0 / (F.col("k") - 1)
                * (1.0 - F.col("siv") / F.col("v")),
                6,
            ).alias("alpha"),
        )
    )


# ===========================================================================
# R385 — Laspeyres / Paasche / Fisher price indices
# ===========================================================================

@register(
    "q_price_index",
    f"""
    WITH parts AS (
      SELECT l_partkey AS pk,
             CASE WHEN l_shipdate < TIMESTAMP '{_PI_SPLIT}' THEN 0
                  ELSE 1 END AS period,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS q,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem
      GROUP BY 1, 2
    ),
    both_periods AS (
      SELECT p0.pk,
             p0.q AS q0, p0.cents AS c0,
             p1.q AS q1, p1.cents AS c1
      FROM parts p0 JOIN parts p1 ON p0.pk = p1.pk
      WHERE p0.period = 0 AND p1.period = 1
        AND p0.q > 0 AND p1.q > 0
    ),
    sums AS (
      -- Σp·q with p = cents/q: p1·q0 = c1·q0/q1 etc.; numerators and
      -- denominators kept as exact integer cross products
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_parts,
        SUM(CAST(round(c1 * 1.0 * q0 / q1) AS BIGINT)) AS p1q0,
        SUM(c0) AS p0q0,
        SUM(c1) AS p1q1,
        SUM(CAST(round(c0 * 1.0 * q1 / q0) AS BIGINT)) AS p0q1
      FROM both_periods
    )
    SELECT n_parts,
           round(p1q0 * 1.0 / p0q0, 6) AS laspeyres,
           round(p1q1 * 1.0 / p0q1, 6) AS paasche,
           round(sqrt((p1q0 * 1.0 / p0q0) * (p1q1 * 1.0 / p0q1)), 6)
             AS fisher
    FROM sums
    """,
)
def q_price_index(spark, sf_dir):
    """R385 — price-index family between the pre/post-{d} periods of
    the lineitem fact, baskets at part grain (q = Σquantity, unit
    price = Σcents/q): Laspeyres Σp₁q₀/Σp₀q₀ (base basket — overstates
    inflation), Paasche Σp₁q₁/Σp₀q₁ (current basket — understates),
    Fisher = their geometric mean (the superlative index). Quantities
    and cents stay integer through the grouping; each Σp·q term is a
    sum of single-division exact-integer cross products. Fisher lies
    between the other two by construction — asserted in tests.
    One keyed agg + a part-grain self-join on the two periods.""".format(
        d=_PI_SPLIT
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.when(
            F.col("l_shipdate") < F.lit(_PI_SPLIT).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
    ).agg(
        F.sum(F.round("l_quantity").cast("long")).alias("q"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents"),
    )
    p0 = parts.filter((F.col("period") == 0) & (F.col("q") > 0)).select(
        "pk", F.col("q").alias("q0"), F.col("cents").alias("c0")
    )
    p1 = parts.filter((F.col("period") == 1) & (F.col("q") > 0)).select(
        "pk", F.col("q").alias("q1"), F.col("cents").alias("c1")
    )
    both = p0.join(p1, "pk")
    sums = both.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(
            F.round(F.col("c1") * 1.0 * F.col("q0") / F.col("q1"))
            .cast("long")
        ).alias("p1q0"),
        F.sum("c0").alias("p0q0"),
        F.sum("c1").alias("p1q1"),
        F.sum(
            F.round(F.col("c0") * 1.0 * F.col("q1") / F.col("q0"))
            .cast("long")
        ).alias("p0q1"),
    )
    return sums.select(
        "n_parts",
        F.round(F.col("p1q0") * 1.0 / F.col("p0q0"), 6).alias("laspeyres"),
        F.round(F.col("p1q1") * 1.0 / F.col("p0q1"), 6).alias("paasche"),
        F.round(
            F.sqrt(
                (F.col("p1q0") * 1.0 / F.col("p0q0"))
                * (F.col("p1q1") * 1.0 / F.col("p0q1"))
            ),
            6,
        ).alias("fisher"),
    )
