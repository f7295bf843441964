"""Round-5 registry additions, batch 138 — the transport PLAN, and two
classical exchangeability tests:

- q_transport_plan: the 1-D optimal transport plan itself (not just
  W₁ = q_wasserstein_1d's cost): in one dimension the optimal
  coupling is the monotone rearrangement, so the mass flowing from
  source value a to target value b is EXACTLY the overlap of their
  cumulative-mass intervals — an interval-intersection JOIN on the
  integer common denominator n_A·n_B. The plan is what q_wasserstein
  integrates; here it materializes (top flows by mass).
- q_record_days: records test — the count of record-breaking days in
  an exchangeable series is Σ1/i ≈ ln n + γ regardless of the
  distribution; observed records vs that expectation flags trend
  without any distributional assumption.
- q_turning_points: turning-points test — local extrema count in an
  iid series concentrates at 2(n−2)/3 with variance (16n−29)/90;
  the z-score flags serial dependence (too few turns = trend/
  stickiness, too many = negative autocorrelation). Pure integer
  comparisons over the calendar frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions import distrank
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_TP_TOP = 15


# ===========================================================================
# R407 — 1-D optimal transport plan
# ===========================================================================

@register(
    "q_transport_plan",
    """
    WITH a AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    na AS (SELECT SUM(c) AS n FROM a),
    nb AS (SELECT SUM(c) AS n FROM b),
    ca AS (
      -- cumulative mass interval of each source atom, on the common
      -- denominator n_a * n_b: [lo, hi) with hi - lo = c * n_b
      SELECT v, (SUM(c) OVER (ORDER BY v) - c) * (SELECT n FROM nb) AS lo,
             SUM(c) OVER (ORDER BY v) * (SELECT n FROM nb) AS hi
      FROM a
    ),
    cb AS (
      SELECT v, (SUM(c) OVER (ORDER BY v) - c) * (SELECT n FROM na) AS lo,
             SUM(c) OVER (ORDER BY v) * (SELECT n FROM na) AS hi
      FROM b
    ),
    flows AS (
      SELECT ca.v AS from_v, cb.v AS to_v,
             least(ca.hi, cb.hi) - greatest(ca.lo, cb.lo) AS mass
      FROM ca JOIN cb
        ON ca.lo < cb.hi AND cb.lo < ca.hi
    )
    SELECT round(from_v / 100.0, 2) AS from_value,
           round(to_v / 100.0, 2) AS to_value,
           CAST(mass AS BIGINT) AS mass_units,
           round(abs(from_v - to_v) * mass
                 / (100.0 * (SELECT n FROM na) * (SELECT n FROM nb)), 6)
             AS cost_contrib
    FROM flows
    ORDER BY mass DESC, from_value, to_value
    LIMIT 15
    """,
)
def q_transport_plan(spark, sf_dir):
    """R407 — the 1-D optimal transport PLAN between the click and
    purchase value distributions: the monotone (Hoeffding-Fréchet)
    coupling is optimal in 1-D, and each (source atom, target atom)
    flow is EXACTLY the intersection length of their cumulative-mass
    intervals on the integer common denominator n_A·n_B — so the plan
    is an interval JOIN over the two distinct-value frames (cumulative
    bounds from distrank, no unpartitioned window in the Spark plan),
    every mass an exact integer, and Σ cost_contrib reproduces
    q_wasserstein_1d's W₁ (the identity the test asserts). Top-{t}
    flows by mass: WHERE the distribution shift moves its
    probability.""".format(t=_TP_TOP)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def atoms(t):
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy(
                F.round(F.col("value") * 100).cast("long").alias("v")
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )

    a, b = atoms("click"), atoms("purchase")
    sa, n_a, tot_a = distrank.zip_scan(a, ["v"], out="_i", scan_col="c",
                                       scan_out="cum")
    sb, n_b, tot_b = distrank.zip_scan(b, ["v"], out="_i", scan_col="c",
                                       scan_out="cum")
    # r11: zip_scan already returns Σc as its scan total — the two
    # separate sum-agg collect jobs this used to run were pure waste.
    na = int(tot_a or 0)
    nb = int(tot_b or 0)
    ca = sa.select(
        F.col("v").alias("av"),
        ((F.col("cum").cast("long") - F.col("c")) * nb).alias("alo"),
        (F.col("cum").cast("long") * nb).alias("ahi"),
    )
    cb = sb.select(
        F.col("v").alias("bv"),
        ((F.col("cum").cast("long") - F.col("c")) * na).alias("blo"),
        (F.col("cum").cast("long") * na).alias("bhi"),
    )
    # Band-bucketed equi-join (r11, VERDICT r10 "Next round" #7; guide
    # §3.1): the raw overlap condition is a BroadcastNestedLoopJoin over
    # |A_atoms| × |B_atoms| interval pairs (census 8.6-9.6 s at sf0.1).
    # Both interval sets tile [0, na·nb) contiguously (they are
    # cumulative-mass staircases), so replicate each interval into the
    # fixed-width bands it spans — band width ≈ one interval per band on
    # average, known driver-side from the atom counts zip_scan already
    # returned — and hash-join on the band key.  A pair overlapping
    # several shared bands is kept exactly once: in the band containing
    # greatest(alo, blo), the start of the intersection, which both
    # intervals provably cover.  Same flows, exact integer masses.
    w = max(1, (na * nb) // max(n_a + n_b, 1))
    banded_a = ca.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor(F.col("alo") / w), F.floor((F.col("ahi") - 1) / w)
            )
        ),
    )
    banded_b = cb.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor(F.col("blo") / w), F.floor((F.col("bhi") - 1) / w)
            )
        ),
    )
    flows = (
        banded_a.join(banded_b, "band")
        .filter(
            (F.col("alo") < F.col("bhi"))
            & (F.col("blo") < F.col("ahi"))
            & (
                F.col("band")
                == F.floor(F.greatest("alo", "blo") / w)
            )
        )
        .select(
            F.col("av").alias("from_v"),
            F.col("bv").alias("to_v"),
            (
                F.least("ahi", "bhi") - F.greatest("alo", "blo")
            ).alias("mass"),
        )
    )
    return (
        flows.select(
            F.round(F.col("from_v") / 100.0, 2).alias("from_value"),
            F.round(F.col("to_v") / 100.0, 2).alias("to_value"),
            F.col("mass").cast("long").alias("mass_units"),
            F.round(
                F.abs(F.col("from_v") - F.col("to_v"))
                * F.col("mass")
                / (100.0 * na * nb),
                6,
            ).alias("cost_contrib"),
        )
        .orderBy(F.col("mass_units").desc(), "from_value", "to_value")
        .limit(_TP_TOP)
    )


# ===========================================================================
# R408 — records test
# ===========================================================================

@register(
    "q_record_days",
    """
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    rec AS (
      SELECT a.d,
             CASE WHEN NOT EXISTS (SELECT 1 FROM daily b
                                   WHERE b.d < a.d AND b.c >= a.c)
                  THEN 1 ELSE 0 END AS is_record
      FROM daily a
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    harm AS (
      SELECT SUM(1.0 / i.i) AS h
      FROM (SELECT unnest(range(1, 1 + CAST((SELECT n FROM n) AS INTEGER)))
              AS i) i
    )
    SELECT (SELECT n FROM n) AS n_days,
           CAST(SUM(rec.is_record) AS BIGINT) AS n_records,
           round(harm.h, 4) AS expected_records,
           round((SUM(rec.is_record) - harm.h)
                 / sqrt(harm.h - 1.6449), 4) AS z_approx
    FROM rec CROSS JOIN harm
    GROUP BY harm.h
    """,
)
def q_record_days(spark, sf_dir):
    """R408 — records test on the daily counts: a day is a RECORD if
    it strictly beats every earlier day; under exchangeability the
    expected record count is H_n = Σ1/i and the variance H_n − π²/6
    (both distribution-free — the magic of records theory). The
    anti-join 'no earlier day ≥ me' is a bounded self-join over the
    calendar frame; H_n comes from an exact literal-range sum. Too
    many records = upward trend, caught with ZERO distributional
    assumptions — the cheapest trend alarm there is."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = daily.count()
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    beaten = (
        a.join(b, (F.col("db") < F.col("da")) & (F.col("cb") >= F.col("ca")))
        .select("da")
        .distinct()
    )
    records = a.join(beaten, "da", "left_anti")
    h = sum(1.0 / i for i in range(1, n + 1))
    return records.agg(
        F.lit(n).cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.lit(round(h, 4)).alias("expected_records"),
        F.round(
            (F.count(F.lit(1)) - F.lit(h)) / F.lit((h - 1.6449) ** 0.5), 4
        ).alias("z_approx"),
    )


# ===========================================================================
# R409 — turning-points test
# ===========================================================================

@register(
    "q_turning_points",
    """
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    triples AS (
      SELECT m.d,
             CASE WHEN (m.c > l.c AND m.c > r.c)
                    OR (m.c < l.c AND m.c < r.c)
                  THEN 1 ELSE 0 END AS turn
      FROM daily m
      JOIN daily l ON l.d = m.d - 1
      JOIN daily r ON r.d = m.d + 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
    SELECT (SELECT n FROM n) AS n_days,
           CAST(SUM(turn) AS BIGINT) AS turning_points,
           round(2.0 * ((SELECT n FROM n) - 2) / 3.0, 4) AS expected,
           round((SUM(turn) - 2.0 * ((SELECT n FROM n) - 2) / 3.0)
                 / sqrt((16.0 * (SELECT n FROM n) - 29.0) / 90.0), 4)
             AS z
    FROM triples
    """,
)
def q_turning_points(spark, sf_dir):
    """R409 — turning-points test: count strict local extrema in the
    daily series (adjacent-day self-joins — exact integer comparisons,
    no windows), compare to the iid expectation 2(n−2)/3 with variance
    (16n−29)/90. Negative z = too few turns (momentum/trend), positive
    = too many (oscillation) — the serial-dependence alarm that
    complements q_runs_test's sign-based view with a shape-based one.
    Calendar-bounded self-joins + one closed form."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = daily.count()
    m = daily.select(F.col("d").alias("dm"), F.col("c").alias("cm"))
    l = daily.select((F.col("d") + 1).alias("dm"), F.col("c").alias("cl"))
    r = daily.select((F.col("d") - 1).alias("dm"), F.col("c").alias("cr"))
    triples = m.join(l, "dm").join(r, "dm").select(
        F.when(
            ((F.col("cm") > F.col("cl")) & (F.col("cm") > F.col("cr")))
            | ((F.col("cm") < F.col("cl")) & (F.col("cm") < F.col("cr"))),
            1,
        )
        .otherwise(0)
        .alias("turn")
    )
    exp = 2.0 * (n - 2) / 3.0
    sd = ((16.0 * n - 29.0) / 90.0) ** 0.5
    return triples.agg(
        F.lit(n).cast("long").alias("n_days"),
        F.sum("turn").cast("long").alias("turning_points"),
        F.lit(round(exp, 4)).alias("expected"),
        F.round((F.sum("turn") - F.lit(exp)) / F.lit(sd), 4).alias("z"),
    )
