"""Round-5 registry additions, batch 110 — probabilistic record
linkage, randomization inference, and exact integer geometry:

- q_record_linkage: Fellegi-Sunter probabilistic record linkage —
  block → candidate pairs → per-field agreement vector → Σ log2(m/u)
  match weight → link / possible / non_link verdict, with ground-truth
  precision alongside (the dirty B side is a deterministic perturbation
  of customer, so true matches are known). The entity-resolution
  pattern every warehouse MDM pipeline runs; blocking keeps the pair
  space at Σ_b |A_b|·|B_b| instead of |A|·|B|.
- q_permutation_test: two-sample randomization test for the
  click-vs-purchase mean value difference — K=100 deterministic
  hash-seeded relabelings, each a keyed agg over the exploded
  (row × perm) frame; p = (1 + #{|stat_p| ≥ |obs|}) / (K+1). All
  group sums are integer cents (IEEE-exact, order-independent), so
  the statistic is bit-identical across engines and partitionings.
- q_city_polygons: per-city star-shaped polygon (vertices in
  pseudo-angle order around the centroid) with EXACT integer shoelace
  area — coordinates scaled to 1e-4° ints, so the cross products and
  their sum are exact BIGINT arithmetic (the classic robust-geometry
  trick: floats order the vertices, integers measure them); perimeter
  accumulates integer-rounded segment lengths for the same
  order-independence.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS_NONULL, derived_points

_P = 2147483647

# ===========================================================================
# R327 — Fellegi-Sunter record linkage
# ===========================================================================

# literal m/u conditional-agreement probabilities (FS weights as
# configuration; estimating them by EM is a fitting concern, not a
# linkage-scan concern)
_FS = {
    "name": (0.9, 0.001),
    "bal": (0.95, 0.3),
    "seg": (0.98, 0.25),
}
_FS_LINK, _FS_NONLINK = 6.0, 0.0


def _w(field):
    import math

    m, u = _FS[field]
    return (
        round(math.log2(m / u), 6),
        round(math.log2((1 - m) / (1 - u)), 6),
    )


_WN_A, _WN_D = _w("name")
_WB_A, _WB_D = _w("bal")
_WS_A, _WS_D = _w("seg")

_SQL_DIRTY = """
    SELECT c_custkey AS b_id,
           c_nationkey AS b_nation,
           CASE WHEN c_custkey % 10 = 0 THEN c_custkey + 1000000
                ELSE c_custkey END AS b_digits,
           c_acctbal + ((c_custkey * 7) % 21 - 10) AS b_bal,
           CASE WHEN c_custkey % 17 = 0 THEN 'BUILDING'
                ELSE c_mktsegment END AS b_seg
    FROM customer
"""


@register(
    "q_record_linkage",
    f"""
    WITH b AS ({_SQL_DIRTY}),
    pairs AS (
      SELECT a.c_custkey AS a_id, b.b_id,
             (a.c_custkey = b.b_digits) AS g_name,
             (abs(a.c_acctbal - b.b_bal) <= 5.5) AS g_bal,
             (a.c_mktsegment = b.b_seg) AS g_seg
      FROM customer a JOIN b ON a.c_nationkey = b.b_nation
    ),
    scored AS (
      SELECT a_id, b_id,
             (CASE WHEN g_name THEN {_WN_A} ELSE {_WN_D} END
              + CASE WHEN g_bal THEN {_WB_A} ELSE {_WB_D} END)
              + CASE WHEN g_seg THEN {_WS_A} ELSE {_WS_D} END AS score
      FROM pairs
    ),
    verdicts AS (
      SELECT CASE WHEN score >= {_FS_LINK} THEN 'link'
                  WHEN score <= {_FS_NONLINK} THEN 'non_link'
                  ELSE 'possible' END AS verdict,
             CASE WHEN a_id = b_id THEN 1 ELSE 0 END AS is_true,
             score
      FROM scored
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_true) AS BIGINT) AS n_true,
           round(SUM(is_true) * 1.0 / COUNT(*), 4) AS true_frac,
           round(MIN(score), 4) AS min_score,
           round(MAX(score), 4) AS max_score
    FROM verdicts
    GROUP BY verdict
    ORDER BY verdict
    """,
)
def q_record_linkage(spark, sf_dir):
    """R327 — Fellegi-Sunter record linkage. A = customer; B = a
    deterministic dirty copy (every 10th name corrupted, acctbal
    jittered by an integer in [-10, 10], every 17th segment rewritten).
    Blocking on nationkey bounds the candidate space; the agreement
    vector is (name digits equal, |bal diff| ≤ 5.5, segment equal);
    score = Σ log2(m/u) for agreeing fields + Σ log2((1−m)/(1−u)) for
    disagreeing — the classic log-likelihood-ratio match weight with
    literal m/u. Verdict thresholds at {lk}/{nl}; ground truth
    (a_id = b_id) is known by construction, so the rollup reports
    per-verdict true-match fractions — links should be ~pure, non_links
    ~empty of true pairs. Integer jitter keeps |bal diff| an
    IEEE-exact double, and the 5.5 threshold sits between integers, so
    the agreement bit can never be engine-dependent. One blocked join +
    one keyed agg; at 100 TB block keys shard the pair generation and
    the agg is map-side partial.""".format(lk=_FS_LINK, nl=_FS_NONLINK)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    b = cust.select(
        F.col("c_custkey").alias("b_id"),
        F.col("c_nationkey").alias("b_nation"),
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_custkey") + 1000000
        )
        .otherwise(F.col("c_custkey"))
        .alias("b_digits"),
        (
            F.col("c_acctbal")
            + ((F.col("c_custkey") * 7) % 21 - 10)
        ).alias("b_bal"),
        F.when(F.col("c_custkey") % 17 == 0, F.lit("BUILDING"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
    )
    pairs = cust.join(
        b, cust["c_nationkey"] == b["b_nation"]
    ).select(
        F.col("c_custkey").alias("a_id"),
        "b_id",
        (F.col("c_custkey") == F.col("b_digits")).alias("g_name"),
        (F.abs(F.col("c_acctbal") - F.col("b_bal")) <= 5.5).alias("g_bal"),
        (F.col("c_mktsegment") == F.col("b_seg")).alias("g_seg"),
    )
    scored = pairs.select(
        "a_id",
        "b_id",
        (
            (
                F.when(F.col("g_name"), F.lit(_WN_A)).otherwise(F.lit(_WN_D))
                + F.when(F.col("g_bal"), F.lit(_WB_A)).otherwise(F.lit(_WB_D))
            )
            + F.when(F.col("g_seg"), F.lit(_WS_A)).otherwise(F.lit(_WS_D))
        ).alias("score"),
    )
    verdicts = scored.select(
        F.when(F.col("score") >= _FS_LINK, F.lit("link"))
        .when(F.col("score") <= _FS_NONLINK, F.lit("non_link"))
        .otherwise(F.lit("possible"))
        .alias("verdict"),
        F.when(F.col("a_id") == F.col("b_id"), 1).otherwise(0).alias(
            "is_true"
        ),
        "score",
    )
    return (
        verdicts.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("is_true").alias("n_true"),
            F.round(
                F.sum("is_true") * F.lit(1.0) / F.count(F.lit(1)), 4
            ).alias("true_frac"),
            F.round(F.min("score"), 4).alias("min_score"),
            F.round(F.max("score"), 4).alias("max_score"),
        )
        .orderBy("verdict")
    )


# ===========================================================================
# R328 — deterministic two-sample permutation (randomization) test
# ===========================================================================

_PT_K = 100
_SQL_PT_LABEL = (
    f"((event_id % {_P}) * 2654435761 + p * 100003 + 12345) % {_P} % 2"
)


@register(
    "q_permutation_test",
    f"""
    WITH ev AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    obs AS (
      SELECT SUM(CASE WHEN event_type = 'click' THEN CAST(round(value * 100) AS BIGINT) END)
               / (100.0 * SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END))
             - SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) END)
               / (100.0 * SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END))
             AS obs_stat
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    perms AS (
      SELECT ev.cents, t.p, {_SQL_PT_LABEL} AS lbl
      FROM ev CROSS JOIN (SELECT unnest(range(1, {_PT_K} + 1)) AS p) t
    ),
    stats AS (
      SELECT p,
             SUM(CASE WHEN lbl = 0 THEN cents END)
               / (100.0 * SUM(CASE WHEN lbl = 0 THEN 1 ELSE 0 END))
             - SUM(CASE WHEN lbl = 1 THEN cents END)
               / (100.0 * SUM(CASE WHEN lbl = 1 THEN 1 ELSE 0 END))
             AS stat
      FROM perms GROUP BY p
    )
    SELECT round(obs.obs_stat, 4) AS obs_stat,
           CAST({_PT_K} AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN abs(stats.stat) >= abs(obs.obs_stat)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((1.0 + SUM(CASE WHEN abs(stats.stat) >= abs(obs.obs_stat)
                                 THEN 1 ELSE 0 END)) / ({_PT_K} + 1.0), 4)
             AS p_value,
           round(MIN(stats.stat), 4) AS null_min,
           round(MAX(stats.stat), 4) AS null_max
    FROM stats CROSS JOIN obs
    GROUP BY obs.obs_stat
    """,
)
def q_permutation_test(spark, sf_dir):
    """R328 — two-sample randomization test, K={k} deterministic
    permutations. Each permutation relabels every row by the portable
    affine hash of (event_id, perm) — seeded, partition-invariant, no
    RNG state — and the null statistic is the mean difference under
    that relabeling. Group sums are integer cents (exact, commutative)
    so every stat_p is a deterministic double and the p-value
    (1 + #extreme)/(K+1) is bit-stable across engines, partition counts
    and 100× scale-ups. Shape: one K-way explode (linear in K·n) →
    keyed agg per perm → K-row comparison against the broadcast
    observed stat. The exact-inference fallback when the t-test's
    normality assumption (q_welch_ttest) is in doubt.""".format(k=_PT_K)
    ev_all = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    obs = ev_all.agg(
        (
            F.sum(F.when(F.col("event_type") == "click", cents))
            / (
                100.0
                * F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
            )
            - F.sum(F.when(F.col("event_type") == "purchase", cents))
            / (
                100.0
                * F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
            )
        ).alias("obs_stat")
    )
    perms = ev_all.select(
        cents.alias("cents"),
        F.explode(F.sequence(F.lit(1), F.lit(_PT_K))).alias("p"),
        "event_id",
    ).select(
        "cents",
        "p",
        (
            (
                F.pmod("event_id", F.lit(_P)) * 2654435761
                + F.col("p") * 100003
                + 12345
            )
            % _P
            % 2
        ).alias("lbl"),
    )
    stats = perms.groupBy("p").agg(
        (
            F.sum(F.when(F.col("lbl") == 0, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("lbl") == 0, 1).otherwise(0)))
            - F.sum(F.when(F.col("lbl") == 1, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("lbl") == 1, 1).otherwise(0)))
        ).alias("stat")
    )
    extreme = F.sum(
        F.when(
            F.abs(F.col("stat")) >= F.abs(F.col("obs_stat")), 1
        ).otherwise(0)
    )
    return (
        stats.crossJoin(F.broadcast(obs))
        .groupBy("obs_stat")
        .agg(
            F.lit(_PT_K).cast("long").alias("n_perms"),
            extreme.cast("long").alias("n_extreme"),
            F.round(
                (1.0 + extreme) / (_PT_K + 1.0), 4
            ).alias("p_value"),
            F.round(F.min("stat"), 4).alias("null_min"),
            F.round(F.max("stat"), 4).alias("null_max"),
        )
        .select(
            F.round("obs_stat", 4).alias("obs_stat"),
            "n_perms",
            "n_extreme",
            "p_value",
            "null_min",
            "null_max",
        )
    )


# ===========================================================================
# R329 — per-city polygon metrics via exact integer shoelace
# ===========================================================================

_GEO_SCALE = 10_000  # 1e-4 degree integer grid (~11 m)


@register(
    "q_city_polygons",
    f"""
    WITH pts AS (
      SELECT id, city,
             CAST(round(lng * {_GEO_SCALE}) AS BIGINT) AS x,
             CAST(round(lat * {_GEO_SCALE}) AS BIGINT) AS y
      FROM ({SQL_POINTS_NONULL})
    ),
    ctr AS (
      SELECT city, CAST(floor(AVG(x)) AS BIGINT) AS cx,
             CAST(floor(AVG(y)) AS BIGINT) AS cy
      FROM pts GROUP BY city
    ),
    rel AS (
      SELECT pts.id, pts.city, pts.x, pts.y,
             pts.x - ctr.cx AS dx, pts.y - ctr.cy AS dy
      FROM pts JOIN ctr USING (city)
    ),
    ang AS (
      SELECT id, city, x, y,
             CASE WHEN abs(dx) + abs(dy) = 0 THEN 0.0
                  WHEN dy >= 0 THEN 1.0 - dx / (abs(dx) + abs(dy))
                  ELSE 3.0 + dx / (abs(dx) + abs(dy)) END AS pangle
      FROM rel
    ),
    ring AS (
      SELECT city, x, y,
             coalesce(lead(x) OVER w, first_value(x) OVER w) AS xn,
             coalesce(lead(y) OVER w, first_value(y) OVER w) AS yn
      FROM ang
      WINDOW w AS (PARTITION BY city ORDER BY pangle, id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    )
    SELECT city,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           round(abs(SUM(x * yn - xn * y)) / (2.0 * {_GEO_SCALE} * {_GEO_SCALE}), 6)
             AS area_deg2,
           round(SUM(CAST(round(sqrt((xn - x) * (xn - x) * 1.0
                                     + (yn - y) * (yn - y))) AS BIGINT))
                   / ({_GEO_SCALE} * 1.0), 4) AS perimeter_deg
    FROM ring
    GROUP BY city
    ORDER BY city
    """,
)
def q_city_polygons(spark, sf_dir):
    """R329 — per-city star-shaped polygon metrics with EXACT integer
    shoelace area. Coordinates snap to a 1e-4° integer grid; vertices
    are ordered by the float-free pseudo-angle around the integer
    centroid (only +,−,/ on ints → IEEE-exact, identical in every
    engine, unlike atan2/libm); the shoelace cross products and their
    sum are then pure BIGINT arithmetic — order-independent and
    overflow-safe (each |x·yn| < 2^41 at this grid, so the per-city sum
    stays < 2^63 up to ~4M vertices; the grid scale is the knob if a
    city exceeds that). Perimeter sums integer-rounded segment
    lengths (sqrt IS correctly-rounded per IEEE-754, so the rounded
    micro-lengths match cross-engine; the integer sum is commutative).
    The robust-geometry split: floats may ORDER, only integers may
    MEASURE. Window is partitioned by city (bounded by the city's point
    count); everything else is keyed aggs."""
    pts = derived_points(spark, sf_dir, with_nulls=False).select(
        "id",
        "city",
        F.round(F.col("lng") * _GEO_SCALE).cast("long").alias("x"),
        F.round(F.col("lat") * _GEO_SCALE).cast("long").alias("y"),
    )
    ctr = pts.groupBy("city").agg(
        F.floor(F.avg("x")).cast("long").alias("cx"),
        F.floor(F.avg("y")).cast("long").alias("cy"),
    )
    rel = pts.join(F.broadcast(ctr), "city").select(
        "id",
        "city",
        "x",
        "y",
        (F.col("x") - F.col("cx")).alias("dx"),
        (F.col("y") - F.col("cy")).alias("dy"),
    )
    denom = F.abs(F.col("dx")) + F.abs(F.col("dy"))
    ang = rel.select(
        "id",
        "city",
        "x",
        "y",
        F.when(denom == 0, F.lit(0.0))
        .when(
            F.col("dy") >= 0, F.lit(1.0) - F.col("dx") / denom
        )
        .otherwise(F.lit(3.0) + F.col("dx") / denom)
        .alias("pangle"),
    )
    w = Window.partitionBy("city").orderBy("pangle", "id")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ring = ang.select(
        "city",
        "x",
        "y",
        F.coalesce(
            F.lead("x").over(w), F.first("x").over(wfull)
        ).alias("xn"),
        F.coalesce(
            F.lead("y").over(w), F.first("y").over(wfull)
        ).alias("yn"),
    )
    seg = F.round(
        F.sqrt(
            (F.col("xn") - F.col("x")) * (F.col("xn") - F.col("x")) * 1.0
            + (F.col("yn") - F.col("y")) * (F.col("yn") - F.col("y"))
        )
    ).cast("long")
    return (
        ring.groupBy("city")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(
                F.abs(
                    F.sum(
                        F.col("x") * F.col("yn") - F.col("xn") * F.col("y")
                    )
                )
                / (2.0 * _GEO_SCALE * _GEO_SCALE),
                6,
            ).alias("area_deg2"),
            F.round(F.sum(seg) / (_GEO_SCALE * 1.0), 4).alias(
                "perimeter_deg"
            ),
        )
        .orderBy("city")
    )
