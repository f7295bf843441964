"""Round-5 registry additions, batch 132 — community quality,
intervention analysis, and factorial ANOVA:

- q_graph_modularity: Newman modularity Q = Σᵢ(eᵢᵢ − aᵢ²) of the
  LABEL partition over the mutual 5-NN embedding graph — the quality
  score community detection is judged by (Q > 0 ⇒ labels capture more
  intra-edges than chance). Within/degree sums are exact integers off
  the kNN edge list; one division per community.
- q_interrupted_ts: interrupted time-series (segmented regression) at
  a known intervention day — closed-form OLS of count on
  {1, t, post, t·post} solved per-segment (two independent 2-var fits
  — algebraically identical to the full interaction model): pre/post
  level and slope with the level-jump and slope-change deltas. The
  causal readout for "we shipped on day D — did the curve move?"
  (the designed-experiment tools R342/R350 can't help when everyone
  is treated at once).
- q_twoway_anova: two-way factorial ANOVA (event_type × weekday) on
  purchase values with the interaction term — SS_A, SS_B, SS_AB,
  SS_within from exact integer-cent cell moments; F ratios closed
  form. The main-effects-vs-interaction decomposition q_anova_f's
  one-way design can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_ITS_DAY = 16  # intervention day


# ===========================================================================
# R389 — Newman modularity of the label partition
# ===========================================================================

_SQL_KNN_EDGES = """
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cos DESC, dst) AS rk
        FROM scored
      ) WHERE rk <= 5
    ),
    mutual AS (
      SELECT a.src AS u, a.dst AS w
      FROM knn a JOIN knn b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src < a.dst
    )
"""


@register(
    "q_graph_modularity",
    f"""
    {_SQL_KNN_EDGES},
    lab AS (SELECT vec_id, label FROM embeddings),
    edges AS (
      SELECT mutual.u, mutual.w, lu.label AS cu, lw.label AS cw
      FROM mutual
      JOIN lab lu ON lu.vec_id = mutual.u
      JOIN lab lw ON lw.vec_id = mutual.w
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM edges),
    within AS (
      SELECT cu AS label, CAST(COUNT(*) AS BIGINT) AS e_in
      FROM edges WHERE cu = cw GROUP BY cu
    ),
    degsum AS (
      SELECT label, CAST(SUM(d) AS BIGINT) AS deg
      FROM (
        SELECT cu AS label, COUNT(*) AS d FROM edges GROUP BY cu
        UNION ALL
        SELECT cw, COUNT(*) FROM edges GROUP BY cw
      ) GROUP BY label
    ),
    per_comm AS (
      SELECT degsum.label,
             coalesce(within.e_in, 0) AS e_in,
             degsum.deg
      FROM degsum LEFT JOIN within ON within.label = degsum.label
    )
    SELECT per_comm.label, per_comm.e_in, per_comm.deg,
           round(SUM(per_comm.e_in * 1.0 / m.m_edges
                     - (per_comm.deg * 0.5 / m.m_edges)
                       * (per_comm.deg * 0.5 / m.m_edges))
                 OVER (), 6) AS modularity_q
    FROM per_comm CROSS JOIN m
    ORDER BY per_comm.label
    """,
)
def q_graph_modularity(spark, sf_dir):
    """R389 — Newman modularity of the given label partition over the
    mutual 5-NN graph: Q = Σᵢ (eᵢᵢ/m − (dᵢ/2m)²) with eᵢᵢ =
    intra-community edges and dᵢ = community degree sum — all exact
    integers off the edge list (the q_kcore mutual-graph
    construction); per-community terms are deterministic doubles and
    the Σ runs over |labels| rows. Q ≈ 0 ⇒ the labels don't explain
    the graph; Q > 0.3 ⇒ real community structure — the score that
    turns q_label_prop's output from 'some labels' into 'good
    communities'. Per-community rows + the global Q stapled on."""
    from arrow_supercluster_spark.plans.registry_ext import _emb
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact

    emb = _emb(spark, sf_dir)
    ed = knn_edges_exact(emb, 5)
    rev = ed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = (
        ed.join(rev, ["a", "b"])
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("w"))
    )
    lab = emb.select("vec_id", "label")
    edges = (
        mutual.join(
            lab.select(F.col("vec_id").alias("u"), F.col("label").alias("cu")),
            "u",
        )
        .join(
            lab.select(F.col("vec_id").alias("w"), F.col("label").alias("cw")),
            "w",
        )
    )
    m_edges = edges.count()
    within = edges.filter(F.col("cu") == F.col("cw")).groupBy(
        F.col("cu").alias("label")
    ).agg(F.count(F.lit(1)).alias("e_in"))
    degsum = (
        edges.select(F.col("cu").alias("label"))
        .unionByName(edges.select(F.col("cw").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    per_comm = degsum.join(within, "label", "left").select(
        "label",
        F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
        F.col("deg").cast("long").alias("deg"),
    )
    q = per_comm.agg(
        F.round(
            F.sum(
                F.col("e_in") * 1.0 / m_edges
                - (F.col("deg") * 0.5 / m_edges)
                * (F.col("deg") * 0.5 / m_edges)
            ),
            6,
        ).alias("modularity_q")
    )
    return (
        per_comm.crossJoin(F.broadcast(q))
        .select("label", "e_in", "deg", "modularity_q")
        .orderBy("label")
    )


# ===========================================================================
# R390 — interrupted time series (segmented regression)
# ===========================================================================

def _sql_seg(name: str, cond: str) -> str:
    return f"""
    {name} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(d) AS sx, SUM(c) AS sy,
             SUM(d * c) AS sxy, SUM(d * d) AS sxx
      FROM daily WHERE {cond}
    )"""


@register(
    "q_interrupted_ts",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    {_sql_seg('pre', f'd < {_ITS_DAY}')},
    {_sql_seg('post', f'd >= {_ITS_DAY}')}
    SELECT
      round((pre.sxy - pre.sx * 1.0 * pre.sy / pre.n)
            / (pre.sxx - pre.sx * 1.0 * pre.sx / pre.n), 6) AS slope_pre,
      round((post.sxy - post.sx * 1.0 * post.sy / post.n)
            / (post.sxx - post.sx * 1.0 * post.sx / post.n), 6)
        AS slope_post,
      round(pre.sy * 1.0 / pre.n
            - (pre.sxy - pre.sx * 1.0 * pre.sy / pre.n)
              / (pre.sxx - pre.sx * 1.0 * pre.sx / pre.n)
              * (pre.sx * 1.0 / pre.n), 4) AS intercept_pre,
      round(((post.sy * 1.0 / post.n
              - (post.sxy - post.sx * 1.0 * post.sy / post.n)
                / (post.sxx - post.sx * 1.0 * post.sx / post.n)
                * (post.sx * 1.0 / post.n))
             + (post.sxy - post.sx * 1.0 * post.sy / post.n)
               / (post.sxx - post.sx * 1.0 * post.sx / post.n)
               * {_ITS_DAY})
            - ((pre.sy * 1.0 / pre.n
                - (pre.sxy - pre.sx * 1.0 * pre.sy / pre.n)
                  / (pre.sxx - pre.sx * 1.0 * pre.sx / pre.n)
                  * (pre.sx * 1.0 / pre.n))
               + (pre.sxy - pre.sx * 1.0 * pre.sy / pre.n)
                 / (pre.sxx - pre.sx * 1.0 * pre.sx / pre.n)
                 * {_ITS_DAY}), 4) AS level_change_at_d,
      round((post.sxy - post.sx * 1.0 * post.sy / post.n)
            / (post.sxx - post.sx * 1.0 * post.sx / post.n)
            - (pre.sxy - pre.sx * 1.0 * pre.sy / pre.n)
              / (pre.sxx - pre.sx * 1.0 * pre.sx / pre.n), 6)
        AS slope_change
    FROM pre CROSS JOIN post
    """,
)
def q_interrupted_ts(spark, sf_dir):
    """R390 — interrupted time series at day {d}: fit OLS lines to the
    pre and post daily-count segments (two independent 2-var fits —
    algebraically the full level+trend interaction model), then read
    off the LEVEL jump at the intervention day (both lines evaluated
    at t={d}) and the SLOPE change. All regression sums are exact
    integers (days × counts); the slopes/intercepts are closed forms.
    The single-timeline causal method for 'we shipped on day {d}' —
    no control group exists, so DiD (R342) and IV (R350) don't apply;
    the pre-trend extrapolation IS the counterfactual.""".format(
        d=_ITS_DAY
    )
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )

    def seg(cond):
        return daily.filter(cond).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sx"),
            F.sum("c").alias("sy"),
            F.sum(F.col("d") * F.col("c")).alias("sxy"),
            F.sum(F.col("d") * F.col("d")).alias("sxx"),
        )

    pre = seg(F.col("d") < _ITS_DAY)
    post = seg(F.col("d") >= _ITS_DAY)
    pre_r = pre.select(*[F.col(c).alias(f"p_{c}") for c in pre.columns])
    post_r = post.select(*[F.col(c).alias(f"q_{c}") for c in post.columns])
    joined = pre_r.crossJoin(F.broadcast(post_r))

    def col_slope(pfx):
        return (
            F.col(f"{pfx}_sxy")
            - F.col(f"{pfx}_sx") * 1.0 * F.col(f"{pfx}_sy") / F.col(f"{pfx}_n")
        ) / (
            F.col(f"{pfx}_sxx")
            - F.col(f"{pfx}_sx") * 1.0 * F.col(f"{pfx}_sx") / F.col(f"{pfx}_n")
        )

    def col_intercept(pfx):
        return F.col(f"{pfx}_sy") * 1.0 / F.col(f"{pfx}_n") - col_slope(
            pfx
        ) * (F.col(f"{pfx}_sx") * 1.0 / F.col(f"{pfx}_n"))

    return joined.select(
        F.round(col_slope("p"), 6).alias("slope_pre"),
        F.round(col_slope("q"), 6).alias("slope_post"),
        F.round(col_intercept("p"), 4).alias("intercept_pre"),
        F.round(
            (col_intercept("q") + col_slope("q") * _ITS_DAY)
            - (col_intercept("p") + col_slope("p") * _ITS_DAY),
            4,
        ).alias("level_change_at_d"),
        F.round(col_slope("q") - col_slope("p"), 6).alias("slope_change"),
    )


# ===========================================================================
# R391 — two-way factorial ANOVA with interaction
# ===========================================================================

@register(
    "q_twoway_anova",
    """
    WITH obs AS (
      SELECT event_type AS a,
             CAST(strftime(ts, '%w') AS INTEGER) AS b,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS s, SUM(y * y) AS ssq
      FROM obs GROUP BY a, b
    ),
    grand AS (
      SELECT SUM(n) AS n, SUM(s) AS s, SUM(ssq) AS ssq FROM cells
    ),
    a_marg AS (SELECT a, SUM(n) AS n, SUM(s) AS s FROM cells GROUP BY a),
    b_marg AS (SELECT b, SUM(n) AS n, SUM(s) AS s FROM cells GROUP BY b),
    comps AS (
      SELECT
        (SELECT SUM(s * 1.0 * s / n) FROM a_marg)
          - (SELECT s * 1.0 * s / n FROM grand) AS ss_a,
        (SELECT SUM(s * 1.0 * s / n) FROM b_marg)
          - (SELECT s * 1.0 * s / n FROM grand) AS ss_b,
        (SELECT SUM(s * 1.0 * s / n) FROM cells)
          - (SELECT SUM(s * 1.0 * s / n) FROM a_marg)
          - (SELECT SUM(s * 1.0 * s / n) FROM b_marg)
          + (SELECT s * 1.0 * s / n FROM grand) AS ss_ab,
        (SELECT ssq * 1.0 FROM grand)
          - (SELECT SUM(s * 1.0 * s / n) FROM cells) AS ss_w,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM a_marg) AS ka,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM b_marg) AS kb,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS kc,
        (SELECT n FROM grand) AS n
    )
    SELECT CAST(ka AS BIGINT) AS levels_a, CAST(kb AS BIGINT) AS levels_b,
           CAST(n AS BIGINT) AS n,
           round(ss_a / 10000.0, 2) AS ss_a,
           round(ss_b / 10000.0, 2) AS ss_b,
           round(ss_ab / 10000.0, 2) AS ss_interaction,
           round(ss_w / 10000.0, 2) AS ss_within,
           round((ss_a / (ka - 1)) / (ss_w / (n - kc)), 4) AS f_a,
           round((ss_b / (kb - 1)) / (ss_w / (n - kc)), 4) AS f_b,
           round((ss_ab / ((ka - 1) * (kb - 1)))
                 / (ss_w / (n - kc)), 4) AS f_interaction
    FROM comps
    """,
)
def q_twoway_anova(spark, sf_dir):
    """R391 — two-way factorial ANOVA (event type × weekday) on value
    cents: SS_A, SS_B, SS_AB, SS_within from the standard
    sums-of-squares identities over exact integer cell moments
    (Σy, Σy² per cell — every SS is a difference of single-division
    terms; cents² stay far inside int64); F ratios against MS_within
    with the unbalanced-cells caveat inherent to the Type-I
    decomposition. Says whether type and weekday matter SEPARATELY
    and whether the type effect DEPENDS on the weekday — the
    interaction one-way ANOVA (q_anova_f) structurally cannot see.
    One cell agg + two marginal aggs."""
    ev = read_events(spark, sf_dir)
    obs = ev.select(
        F.col("event_type").alias("a"),
        (F.dayofweek("ts") - 1).alias("b"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    cells = obs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ssq"),
    )
    grand = cells.agg(
        F.sum("n").alias("gn"), F.sum("s").alias("gs"),
        F.sum("ssq").alias("gssq"),
    )
    term = F.sum(F.col("s") * 1.0 * F.col("s") / F.col("n"))
    a_t = cells.groupBy("a").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(term.alias("ta"), F.count(F.lit(1)).alias("ka"))
    b_t = cells.groupBy("b").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(term.alias("tb"), F.count(F.lit(1)).alias("kb"))
    c_t = cells.agg(term.alias("tc"), F.count(F.lit(1)).alias("kc"))
    j = (
        grand.crossJoin(F.broadcast(a_t))
        .crossJoin(F.broadcast(b_t))
        .crossJoin(F.broadcast(c_t))
    )
    g_term = F.col("gs") * 1.0 * F.col("gs") / F.col("gn")
    ss_a = F.col("ta") - g_term
    ss_b = F.col("tb") - g_term
    ss_ab = F.col("tc") - F.col("ta") - F.col("tb") + g_term
    ss_w = F.col("gssq") * 1.0 - F.col("tc")
    return j.select(
        F.col("ka").cast("long").alias("levels_a"),
        F.col("kb").cast("long").alias("levels_b"),
        F.col("gn").cast("long").alias("n"),
        F.round(ss_a / 10000.0, 2).alias("ss_a"),
        F.round(ss_b / 10000.0, 2).alias("ss_b"),
        F.round(ss_ab / 10000.0, 2).alias("ss_interaction"),
        F.round(ss_w / 10000.0, 2).alias("ss_within"),
        F.round(
            (ss_a / (F.col("ka") - 1)) / (ss_w / (F.col("gn") - F.col("kc"))),
            4,
        ).alias("f_a"),
        F.round(
            (ss_b / (F.col("kb") - 1)) / (ss_w / (F.col("gn") - F.col("kc"))),
            4,
        ).alias("f_b"),
        F.round(
            (ss_ab / ((F.col("ka") - 1) * (F.col("kb") - 1)))
            / (ss_w / (F.col("gn") - F.col("kc"))),
            4,
        ).alias("f_interaction"),
    )
