"""Round-5 registry additions, batch 133 — polyline simplification,
topic coherence, and reliability fitting:

- q_rdp_simplify: Ramer-Douglas-Peucker polyline simplification of
  each city's point chain — the map-rendering vertex-reduction
  operator (the zoom-dependent sibling of the reference's cluster
  radius: fewer vertices, same shape within ε). Per-city chains are
  bounded frames; the recursive split runs where the chain sits
  (Arrow-batched mapInPandas). Rows-only; python oracle + the
  ε-guarantee (every dropped vertex lies within ε of the kept chain)
  verified per city.
- q_topic_coherence: NPMI topic coherence of each source's top
  c-TF-IDF-style terms — the standard did-we-extract-real-topics
  metric: top-5 terms per source by tf·ln(S/df_sources), coherence =
  mean doc-level NPMI over the term pairs. Integer doc-presence
  counts; per-pair closed forms; integer-scaled pair means.
- q_weibull_fit: Weibull shape/scale by median-rank regression —
  ln(−ln(1−F)) vs ln(t) OLS over the empirical CDF of
  time-to-first-purchase (Bernard's median ranks), the classic
  reliability-engineering plot linearized. k < 1 ⇒ infant-mortality
  conversions, k > 1 ⇒ wear-in. Regression sums integer-scaled.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.points import derived_points
from arrow_supercluster_spark.sources.tables import read_events

_RDP_EPS = 2.0  # degrees
_TC_TOP = 5
_TC_SCALE = 1_000_000_000
_WB_SCALE = 1_000_000_000


# ===========================================================================
# R392 — Ramer-Douglas-Peucker simplification
# ===========================================================================

def rdp(points, eps):
    """Iterative RDP over [(x, y), ...]: keep endpoints, recursively
    keep the max-perpendicular-deviation vertex while it exceeds eps.
    Returns the kept indices (sorted)."""
    n = len(points)
    if n <= 2:
        return list(range(n))
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        x1, y1 = points[i]
        x2, y2 = points[j]
        dx, dy = x2 - x1, y2 - y1
        norm = math.hypot(dx, dy)
        best, best_d = -1, eps
        for k in range(i + 1, j):
            xk, yk = points[k]
            if norm == 0:
                d = math.hypot(xk - x1, yk - y1)
            else:
                d = abs(dy * (xk - x1) - dx * (yk - y1)) / norm
            if d > best_d:
                best, best_d = k, d
        if best >= 0:
            keep.add(best)
            stack.append((i, best))
            stack.append((best, j))
    return sorted(keep)


@register("q_rdp_simplify", None)
def q_rdp_simplify(spark, sf_dir):
    """R392 — RDP polyline simplification (ε={e}°) of each city's
    id-ordered point chain: per-city rows collapse into one bounded
    array (array_sort of structs), the recursive max-deviation split
    runs in Arrow-batched mapInPandas where the chain sits, and only
    (city, n_points, n_kept, ratio, max kept-chain error) scalars come
    back. The vertex-reduction operator map renderers run above the
    cluster engine — same motivation as the radius parameter: spend
    vertices only where the shape needs them. Rows-only (recursive
    geometry); python oracle + the ε-guarantee test (every dropped
    vertex within ε of the simplified chain) in
    tests/test_batch133.py.""".format(e=_RDP_EPS)
    import pandas as pd

    pts = derived_points(spark, sf_dir, with_nulls=True).filter(
        F.col("lng").isNotNull()
    )
    chains = pts.groupBy("city").agg(
        F.array_sort(
            F.collect_list(F.struct("id", "lng", "lat"))
        ).alias("chain")
    )

    def run(batches):
        for pdf in batches:
            out = {
                "city": [], "n_points": [], "n_kept": [],
                "kept_ratio": [], "max_dropped_err": [],
            }
            for city, chain in zip(pdf["city"], pdf["chain"]):
                xy = [(p["lng"], p["lat"]) for p in chain]
                kept = rdp(xy, _RDP_EPS)
                # verify ε-guarantee inline: distance of every dropped
                # vertex to its enclosing kept segment
                max_err = 0.0
                for a, b in zip(kept, kept[1:]):
                    x1, y1 = xy[a]
                    x2, y2 = xy[b]
                    dx, dy = x2 - x1, y2 - y1
                    norm = math.hypot(dx, dy)
                    for k in range(a + 1, b):
                        xk, yk = xy[k]
                        d = (
                            math.hypot(xk - x1, yk - y1)
                            if norm == 0
                            else abs(dy * (xk - x1) - dx * (yk - y1)) / norm
                        )
                        max_err = max(max_err, d)
                out["city"].append(city)
                out["n_points"].append(len(xy))
                out["n_kept"].append(len(kept))
                out["kept_ratio"].append(round(len(kept) / len(xy), 6))
                out["max_dropped_err"].append(round(max_err, 6))
            yield pd.DataFrame(out)

    return chains.mapInPandas(
        run,
        schema=(
            "city string, n_points long, n_kept long, kept_ratio double, "
            "max_dropped_err double"
        ),
    ).orderBy("city")


# ===========================================================================
# R393 — NPMI topic coherence
# ===========================================================================

@register(
    "q_topic_coherence",
    f"""
    WITH doc_toks AS (
      SELECT doc_id, source, unnest(list_distinct({SQL_TOKS})) AS tok
      FROM documents
    ),
    clean AS (SELECT * FROM doc_toks WHERE tok != ''),
    n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    src_tf AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM clean GROUP BY source, tok
    ),
    src_df AS (
      SELECT tok, CAST(COUNT(DISTINCT source) AS BIGINT) AS sdf
      FROM clean GROUP BY tok
    ),
    n_src AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
              FROM documents),
    top_terms AS (
      SELECT source, tok FROM (
        SELECT src_tf.source, src_tf.tok,
               ROW_NUMBER() OVER (
                 PARTITION BY src_tf.source
                 ORDER BY CAST(round(src_tf.tf
                          * ln((SELECT ns FROM n_src) * 1.0 / src_df.sdf
                               + 1.0) * 1e6) AS BIGINT) DESC, src_tf.tok
               ) AS rk
        FROM src_tf JOIN src_df ON src_tf.tok = src_df.tok
      ) WHERE rk <= {_TC_TOP}
    ),
    doc_presence AS (
      SELECT DISTINCT doc_id, tok FROM clean
    ),
    tok_df AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM doc_presence
      GROUP BY tok
    ),
    pair_df AS (
      SELECT a.source, a.tok AS ta, b.tok AS tb,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM doc_presence pa
              JOIN doc_presence pb ON pa.doc_id = pb.doc_id
              WHERE pa.tok = a.tok AND pb.tok = b.tok) AS codf
      FROM top_terms a JOIN top_terms b
        ON a.source = b.source AND a.tok < b.tok
    ),
    npmi AS (
      SELECT pair_df.source,
             CAST(round(
               CASE WHEN codf = 0 THEN -1.0
                    ELSE ln(codf * 1.0 * nd.nd
                            / (ta_df.df * 1.0 * tb_df.df))
                         / (-ln(codf * 1.0 / nd.nd)) END
               * {_TC_SCALE}) AS BIGINT) AS npmi_s
      FROM pair_df
      JOIN tok_df ta_df ON ta_df.tok = pair_df.ta
      JOIN tok_df tb_df ON tb_df.tok = pair_df.tb
      CROSS JOIN n_docs nd
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(SUM(npmi_s) * 1.0 / ({_TC_SCALE} * 1.0 * COUNT(*)), 6)
             AS coherence
    FROM npmi
    GROUP BY source
    ORDER BY source
    """,
)
def q_topic_coherence(spark, sf_dir):
    """R393 — NPMI topic coherence: each source's top-{t} terms by
    tf·ln(S/df_sources + 1) (the c-TF-IDF exclusivity score; the
    ranking key integer-scales before the per-source top-k cut), then
    coherence = mean over the C({t},2) term pairs of doc-level NPMI =
    ln(p(a,b)/(p(a)p(b)))/(−ln p(a,b)), with co-document counts the
    only joined quantity and each pair's NPMI integer-scaled before
    the mean. Coherence near 1 ⇒ the 'topic' terms genuinely co-occur;
    near 0 ⇒ exclusivity picked unrelated rare words — the standard
    topic-model eval applied to the source-as-topic view
    (q_ctfidf's labels, now scored).""".format(t=_TC_TOP)
    from pyspark.sql import Window

    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    nd = docs.count()
    clean = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    ).filter(F.col("tok") != "")
    n_src = clean.select("source").distinct().count()
    src_tf = clean.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    src_df = clean.groupBy("tok").agg(
        F.countDistinct("source").alias("sdf")
    )
    scored = src_tf.join(src_df, "tok").select(
        "source",
        "tok",
        F.round(
            F.col("tf") * F.log(n_src * 1.0 / F.col("sdf") + 1.0) * 1e6
        )
        .cast("long")
        .alias("score_s"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score_s").desc(), "tok"
    )
    top_terms = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TC_TOP)
        .select("source", "tok")
    )
    presence = clean.select("doc_id", "tok").distinct()
    tok_df = presence.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a = top_terms.select("source", F.col("tok").alias("ta"))
    b = top_terms.select(F.col("source").alias("sb"), F.col("tok").alias("tb"))
    pairs = a.join(
        b, (F.col("source") == F.col("sb")) & (F.col("ta") < F.col("tb"))
    ).select("source", "ta", "tb")
    pa = presence.select(F.col("doc_id").alias("d1"), F.col("tok").alias("ta"))
    pb = presence.select(F.col("doc_id").alias("d2"), F.col("tok").alias("tb"))
    co = (
        pa.join(pb, (F.col("d1") == F.col("d2")))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("codf"))
    )
    npmi_s = F.when(F.col("codf").isNull() | (F.col("codf") == 0), F.lit(-1.0)).otherwise(
        F.log(
            F.col("codf") * 1.0 * nd / (F.col("dfa") * 1.0 * F.col("dfb"))
        )
        / (-F.log(F.col("codf") * 1.0 / nd))
    )
    joined = (
        pairs.join(co, ["ta", "tb"], "left")
        .join(
            tok_df.select(F.col("tok").alias("ta"), F.col("df").alias("dfa")),
            "ta",
        )
        .join(
            tok_df.select(F.col("tok").alias("tb"), F.col("df").alias("dfb")),
            "tb",
        )
        .select(
            "source",
            F.round(npmi_s * _TC_SCALE).cast("long").alias("npmi_s"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("npmi_s") * 1.0 / (_TC_SCALE * 1.0 * F.count(F.lit(1))),
                6,
            ).alias("coherence"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R394 — Weibull median-rank regression fit
# ===========================================================================

@register(
    "q_weibull_fit",
    f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(strftime(ts, '%d') AS INTEGER) END) AS t
      FROM events GROUP BY user_id
    ),
    obs AS (SELECT t FROM firsts WHERE t IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    by_t AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM obs GROUP BY t),
    cum AS (
      SELECT t, SUM(c) OVER (ORDER BY t) AS cum_c FROM by_t
    ),
    pts AS (
      SELECT CAST(round(ln(t) * {_WB_SCALE}) AS BIGINT) AS x_s,
             CAST(round(ln(-ln(1.0 - (cum_c - 0.3) / (n.n + 0.4)))
                        * {_WB_SCALE}) AS BIGINT) AS y_s
      FROM cum CROSS JOIN n
      WHERE (cum_c - 0.3) / (n.n + 0.4) < 1.0
    ),
    reg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(x_s) AS sx, SUM(y_s) AS sy,
             SUM(CAST(round(x_s * 1.0 * y_s / {_WB_SCALE}) AS BIGINT))
               AS sxy_s,
             SUM(CAST(round(x_s * 1.0 * x_s / {_WB_SCALE}) AS BIGINT))
               AS sxx_s
      FROM pts
    )
    SELECT k AS n_points,
           round((sxy_s - sx * 1.0 * sy / ({_WB_SCALE} * 1.0 * k))
                 / (sxx_s - sx * 1.0 * sx / ({_WB_SCALE} * 1.0 * k)), 6)
             AS shape_k,
           round(exp(-(sy * 1.0 / ({_WB_SCALE} * 1.0 * k)
                       - (sxy_s - sx * 1.0 * sy / ({_WB_SCALE} * 1.0 * k))
                         / (sxx_s - sx * 1.0 * sx / ({_WB_SCALE} * 1.0 * k))
                         * (sx * 1.0 / ({_WB_SCALE} * 1.0 * k)))
                     / ((sxy_s - sx * 1.0 * sy / ({_WB_SCALE} * 1.0 * k))
                        / (sxx_s - sx * 1.0 * sx
                           / ({_WB_SCALE} * 1.0 * k)))), 4) AS scale_lambda
    FROM reg
    """,
)
def q_weibull_fit(spark, sf_dir):
    """R394 — Weibull fit by median-rank regression over
    time-to-first-purchase: empirical CDF with Bernard's approximation
    F̂ = (i − 0.3)/(n + 0.4) on the day-grouped cumulative counts, then
    OLS of y = ln(−ln(1−F̂)) on x = ln t — the Weibull plot
    linearization where the slope IS the shape k and λ = exp(−b/k).
    Coordinates integer-scale before the regression sums (the handful
    of ln calls land on integer inputs, then everything is
    order-free). k < 1 says conversions behave like infant mortality
    (early or never) — the reliability readout behind trial-length
    decisions. Distinct-day frame + one closed form."""
    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.dayofmonth("ts"))
        ).alias("t")
    )
    obs = firsts.filter(F.col("t").isNotNull())
    n = obs.count()
    by_t = obs.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    from arrow_supercluster_spark.functions import distrank

    cum, _, _ = distrank.zip_scan(by_t, ["t"], out="_i", scan_col="c",
                                  scan_out="cum_c")
    pts = cum.select(
        F.round(F.log("t") * _WB_SCALE).cast("long").alias("x_s"),
        F.round(
            F.log(
                -F.log(
                    1.0 - (F.col("cum_c").cast("long") - 0.3) / (n + 0.4)
                )
            )
            * _WB_SCALE
        )
        .cast("long")
        .alias("y_s"),
    )
    reg = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x_s").alias("sx"),
        F.sum("y_s").alias("sy"),
        F.sum(
            F.round(F.col("x_s") * 1.0 * F.col("y_s") / _WB_SCALE)
            .cast("long")
        ).alias("sxy_s"),
        F.sum(
            F.round(F.col("x_s") * 1.0 * F.col("x_s") / _WB_SCALE)
            .cast("long")
        ).alias("sxx_s"),
    )
    k = F.col("k")
    slope = (
        F.col("sxy_s") - F.col("sx") * 1.0 * F.col("sy") / (_WB_SCALE * 1.0 * k)
    ) / (
        F.col("sxx_s") - F.col("sx") * 1.0 * F.col("sx") / (_WB_SCALE * 1.0 * k)
    )
    intercept = F.col("sy") * 1.0 / (_WB_SCALE * 1.0 * k) - slope * (
        F.col("sx") * 1.0 / (_WB_SCALE * 1.0 * k)
    )
    return reg.select(
        k.cast("long").alias("n_points"),
        F.round(slope, 6).alias("shape_k"),
        F.round(F.exp(-intercept / slope), 4).alias("scale_lambda"),
    )
