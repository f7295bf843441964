"""Round-4 registry additions, batch 90 — isotonic calibration, the
hashing trick, and forecast-accuracy evaluation:

- q_isotonic_calibration: isotonic regression via pool-adjacent-
  violators (PAV) on the score→label relationship (score = portable
  per-user hash-mix, label = high-value purchase) — THE nonparametric
  calibration method (the binned q_calibration is its histogram
  approximation). Distributed part: collapse events to per-user
  (score, label), pre-bin to ~100 quantile cells; the PAV pooling is
  sequential by nature and runs over the 100-cell frame. Rows-only
  (PAV has no SQL form); independent Python PAV + monotonicity tests.
- q_feature_hashing: the hashing trick (Weinberger et al. 2009) —
  token features → dimension idx = polyhash % D with a ± sign bit, as
  SPARSE (doc_id, idx, val) triplets so collisions cancel exactly the
  way the dense vector would. Fully oracle-checked (portable
  polynomial hash both engines).
- q_mase: seasonal-naive forecast evaluation — MASE (Hyndman &
  Koehler 2006): MAE of the lag-7 naive forecast scaled by the
  in-sample lag-7 MAE, per event type. The scale-free forecast metric
  (MAPE breaks at zero volumes); windows partition by type.

At 100 TB: PAV's sequential tail runs on a bounded cell frame; feature
hashing is a narrow map + (doc, idx) agg; MASE is two bounded-key
window passes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_P = 2147483647
_FH_D = 64


@register(
    "q_feature_hashing",
    f"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    hashed AS (
      SELECT doc_id,
             list_reduce(
               list_transform(string_split(tok, ''),
                              x -> CAST(ord(x) AS BIGINT)),
               (a, b) -> (a * 31 + b) % {_P}) AS h,
             c
      FROM tf
    )
    SELECT doc_id,
           CAST(h % {_FH_D} AS BIGINT) AS idx,
           CAST(SUM(CASE WHEN (h // {_FH_D}) % 2 = 0 THEN c ELSE -c END)
                AS BIGINT) AS val
    FROM hashed
    GROUP BY doc_id, h % {_FH_D}
    HAVING SUM(CASE WHEN (h // {_FH_D}) % 2 = 0 THEN c ELSE -c END) <> 0
    """,
)
def q_feature_hashing(spark, sf_dir):
    """Hashing-trick vectorization: token → idx = polyhash % 64, sign =
    parity of the next hash bits (the ± trick keeps collision noise
    zero-mean), emitted as sparse (doc_id, idx, val) triplets with
    exact signed-count cancellation (zero entries dropped). Narrow map
    + one (doc, idx) agg — the fixed-width encoding that feeds linear
    models at corpus scale without a vocabulary dictionary."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    codes = F.transform(
        F.split(F.col("tok"), ""), lambda ch: F.ascii(ch).cast("long")
    )
    h = F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1),
        lambda a, b: (a * 31 + b) % _P,
    )
    hashed = tf.select("doc_id", h.alias("h"), "c")
    signed = F.when(
        (F.floor(F.col("h") / _FH_D) % 2) == 0, F.col("c")
    ).otherwise(-F.col("c"))
    return (
        hashed.groupBy("doc_id", (F.col("h") % _FH_D).alias("idx"))
        .agg(F.sum(signed).alias("val"))
        .filter(F.col("val") != 0)
    )


_ISO_BINS = 100
_H_MULT, _H_MOD = 48271, 65537

# SQL twin (r7): the PAV result has a merge-order-free characterization —
# the boundary after cell i survives iff NO interval pair straddling it
# violates monotonicity: for all j<=i < k, avg(j..i) <= avg(i+1..k),
# compared cross-multiplied in exact integer arithmetic (the same
# pos*n > pos*n comparison the Spark-side merge loop uses).  Verified
# against the sequential PAV loop on 30k random cell tables, including
# tie-heavy ones (adjacent equal-rate pools stay unmerged under strict-
# violation PAV, and the NOT-EXISTS condition reproduces exactly that).
# O(B^3) with B<=100 cells — trivial at oracle scale.
_ISO_SQL = f"""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                 THEN 1 ELSE 0 END) AS label
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT ((user_id * {_H_MULT}) % {_H_MOD}) / {_H_MOD}.0 AS score,
             label
      FROM users
    ),
    cells AS (
      SELECT CAST(floor(score * {_ISO_BINS}) AS BIGINT) AS cell,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos,
             MIN(score) AS lo, MAX(score) AS hi
      FROM scored GROUP BY cell
    ),
    idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY cell) AS i, n, pos, lo, hi,
             CAST(SUM(n) OVER (ORDER BY cell) AS BIGINT) AS cn,
             CAST(SUM(pos) OVER (ORDER BY cell) AS BIGINT) AS cp
      FROM cells
    ),
    surv AS (
      SELECT a.i,
             NOT EXISTS (
               SELECT 1 FROM idx j, idx k
               WHERE j.i <= a.i AND k.i > a.i
                 AND (a.cp - (j.cp - j.pos)) * (k.cn - a.cn)
                   > (k.cp - a.cp) * (a.cn - (j.cn - j.n))
             ) AS keep
      FROM idx a
    ),
    pooled AS (
      SELECT x.i, x.n, x.pos, x.lo, x.hi,
             COALESCE(SUM(CASE WHEN s.keep THEN 1 ELSE 0 END), 0)
               AS pool_id
      FROM idx x LEFT JOIN surv s ON s.i < x.i
      GROUP BY x.i, x.n, x.pos, x.lo, x.hi
    )
    SELECT round(MIN(lo), 6) AS score_lo,
           round(MAX(hi), 6) AS score_hi,
           CAST(SUM(n) AS BIGINT) AS n,
           round(SUM(pos) * 1.0 / SUM(n), 6) AS rate
    FROM pooled GROUP BY pool_id ORDER BY score_lo
    """


@register("q_isotonic_calibration", _ISO_SQL)
def q_isotonic_calibration(spark, sf_dir):
    """Isotonic calibration by PAV: per-user score = portable Lehmer
    mix of user_id (a stand-in model score), label = made a >90-value
    purchase. Users collapse distributed; scores pre-bin into ~100
    equal-width cells (count + positives per cell, ordered by score) —
    then pool-adjacent-violators merges cells until the positive-rate
    sequence is monotone. Output: one row per final pool (score_lo,
    score_hi, n, rate). The pooling is inherently sequential over the
    BOUNDED cell frame (the distributed 99% is the user collapse).
    SQL twin since r7 via the merge-order-free boundary
    characterization above; independent Python PAV oracle in tests."""
    import pandas as pd

    ev = read_events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("label")
    )
    score = ((F.col("user_id") * _H_MULT) % _H_MOD) / F.lit(float(_H_MOD))
    cells = (
        users.select(score.alias("score"), "label")
        .groupBy(F.floor(F.col("score") * _ISO_BINS).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("pos"),
            F.min("score").alias("lo"),
            F.max("score").alias("hi"),
        )
        .orderBy("cell")
        .collect()
    )
    # PAV over the bounded cell frame: merge while a later pool's rate
    # is below an earlier one's
    pools = [
        {"lo": r.lo, "hi": r.hi, "n": r.n, "pos": r.pos} for r in cells
    ]
    i = 0
    while i < len(pools) - 1:
        a, b = pools[i], pools[i + 1]
        if a["pos"] * b["n"] > b["pos"] * a["n"]:  # rate_a > rate_b
            a["hi"] = b["hi"]
            a["n"] += b["n"]
            a["pos"] += b["pos"]
            del pools[i + 1]
            if i > 0:
                i -= 1  # merged pool may now violate its left neighbor
        else:
            i += 1
    out = [
        (
            round(float(p["lo"]), 6),
            round(float(p["hi"]), 6),
            int(p["n"]),
            round(p["pos"] / p["n"], 6),
        )
        for p in pools
    ]
    return spark.createDataFrame(
        out, "score_lo double, score_hi double, n long, rate double"
    )


_MASE_LAG = 7


@register(
    "q_mase",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, n,
             lag(n, {_MASE_LAG}) OVER (PARTITION BY event_type
                                       ORDER BY day) AS naive
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(naive) AS BIGINT) AS n_scored,
           ROUND(AVG(abs(n - naive)), 4) AS mae_naive7,
           ROUND(AVG(abs(n - naive))
                 / NULLIF(AVG(abs(n - naive)) , 0), 6) AS mase_self,
           ROUND(AVG(CAST(abs(n - naive) AS DOUBLE)) /
                 NULLIF((SELECT AVG(abs(l2.n - l2.naive)) FROM lagged l2
                         WHERE l2.naive IS NOT NULL), 0), 6) AS mase_vs_pool
    FROM lagged WHERE naive IS NOT NULL
    GROUP BY event_type
    """,
)
def q_mase(spark, sf_dir):
    """Forecast-accuracy evaluation: the lag-7 seasonal-naive forecast
    per event type, scored by MAE and by MASE against the pooled naive
    MAE (scale-free — comparable across types with different volumes;
    mase_self ≡ 1 is the tautological per-type scaling kept as a
    structural check). Windows partition by event_type — bounded
    keys."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "n", F.lag("n", _MASE_LAG).over(w).alias("naive")
    ).filter(F.col("naive").isNotNull())
    err = F.abs(F.col("n") - F.col("naive"))
    pool = lagged.agg(F.avg(err).alias("pool_mae"))
    return (
        lagged.crossJoin(F.broadcast(pool))
        .groupBy("event_type", "pool_mae")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(err), 4).alias("mae_naive7"),
            F.round(F.avg(err) / F.nullif(F.avg(err), F.lit(0)), 6).alias(
                "mase_self"
            ),
            F.round(
                F.avg(err.cast("double"))
                / F.nullif(F.first("pool_mae"), F.lit(0)),
                6,
            ).alias("mase_vs_pool"),
        )
        .drop("pool_mae")
    )
