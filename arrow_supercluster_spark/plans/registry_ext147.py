"""Round-5 registry additions, batch 142 — the distance-based
two-sample test, sequence-prediction evaluation, and recommender
coverage:

- q_energy_distance: Székely's energy distance between the even/odd
  embedding halves — D² = 2E‖X−Y‖ − E‖X−X'‖ − E‖Y−Y'‖, the
  kernel-free companion to q_kernel_mmd (no bandwidth to choose;
  zero iff the distributions coincide). Per-pair distances
  integer-scale before the three group means.
- q_markov_accuracy: evaluation of the first-order Markov next-event
  predictor — train transition argmaxes on odd users, score top-1
  accuracy on even users' transitions, against the
  marginal-majority baseline. The eval that turns q_event_transitions
  from a descriptive table into a scored model.
- q_rec_coverage: aggregate-diversity audit of the item-CF
  recommender — catalog coverage (share of items ever recommended)
  and the concentration of recommendations across items (share
  absorbed by the top decile of items). Accuracy metrics hide
  popularity collapse; coverage is the standard counterweight.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_ED_SCALE = 1_000_000


# ===========================================================================
# R419 — energy distance
# ===========================================================================

_SQL_ED_D = (
    "sqrt(list_sum(list_transform(range(1, 65), i -> "
    "(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) "
    "* (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))))"
)


@register(
    "q_energy_distance",
    f"""
    WITH halves AS (
      SELECT vec_id, vec_id % 2 AS g, embedding FROM embeddings
    ),
    ds AS (
      SELECT a.g AS ga, b.g AS gb,
             CAST(round({_SQL_ED_D} * {_ED_SCALE}) AS BIGINT) AS d_s
      FROM halves a JOIN halves b ON a.vec_id < b.vec_id
    ),
    sums AS (
      SELECT
        SUM(CASE WHEN ga = 0 AND gb = 0 THEN d_s ELSE 0 END) AS dxx,
        SUM(CASE WHEN ga = 1 AND gb = 1 THEN d_s ELSE 0 END) AS dyy,
        SUM(CASE WHEN ga != gb THEN d_s ELSE 0 END) AS dxy,
        SUM(CASE WHEN ga = 0 AND gb = 0 THEN 1 ELSE 0 END) AS nxx,
        SUM(CASE WHEN ga = 1 AND gb = 1 THEN 1 ELSE 0 END) AS nyy,
        SUM(CASE WHEN ga != gb THEN 1 ELSE 0 END) AS nxy
      FROM ds
    )
    SELECT CAST(nxy AS BIGINT) AS n_cross_pairs,
           round(2.0 * dxy / ({_ED_SCALE} * 1.0 * nxy)
                 - dxx * 1.0 / ({_ED_SCALE} * 1.0 * nxx)
                 - dyy * 1.0 / ({_ED_SCALE} * 1.0 * nyy), 8)
             AS energy_distance
    FROM sums
    """,
)
def q_energy_distance(spark, sf_dir):
    """R419 — Székely energy distance between the embedding halves:
    D² = 2Ê‖X−Y‖ − Ê‖X−X'‖ − Ê‖Y−Y'‖ with every pairwise norm
    integer-scaled (micro grid) before the three group means — exact
    sums, one division each. Characteristic like MMD (zero iff equal
    distributions) with NO bandwidth to tune — the hyperparameter
    -free member of the two-sample pair (R418); the parity split's
    D² ≈ 0 null is asserted. Same all-pairs fold shape; at scale the
    pair set subsamples deterministically, identical math."""
    from arrow_supercluster_spark.plans.registry_ext import _emb

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        (F.col("vec_id") % 2).alias("g"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # r11 (VERDICT r10 #8, guide §4.2): BNLJ + interpreted HOF fold →
    # block-pair NumPy kernel.  fold_d2 reproduces the zip_with left
    # fold bit-for-bit and half_up reproduces F.round's HALF_UP, so
    # d_s is identical to the pair-join form (exceptAll = 0 at all
    # three SFs).  Each block pair emits six partial sums; the final
    # agg combines exact integers.
    import numpy as np
    import pandas as pd

    from arrow_supercluster_spark.functions import blockpairs as bp

    def _ed_fn(pdf):
        pa, pb = int(pdf["pa"].iat[0]), int(pdf["pb"].iat[0])
        a = pdf[pdf["p"] == pa]
        b_ = pdf[pdf["p"] == pb]
        cols = ["dxx", "dyy", "dxy", "nxx", "nyy", "nxy"]
        if a.empty or b_.empty:
            return pd.DataFrame({c: [] for c in cols})
        A = np.stack(a["v"].to_numpy())
        B = np.stack(b_["v"].to_numpy())
        d_s = bp.half_up(np.sqrt(bp.fold_d2(A, B)) * _ED_SCALE)
        mask = bp.pair_mask(
            a["vec_id"].to_numpy(), b_["vec_id"].to_numpy(), pa == pb
        )
        ga = a["g"].to_numpy()[:, None]
        gb = b_["g"].to_numpy()[None, :]
        xx = (ga == 0) & (gb == 0) & mask
        yy = (ga == 1) & (gb == 1) & mask
        xy = (ga != gb) & mask
        return pd.DataFrame(
            [
                {
                    "dxx": int(d_s[xx].sum()), "dyy": int(d_s[yy].sum()),
                    "dxy": int(d_s[xy].sum()), "nxx": int(xx.sum()),
                    "nyy": int(yy.sum()), "nxy": int(xy.sum()),
                }
            ]
        )

    ds = bp.block_pair_groups(
        emb, _ed_fn,
        "dxx long, dyy long, dxy long, nxx long, nyy long, nxy long",
    )
    sums = ds.agg(
        F.sum("dxx").alias("dxx"),
        F.sum("dyy").alias("dyy"),
        F.sum("dxy").alias("dxy"),
        F.sum("nxx").alias("nxx"),
        F.sum("nyy").alias("nyy"),
        F.sum("nxy").alias("nxy"),
    )
    return sums.select(
        F.col("nxy").cast("long").alias("n_cross_pairs"),
        F.round(
            2.0 * F.col("dxy") / (_ED_SCALE * 1.0 * F.col("nxy"))
            - F.col("dxx") * 1.0 / (_ED_SCALE * 1.0 * F.col("nxx"))
            - F.col("dyy") * 1.0 / (_ED_SCALE * 1.0 * F.col("nyy")),
            8,
        ).alias("energy_distance"),
    )


# ===========================================================================
# R420 — Markov next-event prediction accuracy
# ===========================================================================

_SQL_TRANS = """
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
"""


@register(
    "q_markov_accuracy",
    f"""
    WITH trans AS ({_SQL_TRANS}),
    clean AS (SELECT * FROM trans WHERE nxt IS NOT NULL),
    train AS (SELECT * FROM clean WHERE user_id % 2 = 1),
    test AS (SELECT * FROM clean WHERE user_id % 2 = 0),
    model AS (
      SELECT cur, nxt AS pred FROM (
        SELECT cur, nxt, ROW_NUMBER() OVER (
          PARTITION BY cur ORDER BY COUNT(*) DESC, nxt) AS rk
        FROM train GROUP BY cur, nxt
      ) WHERE rk = 1
    ),
    majority AS (
      SELECT nxt AS pred FROM (
        SELECT nxt, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, nxt) AS rk
        FROM train GROUP BY nxt
      ) WHERE rk = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           round(SUM(CASE WHEN test.nxt = model.pred THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS markov_accuracy,
           round(SUM(CASE WHEN test.nxt = (SELECT pred FROM majority)
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS majority_accuracy
    FROM test JOIN model ON model.cur = test.cur
    """,
)
def q_markov_accuracy(spark, sf_dir):
    """R420 — first-order Markov next-event predictor, properly
    EVALUATED: transition argmaxes train on odd users, top-1 accuracy
    scores on even users' transitions, against the marginal-majority
    baseline from the same training split (an honest baseline — no
    test leakage anywhere). Windows partition by user (bounded
    histories); the model is a |states|-row broadcast. Turns
    q_event_transitions' descriptive matrix into a scored model — and
    if markov ≤ majority, the sequence carries no usable memory
    (cross-checked against q_entropy_rate's verdict)."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    train = trans.filter(F.col("user_id") % 2 == 1)
    test = trans.filter(F.col("user_id") % 2 == 0)
    counts = train.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
    model = (
        counts.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    maj = (
        train.groupBy("nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "nxt")
        .limit(1)
        .select(F.col("nxt").alias("mpred"))
    )
    scored = test.join(F.broadcast(model), "cur").crossJoin(
        F.broadcast(maj)
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.sum(
                F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0)
            )
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("markov_accuracy"),
        F.round(
            F.sum(
                F.when(F.col("nxt") == F.col("mpred"), 1).otherwise(0)
            )
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("majority_accuracy"),
    )


# ===========================================================================
# R421 — recommender catalog coverage
# ===========================================================================

@register(
    "q_rec_coverage",
    """
    WITH ui AS (
      SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT)
               % 100 AS item,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    ),
    norms AS (SELECT item, SUM(cnt * cnt) AS n2 FROM ui GROUP BY item),
    sims AS (
      SELECT a.item AS item_i, b.item AS item_j,
             CAST(round(SUM(a.cnt * b.cnt) * 1.0
                        / (sqrt(na.n2) * sqrt(nb.n2)) * 1e9) AS BIGINT)
               AS sim_s
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
      JOIN norms na ON na.item = a.item
      JOIN norms nb ON nb.item = b.item
      GROUP BY a.item, b.item, na.n2, nb.n2
    ),
    topn AS (
      SELECT item_i, item_j FROM (
        SELECT item_i, item_j,
               ROW_NUMBER() OVER (PARTITION BY item_i
                                  ORDER BY sim_s DESC, item_j) AS rk
        FROM sims
      ) WHERE rk <= 3
    ),
    seen AS (SELECT DISTINCT user_id, item FROM ui),
    recs AS (
      SELECT DISTINCT s.user_id, t.item_j AS rec_item
      FROM seen s JOIN topn t ON t.item_i = s.item
      WHERE NOT EXISTS (SELECT 1 FROM seen s2
                        WHERE s2.user_id = s.user_id
                          AND s2.item = t.item_j)
    ),
    catalog AS (SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items
                FROM ui),
    per_item AS (
      SELECT rec_item, CAST(COUNT(*) AS BIGINT) AS times_rec
      FROM recs GROUP BY rec_item
    ),
    dec AS (
      SELECT SUM(times_rec) AS total,
             SUM(CASE WHEN rk <= ceil(cnt_items * 0.1)
                      THEN times_rec ELSE 0 END) AS top_decile
      FROM (
        SELECT times_rec,
               ROW_NUMBER() OVER (ORDER BY times_rec DESC, rec_item) AS rk,
               COUNT(*) OVER () AS cnt_items
        FROM per_item
      )
    )
    SELECT catalog.n_items,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_item)
             AS items_recommended,
           round((SELECT COUNT(*) FROM per_item) * 1.0
                 / catalog.n_items, 4) AS catalog_coverage,
           round(dec.top_decile * 1.0 / dec.total, 4)
             AS top_decile_share
    FROM catalog CROSS JOIN dec
    """,
)
def q_rec_coverage(spark, sf_dir):
    """R421 — aggregate diversity of the item-CF recommender (the
    q_item_cf_recs construction, scored for ALL users): catalog
    coverage = fraction of items that appear in anyone's
    recommendation set, and the popularity concentration = share of
    all recommendations absorbed by the top decile of recommended
    items. High accuracy + low coverage is the popularity-collapse
    failure mode every recommender audit must catch; windows here
    partition by item (bounded) or run over the |recommended-items|
    frame."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ui = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(
            "user_id",
            F.pmod(
                F.get_json_object("props", "$.k").cast("bigint"),
                F.lit(100),
            ).alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    norms = ui.groupBy("item").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("n2")
    )
    a, b = ui.alias("a"), ui.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col("item").alias("ni"), F.col("n2").alias("na2")
                )
            ),
            F.col("a.item") == F.col("ni"),
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col("item").alias("nj"), F.col("n2").alias("nb2")
                )
            ),
            F.col("b.item") == F.col("nj"),
        )
        .groupBy(
            F.col("a.item").alias("item_i"),
            F.col("b.item").alias("item_j"),
            F.col("na2").alias("na2"),
            F.col("nb2").alias("nb2"),
        )
        .agg(
            F.round(
                F.sum(F.col("a.cnt") * F.col("b.cnt"))
                * 1.0
                / (F.sqrt("na2") * F.sqrt("nb2"))
                * 1e9
            )
            .cast("long")
            .alias("sim_s")
        )
    )
    wtop = Window.partitionBy("item_i").orderBy(
        F.col("sim_s").desc(), "item_j"
    )
    topn = (
        sims.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 3)
        .select("item_i", "item_j")
    )
    seen = ui.select("user_id", "item").distinct()
    recs = (
        seen.join(topn, seen["item"] == topn["item_i"])
        .select("user_id", F.col("item_j").alias("rec_item"))
        .join(
            seen.select("user_id", F.col("item").alias("rec_item")),
            ["user_id", "rec_item"],
            "left_anti",
        )
        .distinct()
    )
    catalog = ui.select("item").distinct().count()
    per_item = recs.groupBy("rec_item").agg(
        F.count(F.lit(1)).alias("times_rec")
    )
    n_rec_items = per_item.count()
    import math

    k_top = math.ceil(n_rec_items * 0.1)
    top = per_item.orderBy(
        F.col("times_rec").desc(), "rec_item"
    ).limit(k_top)
    totals = per_item.agg(F.sum("times_rec").alias("total")).crossJoin(
        F.broadcast(top.agg(F.sum("times_rec").alias("top_decile")))
    )
    return totals.select(
        F.lit(catalog).cast("long").alias("n_items"),
        F.lit(n_rec_items).cast("long").alias("items_recommended"),
        F.lit(round(n_rec_items / catalog, 4)).alias("catalog_coverage"),
        F.round(
            F.col("top_decile") * 1.0 / F.col("total"), 4
        ).alias("top_decile_share"),
    )
