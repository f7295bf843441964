"""Round-5 registry additions, batch 123 — collaborative filtering,
ER blocking design, and Bloom-filter calibration:

- q_item_cf_recs: item-item collaborative filtering end to end —
  user×item interaction counts (items = props.k), item-item cosine on
  the shared-user vectors (integer numerators/norms), top-3 neighbors
  per item, then recommendations for the first users: unseen items
  scored by summed similarity to the user's history. The classic
  neighborhood recommender as pure joins/aggs.
- q_blocking_eval: entity-resolution BLOCKING strategy evaluation —
  for each candidate blocking key (nation / segment / balance band),
  the reduction ratio (pair-space shrink) vs pair completeness
  (true matches whose blocks still collide, under the SAME dirty-copy
  corruption as q_record_linkage). The design tradeoff every linkage
  pipeline must measure: segment blocking loses the corrupted-segment
  true pairs, balance banding loses jitter-crossed boundaries, nation
  keeps recall 1.0 at the worst reduction.
- q_bloom_fpr_curve: Bloom-filter calibration — portable-hash filters
  at 4/8/12/16 bits-per-key built over the even keys, probed with the
  disjoint odd keys; empirical false-positive rate vs the theoretical
  (1 − e^(−kn/m))^k, per configuration. The sizing curve behind
  q_bloom_decontam's production use.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_P = 2147483647
_CF_ITEMS = 100
_CF_TOPN = 3
_CF_USERS = 5
_CF_RECS = 3
_BF_BITS = (4, 8, 12, 16)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ===========================================================================
# R363 — item-item collaborative filtering
# ===========================================================================

@register(
    "q_item_cf_recs",
    f"""
    WITH ui AS (
      SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT)
               % {_CF_ITEMS} AS item,
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
      SELECT item_i, item_j, sim_s FROM (
        SELECT item_i, item_j, sim_s,
               ROW_NUMBER() OVER (PARTITION BY item_i
                                  ORDER BY sim_s DESC, item_j) AS rk
        FROM sims
      ) WHERE rk <= {_CF_TOPN}
    ),
    seen AS (SELECT DISTINCT user_id, item FROM ui),
    scores AS (
      SELECT s.user_id, t.item_j AS rec_item, SUM(t.sim_s) AS score_s
      FROM seen s JOIN topn t ON t.item_i = s.item
      WHERE s.user_id < {_CF_USERS}
        AND NOT EXISTS (SELECT 1 FROM seen s2
                        WHERE s2.user_id = s.user_id
                          AND s2.item = t.item_j)
      GROUP BY s.user_id, t.item_j
    )
    SELECT user_id, rec_item, round(score_s / 1e9, 6) AS score
    FROM (
      SELECT user_id, rec_item, score_s,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY score_s DESC, rec_item) AS rk
      FROM scores
    ) WHERE rk <= {_CF_RECS}
    ORDER BY user_id, score DESC, rec_item
    """,
)
def q_item_cf_recs(spark, sf_dir):
    """R363 — item-item CF: interaction counts per (user, item=props.k
    mod {m}) → item-item cosine on shared-user count vectors (integer
    numerators and norms; the score integer-scales ×1e9 before every
    ranking, so neighbor and rec cuts are engine-stable) → top-{t}
    neighbors per item → for the first {u} users, unseen items scored
    by Σ similarity over the user's history, top-{r} per user. The
    whole neighborhood recommender is keyed joins + aggs (windows only
    partition by item/user — bounded by catalog and history sizes); at
    100 TB the sims table prunes by minimum co-support before the
    cosine, same shape.""".format(
        m=_CF_ITEMS, t=_CF_TOPN, u=_CF_USERS, r=_CF_RECS
    )
    from pyspark.sql import Window

    ui = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .groupBy(
            "user_id",
            F.pmod(
                F.get_json_object("props", "$.k").cast("bigint"),
                F.lit(_CF_ITEMS),
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
            F.broadcast(norms.select(F.col("item").alias("ni"),
                                     F.col("n2").alias("na2"))),
            F.col("a.item") == F.col("ni"),
        )
        .join(
            F.broadcast(norms.select(F.col("item").alias("nj"),
                                     F.col("n2").alias("nb2"))),
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
    w = Window.partitionBy("item_i").orderBy(
        F.col("sim_s").desc(), "item_j"
    )
    topn = (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CF_TOPN)
        .select("item_i", "item_j", "sim_s")
    )
    seen = ui.select("user_id", "item").distinct()
    hist = seen.filter(F.col("user_id") < _CF_USERS)
    cand = hist.join(topn, hist["item"] == topn["item_i"]).select(
        "user_id", F.col("item_j").alias("rec_item"), "sim_s"
    )
    unseen = cand.join(
        seen.select("user_id", F.col("item").alias("rec_item")),
        ["user_id", "rec_item"],
        "left_anti",
    )
    scores = unseen.groupBy("user_id", "rec_item").agg(
        F.sum("sim_s").alias("score_s")
    )
    wu = Window.partitionBy("user_id").orderBy(
        F.col("score_s").desc(), "rec_item"
    )
    return (
        scores.withColumn("rk", F.row_number().over(wu))
        .filter(F.col("rk") <= _CF_RECS)
        .select(
            "user_id",
            "rec_item",
            F.round(F.col("score_s") / 1e9, 6).alias("score"),
        )
        .orderBy("user_id", F.col("score").desc(), "rec_item")
    )


# ===========================================================================
# R364 — ER blocking-strategy evaluation
# ===========================================================================

@register(
    "q_blocking_eval",
    """
    WITH a AS (
      SELECT c_custkey AS id, c_nationkey AS nation, c_mktsegment AS seg,
             c_acctbal AS bal
      FROM customer
    ),
    b AS (
      SELECT c_custkey AS id, c_nationkey AS nation,
             CASE WHEN c_custkey % 17 = 0 THEN 'BUILDING'
                  ELSE c_mktsegment END AS seg,
             c_acctbal + ((c_custkey * 7) % 21 - 10) AS bal
      FROM customer
    ),
    keys AS (
      SELECT 'nation' AS strategy, CAST(a.nation AS VARCHAR) AS ka, id
      FROM a
      UNION ALL SELECT 'segment', seg, id FROM a
      UNION ALL SELECT 'bal_band', CAST(CAST(floor(bal / 1000) AS BIGINT)
                                        AS VARCHAR), id FROM a
    ),
    keys_b AS (
      SELECT 'nation' AS strategy, CAST(b.nation AS VARCHAR) AS kb, id
      FROM b
      UNION ALL SELECT 'segment', seg, id FROM b
      UNION ALL SELECT 'bal_band', CAST(CAST(floor(bal / 1000) AS BIGINT)
                                        AS VARCHAR), id FROM b
    ),
    cand AS (
      SELECT keys.strategy, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM keys JOIN keys_b
        ON keys.strategy = keys_b.strategy AND keys.ka = keys_b.kb
      GROUP BY keys.strategy
    ),
    truth AS (
      SELECT keys.strategy, CAST(COUNT(*) AS BIGINT) AS n_true_kept
      FROM keys JOIN keys_b
        ON keys.strategy = keys_b.strategy AND keys.ka = keys_b.kb
       AND keys.id = keys_b.id
      GROUP BY keys.strategy
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(COUNT(*) AS BIGINT) * CAST(COUNT(*) AS BIGINT)
               AS n_all_pairs
      FROM a
    )
    SELECT cand.strategy, cand.n_candidates, truth.n_true_kept,
           round(1.0 - cand.n_candidates * 1.0 / tot.n_all_pairs, 6)
             AS reduction_ratio,
           round(truth.n_true_kept * 1.0 / tot.n_true, 6)
             AS pair_completeness
    FROM cand JOIN truth USING (strategy) CROSS JOIN tot
    ORDER BY strategy
    """,
)
def q_blocking_eval(spark, sf_dir):
    """R364 — blocking-strategy evaluation for the q_record_linkage
    corpus (same deterministic dirty copy): for each candidate key —
    nation (never corrupted), segment (corrupted every 17th), balance
    //1000 band (jitter crosses boundaries) — measure the REDUCTION
    RATIO (1 − candidates/|A×B|) against PAIR COMPLETENESS (fraction
    of true matches whose records still share a block). The ER design
    tradeoff: the safest key blocks worst; the tightest key silently
    loses corrupted matches. All counts are exact-integer keyed
    aggs; at 100 TB blocking IS the pair-space budget."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nation"),
        F.when(F.col("c_custkey") % 17 == 0, F.lit("BUILDING"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        (F.col("c_acctbal") + ((F.col("c_custkey") * 7) % 21 - 10)).alias(
            "bal"
        ),
    )

    def keyed(df):
        band = F.floor(F.col("bal") / 1000).cast("long").cast("string")
        return (
            df.select(F.lit("nation").alias("strategy"),
                      F.col("nation").cast("string").alias("k"), "id")
            .unionByName(
                df.select(F.lit("segment").alias("strategy"),
                          F.col("seg").alias("k"), "id")
            )
            .unionByName(
                df.select(F.lit("bal_band").alias("strategy"),
                          band.alias("k"), "id")
            )
        )
    ka = keyed(a).select("strategy", F.col("k").alias("ka"),
                         F.col("id").alias("ida"))
    kb = keyed(b).select("strategy", F.col("k").alias("kb"),
                         F.col("id").alias("idb"))
    joined = ka.join(
        kb, (ka["strategy"] == kb["strategy"]) & (ka["ka"] == kb["kb"])
    )
    cand = joined.groupBy(ka["strategy"].alias("strategy")).agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    truth = (
        joined.filter(F.col("ida") == F.col("idb"))
        .groupBy(ka["strategy"].alias("strategy"))
        .agg(F.count(F.lit(1)).alias("n_true_kept"))
    )
    tot = a.agg(
        F.count(F.lit(1)).alias("n_true"),
        (F.count(F.lit(1)) * F.count(F.lit(1))).alias("n_all_pairs"),
    )
    return (
        cand.join(truth, "strategy")
        .crossJoin(F.broadcast(tot))
        .select(
            "strategy",
            "n_candidates",
            "n_true_kept",
            F.round(
                1.0 - F.col("n_candidates") * 1.0 / F.col("n_all_pairs"), 6
            ).alias("reduction_ratio"),
            F.round(
                F.col("n_true_kept") * 1.0 / F.col("n_true"), 6
            ).alias("pair_completeness"),
        )
        .orderBy("strategy")
    )


# ===========================================================================
# R365 — Bloom-filter false-positive-rate calibration curve
# ===========================================================================

def _bf_hash_sql(key: str, j: str, m: int) -> str:
    return (
        f"((({key}) % {_P}) * 2654435761 + ({j}) * 97003 + 131) % {_P} % {m}"
    )


def _sql_bf(bits: int) -> str:
    k = max(1, round(bits * math.log(2)))
    return f"""
    SELECT {bits} AS bits_per_key, {k} AS k_hashes,
           (SELECT COUNT(*) FROM akeys) AS n_keys,
           m.m AS m_bits,
           CAST(SUM(CASE WHEN p.hits = {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS false_positives,
           CAST(COUNT(*) AS BIGINT) AS n_probes
    FROM (
      SELECT bk.id,
             SUM(CASE WHEN bpos.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
      FROM (
        SELECT b.id, {_bf_hash_sql('b.id', 'j.j', f'(SELECT m FROM m_{bits})')} AS pos
        FROM bkeys b CROSS JOIN (SELECT unnest(range(0, {k})) AS j) j
      ) bk
      LEFT JOIN (
        SELECT DISTINCT {_bf_hash_sql('a.id', 'j.j', f'(SELECT m FROM m_{bits})')} AS pos
        FROM akeys a CROSS JOIN (SELECT unnest(range(0, {k})) AS j) j
      ) bpos ON bk.pos = bpos.pos
      GROUP BY bk.id
    ) p CROSS JOIN m_{bits} m
    GROUP BY m.m
    """


@register(
    "q_bloom_fpr_curve",
    f"""
    WITH akeys AS (SELECT c_custkey AS id FROM customer
                   WHERE c_custkey % 2 = 0),
    bkeys AS (SELECT c_custkey AS id FROM customer
              WHERE c_custkey % 2 = 1),
    {','.join(
        f'm_{bits} AS (SELECT CAST({bits} * COUNT(*) AS BIGINT) AS m '
        f'FROM akeys)'
        for bits in _BF_BITS)}
    {''.join('')}
    SELECT bits_per_key, k_hashes, CAST(n_keys AS BIGINT) AS n_keys,
           CAST(m_bits AS BIGINT) AS m_bits,
           false_positives, n_probes,
           round(false_positives * 1.0 / n_probes, 6) AS empirical_fpr,
           round(pow(1.0 - exp(-CAST(k_hashes AS DOUBLE) * n_keys / m_bits),
                     k_hashes), 6) AS theoretical_fpr
    FROM ({' UNION ALL '.join(f'({_sql_bf(bits)})' for bits in _BF_BITS)}) u
    ORDER BY bits_per_key
    """,
)
def q_bloom_fpr_curve(spark, sf_dir):
    """R365 — Bloom-filter sizing curve: build portable-hash filters
    over the even custkeys at 4/8/12/16 bits per key (k = round(b·ln2)
    hash functions, each an affine map of (key, j) — no engine RNG),
    probe with the DISJOINT odd keys, and report empirical vs
    theoretical (1 − e^(−kn/m))^k false-positive rates. The filter is
    the DISTINCT set of set-bit positions (≤ m rows), membership is a
    position semi-join counting k hits — exact-integer end to end, so
    both engines build and probe the identical filter. The calibration
    behind q_bloom_decontam: pick the bits/key where the curve's FPR
    meets the pipeline's tolerance.""" + ""
    akeys = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 2 == 0
    ).select(F.col("c_custkey").alias("id"))
    bkeys = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 2 == 1
    ).select(F.col("c_custkey").alias("id"))
    n_keys = akeys.count()
    out = None
    for bits in _BF_BITS:
        k = max(1, round(bits * math.log(2)))
        m = bits * n_keys

        def pos(df):
            return df.select(
                "id",
                F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
            ).select(
                "id",
                (
                    (
                        F.pmod("id", F.lit(_P)) * 2654435761
                        + F.col("j") * 97003
                        + 131
                    )
                    % _P
                    % m
                ).alias("pos"),
            )

        filt = pos(akeys).select("pos").distinct()
        probes = pos(bkeys)
        hits = (
            probes.join(filt, "pos", "left_semi")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        per_key = bkeys.join(hits, "id", "left").select(
            F.coalesce("hits", F.lit(0)).alias("hits")
        )
        row = per_key.agg(
            F.lit(bits).alias("bits_per_key"),
            F.lit(k).alias("k_hashes"),
            F.lit(n_keys).cast("long").alias("n_keys"),
            F.lit(m).cast("long").alias("m_bits"),
            F.sum(F.when(F.col("hits") == k, 1).otherwise(0))
            .cast("long")
            .alias("false_positives"),
            F.count(F.lit(1)).alias("n_probes"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "*",
        F.round(
            F.col("false_positives") * 1.0 / F.col("n_probes"), 6
        ).alias("empirical_fpr"),
        F.round(
            F.pow(
                1.0
                - F.exp(
                    -F.col("k_hashes").cast("double")
                    * F.col("n_keys")
                    / F.col("m_bits")
                ),
                F.col("k_hashes"),
            ),
            6,
        ).alias("theoretical_fpr"),
    ).orderBy("bits_per_key")
