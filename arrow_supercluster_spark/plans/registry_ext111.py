"""Round-5 registry additions, batch 106 — portable sketch + the
canonical LM smoothing:

- q_hll_portable: HyperLogLog over the portable polynomial token hash
  (registry_ext43's construction), m=64 registers with the standard
  small-range correction — every register value and the final estimate
  hash-match the oracle, completing the sketch family the way
  q_minhash_portable did for MinHash (the engine-hash
  q_approx_distinct can only be rows-only). Shape: token hash →
  (bucket, rho) projection → 64-row max agg → one closed-form estimate
  row; mergeability across partitions is the max-agg itself.
- q_kneser_ney: interpolated Kneser-Ney bigram scoring (D=0.75) — the
  smoothing that won the n-gram LM era (continuation counts instead of
  raw frequency for the backoff mass). Per-doc mean log-probability
  over its bigram instances: the next LM-quality signal above
  q_bigram_lm's Jelinek-Mercer mix. Count tables (c(w1w2), c(w1·),
  N1+(w1·), N1+(·w2), |distinct bigrams|) are all keyed aggs; scoring
  is keyed joins; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_P = 2147483647
_HLL_M = 64  # 2^6 registers; hash = 6 bucket bits + 25 rho bits
_HLL_ALPHA = 0.709  # standard alpha for m=64
_KN_D = 0.75

_SQL_TOKHASH = f"""
    list_transform(list_filter({SQL_TOKS}, t -> t != ''), s ->
      list_reduce(list_transform(string_split(s, ''), c -> CAST(ord(c) AS BIGINT)),
                  (a, b) -> (a * 31 + b) % {_P}))
"""


@register(
    "q_hll_portable",
    f"""
    WITH h AS (
      SELECT unnest({_SQL_TOKHASH}) AS hv FROM documents
    ),
    br AS (
      SELECT hv % {_HLL_M} AS bucket,
             CASE WHEN hv // {_HLL_M} = 0 THEN 26
                  ELSE 25 - CAST(floor(log2(hv // {_HLL_M})) AS INTEGER)
             END AS rho
      FROM h
    ),
    regs AS (SELECT bucket, MAX(rho) AS m FROM br GROUP BY bucket),
    est AS (
      SELECT COUNT(*) AS n_filled,
             SUM(power(2.0, -m)) AS denom
      FROM regs
    ),
    raw AS (
      SELECT ({_HLL_ALPHA} * {_HLL_M} * {_HLL_M})
               / (denom + ({_HLL_M} - n_filled)) AS e,
             {_HLL_M} - n_filled AS v
      FROM est
    ),
    corrected AS (
      SELECT CASE WHEN e <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1.0 / v)
                  ELSE e END AS est
      FROM raw
    ),
    exact AS (
      SELECT COUNT(DISTINCT tok) AS n_exact
      FROM (SELECT unnest(list_filter({SQL_TOKS}, t -> t != '')) AS tok
            FROM documents)
    )
    SELECT CAST(exact.n_exact AS BIGINT) AS n_exact,
           round(corrected.est, 4) AS hll_estimate,
           round(abs(corrected.est - exact.n_exact) / exact.n_exact, 4)
             AS rel_error
    FROM corrected CROSS JOIN exact
    """,
)
def q_hll_portable(spark, sf_dir):
    """Portable HyperLogLog (m={m}, α={a}) over the distinct-token
    cardinality, differentially checked register-for-register via the
    portable polynomial hash: bucket = h mod {m}, rho = leading-zero
    rank of the remaining 25 bits (+1), registers = 64-row max agg,
    estimate = αm²/Σ2^(−M_j) with the linear-counting small-range
    correction. The max-agg IS the merge operator — per-partition
    partial registers combine losslessly, which is why HLL is the
    distributed count-distinct at 100 TB. Exact distinct + relative
    error reported alongside.""".format(m=_HLL_M, a=_HLL_ALPHA)
    toks = _docs(spark, sf_dir).select(
        F.explode(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).alias("tok")
    )
    codes = F.transform(
        F.split(F.col("tok"), ""), lambda c: F.ascii(c).cast("long")
    )
    hv = F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1),
        lambda a, b: (a * 31 + b) % _P,
    )
    h = toks.select(hv.alias("hv"))
    br = h.select(
        F.pmod("hv", F.lit(_HLL_M)).alias("bucket"),
        F.when(F.floor(F.col("hv") / _HLL_M) == 0, F.lit(26))
        .otherwise(
            F.lit(25)
            - F.floor(F.log2(F.floor(F.col("hv") / _HLL_M))).cast("int")
        )
        .alias("rho"),
    )
    regs = br.groupBy("bucket").agg(F.max("rho").alias("m"))
    est = regs.agg(
        F.count(F.lit(1)).alias("n_filled"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("denom"),
    )
    raw = est.select(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (F.col("denom") + (_HLL_M - F.col("n_filled")))
        ).alias("e"),
        (_HLL_M - F.col("n_filled")).alias("v"),
    )
    corrected = raw.select(
        F.when(
            (F.col("e") <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(_HLL_M) * F.log(F.lit(_HLL_M) * F.lit(1.0) / F.col("v")),
        )
        .otherwise(F.col("e"))
        .alias("est")
    )
    exact = toks.agg(F.count_distinct("tok").alias("n_exact"))
    return corrected.crossJoin(F.broadcast(exact)).select(
        "n_exact",
        F.round("est", 4).alias("hll_estimate"),
        F.round(
            F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_error"),
    )


@register(
    "q_kneser_ney",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter({SQL_TOKS}, x -> x != '') AS toks
      FROM documents
    ),
    big AS (
      SELECT doc_id,
             string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM t WHERE len(toks) >= 2
      )
    ),
    cnt2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    cnt1 AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1fw FROM cnt2 GROUP BY 1),
    n1pc AS (SELECT w2, COUNT(*) AS npc FROM cnt2 GROUP BY 1),
    btot AS (SELECT COUNT(*) AS nb FROM cnt2)
    SELECT big.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(SUM(ln(
             (cnt2.c2 - {_KN_D}) / cnt1.c1
             + {_KN_D} * cnt1.n1fw / cnt1.c1 * (n1pc.npc * 1.0 / btot.nb)
           )) / COUNT(*), 6) AS kn_logprob
    FROM big
    JOIN cnt2 USING (w1, w2)
    JOIN cnt1 USING (w1)
    JOIN n1pc USING (w2)
    CROSS JOIN btot
    GROUP BY big.doc_id
    """,
)
def q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram score per doc (D={d}):
    P(w₂|w₁) = (c(w₁w₂)−D)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/|B| —
    the continuation-count backoff ("how many contexts has w₂ completed",
    not "how often does w₂ occur") that made KN the standard n-gram
    smoothing. Resubstitution scoring (every doc bigram exists in the
    corpus tables, so the discounted term never needs the max(·,0)
    clamp). All five count tables are keyed aggs over the bigram frame;
    the scoring pass is three keyed joins + one broadcast scalar.""".format(
        d=_KN_D
    )
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.filter(tokenize(F.col("text")), lambda x: x != F.lit("")).alias(
            "toks"
        ),
    ).filter(F.size("toks") >= 2)
    bg = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.element_at("toks", i),
                    F.lit(" "),
                    F.element_at("toks", i + 1),
                ),
            )
        ).alias("bg"),
    )
    # the bigram frame fans out five ways (cnt2/cnt1/n1pc/btot + the
    # scoring join); materialize once instead of re-running the
    # tokenize+explode lineage per consumer — the lsh_candidate_pairs
    # compute-once discipline
    big = bg.select(
        "doc_id",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    ).localCheckpoint(eager=False)
    cnt2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cnt1 = cnt2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1fw")
    )
    n1pc = cnt2.groupBy("w2").agg(F.count(F.lit(1)).alias("npc"))
    btot = cnt2.agg(F.count(F.lit(1)).alias("nb"))
    p = (
        (F.col("c2") - _KN_D) / F.col("c1")
        + F.lit(_KN_D)
        * F.col("n1fw")
        / F.col("c1")
        * (F.col("npc") * F.lit(1.0) / F.col("nb"))
    )
    return (
        big.join(cnt2, ["w1", "w2"])
        .join(cnt1, "w1")
        .join(n1pc, "w2")
        .crossJoin(F.broadcast(btot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(F.log(p)) / F.count(F.lit(1)), 6).alias(
                "kn_logprob"
            ),
        )
    )
