"""Round-5 registry additions, batch 127 — data valuation, wavelet
energy, and sequence complexity:

- q_source_shapley_value: Shapley DATA VALUATION of the top corpus
  sources — players = the 5 largest sources, utility v(S) = distinct
  vocabulary covered by S (plus the fixed remainder pool). Every
  coalition utility comes from one token→source-bitmask table and a
  32-mask bit-test join; the Shapley sum reuses the exact-coalition
  machinery of q_shapley_attribution. "What is this data source
  WORTH to the corpus" — the curation-budget question, answered with
  an axiom-clean split of the total vocabulary gain.
- q_haar_energy: Haar wavelet energy decomposition of the 32-day
  (padded) daily event-count series — per-level detail energy from
  dyadic pairwise differences, all in exact integers (level-k detail
  coefficients are scaled sums/differences of counts). The
  multi-resolution complement to q_dft_power's global spectrum:
  WHERE in time the variance lives, by scale.
- q_lz_complexity: Lempel-Ziv (LZ76) phrase complexity of each user's
  event-type sequence — the compressibility-based predictability
  measure next to q_entropy_rate's Markov estimate. Sequential parse
  per user (bounded by history length) in Arrow-batched mapInPandas;
  rows-only with an independent python parser oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_SV_TOP = 5
_SV_SCALE = 1_000_000


def _sv_weight(s_size: int) -> float:
    return (
        math.factorial(s_size)
        * math.factorial(_SV_TOP - 1 - s_size)
        / math.factorial(_SV_TOP)
    )


# ===========================================================================
# R375 — Shapley data valuation of sources
# ===========================================================================

def _sql_source_shapley() -> str:
    wcases = " ".join(
        f"WHEN {s} THEN {_sv_weight(s)!r}" for s in range(_SV_TOP)
    )
    return f"""
    WITH src_rank AS (
      SELECT source, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) - 1
               AS rk
      FROM documents GROUP BY source
    ),
    players AS (SELECT source, rk FROM src_rank WHERE rk < {_SV_TOP}),
    tok_masks AS (
      SELECT tok,
             SUM(DISTINCT CASE WHEN p.rk IS NOT NULL
                               THEN CAST(pow(2, p.rk) AS BIGINT)
                               ELSE 0 END) AS pmask,
             MAX(CASE WHEN p.rk IS NULL THEN 1 ELSE 0 END) AS in_rest
      FROM (
        SELECT DISTINCT tok, source FROM (
          SELECT unnest({SQL_TOKS}) AS tok, source FROM documents
        ) WHERE tok != ''
      ) ts LEFT JOIN players p USING (source)
      GROUP BY tok
    ),
    masks AS (SELECT unnest(range(0, {1 << _SV_TOP})) AS m),
    v AS (
      SELECT masks.m,
             CAST(SUM(CASE WHEN tok_masks.in_rest = 1
                            OR (tok_masks.pmask & masks.m) != 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS vocab
      FROM masks CROSS JOIN tok_masks
      GROUP BY masks.m
    ),
    chans AS (SELECT source, rk FROM players),
    terms AS (
      SELECT chans.source,
             CAST(round((v1.vocab - v0.vocab)
                        * (CASE CAST(({'+'.join(f'(S.m >> {k}) & 1' for k in range(_SV_TOP))}) AS INTEGER)
                           {wcases} END) * {_SV_SCALE}) AS BIGINT) AS t
      FROM chans
      JOIN masks S ON (S.m >> chans.rk) & 1 = 0
      JOIN v v0 ON v0.m = S.m
      JOIN v v1 ON v1.m = S.m + CAST(pow(2, chans.rk) AS BIGINT)
    )
    SELECT source,
           round(SUM(t) * 1.0 / {_SV_SCALE}, 4) AS shapley_vocab
    FROM terms GROUP BY source
    ORDER BY source
    """


@register("q_source_shapley_value", _sql_source_shapley())
def q_source_shapley_value(spark, sf_dir):
    """R375 — Shapley data valuation: players = the {k} largest
    sources, v(S) = distinct vocabulary covered by S plus the fixed
    remainder pool. Coalition utilities come from ONE token →
    player-bitmask table bit-tested against all 2^{k} masks (the
    corpus is scanned once; the coalition lattice is literal-sized);
    φ follows the exact q_shapley_attribution machinery with
    integer-scaled terms. Σφ = v(full) − v(rest-only) (efficiency —
    tested), so the values split the top sources' total vocabulary
    contribution fairly, counting redundancy against each source.
    The which-source-earns-its-storage readout for corpus
    curation.""".format(k=_SV_TOP)
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    players = {
        r.source: i
        for i, r in enumerate(
            counts.orderBy(F.col("n").desc(), "source").limit(_SV_TOP)
            .collect()
        )
    }
    ts = (
        docs.select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    pmask_expr = None
    for src, rk in players.items():
        term = F.max(
            F.when(F.col("source") == src, F.lit(1 << rk)).otherwise(0)
        )
        pmask_expr = term if pmask_expr is None else pmask_expr + term
    in_rest = F.max(
        F.when(~F.col("source").isin(*players.keys()), 1).otherwise(0)
    )
    tok_masks = ts.groupBy("tok").agg(
        pmask_expr.alias("pmask"), in_rest.alias("in_rest")
    )
    masks = spark.range(1 << _SV_TOP).select(F.col("id").alias("m"))
    v = (
        masks.crossJoin(tok_masks)
        .select(
            "m",
            F.when(
                (F.col("in_rest") == 1)
                | (F.col("pmask").bitwiseAND(F.col("m")) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("m")
        .agg(F.sum("hit").alias("vocab"))
    )
    chans = spark.createDataFrame(
        [(s, rk, 1 << rk) for s, rk in players.items()],
        "source string, rk int, bitval long",
    )
    wexpr = None
    popcnt = F.bit_count("m")
    for s in range(_SV_TOP):
        wexpr = (
            F.when(popcnt == s, F.lit(_sv_weight(s)))
            if wexpr is None
            else wexpr.when(popcnt == s, F.lit(_sv_weight(s)))
        )
    v0 = v.select(F.col("m").alias("m0"), F.col("vocab").alias("vocab0"))
    v1 = v.select(F.col("m").alias("m1"), F.col("vocab").alias("vocab1"))
    terms = (
        chans.join(masks, F.col("m").bitwiseAND(F.col("bitval")) == 0)
        .join(v0, F.col("m") == F.col("m0"))
        .join(v1, F.col("m") + F.col("bitval") == F.col("m1"))
        .select(
            "source",
            F.round(
                (F.col("vocab1") - F.col("vocab0")) * wexpr * _SV_SCALE
            )
            .cast("long")
            .alias("t"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.round(F.sum("t") * 1.0 / _SV_SCALE, 4).alias("shapley_vocab"))
        .orderBy("source")
    )


# ===========================================================================
# R376 — Haar wavelet energy by scale
# ===========================================================================

_HAAR_LEN = 32  # pad the 30-day series to a dyadic length


def _sql_haar() -> str:
    # build levels iteratively: level k averages pairs of level k-1
    ctes = [f"""
    lvl0 AS (
      SELECT g.d AS idx, coalesce(cnts.c, 0) AS a
      FROM (SELECT unnest(range(0, {_HAAR_LEN})) AS d) g
      LEFT JOIN (
        SELECT CAST(strftime(ts, '%d') AS INTEGER) - 1 AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
      ) cnts ON g.d = cnts.d
    )"""]
    n = _HAAR_LEN
    lvl = 0
    while n > 1:
        lvl += 1
        n //= 2
        ctes.append(f"""
    lvl{lvl} AS (
      SELECT e.idx // 2 AS idx,
             SUM(CASE WHEN e.idx % 2 = 0 THEN e.a ELSE 0 END)
             + SUM(CASE WHEN e.idx % 2 = 1 THEN e.a ELSE 0 END) AS a,
             SUM(CASE WHEN e.idx % 2 = 0 THEN e.a ELSE 0 END)
             - SUM(CASE WHEN e.idx % 2 = 1 THEN e.a ELSE 0 END) AS dcoef
      FROM lvl{lvl-1} e GROUP BY e.idx // 2
    )""")
    unions = " UNION ALL ".join(
        f"SELECT {k} AS level, SUM(dcoef * dcoef) * 1.0 / pow(2, {k}) "
        f"AS energy, CAST(COUNT(*) AS BIGINT) AS n_coeffs FROM lvl{k} "
        f"GROUP BY 1"
        for k in range(1, lvl + 1)
    )
    return f"""
    WITH {','.join(ctes)},
    lv AS ({unions}),
    tot AS (SELECT SUM(energy) AS te FROM lv)
    SELECT lv.level, round(lv.energy, 4) AS energy, lv.n_coeffs,
           round(lv.energy / tot.te, 6) AS energy_frac
    FROM lv CROSS JOIN tot
    ORDER BY lv.level
    """


@register("q_haar_energy", _sql_haar())
def q_haar_energy(spark, sf_dir):
    """R376 — Haar wavelet energy by scale over the (zero-padded,
    {n}-slot) daily event counts: level-k detail coefficients are the
    UNNORMALIZED pairwise differences of level-(k−1) sums — pure
    integers all the way up the pyramid — and the per-level energy
    applies the 2^-k normalization once at the end (Σd²/2^k, the
    orthonormal-Haar energy). energy_frac says which time scale
    (2-day, 4-day, … 32-day) carries the variance — the
    multi-resolution reading q_dft_power's global spectrum and
    q_seasonality's fixed week-grid can't give. log2(n) keyed aggs
    over frames that HALVE each level."""
    ev = read_events(spark, sf_dir)
    counts = ev.groupBy(
        (F.dayofmonth("ts") - 1).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = spark.range(_HAAR_LEN).select(F.col("id").alias("d"))
    level = grid.join(counts, "d", "left").select(
        F.col("d").alias("idx"), F.coalesce("c", F.lit(0)).alias("a")
    )
    out = None
    n = _HAAR_LEN
    k = 0
    while n > 1:
        k += 1
        n //= 2
        paired = level.groupBy((F.col("idx") / 2).cast("long").alias("idx")).agg(
            (
                F.sum(F.when(F.col("idx") % 2 == 0, F.col("a")).otherwise(0))
                + F.sum(
                    F.when(F.col("idx") % 2 == 1, F.col("a")).otherwise(0)
                )
            ).alias("a"),
            (
                F.sum(F.when(F.col("idx") % 2 == 0, F.col("a")).otherwise(0))
                - F.sum(
                    F.when(F.col("idx") % 2 == 1, F.col("a")).otherwise(0)
                )
            ).alias("dcoef"),
        )
        row = paired.agg(
            F.lit(k).alias("level"),
            (
                F.sum(F.col("dcoef") * F.col("dcoef"))
                * 1.0
                / F.pow(F.lit(2.0), F.lit(k))
            ).alias("energy"),
            F.count(F.lit(1)).alias("n_coeffs"),
        )
        out = row if out is None else out.unionByName(row)
        level = paired.select("idx", "a")
    tot = out.agg(F.sum("energy").alias("te"))
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "level",
            F.round("energy", 4).alias("energy"),
            "n_coeffs",
            F.round(F.col("energy") / F.col("te"), 6).alias("energy_frac"),
        )
        .orderBy("level")
    )


# ===========================================================================
# R377 — Lempel-Ziv (LZ76) sequence complexity
# ===========================================================================

def lz76_phrases(seq: str) -> int:
    """LZ76 production count, definitional form: each phrase extends
    while seq[i:i+l] still occurs in seq[:i+l-1] (self-overlap
    allowed, per Lempel-Ziv 1976), then closes with one new symbol.
    O(n²) substring scans — histories are bounded per user, and the
    independent pointer-based oracle in tests/test_batch127.py must
    agree phrase-for-phrase."""
    n = len(seq)
    phrases = 0
    i = 0
    while i < n:
        l = 1
        while i + l <= n and seq[i : i + l] in seq[: i + l - 1]:
            l += 1
        phrases += 1
        i += l
    return phrases


@register("q_lz_complexity", None)
def q_lz_complexity(spark, sf_dir):
    """R377 — Lempel-Ziv (LZ76) complexity of each user's
    chronological event-type sequence (types mapped to single
    symbols): the phrase count a left-to-right LZ parse needs, plus
    the normalized rate C·log_A(n)/n that makes users of different
    activity levels comparable. Predictable routines parse into few
    phrases; erratic behavior into many — the compression-flavored
    twin of q_user_entropy/q_entropy_rate. Sequences assemble via a
    bounded per-user sort (array_sort of (ts, type) structs inside
    one row); the parse runs where the row sits (Arrow-batched
    mapInPandas). Rows-only; independent python parser oracle in
    tests/test_batch127.py."""
    import pandas as pd

    ev = read_events(spark, sf_dir)
    sym = {
        "click": "c", "error": "e", "purchase": "p",
        "signup": "s", "view": "v",
    }
    sym_col = None
    for t, ch in sym.items():
        sym_col = (
            F.when(F.col("event_type") == t, ch)
            if sym_col is None
            else sym_col.when(F.col("event_type") == t, ch)
        )
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), sym_col.alias("ch")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s.ch
                ),
            ).alias("seq")
        )
    )

    def run(batches):
        for pdf in batches:
            out = {
                "user_id": [], "n_events": [], "lz_phrases": [],
                "lz_rate": [],
            }
            for uid, seq in zip(pdf["user_id"], pdf["seq"]):
                c = lz76_phrases(seq)
                n = len(seq)
                rate = (
                    round(c * math.log(n, 5) / n, 6) if n > 1 else None
                )
                out["user_id"].append(uid)
                out["n_events"].append(n)
                out["lz_phrases"].append(c)
                out["lz_rate"].append(rate)
            yield pd.DataFrame(out)

    return seqs.mapInPandas(
        run,
        schema=(
            "user_id long, n_events long, lz_phrases long, lz_rate double"
        ),
    ).orderBy("user_id")
