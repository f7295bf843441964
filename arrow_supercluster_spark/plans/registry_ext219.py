"""Round-8 registry additions, batch 214 — phonetic blocking and
string-verify completions for the record-linkage family (q_record_linkage
/ q_blocking_eval ship key-equality blocking; this batch adds the
classic PHONETIC block and the two standard in-block verifiers):

- q_soundex_blocks: soundex keys over the part-name vocabulary — the
  database-style algorithm (letter→digit translate, adjacent-duplicate
  collapse, vowel removal, pad to letter+3) implemented as the SAME
  translate/regexp chain in both engines (RE2 has no backreferences, so
  the collapse is seven per-digit `d{{2,}}→d` passes, not `(\\d)\\1+`);
  output = block-size distribution (the blocking-budget readout).
- q_edit_blocked_join: blocking + verify — Levenshtein ≤ 2 candidate
  pairs WITHIN soundex blocks (both engines' built-in levenshtein is
  the standard integer DP — exact cross-engine).  The canonical
  typo-linkage join shape: block first, pay edit distance only in-block.
- q_string_blocking_keys: blocking-strategy comparison on the same
  vocabulary — first-character vs length-band vs soundex keys scored by
  block count / max block / candidate pairs / reduction ratio (the
  string-key counterpart of q_blocking_eval; a trigram-Jaccard verifier
  was drafted first but this fixture's synthetic vocabulary contains no
  trigram-sharing pair, so it would register an always-empty frame).

At 100 TB: the vocabulary collapses once (distinct words ≪ corpus);
blocks are keyed groups; every verify join is block-keyed with
degree = block size — never vocab².
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

# database-soundex letter → code map (vowels/h/w/y → 0)
_SDX_FROM = "abcdefghijklmnopqrstuvwxyz"
_SDX_TO = "01230120022455012623010202"
_EDIT_MAX = 2


def _sql_soundex(col: str) -> str:
    """Soundex as a translate/regexp chain (both engines, no backrefs):
    collapse adjacent duplicate codes on the FULL mapped string (so the
    first letter participates in the adjacency rule), drop the first
    mapped char, strip zeros, pad to 3 digits."""
    mapped = f"translate({col}, '{_SDX_FROM}', '{_SDX_TO}')"
    collapsed = mapped
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    tail = f"regexp_replace(substr({collapsed}, 2), '0', '', 'g')"
    return (
        f"upper(substr({col}, 1, 1)) || substr({tail} || '000', 1, 3)"
    )


def _spark_soundex(col):
    mapped = F.translate(col, _SDX_FROM, _SDX_TO)
    collapsed = mapped
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, f"{d}{{2,}}", d)
    tail = F.regexp_replace(F.substring(collapsed, 2, 1000), "0", "")
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.substring(F.concat(tail, F.lit("000")), 1, 3),
    )


_SQL_WORDS = """
    words AS MATERIALIZED (
      SELECT DISTINCT w FROM (
        SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part
      ) WHERE w != ''
    )"""


def _spark_words(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.select(
            F.explode(F.split(F.lower("p_name"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
    )


@register(
    "q_soundex_blocks",
    f"""
    WITH {_SQL_WORDS},
    keyed AS (
      SELECT w, {_sql_soundex('w')} AS sdx FROM words
    ),
    blocks AS (
      SELECT sdx, CAST(COUNT(*) AS BIGINT) AS sz FROM keyed GROUP BY sdx
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(sz) AS BIGINT) AS n_words,
           CAST(MAX(sz) AS BIGINT) AS max_block,
           round(AVG(sz * 1.0), 6) AS avg_block,
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS candidate_pairs
    FROM blocks
    """,
)
def q_soundex_blocks(spark, sf_dir):
    """R635 — soundex blocking over the part-name vocabulary: the
    phonetic key (shared translate/regexp-chain algorithm, documented
    simplified-database semantics) and its block-size distribution —
    n_blocks / max / avg / Σ C(sz,2) candidate pairs, the pair-space
    budget the verify joins below pay.  One vocab collapse + one keyed
    agg."""
    words = _spark_words(spark, sf_dir)
    keyed = words.select("w", _spark_soundex(F.col("w")).alias("sdx"))
    blocks = keyed.groupBy("sdx").agg(F.count(F.lit(1)).alias("sz"))
    return blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("sz").cast("long").alias("n_words"),
        F.max("sz").cast("long").alias("max_block"),
        F.round(F.avg(F.col("sz") * 1.0), 6).alias("avg_block"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
        .cast("long")
        .alias("candidate_pairs"),
    )


@register(
    "q_edit_blocked_join",
    f"""
    WITH {_SQL_WORDS},
    keyed AS (
      SELECT w, {_sql_soundex('w')} AS sdx FROM words
    ),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2,
             CAST(levenshtein(a.w, b.w) AS BIGINT) AS ed
      FROM keyed a JOIN keyed b ON a.sdx = b.sdx AND a.w < b.w
    )
    SELECT w1, w2, ed
    FROM pairs WHERE ed <= {_EDIT_MAX}
    ORDER BY ed, w1, w2
    LIMIT 50
    """,
)
def q_edit_blocked_join(spark, sf_dir):
    """R636 — blocked edit-distance verify: Levenshtein ≤ {e} word
    pairs WITHIN soundex blocks (typo-linkage candidates).  Both
    engines' built-in levenshtein is the standard DP — integer-exact
    cross-engine.  The join is block-keyed: each word meets only its
    block, so the verify cost is Σ block² — the q_blocking_eval budget,
    never vocab².""".format(e=_EDIT_MAX)
    words = _spark_words(spark, sf_dir)
    keyed = words.select("w", _spark_soundex(F.col("w")).alias("sdx"))
    a = keyed.select(F.col("w").alias("w1"), "sdx")
    b = keyed.select(F.col("w").alias("w2"), "sdx")
    pairs = (
        a.join(b, "sdx")
        .filter(F.col("w1") < F.col("w2"))
        .select(
            "w1", "w2",
            F.levenshtein("w1", "w2").cast("long").alias("ed"),
        )
    )
    return (
        pairs.filter(F.col("ed") <= _EDIT_MAX)
        .orderBy("ed", "w1", "w2")
        .limit(50)
    )


@register(
    "q_string_blocking_keys",
    f"""
    WITH {_SQL_WORDS},
    keyed AS (
      SELECT w,
             substr(w, 1, 1) AS k_first,
             CAST(len(w) // 3 AS VARCHAR) AS k_len,
             {_sql_soundex('w')} AS k_sdx
      FROM words
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             COUNT(*) * (COUNT(*) - 1) / 2 AS allpairs
      FROM keyed
    ),
    strat AS (
      SELECT 'first_char' AS strategy, k_first AS k FROM keyed
      UNION ALL SELECT 'length_band', k_len FROM keyed
      UNION ALL SELECT 'soundex', k_sdx FROM keyed
    ),
    blocks AS (
      SELECT strategy, k, CAST(COUNT(*) AS BIGINT) AS sz
      FROM strat GROUP BY 1, 2
    )
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(MAX(sz) AS BIGINT) AS max_block,
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS candidate_pairs,
           round(1.0 - SUM(sz * (sz - 1) / 2) / tot.allpairs, 6)
             AS reduction_ratio
    FROM blocks CROSS JOIN tot
    GROUP BY strategy, tot.allpairs
    ORDER BY strategy
    """,
)
def q_string_blocking_keys(spark, sf_dir):
    """R637 — string blocking-key comparison on the shared vocabulary:
    first-character, length-band (len//3) and soundex keys, each scored
    by block count, max block, candidate pairs Σ C(sz,2) and reduction
    ratio 1 − candidates/C(n,2) — the string-key counterpart of
    q_blocking_eval's numeric/categorical comparison (reduction vs
    completeness is THE blocking design axis; completeness needs
    labeled matches, which q_blocking_eval's dirty-copy fixture
    provides — here the vocabulary is unlabeled so reduction is the
    readout).  One vocab collapse + one key explode + keyed aggs."""
    words = _spark_words(spark, sf_dir)
    keyed = words.select(
        "w",
        F.substring("w", 1, 1).alias("k_first"),
        (F.floor(F.length("w") / 3)).cast("string").alias("k_len"),
        _spark_soundex(F.col("w")).alias("k_sdx"),
    )
    tot = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2
        ).alias("allpairs"),
    )
    strat = (
        keyed.select(F.lit("first_char").alias("strategy"),
                     F.col("k_first").alias("k"))
        .unionByName(
            keyed.select(F.lit("length_band").alias("strategy"),
                         F.col("k_len").alias("k"))
        )
        .unionByName(
            keyed.select(F.lit("soundex").alias("strategy"),
                         F.col("k_sdx").alias("k"))
        )
    )
    blocks = strat.groupBy("strategy", "k").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        blocks.crossJoin(F.broadcast(tot))
        .groupBy("strategy", "allpairs")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("sz").alias("max_block"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cand"),
        )
        .select(
            "strategy",
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.col("max_block").cast("long").alias("max_block"),
            F.col("cand").cast("long").alias("candidate_pairs"),
            F.round(
                1.0 - F.col("cand") / F.col("allpairs"), 6
            ).alias("reduction_ratio"),
        )
        .orderBy("strategy")
    )
