"""Round-7 registry additions, batch 167 — web-corpus character/line
hygiene (the q_url_canonicalize / q_luhn_check family: deterministic
dirty fixtures synthesized from (doc_id, text) so both engines audit
identical inputs, because the clean synthetic corpus contains none of
the defects these operators exist to catch):

- q_script_mix: per-language character-class profile (alpha / digit /
  space / punct fractions) — the script-level signal language-ID and
  quality filters consume (a Latin-corpus doc that is 40% digits is a
  table dump, not prose).
- q_mojibake: encoding-damage audit — UTF-8-decoded-as-CP1252
  signatures (â€/Ã©-class sequences, stray BOM) and U+FFFD
  replacement characters, counted per source. The double-encoding
  class is THE dominant real-world text corruption; a corpus with a
  rising mojibake rate has a broken ingestion hop.
- q_line_filters: RefinedWeb-style line-level quality rules over
  8-word synthesized lines — bullet lines, ellipsis endings,
  ALL-CAPS shouting, sub-3-word fragments; per-source flagged
  fraction and the keep verdict at a 30% line-noise budget.

At 100 TB: all three are pure per-row string/array expressions
(whole-stage codegen, no UDF, no explode — line rules run inside
list_filter/F.filter) followed by one partial-aggregated rollup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs

_LF_WORDS = 8       # synthesized line width (words)
_LF_BUDGET = 0.3    # max flagged-line fraction to keep a doc


# ===========================================================================
# R498 — character-class (script) mix
# ===========================================================================

_SM_DIRTY_SQL = (
    "text || ' ' || CAST(doc_id % 100 AS VARCHAR) || "
    "CASE doc_id % 4 WHEN 0 THEN '!!' WHEN 1 THEN ', ok.' "
    "WHEN 2 THEN ' (x)' ELSE '' END"
)


@register(
    "q_script_mix",
    f"""
    WITH dirty AS (
      SELECT lang, {_SM_DIRTY_SQL} AS t FROM documents
    ),
    prof AS (
      SELECT lang, len(t) AS n,
             len(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             len(regexp_replace(t, '[^0-9]', '', 'g')) AS n_digit,
             len(regexp_replace(t, '[^ ]', '', 'g')) AS n_space
      FROM dirty
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_chars,
           round(SUM(n_alpha) * 1.0 / SUM(n), 6) AS alpha_frac,
           round(SUM(n_digit) * 1.0 / SUM(n), 6) AS digit_frac,
           round(SUM(n_space) * 1.0 / SUM(n), 6) AS space_frac,
           round(SUM(n - n_alpha - n_digit - n_space) * 1.0 / SUM(n), 6)
             AS punct_frac
    FROM prof GROUP BY lang ORDER BY lang
    """,
)
def q_script_mix(spark, sf_dir):
    """R498 — character-class profile per language over a
    deterministically augmented text (the clean corpus carries no
    digits/punctuation, so a doc_id-derived tail adds both — stated
    fixture, the q_url_canonicalize pattern). Fractions are exact
    integer-length ratios — no float drift before the 6-digit round.
    Plan: three regexp_replace lengths per row, one rollup."""
    docs = _docs(spark, sf_dir)
    dirty = F.concat(
        F.col("text"), F.lit(" "),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, "!!")
        .when(F.col("doc_id") % 4 == 1, ", ok.")
        .when(F.col("doc_id") % 4 == 2, " (x)")
        .otherwise(""),
    )
    prof = docs.select(
        "lang",
        F.length(dirty).alias("n"),
        F.length(F.regexp_replace(dirty, "[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(dirty, "[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace(dirty, "[^ ]", "")).alias("n_space"),
    )
    n, a, d, sp = (F.col(c) for c in ("n", "n_alpha", "n_digit", "n_space"))
    return (
        prof.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("total_chars"),
            F.round(F.sum(a) * 1.0 / F.sum(n), 6).alias("alpha_frac"),
            F.round(F.sum(d) * 1.0 / F.sum(n), 6).alias("digit_frac"),
            F.round(F.sum(sp) * 1.0 / F.sum(n), 6).alias("space_frac"),
            F.round(
                F.sum(n - a - d - sp) * 1.0 / F.sum(n), 6
            ).alias("punct_frac"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# R499 — mojibake / encoding-damage audit
# ===========================================================================

# UTF-8 bytes re-decoded as CP1252: ’ → â€™, é → Ã©, BOM → ï»¿
_MJ_APOS = "â€™"      # â€™
_MJ_EACUTE = "Ã©"          # Ã©
_MJ_BOM = "ï»¿"       # ï»¿
_MJ_REPL = "�"                  # U+FFFD


@register(
    "q_mojibake",
    f"""
    WITH dirty AS (
      SELECT source,
             text || CASE doc_id % 7
               WHEN 0 THEN ' it{_MJ_APOS}s'
               WHEN 1 THEN ' {_MJ_EACUTE}t{_MJ_EACUTE}'
               WHEN 2 THEN ' ' || chr(65533)
               WHEN 3 THEN ' {_MJ_BOM}start'
               ELSE '' END AS t
      FROM documents
    ),
    flags AS (
      SELECT source,
             CASE WHEN contains(t, chr(65533)) THEN 1 ELSE 0 END AS repl,
             CASE WHEN contains(t, '{_MJ_APOS[:2]}')
                    OR contains(t, '{_MJ_EACUTE}')
                    OR contains(t, '{_MJ_BOM}') THEN 1 ELSE 0 END AS cp1252
      FROM dirty
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(repl) AS BIGINT) AS n_replacement,
           CAST(SUM(cp1252) AS BIGINT) AS n_cp1252,
           round(SUM(CASE WHEN repl = 1 OR cp1252 = 1 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS damage_rate
    FROM flags GROUP BY source ORDER BY source
    """,
)
def q_mojibake(spark, sf_dir):
    """R499 — encoding-damage audit over a deterministically damaged
    fixture (doc_id mod 7 injects the three classic CP1252-mojibake
    signatures or a U+FFFD replacement char — stated; the clean
    corpus has none): per source, documents carrying replacement
    characters vs double-encoding signatures, and the combined damage
    rate. Pure contains() flags — no regex engine differences to
    reconcile; one rollup."""
    docs = _docs(spark, sf_dir)
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" it" + _MJ_APOS + "s"))
        .when(F.col("doc_id") % 7 == 1,
              F.lit(" " + _MJ_EACUTE + "t" + _MJ_EACUTE))
        .when(F.col("doc_id") % 7 == 2, F.lit(" " + _MJ_REPL))
        .when(F.col("doc_id") % 7 == 3, F.lit(" " + _MJ_BOM + "start"))
        .otherwise(F.lit("")),
    )
    flags = docs.select(
        "source",
        F.when(F.contains(t, F.lit(_MJ_REPL)), 1).otherwise(0).alias("repl"),
        F.when(
            F.contains(t, F.lit(_MJ_APOS[:2]))
            | F.contains(t, F.lit(_MJ_EACUTE))
            | F.contains(t, F.lit(_MJ_BOM)),
            1,
        ).otherwise(0).alias("cp1252"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("repl").cast("long").alias("n_replacement"),
            F.sum("cp1252").cast("long").alias("n_cp1252"),
            F.round(
                F.sum(
                    F.when((F.col("repl") == 1) | (F.col("cp1252") == 1), 1)
                    .otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("damage_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R500 — line-level quality filters (RefinedWeb-style)
# ===========================================================================

_LF_INJ_SQL = (
    "CASE doc_id % 5 WHEN 0 THEN '- click here' "
    "WHEN 1 THEN 'read more...' WHEN 2 THEN 'SUBSCRIBE NOW' "
    "WHEN 3 THEN 'ok' ELSE NULL END"
)


@register(
    "q_line_filters",
    f"""
    WITH lined AS (
      SELECT doc_id, source,
             list_transform(
               range(CAST(ceil(len(string_split(text, ' '))
                               * 1.0 / {_LF_WORDS}) AS BIGINT)),
               i -> array_to_string(
                      string_split(text, ' ')[(i * {_LF_WORDS} + 1)
                                              :(i * {_LF_WORDS}
                                                + {_LF_WORDS})], ' ')
             ) AS body,
             {_LF_INJ_SQL} AS inj
      FROM documents
    ),
    lines AS (
      SELECT doc_id, source,
             CASE WHEN inj IS NULL THEN body
                  ELSE list_append(body, inj) END AS ls
      FROM lined
    ),
    scored AS (
      SELECT source, len(ls) AS n_lines,
             len(list_filter(ls, l ->
                   starts_with(l, '-') OR l LIKE '%...'
                   OR (upper(l) = l AND regexp_matches(l, '[A-Z]'))
                   OR len(string_split(l, ' ')) < 3)) AS n_flagged
      FROM lines
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_lines) AS BIGINT) AS total_lines,
           CAST(SUM(n_flagged) AS BIGINT) AS flagged_lines,
           round(AVG(n_flagged * 1.0 / n_lines), 6) AS avg_flagged_frac,
           CAST(SUM(CASE WHEN n_flagged * 1.0 / n_lines <= {_LF_BUDGET}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM scored GROUP BY source ORDER BY source
    """,
)
def q_line_filters(spark, sf_dir):
    """R500 — RefinedWeb-style line rules over {w}-word synthesized
    lines (the corpus is single-line, so lines are the consecutive
    {w}-word windows plus one injected noise line per doc_id mod 5 —
    stated fixture): a line is flagged when it is a bullet ('-'
    prefix), ends in an ellipsis, SHOUTS (all-caps with letters), or
    has fewer than 3 words. Per source: total/flagged lines, average
    flagged fraction, and how many docs survive the {b:.0%} noise
    budget. No explode — the rules run inside list_filter/F.filter,
    so a 100k-line document never becomes 100k shuffle rows.""".format(
        w=_LF_WORDS, b=_LF_BUDGET
    )
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_lines_body = F.ceil(F.size(toks) * 1.0 / _LF_WORDS).cast("long")
    body = F.transform(
        F.sequence(F.lit(0), (n_lines_body - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(toks, i * _LF_WORDS + 1, _LF_WORDS), " "
        ),
    )
    inj = (
        F.when(F.col("doc_id") % 5 == 0, "- click here")
        .when(F.col("doc_id") % 5 == 1, "read more...")
        .when(F.col("doc_id") % 5 == 2, "SUBSCRIBE NOW")
        .when(F.col("doc_id") % 5 == 3, "ok")
    )
    ls = F.when(inj.isNull(), body).otherwise(
        F.concat(body, F.array(inj))
    )
    flagged = F.size(
        F.filter(
            ls,
            lambda line: line.startswith("-")
            | line.endswith("...")
            | ((F.upper(line) == line) & line.rlike("[A-Z]"))
            | (F.size(F.split(line, " ")) < 3),
        )
    )
    scored = docs.select(
        "source",
        F.size(ls).alias("n_lines"),
        flagged.alias("n_flagged"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").cast("long").alias("total_lines"),
            F.sum("n_flagged").cast("long").alias("flagged_lines"),
            F.round(
                F.avg(F.col("n_flagged") * 1.0 / F.col("n_lines")), 6
            ).alias("avg_flagged_frac"),
            F.sum(
                F.when(
                    F.col("n_flagged") * 1.0 / F.col("n_lines")
                    <= _LF_BUDGET,
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )
