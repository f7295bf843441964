"""Text-analysis operators (SURVEY.md §2b E4): token counting, top-token
stats, language-ID heuristic, quality scoring, document fingerprinting.

All pure built-in expressions (split/explode/regexp/aggregate) — the whole
module is shuffle-light: per-doc scores are narrow maps; corpus-level stats
are single hash aggregations with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.partitioning import spread

from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public-knowledge wordlists, not from the reference).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
}


def token_count(c) -> "F.Column":
    """Whitespace token count. BPE-ish subword estimate is `bpe_estimate`."""
    return F.size(tokenize(c))


def bpe_token_estimate(c) -> "F.Column":
    """BPE-ish token-count estimate without a tokenizer model: count
    regex word-pieces (runs of letters, digits, or single punctuation) —
    the standard cheap proxy (≈ GPT-style pre-tokenizer split)."""
    pieces = F.split(
        F.regexp_replace(normalize_text(c), r"([a-z]+|[0-9]+|[^a-z0-9 ])", "$1"),
        "",
    )
    return F.size(F.filter(pieces, lambda p: F.trim(p) != ""))


def char_count(c) -> "F.Column":
    return F.length(c)


def quality_score(text_col) -> "F.Column":
    """Heuristic quality score in [0,1]: mean-word-length band + punct
    ratio + uppercase ratio penalties (public Gopher/C4-style filters,
    simplified). Pure expressions; tune thresholds per corpus."""
    n_chars = F.length(text_col).cast("double")
    n_tokens = token_count(text_col).cast("double")
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1.0))
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", "")).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    upper = F.length(F.regexp_replace(text_col, r"[^A-Z]", "")).cast("double")
    upper_ratio = upper / F.greatest(n_chars, F.lit(1.0))
    word_len_ok = F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.6)
    upper_ok = F.when(upper_ratio <= 0.3, 1.0).otherwise(0.7)
    return word_len_ok * punct_ok * upper_ok


def lang_id_expr(text_col) -> "F.Column":
    """Stopword-vote language ID: score per language = number of tokens in
    that language's stopword list; argmax with deterministic tie-break
    (language code order). Returns 'und' when no stopword hits.

    The token array is bound ONCE as a lambda variable (the
    element_at/transform/array trick — see dedup.shingles): referencing
    `tokenize(text)` directly in each language's filter would embed the
    tokenization expression per language AND per use in the
    greatest/CASE chain, re-evaluating it ~12× per row."""

    def inner(toks):
        def stopword_hits(ws):
            lits = F.array(*[F.lit(w) for w in ws])
            # single-arg lambda: PySpark passes (element, index) to 2-arg
            # lambdas
            return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))

        scores = [
            (lang, stopword_hits(ws)) for lang, ws in sorted(STOPWORDS.items())
        ]
        best = F.greatest(*[s for _, s in scores])
        out = F.lit("und")
        for lang, s in reversed(scores):  # earlier langs win ties
            out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
        return out

    return F.element_at(F.transform(F.array(tokenize(text_col)), inner), 1)


def rolling_fingerprint(text_col, window: int = 8) -> "F.Column":
    """Document fingerprint: min of rolling token-window hashes (winnowing
    flavor) — a single 64-bit doc signature robust to local edits. Token
    array bound as a lambda var (see dedup.shingles for why)."""

    def inner(arr):
        n = F.size(arr)
        idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
        return F.array_min(
            F.transform(
                idx,
                lambda i: F.xxhash64(F.array_join(F.slice(arr, i + 1, window), " ")),
            )
        )

    return F.element_at(F.transform(F.array(tokenize(text_col)), inner), 1)


def doc_stats(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Per-document analysis row: counts, quality, lang guess, fingerprint."""
    t = F.col(text)
    # spread heavy per-doc expressions across the cluster even when the
    # input is a single file/partition
    docs = spread(docs)
    return docs.select(
        F.col(key),
        token_count(t).alias("n_tokens"),
        bpe_token_estimate(t).alias("n_bpe_tokens"),
        char_count(t).alias("n_chars_computed"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id_expr(t).alias("lang_guess"),
        rolling_fingerprint(t).alias("fingerprint"),
    )


def top_tokens(docs: DataFrame, text: str = "text", k: int = 50) -> DataFrame:
    """Corpus-level top-k tokens: explode → hash-agg (map-side combine) →
    deterministic top-k (count desc, token asc)."""
    docs = spread(docs)
    return (
        docs.select(F.explode(tokenize(F.col(text))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def lang_stats(docs: DataFrame, lang: str = "lang", n_chars: str = "n_chars") -> DataFrame:
    """Per-language corpus stats (declared-lang column)."""
    return (
        docs.groupBy(lang)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_chars).alias("total_chars"),
            F.round(F.avg(n_chars), 4).alias("avg_chars"),
        )
        .orderBy(lang)
    )


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Textbook Jaro-Winkler (Winkler 1990): Jaro similarity boosted by
    l·p·(1−jaro) for a shared prefix of l ≤ 4 chars, p = 0.1, applied
    only when jaro > 0.7 (the standard boost threshold — verified to
    match DuckDB's jaro_winkler_similarity on reference pairs, which is
    the oracle twin). Pure Python on purpose: the metric is inherently
    per-pair sequential; it runs inside an Arrow-batched pandas UDF so
    the per-row overhead is a function call, not a serialized Row."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    win = max(n1, n2) // 2 - 1
    if win < 0:
        win = 0
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - win), min(n2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    # transpositions = FLOOR(half-transpositions / 2): an odd mismatch
    # count rounds down, matching DuckDB's (RapidFuzz-style) integer
    # division — the textbook t/2 differs on e.g. 'raecan'/'aer'
    jaro = (
        matches / n1 + matches / n2 + (matches - t // 2) / matches
    ) / 3.0
    if jaro > 0.7:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        jaro += l * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler_col(a, b):
    """Vectorized (Arrow-batched) Jaro-Winkler column over two string
    columns. The only Python-UDF text metric in the repo besides none:
    Spark has no built-in JW (levenshtein yes, JW no), and the char-
    window match loop doesn't decompose into HOF expressions. Batches
    stream through Arrow; at 100 TB this is a narrow map — no shuffle."""
    # module-global pandas import: `from __future__ import annotations`
    # stringifies the hints, and the pandas_udf type-hint resolver looks
    # them up in the module globals
    global pd
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(sa: "pd.Series", sb: "pd.Series") -> "pd.Series":
        return pd.Series(
            [
                jaro_winkler_py(x or "", y or "")
                for x, y in zip(sa.tolist(), sb.tolist())
            ],
            dtype="float64",
        )

    return _jw(a, b)
