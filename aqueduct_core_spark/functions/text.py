"""Text analysis: tokenization, quality scoring, language ID, fingerprinting.

All pure built-in Spark SQL expressions (whole-stage codegen, no Python in the
hot path) so they run at scan speed over 100 TB document tables. Each has an
ANSI-SQL twin in __spark_entry__.oracle_sql() for the DuckDB correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: token pattern shared with the DuckDB oracles (keep in sync!)
TOKEN_RE = "[a-z0-9']+"
#: BPE-ish pre-tokenizer: words, single digits, punctuation runs
BPE_ISH_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"
PUNCT_RE = "[.,;:!?'\"()\\[\\]{}-]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "sie"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est", "que", "pour"],
}


def tokens(col: Column) -> Column:
    """Lowercased word tokens as an array (JVM-side regex extraction).

    regexp_extract_all of TOKEN_RE — one regex pass, no empty-string
    artifacts. Provably identical to the previous
    filter(split(lower, "[^a-z0-9']+"), x != ''): the maximal [a-z0-9']+
    runs ARE the non-empty split fields (verified 0 mismatches across every
    SF dataset), and it measured 6x faster at sf1 (2.1s -> 0.35s for 50k
    docs) because split materializes empties and the higher-order filter
    re-walks the array (guide §4.1: prefer one built-in)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_count(col: Column, mode: str = "word") -> Column:
    """Token count: 'word' (whitespace-ish) or 'bpe' (BPE-ish regex pieces)."""
    if mode == "word":
        return F.regexp_count(F.lower(col), F.lit(TOKEN_RE))
    if mode == "bpe":
        return F.regexp_count(col, F.lit(BPE_ISH_RE))
    raise ValueError(mode)


def _stopword_count(col: Column, lang: str) -> Column:
    pat = "\\b(" + "|".join(STOPWORDS[lang]) + ")\\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID (n-gram-heuristic family). Deterministic
    argmax with fixed tie order en > es > de > fr; 'und' (undetermined) when
    no stopword hits at all."""
    counts = {lang: _stopword_count(col, lang) for lang in ("en", "es", "de", "fr")}
    best = F.greatest(*counts.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "es", "de", "fr"):
        out = out.when(counts[lang] == best, F.lit(lang))
    return out


def quality_score(col: Column) -> Column:
    """Deterministic document-quality heuristic in [0,1]: rewards sane length,
    some stopwords, low punctuation density, token diversity."""
    n_chars = F.length(col)
    n_tok = token_count(col)
    n_punct = F.regexp_count(col, F.lit(PUNCT_RE))
    n_stop = _stopword_count(col, "en")
    toks = tokens(col)
    uniq_ratio = F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))
    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(n_stop / F.greatest(n_tok, F.lit(1)) * 4.0, F.lit(1.0))
    punct_pen = F.least(n_punct / F.greatest(n_chars, F.lit(1)) * 10.0, F.lit(1.0))
    return F.round(
        0.3 * len_term + 0.3 * stop_term + 0.2 * uniq_ratio + 0.2 * (1.0 - punct_pen), 6
    )


def fingerprint_md5(col: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed,
    punctuation-stripped text. Stable across engines (md5 in DuckDB == Spark)."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "))
    return F.md5(norm)


def shingle_array(toks: Column, n: int) -> Column:
    """Distinct n-token shingles from a MATERIALIZED token-array column.

    Built as a zip of n shifted slices + one transform — O(tokens) per row.
    (The naive `transform(sequence(...), i -> slice(toks, i, n))` form inlines
    and re-evaluates the token expression per shingle — O(tokens^2) per row,
    measured 20x slower; and the caller must bind `toks` to a real column, not
    an expression, for the same reason.)"""
    nsh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, nsh) for i in range(n)])
    return F.array_distinct(
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    )


def rolling_fingerprints(col: Column, n: int = 5) -> Column:
    """Rolling-hash shingle fingerprints: xxhash64 of each n-token shingle.
    The scale path for fuzzy containment checks (Spark-only; no SQL twin).
    NOTE: pass a materialized token column through shingle_array for hot paths."""
    return F.transform(shingle_array(tokens(col), n), lambda sh: F.xxhash64(sh))


def add_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document text features in one narrow projection (single scan)."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.length(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        token_count(c, "bpe").alias("n_bpe_tokens"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint_md5(c).alias("fingerprint"),
    )
