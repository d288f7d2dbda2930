"""Text analysis operators: tokenization, token counting, language ID,
quality scoring, document fingerprinting.

Scale design: every function is a narrow per-row Catalyst expression
(split/regexp/higher-order functions) — no shuffle, no Python, fully
pipelined into the parquet scan and parallel across any number of
executors. Corpus-level steps (df counts for TF-IDF) are classic
partial-aggregation shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Token = run of word characters; the BPE-ish fallback also splits on
# punctuation boundaries (reference-free public heuristic).
TOKEN_SPLIT_REGEX = r"\s+"
WORD_REGEX = r"[A-Za-z0-9_']+"
PUNCT_REGEX = r"[\.,;:!\?\"'\(\)\[\]\{\}-]"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (shared with the oracle).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ein"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text (array<string>)."""
    return F.split(F.lower(F.trim(col)), TOKEN_SPLIT_REGEX)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish regex token count: word-character runs only."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(WORD_REGEX), 0))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_REGEX), 0))


def stopword_count(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are stopwords (exact membership)."""
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def quality_score(col: Column) -> Column:
    """Length/punct/stopword quality heuristic in [0, 1].

    score = 0.4*min(1, tokens/50) + 0.3*(1 - min(1, punct_ratio*5))
          + 0.3*min(1, stopword_ratio*5)
    All-double arithmetic over exact int counts -> cross-engine stable.
    """
    n_tok = token_count(col).cast("double")
    n_char = char_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    n_stop = stopword_count(col, LANG_PROFILES["en"]).cast("double")
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1.0))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(5.0)))
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    return {
        lang: stopword_count(col, words) for lang, words in LANG_PROFILES.items()
    }


def lang_guess(col: Column) -> Column:
    """Argmax language by stopword hits; ties by profile order; 'und' if 0.

    Implemented as a fold over a fixed profile list — pure CASE chain.
    """
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strict > keeps earlier language on ties
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 over normalized (lowercased, space-collapsed)
    text — the exact-dedup key. Cross-engine deterministic (md5 is md5)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def fingerprint_prefix64(col: Column) -> Column:
    """First 60 bits of the md5 fingerprint as BIGINT (bucketable key)."""
    return F.conv(F.substring(doc_fingerprint(col), 1, 15), 16, 10).cast("bigint")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full text-analysis profile to a documents DataFrame."""
    c = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count(c).cast("bigint"))
        .withColumn("n_chars_measured", char_count(c).cast("bigint"))
        .withColumn("n_punct", punct_count(c).cast("bigint"))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", lang_guess(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )
    return out
