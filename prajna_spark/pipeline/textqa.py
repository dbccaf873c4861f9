"""Text analysis column library: normalization, tokenization, language-ID,
quality scoring, fingerprinting.

All pure column expressions (whole-stage codegen; zero Python in the hot
path). The reference has no text ops — samples do string work in .NET
closures (WordCount.fs:36, DistributedLogAnalysis.fs:104-117); this module
is the declared Spark-native surface for the same jobs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deliberately small + deterministic (no external models).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "un", "en", "du", "des", "les", "est"),
    "de": ("der", "die", "und", "das", "von", "mit", "ein", "zu", "den", "ist"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def normalized(col: Column) -> Column:
    """lower, strip non-alphanumerics to spaces, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.filter(F.split(normalized(col), " +"), lambda w: w != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex (on lowered text)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(F.lower(col), r"[a-z0-9 ]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda w: w.isin(*words)))


def lang_id(col: Column) -> Column:
    """Best-scoring language by stopword-hit ratio; 'und' when no hits.

    Deterministic tie-break: languages evaluated in sorted order and
    strictly-greater comparison, so the first (alphabetical) max wins.
    """
    n = F.greatest(token_count(col), F.lit(1))
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(STOPWORDS):
        score = stopword_hits(col, lang) / n
        new_best = score > best_score
        best_lang = F.when(new_best, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(new_best, score).otherwise(best_score)
    return best_lang


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence + mean-word-length band. All subscores in [0,1]."""
    ntok = token_count(col)
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    stop_score = F.least(
        stopword_hits(col, "en") / F.greatest(ntok, F.lit(1)) * 5, F.lit(1.0)
    )
    mean_wlen = F.length(normalized(col)) / F.greatest(ntok, F.lit(1))
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    return (len_score + punct_score + stop_score + wlen_score) / 4


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalized(col))
