"""Text-analysis column builders — the LLM-data-pipeline scalar tier.

All builders return pure JVM-side ``Column`` expressions (no Python UDFs):
tokenization, counting, quality scoring, language ID, and fingerprinting stay
inside whole-stage codegen and scale linearly with no shuffle (SURVEY.md §7.2
stage 9; BASELINE.json north star).

Determinism notes: token splitting is ``\\s+`` on trimmed text (empty text →
0 tokens, guarded explicitly since ``split('')`` yields ``['']``); stopword
lists are fixed constants; fingerprints are md5 over normalized text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed stopword lists for the n-gram language heuristic.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
ES_STOPWORDS = ("el", "la", "de", "que", "y", "en", "los", "un", "es", "por")

# BPE-ish token pattern: alpha runs, digit runs, single punctuation marks.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (empty → empty array)."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), r"\s+")
    )


def word_count(col: Column) -> Column:
    """Token count; NULL for NULL text. ``F.size`` of a NULL array is -1
    with ANSI off while SQL ``len(NULL)`` is NULL, so without the guard
    every word-count oracle pair diverges the moment a corpus carries a
    NULL document (late-r11 review, confirmed row-level mismatch)."""
    return F.when(
        col.isNull(), F.lit(None).cast("long")
    ).otherwise(F.size(tokens(col)).cast("long"))


def nonspace_len(col: Column) -> Column:
    """Characters excluding whitespace — numerator for avg word length."""
    return F.length(F.regexp_replace(col, r"\s+", "")).cast("long")


def avg_word_len(col: Column, decimals: int = 4) -> Column:
    n = word_count(col)
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.round(nonspace_len(col) / n, decimals)
    )


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("long")


def stopword_hits(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of whitespace-tokens equal to a stopword.

    Implemented as ONE anchored-alternation regex count over the lowered
    text rather than ``filter(tokens, isin)`` — array lambdas run in the
    interpreted expression evaluator per element, while ``regexp_count``
    is a single codegen'd JVM pass (~5× on the documents corpus).
    Token-equality semantics are preserved exactly: ``(?:^|\\s)w(?=\\s|$)``
    fires precisely where ``split(\\s+)`` would yield the bare token ``w``
    (the lookahead leaves the separator unconsumed for the next match).
    """
    alt = "|".join(re.escape(w) for w in stopwords)
    pat = rf"(?:^|\s)(?:{alt})(?=\s|$)"
    return F.regexp_count(F.lower(F.trim(col)), F.lit(pat)).cast("long")


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    n = word_count(col)
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        stopword_hits(col, stopwords) / n
    )


def lang_guess(col: Column) -> Column:
    """N-gram (stopword) language heuristic: en vs es vs und.

    Ties favor 'en' (deterministic, documented); zero hits → 'und'.
    """
    en = stopword_hits(col, EN_STOPWORDS)
    es = stopword_hits(col, ES_STOPWORDS)
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def quality_score(col: Column, decimals: int = 4) -> Column:
    """Composite doc-quality score in [0, 1]:

    0.4·stopword_ratio + 0.3·min(avg_word_len/10, 1) + 0.3·alpha_ratio —
    length/punct/stopword heuristics per the north-star text-quality tier.
    """
    n = word_count(col)
    swr = stopword_hits(col, EN_STOPWORDS) / n
    awl = nonspace_len(col) / n
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")) / F.length(col)
    score = 0.4 * swr + 0.3 * F.least(awl / 10.0, F.lit(1.0)) + 0.3 * alpha
    return F.when((n == 0) | (F.length(col) == 0), F.lit(None).cast("double")).otherwise(
        F.round(score, decimals)
    )


def bpe_token_count(col: Column) -> Column:
    """Regex token count (alpha runs / digit runs / punctuation singles)."""
    return F.regexp_count(col, F.lit(TOKEN_PATTERN)).cast("long")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lower-cased text (the exact-dedup key)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
