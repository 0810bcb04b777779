"""Text-analysis column functions (LLM-data-pipeline surface).

All JVM-side built-ins (split / transform / filter / md5) -- no Python
UDFs in the hot path, so these stay inside whole-stage codegen and scale
linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the stopword-overlap language-ID
# heuristic. Deliberately small + deterministic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los", "es"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "des", "est", "un"),
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenizer (regex split, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    Stand-in for a rolling hash; collision-free enough for exact-dup
    detection at 100 TB (128-bit space).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (non-distinct; wrap in array_distinct for
    set semantics). Docs with < n tokens yield an empty array.

    Built by zipping n shifted slices of the token array: the source
    array is evaluated O(n) times per row, not once per element (a
    per-element F.get would re-evaluate the upstream split() for every
    token -- higher-order functions don't share subexpressions).
    """
    count = F.greatest(F.size(tokens_col) - (n - 1), F.lit(0))
    acc = F.slice(tokens_col, 1, count)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(tokens_col, j + 1, count),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return acc


def stopword_hits(tokens_col: Column, lang: str) -> Column:
    """Count of tokens in the language's stopword list (duplicates count)."""
    return F.size(F.filter(tokens_col, lambda x: x.isin(*STOPWORDS[lang]))).cast(
        "long"
    )
