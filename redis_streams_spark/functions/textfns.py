"""Cross-engine text primitives: tokenization, shingling, lexicons.

Each helper has a Spark Column form and a DuckDB SQL-snippet form computing
identical values (same regexes restricted to the RE2 ∩ Java common subset,
same 1-based list indexing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"
PUNCT_RE = "[.,;:!?]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

LANG_LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}


def words(col: Column | str) -> Column:
    """Lowercased word tokens (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def words_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        " x -> x <> '')"
    )


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), distinct; empty when < n words.

    SET semantics: element ORDER is unspecified (Spark's array_distinct
    keeps first occurrence, DuckDB's list_distinct does not — found by
    the cross-engine property test).  Every consumer must treat the
    array as a set (explode + equi-join, size()); never emit it raw in
    an oracle-hashed output — sort it first if an array output is ever
    needed."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + k) for k in range(n)]
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= n, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )
    )


def word_shingles_sql(toks: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{toks}[i+{k}]" for k in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END)"
    )


def char_ngrams(norm: Column, n: int = 4) -> Column:
    """Distinct character n-grams of an already-normalized string.
    SET semantics — same order caveat as :func:`word_shingles`."""
    idx = F.sequence(F.lit(1), F.length(norm) - (n - 1))
    return F.array_distinct(
        F.when(
            F.length(norm) >= n, F.transform(idx, lambda i: F.substring(norm, i, n))
        ).otherwise(F.array().cast("array<string>"))
    )


def char_ngrams_sql(norm: str, n: int = 4) -> str:
    return (
        f"list_distinct(CASE WHEN len({norm}) >= {n} THEN "
        f"list_transform(range(1, len({norm}) - {n - 2}), i -> substr({norm}, i, {n})) "
        f"ELSE [] END)"
    )


def sql_str_list(items: list[str]) -> str:
    inner = ", ".join("'" + s.replace("'", "''") + "'" for s in items)
    return f"[{inner}]"
