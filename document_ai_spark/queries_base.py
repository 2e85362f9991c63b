"""Shared word/shingle normalization used across the query modules —
ONE frozen policy in both engines (Spark expression + DuckDB SQL twin):
split(regexp_replace(trim(text), '\\s+', ' '), ' ').
Inline the split into per-element lambdas and both engines go O(words^2)
per document — always materialize `words` once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SHINGLE_W = 3


def _norm_words(col: str = "text") -> F.Column:
    return F.split(
        F.regexp_replace(F.trim(F.col(col)), r"\s+", " "), " "
    )


def _shingles(words: F.Column) -> F.Column:
    """Word 3-gram shingles; empty array for docs with < 3 words."""
    n = F.size(words)
    return F.when(
        n >= SHINGLE_W,
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_W),
            lambda i: F.concat_ws(
                " ", words[i], words[i + 1], words[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


_SQL_WORDS = "str_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
_SQL_WORDS_CTE = f"SELECT doc_id, {_SQL_WORDS} AS words FROM documents"
_SQL_SHINGLES_FROM_WORDS = """
    CASE WHEN len(words) >= 3 THEN
      list_transform(range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
    ELSE [] END
"""
