"""Shared text column expressions (pure built-in functions — JVM-side,
whole-stage-codegen friendly; no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text_col: str | Column = "text", lowercase: bool = True) -> Column:
    """Non-empty whitespace tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token array
    column; a doc shorter than n words yields one whole-doc shingle (so
    no document silently drops out of similarity joins).

    ``toks`` must be an attribute (a projected column), not a nested
    expression: higher-order functions evaluate interpreted (no codegen
    / no common-subexpression elimination), so a token expression nested
    inside the ``transform`` lambda would re-tokenize the document once
    PER SHINGLE — O(tokens²) per document. Callers project tokens first
    (the projection survives optimization because the column is
    referenced multiple times here, which CollapseProject refuses to
    inline for non-cheap expressions).
    """
    if n <= 1:
        return F.array_distinct(toks)
    size = F.size(toks)
    grams = F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def word_shingles(text_col: str | Column, n: int) -> Column:
    """Single-expression shingles (convenience; see
    :func:`shingles_from_tokens` for the fast two-step form used in the
    dedup hot paths)."""
    return shingles_from_tokens(tokens(text_col), n)
