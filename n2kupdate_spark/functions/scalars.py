"""Scalar helper columns shared across operators.

All helpers stay JVM-side (built-in functions / higher-order functions) so
they run inside whole-stage codegen — no Python boundary in the hot path
(SURVEY.md §4 "vectorized execution").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_seconds(col: str | Column) -> Column:
    """Epoch seconds (bigint) of a timestamp, truncated.

    Oracle parity (SURVEY.md §7.4.3): the DuckDB mirror is
    ``CAST(epoch(date_trunc('second', ts)) AS BIGINT)``. Timestamp→long in
    Spark is epoch-microseconds floor-divided by 1e6, i.e. the same value.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("long")


def _arr(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two float arrays via higher-order functions (JVM-side;
    no UDF). Arrays are cast to double first (SURVEY.md §7.4.2)."""
    return F.aggregate(
        F.zip_with(_arr(a), _arr(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    """Euclidean norm of a float array (double math, JVM-side)."""
    return F.sqrt(
        F.aggregate(_arr(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two float arrays, computed in double.

    Matches DuckDB ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`` —
    both fold left-to-right over the same doubles, so results agree to well
    past the 4-decimal rounding used in oracle-facing queries.
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def norm_text(col: str | Column) -> Column:
    """Canonical dedup-grade text normalization, fully JVM-side:
    lowercase → non-alphanumerics to spaces → collapse runs → trim.
    This is the standard preprocessing every published near-dup pipeline
    applies before shingling (case/punctuation variants of one document
    must hash identically); keeping it a codegen column expression means
    normalizing 100 TB costs a scan, not a Python boundary.

    Oracle parity: DuckDB mirror is ``TRIM(REGEXP_REPLACE(
    REGEXP_REPLACE(LOWER(x), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))``
    — DuckDB replaces FIRST match unless given the 'g' flag, Spark always
    replaces all; the registered text_normalize query hash-verifies the
    two engines' regex semantics agree on this battery."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(c, " +", " "))
