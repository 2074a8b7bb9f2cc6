"""Vector math over ``array<float|double>`` columns — pure built-in
higher-order functions (JVM-side, whole-stage-codegen eligible, no Python).

All math is done in double with a sequential left fold so results are
bit-identical to DuckDB's ``list_*`` functions on ``DOUBLE[]`` — which is
what lets the similarity queries hash-match their oracles without rounding
games.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col) -> Column:
    return _c(col).cast("array<double>")


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ — zip_with product then ordered left-fold sum."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns NULL)."""
    d = norm(_c(a)) * norm(_c(b))
    return F.when(d != 0.0, dot(a, b) / d)
