"""Vector (embedding) column expressions.

Dot products / norms are built from ``zip_with`` + ``aggregate`` higher
order functions — JVM-side, sequential left-to-right summation, which
matches DuckDB's ``list_dot_product`` element order so oracle parity
holds to the last ulp. No Pandas UDF needed for 64-dim vectors; at very
high dims a vectorized Pandas UDF variant would amortize better (noted
in SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — formula mirrored
    verbatim in the DuckDB oracle."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def normalized(vec: Column) -> Column:
    """v / ||v|| computed once per vector, so pairwise cosine reduces to
    a single fold dot. The element-wise divide + sequential fold is
    mirrored verbatim in the DuckDB oracle, keeping bit-exact parity
    while cutting per-pair work 3x."""
    norm = F.sqrt(dot(vec, vec))
    return F.transform(vec, lambda x: x / norm)
