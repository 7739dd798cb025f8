"""Vector math over array<float> embedding columns — pure Column expressions.

Dot products / norms use ``zip_with`` + ``aggregate`` with **double**
accumulation (matching DuckDB's semantics on DOUBLE[] casts), JVM-side and
codegen-friendly. No Python in the per-row path; a vectorized Pandas-UDF
variant only makes sense when a BLAS batch beats codegen, which for 64-dim
vectors it does not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: str | Column) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: str | Column, b: str | Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) when either vector has zero
    norm. Prefer precomputing norms per vector in pairwise operators —
    see operators/similarity.py."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
