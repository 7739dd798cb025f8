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


def quantize_int8(a: str | Column) -> Column:
    """Per-vector symmetric-range int8 quantization: each component maps to
    round((x - lo) / (hi - lo) * 255) - 128, where lo/hi are the vector's
    min/max. Returns array<int> in [-128, 127]; a constant vector (hi == lo)
    quantizes to all -128 via try_divide's NULL -> coalesce 0.

    This is the storage-shrink step of an ANN index (4 bytes -> 1 byte per
    dim = 4x less shuffle and scan at 100 TB); pair with dequantize_int8 and
    max_abs_error to bound the recall impact.
    """
    v = _c(a)
    lo = F.array_min(v).cast("double")
    hi = F.array_max(v).cast("double")
    scale = hi - lo
    return F.transform(
        v,
        lambda x: (
            F.round(
                F.coalesce(F.try_divide((x.cast("double") - lo) * 255.0, scale), F.lit(0.0))
            ).cast("int")
            - 128
        ),
    )


def dequantize_int8(q: str | Column, lo: Column, hi: Column) -> Column:
    """Inverse of quantize_int8 given the vector's stored (lo, hi) range."""
    scale = (hi.cast("double") - lo.cast("double")) / 255.0
    return F.transform(_c(q), lambda c: (c.cast("double") + 128.0) * scale + lo.cast("double"))
