"""Vector functions over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (zip_with / transform / aggregate) —
JVM-side, no Python, no UDF registration — so similarity math runs inside
the scan stage.  Floats are cast to double *element-wise before any
arithmetic* so results match engines that compute in double (and avoid
float32 accumulation error); the fold order is the array order, making
sums bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity = dot / (||a|| * ||b||)."""
    return dot(a, b) / (norm(a) * norm(b))
