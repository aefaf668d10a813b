"""Vector (embedding) expression helpers.

Operate on ``array<float|double>`` columns entirely JVM-side via
``F.zip_with`` / ``F.aggregate`` — no Python UDF in the hot path. Elements
are cast to double before accumulation so precision does not depend on
the storage type (float32 in the testdata).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (sequential fold, double acc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(||a||*||b||); NULL if either norm is zero."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """cosine with pre-staged norms — bit-identical to
    ``cosine_similarity`` (same fold over the same array, evaluated
    once per VECTOR instead of once per PAIR). Array folds are
    interpreted, not codegen'd, so staging norms below a join cuts the
    per-pair fold count from three to one — the dominant cost of every
    cross/bucket-join similarity operator."""
    return F.try_divide(dot(a, b), a_norm * b_norm)
