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


def sql_double_literal(v: float) -> str:
    """repr-based float -> Spark-SQL double literal (exact round trip;
    scientific/inf/nan forms routed through a CAST). Shared by every
    parsed-SQL-string expression builder (codebooks, LSH planes)."""
    s = repr(float(v))
    if "e" in s or "E" in s or "inf" in s or "nan" in s:
        return f"CAST('{s}' AS DOUBLE)"
    return s + "D"


def dot_literal(a: Column, vals) -> Column:
    """Dot product of an array column against a DRIVER-SIDE literal
    vector, as a flat multiply-add chain instead of a
    ``zip_with``/``aggregate`` fold.

    Association matches ``dot`` exactly (left fold from 0.0, each term
    cast to double before the multiply), so results are bit-identical
    to ``dot(a, F.array(*lits))``.

    Trade-off record (measured at sf0.1, 64-dim embeddings): higher-
    order array functions are interpreted per element, so a fold
    against a K-entry literal codebook costs K*dims lambda evaluations
    per row — this flat chain avoids that and stays codegen-able for a
    SINGLE literal vector. But expanding a whole codebook this way
    (16 centroids x 64 dims inside one struct-array expression) blows
    Janino's 64 KB method limit, knocks the entire stage out of
    whole-stage codegen, and ran 4x SLOWER than the folds it replaced
    (ivf_topk 4.2 s -> 17 s). Use only for small (couple-hundred-term)
    expressions; codebook assignment keeps the fold form
    (operators/similarity.py::ivf_topk, operators/clustering.py).
    """
    acc: Column = F.lit(0.0)
    for i, v in enumerate(vals):
        acc = acc + a[i].cast("double") * F.lit(float(v))
    return acc


def sq_dist_literal(a: Column, vals) -> Column:
    """Squared L2 distance against a literal vector — flat chain,
    bit-identical to the ``zip_with`` + fold formulation (same
    left-to-right association; elements NOT cast, matching
    operators/clustering._sq_dist where the input is already double).
    Same 64 KB-codegen caveat as ``dot_literal`` — do not expand a
    whole codebook through this."""
    acc: Column = F.lit(0.0)
    for i, v in enumerate(vals):
        d = a[i] - F.lit(float(v))
        acc = acc + d * d
    return acc


def cosine_from_norms(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """cosine with pre-staged norms — bit-identical to
    ``cosine_similarity`` (same fold over the same array, evaluated
    once per VECTOR instead of once per PAIR). Array folds are
    interpreted, not codegen'd, so staging norms below a join cuts the
    per-pair fold count from three to one — the dominant cost of every
    cross/bucket-join similarity operator."""
    return F.try_divide(dot(a, b), a_norm * b_norm)
