"""r12 optimization: the ``canonical=True`` fast path of
triangle_count / kcore_decompose skips the defensive
filter + least/greatest + distinct pass when the caller guarantees a
canonicalized edge frame. These tests pin that the fast path produces
IDENTICAL output to the defensive path on inputs that satisfy the
contract (the only inputs it is documented for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.graph import (
    kcore_decompose,
    triangle_count,
)


def _canonical_edges(spark, pairs):
    """u < v, duplicate-free — the documented canonical contract."""
    df = spark.createDataFrame(pairs, "src long, dst long")
    return (
        df.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def test_triangle_canonical_matches_defensive(spark):
    # two triangles sharing an edge + a pendant + an isolated edge
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5), (8, 9)]
    e = _canonical_edges(spark, pairs)
    slow = {
        (r["node"], r["triangles"])
        for r in triangle_count(e).collect()
    }
    fast = {
        (r["node"], r["triangles"])
        for r in triangle_count(e, canonical=True).collect()
    }
    assert fast == slow and len(fast) == 4


def test_kcore_canonical_matches_defensive(spark):
    # K4 plus a tail: 2-core erodes the tail over rounds
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6), (6, 7)]
    e = _canonical_edges(spark, k4 + tail)
    # kcore consumes the SYMMETRIZED frame; the symmetric closure of a
    # canonical u<v set is loop-free and duplicate-free, which is the
    # exact contract the registered kcore_rounds query relies on
    sym = e.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    sym = sym.unionByName(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    slow = {
        (r["round"], r["node"], r["deg"])
        for r in kcore_decompose(
            sym, k=2, rounds=3, src="u", dst="v"
        ).collect()
    }
    fast = {
        (r["round"], r["node"], r["deg"])
        for r in kcore_decompose(
            sym, k=2, rounds=3, src="u", dst="v", canonical=True
        ).collect()
    }
    assert fast == slow and slow
