"""Pinned minimal repro of a Spark 4.1 Catalyst bug (r5 verdict #7).

`UnionBase.rewriteConstraints` throws `java.util.NoSuchElementException:
key not found: <attr>` when optimizing a plan that unions a
localCheckpoint()ed frame with itself (or a column-swap of itself) and
then joins/filters the union — IF the checkpoint's ORIGIN plan was a
filtered union containing a LocalRelation (createDataFrame) branch.

Mechanism (from minimization, /tmp/repro9-14 lineage): the LogicalRDD
that localCheckpoint produces preserves the origin Dataset's
constraints (SPARK-39748-style stats/constraints carry-over), and those
constraints reference pre-checkpoint attribute ids. When the
LogicalRDD appears under a new Union, the right child is deduplicated
to fresh exprIds but the carried constraints still name the left
child's ids; rewriteConstraints' AttributeMap lookup then misses.
Every ingredient is required: drop the LocalRelation branch, the
filter, or the checkpoint and the plan optimizes fine.

Production code works around it by setting
`spark.sql.constraintPropagation.enabled=false` around star-contraction
fixtures (tests/test_scale_smoke.py) — constraint propagation is an
optimizer nicety, not a correctness input.

The repro test ASSERTS THE BUG FIRES: when a future Spark release
fixes it, `test_bug_still_present` fails loudly — that is the signal
to delete the conf workaround (and then this file).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _build_failing_plan(spark):
    chain = spark.range(199).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    bridge = spark.createDataFrame([(77, 1000)], "u long, v long")
    e = (
        chain.unionByName(bridge)
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint()
    )
    sym = e.unionByName(e)
    mins = sym.groupBy("u").agg(F.min("v").alias("m"))
    return (
        sym.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _with_constraint_propagation(spark, enabled: str):
    spark.conf.set("spark.sql.constraintPropagation.enabled", enabled)


def test_bug_still_present(spark):
    """Expected to PASS while Spark 4.1 carries the bug. If this test
    ever fails with 'bug fixed upstream', remove the
    constraintPropagation workaround in test_scale_smoke.py and
    delete this module."""
    _with_constraint_propagation(spark, "true")
    try:
        plan = _build_failing_plan(spark)
        with pytest.raises(Exception, match="key not found"):
            plan.count()
    finally:
        _with_constraint_propagation(spark, "true")


def test_workaround_gives_correct_result(spark):
    """With constraint propagation off, the identical plan both runs
    and returns the hand-checkable answer: only the bridge group
    (u=77 -> v in {78, 1000}, m=78) survives the final filter, twice
    (self-union duplicates every row)."""
    _with_constraint_propagation(spark, "false")
    try:
        assert _build_failing_plan(spark).count() == 2
    finally:
        _with_constraint_propagation(spark, "true")
