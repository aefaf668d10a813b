"""Binned interval (range) joins.

A pure range predicate (``r.ts BETWEEN l.ts + lower AND l.ts + upper``)
gives Spark no equi-key, so the planner falls back to
BroadcastNestedLoopJoin — O(|L|·|R|) and a broadcast of a whole side;
at corpus scale that's the join that never finishes. The standard fix
is binning: quantize time into buckets at least as wide as the window,
explode the left side to the handful of buckets its window can touch,
hash-join on the bucket, then re-check the exact range. The shuffle is
keyed by time bucket — bounded fan-out (``⌈span/bin⌉+1`` rows per left
row), AQE splits hot buckets, and both scans stay pruned.

DuckDB oracles state the plain theta join (its IEJoin handles that
shape natively); equality of results is exactly what the parity gate
checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bin_size: int | None = None,
) -> DataFrame:
    """Inner join of ``left`` x ``right`` on
    ``right_ts BETWEEN left_ts + lower AND left_ts + upper``.

    Timestamps are integral (epoch micros); ``bin_size`` defaults to
    the window span so each left row explodes to at most 2 buckets.
    Column names must be disjoint (select/alias beforehand).
    """
    if upper < lower:
        raise ValueError(f"empty interval [{lower}, {upper}]")
    span = upper - lower
    b = bin_size or max(span, 1)
    lo: Column = F.col(left_ts) + lower
    hi: Column = F.col(left_ts) + upper
    binned_left = left.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(lo / b), F.floor(hi / b))),
    )
    binned_right = right.withColumn("_rbin", F.floor(F.col(right_ts) / b))
    return (
        binned_left.join(binned_right, F.col("_bin") == F.col("_rbin"))
        .filter(F.col(right_ts).between(lo, hi))
        .drop("_bin", "_rbin")
    )
