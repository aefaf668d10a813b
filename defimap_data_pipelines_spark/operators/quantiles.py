"""Distributed EXACT quantiles for few huge groups.

Spark's ``percentile`` is exact but buffers every value of a group in
one aggregation buffer — the right tool when groups are numerous and
small, and precisely the wrong one for a 100 TB table with a handful of
giant groups (3 return flags x billions of rows: three single-threaded
sorts of the whole table). This module computes the same type-1
(discrete) quantile by bucket refinement instead:

1. one pass for per-group (count, min, max) — tiny;
2. one pass for a per-group histogram over ``buckets`` equal-width
   value ranges — shuffle keyed by (group, bucket), map-side combined;
3. a driver walk over the histogram (groups x nonempty buckets rows —
   this operator deliberately targets FEW groups) finds the bucket
   holding the target rank and the residual rank within it;
4. one filtered pass counts distinct values inside the target buckets
   only (~n/buckets rows per group), and a per-group window over those
   few distinct values picks the answer exactly.

The result equals DuckDB's ``quantile_disc``: the element at 1-based
rank ceil(q*n) in ascending order. Rank arithmetic is fp-exact for
binary-representable q (the registered query uses q=0.5).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_grouped_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    buckets: int = 1024,
) -> DataFrame:
    """(group, quantile): exact type-1 quantile of ``value_col`` per
    group, never holding more than ~n/buckets values of one group in
    any single task."""
    # NULLs are excluded up front: F.count(value_col) already skips
    # them in the rank base, but F.least treats floor(NULL)=NULL as
    # the LAST bucket (least skips nulls), silently inflating the top
    # histogram bucket and shifting the chosen rank.
    df = df.filter(F.col(value_col).isNotNull())
    stats = df.groupBy(group_col).agg(
        F.count(value_col).alias("_n"),
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
    )
    staged = df.select(group_col, value_col).join(
        F.broadcast(stats), group_col
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(buckets))
    bucket = F.when(F.col("_hi") > F.col("_lo"),
        F.least(
            F.lit(buckets - 1),
            F.floor((F.col(value_col) - F.col("_lo")) / width).cast("int"),
        ),
    ).otherwise(F.lit(0))
    hist = (
        staged.select(group_col, bucket.alias("_b"))
        .groupBy(group_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # driver walk: per group, locate the bucket holding rank ceil(q*n)
    # and the residual rank inside it. Histogram size = groups x
    # nonempty buckets — the operator's contract is FEW groups.
    counts = {r[0]: r[1] for r in stats.select(group_col, "_n").collect()}
    target: dict = {}
    rows = sorted(
        hist.collect(), key=lambda r: (str(r[0]), r[1])
    )
    remaining = {g: int(math.ceil(q * n)) for g, n in counts.items()}
    for r in rows:
        g, b, c = r[0], r[1], r[2]
        if g in target:
            continue
        if remaining[g] <= c:
            target[g] = (b, remaining[g])
        else:
            remaining[g] -= c
    tb = F.create_map(
        *[x for g, (b, _) in target.items() for x in (F.lit(g), F.lit(b))]
    )
    rr = F.create_map(
        *[x for g, (_, r_) in target.items() for x in (F.lit(g), F.lit(r_))]
    )
    # final pass: only the target bucket's rows survive the filter;
    # the per-group window runs over that bucket's DISTINCT values
    in_bucket = staged.filter(bucket == tb[F.col(group_col)])
    per_value = in_bucket.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_value.withColumn("_cum", F.sum("_c").over(w))
    hit = cum.filter(F.col("_cum") >= rr[F.col(group_col)])
    wmin = Window.partitionBy(group_col).orderBy(value_col)
    return (
        hit.withColumn("_rn", F.row_number().over(wmin))
        .filter(F.col("_rn") == 1)
        .select(group_col, F.col(value_col).alias("quantile"))
    )
