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
   this operator deliberately targets FEW groups) finds, for EVERY
   requested q at once, the bucket holding the target rank and the
   residual rank within it;
4. one filtered pass counts distinct values inside the target buckets
   only (~n/buckets rows per group per q), and a per-(group, q) window
   over those few distinct values picks each answer exactly.

Multiple quantiles of the same column share passes 1-3 and the single
filtered pass — asking for (q25, q75) costs the same three scans as
asking for the median, not double.

The result equals DuckDB's ``quantile_disc``: the element at 1-based
rank ceil(q*n) in ascending order. Rank arithmetic is fp-exact for
binary-representable q (the registered queries use 0.5 / 0.25 / 0.75).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    buckets: int = 1024,
) -> DataFrame:
    """(group, q, quantile): exact type-1 quantiles of ``value_col``
    per group for every q in ``qs``, never holding more than
    ~n/buckets values of one group in any single task."""
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
    # ONE collect of the per-group stats serves everything downstream
    # (r13, guide §2.4/§5): previously the stats aggregation was
    # broadcast-JOINED under both the histogram pass and the final
    # pass (re-building the aggregation once per action) AND collected
    # a third time for the driver walk's counts — five input scans per
    # call. The collected rows are re-emitted as per-group literal
    # CASE branches instead (few groups is the operator's contract),
    # so each action scans the input exactly once: three scans total.
    # Literal round trips are exact: longs are exact int literals;
    # py4j moves doubles via shortest-round-trip decimal strings in
    # both directions, so lo/hi re-enter the plan bit-identical and
    # every downstream arithmetic expression is unchanged.
    stats_rows = stats.collect()
    if not stats_rows:
        return df.select(
            group_col,
            F.lit(0.0).alias("q"),
            F.col(value_col).alias("quantile"),
        ).limit(0)

    def _case(field: str):
        e = None
        for r_ in stats_rows:
            cond = F.col(group_col) == F.lit(r_[0])
            e = F.when(cond, F.lit(r_[field])) if e is None else e.when(
                cond, F.lit(r_[field])
            )
        return e

    lo_e, hi_e = _case("_lo"), _case("_hi")
    # rows whose group is NULL never matched the previous stats join;
    # the explicit filter preserves that exclusion
    staged = df.filter(F.col(group_col).isNotNull()).select(
        group_col, value_col
    )
    width = (hi_e - lo_e) / F.lit(float(buckets))
    bucket = F.when(hi_e > lo_e,
        F.least(
            F.lit(buckets - 1),
            F.floor((F.col(value_col) - lo_e) / width).cast("int"),
        ),
    ).otherwise(F.lit(0))
    hist = (
        staged.select(group_col, bucket.alias("_b"))
        .groupBy(group_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # driver walk: per (group, q), locate the bucket holding rank
    # ceil(q*n) and the residual rank inside it. Histogram size =
    # groups x nonempty buckets — the operator's contract is FEW
    # groups — and one walk serves every q.
    counts = {r_[0]: r_["_n"] for r_ in stats_rows if r_[0] is not None}
    rows = sorted(hist.collect(), key=lambda r: (str(r[0]), r[1]))
    target: dict = {}  # (g, q) -> (bucket, residual_rank)
    remaining = {
        (g, q): int(math.ceil(q * n))
        for g, n in counts.items()
        for q in qs
    }
    for r in rows:
        g, b, c = r[0], r[1], r[2]
        for q in qs:
            key = (g, q)
            if key in target:
                continue
            if remaining[key] <= c:
                target[key] = (b, remaining[key])
            else:
                remaining[key] -= c
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    tschema = (
        f"`{group_col}` {gtype}, `_q` DOUBLE, `_tb` INT, `_rr` BIGINT"
    )
    tdf = spark.createDataFrame(
        [(g, float(q), int(b), int(r_)) for (g, q), (b, r_) in target.items()],
        tschema,
    )
    # final pass: rows in ANY q's target bucket survive (the join
    # replicates a row only when two q's share a bucket); the
    # per-(group, q) window runs over that bucket's DISTINCT values
    s = staged.withColumn("_b", bucket).alias("s")
    in_bucket = s.join(
        F.broadcast(tdf.alias("t")),
        (F.col(f"s.{group_col}") == F.col(f"t.{group_col}"))
        & (F.col("s._b") == F.col("t._tb")),
    ).select(
        F.col(f"s.{group_col}").alias(group_col),
        F.col("t._q").alias("_q"),
        F.col("t._rr").alias("_rr"),
        F.col(f"s.{value_col}").alias(value_col),
    )
    per_value = in_bucket.groupBy(group_col, "_q", "_rr", value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(group_col, "_q")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_value.withColumn("_cum", F.sum("_c").over(w))
    hit = cum.filter(F.col("_cum") >= F.col("_rr"))
    wmin = Window.partitionBy(group_col, "_q").orderBy(value_col)
    return (
        hit.withColumn("_rn", F.row_number().over(wmin))
        .filter(F.col("_rn") == 1)
        .select(
            group_col,
            F.col("_q").alias("q"),
            F.col(value_col).alias("quantile"),
        )
    )


def exact_grouped_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    buckets: int = 1024,
) -> DataFrame:
    """(group, quantile): single-q form of
    :func:`exact_grouped_quantiles`."""
    return exact_grouped_quantiles(
        df, group_col, value_col, [q], buckets
    ).select(group_col, "quantile")


def bottomk_sample_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: list[float],
    k: int = 1024,
) -> DataFrame:
    """MERGEABLE approximate quantiles from a deterministic bottom-k
    sample: the rows whose ``md5(key)`` ranks in the global bottom k
    form a uniform without-replacement sample (the same bottom-k hash
    set a KMV sketch keeps — union two days' samples and re-take the
    k minima to merge), and the reported quantiles are the EXACT
    type-1 quantiles of that sample. Rank error is O(1/sqrt(k)).

    Where exact_grouped_quantiles re-scans the data per refinement
    pass, the sample is maintainable incrementally and answers every
    q from k rows — the streaming/rollup regime. And unlike t-digest
    or KLL (merge-order-dependent internals), the bottom-k set is a
    pure function of the data, so the SKETCH ITSELF — not just a
    tolerance gate — replays in a SQL oracle.

    Scale shape: one TakeOrdered of (hash, value) — per-partition
    heaps, driver merge of k rows, no global sort; the quantile
    extraction is a window over k rows.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(key_col).cast("string"))
    # Tie-break the k-boundary cut by value: duplicate key values (or
    # any hash collision straddling the limit) would otherwise make
    # the kept set engine- and partition-dependent. With (_h, _v) the
    # sample is a pure function of the data even when key_col repeats
    # — though repeats do bias the "uniform" claim toward duplicated
    # keys, so pass a unique key for a genuinely uniform sample.
    sample = (
        df.filter(F.col(value_col).isNotNull())
        .select(h.alias("_h"), F.col(value_col).alias("_v"))
        .orderBy("_h", "_v")
        .limit(k)
    )
    n = F.max("_rn").over(Window.partitionBy())
    ranked = sample.withColumn(
        "_rn",
        F.row_number().over(Window.orderBy(F.col("_v").asc(), F.col("_h"))),
    ).withColumn("_n", n)
    # ONE pass for every q: explode the q list per row and keep the
    # row whose rank is that q's target — a per-q union of filters
    # re-ran the TakeOrdered sample scan once per q (measured 4
    # scans in the plan audit for 4 qs)
    return (
        ranked.withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
        )
        .filter(
            F.col("_rn")
            == F.greatest(
                F.lit(1), F.ceil(F.col("q") * F.col("_n")).cast("int")
            )
        )
        .select("q", F.col("_v").alias("quantile"))
    )


def weighted_median_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col,
    quantum: int = 100,
) -> DataFrame:
    """Lower weighted median of ``value_col`` under integer weights,
    per group: the smallest value v with cumulative weight(<= v) >=
    half the total weight. The robust center for "median price per
    unit SOLD" style questions where each row speaks for
    ``weight_col`` units, not one (plain median over rows answers a
    different question).

    The LOWER-median convention is deliberate: it always lands on an
    observed value, needs no interpolation, and is a pure integer
    decision (2 * cumw >= total under int64), so it replays exactly
    in any engine. One groupBy to (group, value)-level weight sums —
    value-distinct-sized, not row-sized — then a window cumsum and a
    MIN over qualifying values. Returns (g, total_w, w_median).
    """
    from pyspark.sql import Window

    vq = F.round(F.col(value_col) * quantum).cast("long")
    per_v = (
        df.select(
            F.col(group_col).alias("g"),
            vq.alias("vq"),
            weight_col.cast("long").alias("w"),
        )
        .groupBy("g", "vq")
        .agg(F.sum("w").alias("wv"))
    )
    cum = per_v.select(
        "g",
        "vq",
        "wv",
        F.sum("wv")
        .over(
            Window.partitionBy("g")
            .orderBy("vq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cw"),
        F.sum("wv")
        .over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(
            F.max("tw").alias("total_w"),
            (F.min("vq").cast("double") / quantum).alias("w_median"),
        )
    )
