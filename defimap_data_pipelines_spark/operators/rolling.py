"""Rolling/decayed window analytics over the events stream (engine
extension: the reference's trailing windows, A2/A3 in SURVEY.md §2.4,
generalized to per-key rolling frames at event grain).

Determinism contract (plans/queries.py docstring): every accumulation
that would be float-order-sensitive is quantized to exact integers
before summing, so Spark's frame-ordered fold and the oracle's
unordered SUM agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weighted_moving_avg(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
    window_rows: int = 20,
    decay: float = 0.8,
) -> DataFrame:
    """Exponentially-decayed moving average over the trailing
    ``window_rows`` events per key (a truncated EWMA).

    wma_t = sum_j decay^j * v_{t-j} / sum_j decay^j over the available
    trailing rows j = 0..window_rows-1. The truncation keeps the weight
    exponent bounded, so the terms are representable and the whole
    expression is a closed form both engines compute identically —
    an infinite-history EWMA is a sequential recurrence that can't be
    distributed without a scan operator, and its (1-a)^-i rewrite
    overflows doubles after ~3k rows.

    Implementation: collect_list over the row frame (frame order = the
    window's orderBy, oldest first), per-element integer-quantized
    decayed terms, order-free bigint sum; weight normalizer is the
    closed-form geometric sum.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.collect_list(value_col).over(w)
    n = F.size(arr)
    # element i (0-based, oldest first) gets weight decay^(n-1-i);
    # weights are a precomputed literal array zipped against the frame
    # (same IEEE doubles as a per-element pow, cheaper to plan/execute)
    weights = F.array(
        *[F.lit(decay**j) for j in range(window_rows - 1, -1, -1)]
    )
    terms = F.zip_with(
        arr,
        F.slice(weights, F.lit(window_rows) - n + 1, n),
        lambda x, wgt: F.round(x * wgt * 1_000_000.0).cast("long"),
    )
    qsum = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, t: acc + t
    )
    wsum = (F.lit(1.0) - F.pow(F.lit(decay), n.cast("double"))) / F.lit(
        1.0 - decay
    )
    return events.select(
        key_col,
        *order_cols,
        F.col(value_col),
        F.round(qsum / 1_000_000.0 / wsum, 6).alias("wma"),
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
    window_rows: int = 50,
    z_threshold: float = 2.5,
    min_n: int = 10,
) -> DataFrame:
    """Rows whose value deviates > ``z_threshold`` sample standard
    deviations from the trailing ``window_rows``-row mean (the rolling
    outlier detector every telemetry/quality pipeline needs).

    Values are quantized to 1e-3 units so the rolling sum and
    sum-of-squares are exact bigints (order-free; sum of squares stays
    < 2^63 for |value| <= ~6e5 over 50 rows); mean/variance then come
    from identical integer inputs in both engines. Sample variance,
    n-1, matching the reference's statistics.stdev choice (A3).
    """
    q = F.round(F.col(value_col) * 1000.0).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    df = events.select(
        key_col, *order_cols, F.col(value_col), q.alias("_q")
    ).select(
        key_col,
        *order_cols,
        value_col,
        F.count(F.lit(1)).over(w).alias("_n"),
        F.sum("_q").over(w).alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).over(w).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s") / n / 1000.0
    var = (
        (F.col("_ss") - F.col("_s") * F.col("_s") / n)
        / (n - 1.0)
        / 1_000_000.0
    )
    # var == 0 exactly when all window values are equal (integer-exact
    # inputs) — emit no zscore rather than +/-inf
    z = F.when(var > 0, (F.col(value_col) - mean) / F.sqrt(var))
    return (
        df.filter(F.col("_n") >= min_n)
        .select(
            key_col,
            *order_cols,
            value_col,
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > z_threshold)
    )


def pareto_frontier(
    df: DataFrame,
    minimize: str,
    maximize: str,
    buckets: int = 32,
) -> DataFrame:
    """2-D skyline: distinct (minimize, maximize) points not dominated
    by any other point (dominate = <= on ``minimize``, >= on
    ``maximize``, strict on at least one).

    Two-phase for scale: a local prune per hash bucket first (any point
    dominated within its bucket is dominated globally — sound, not
    complete), then the exact single-pass sweep over the few bucket
    survivors. The sweep is the classic sort trick: order by (min asc,
    max desc); a point is dominated iff the running max of ``maximize``
    over STRICTLY PRECEDING rows reaches its own value — correct on
    distinct pairs because preceding rows have smaller price or equal
    price with strictly larger size.
    """
    pts = df.select(
        F.col(minimize).alias("lo"), F.col(maximize).alias("hi")
    ).distinct()

    def sweep(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("lo").asc(), F.col("hi").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
            if part_cols
            else Window.orderBy(F.col("lo").asc(), F.col("hi").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        return frame.withColumn("_runmax", F.max("hi").over(w)).filter(
            F.col("_runmax").isNull() | (F.col("_runmax") < F.col("hi"))
        )

    local = sweep(
        pts.withColumn(
            "_b", F.pmod(F.hash("lo", "hi"), F.lit(buckets))
        ),
        ["_b"],
    ).drop("_b", "_runmax")
    return sweep(local, []).select(
        F.col("lo").alias(minimize), F.col("hi").alias(maximize)
    )


def ewma_quantized(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """EWMA (alpha = 1/2) as an EXACT integer recursion — the
    oracle-able member of the order-dependent-state family (the same
    trick pagerank_quantized plays on iterative graph state, applied
    to sequential per-key state):

        e_1 = q(x_1);  e_t = (q(x_t) + e_{t-1}) div 2

    with q(x) = round(x * micro) and ``div`` truncating toward zero —
    the one convention Spark's ``div`` and DuckDB's ``//`` share
    (DuckDB -3 // 2 = -1, trunc; note Python's ``//`` FLOORS, so the
    pandas loop must trunc explicitly). Exact integers end to end, so
    a recursive-CTE oracle replays every step bit-for-bit — float
    EWMA could never cross engines (every step compounds rounding).

    True sequential recursions don't vectorize: each key's series
    runs as a Python loop in event order. Execution shape (r12
    optimization, guide §4): ONE ``mapInPandas`` pass over rows
    hash-partitioned by key and sorted (key, order) within partitions,
    with the per-key state carried across Arrow batches. The previous
    ``groupBy().applyInPandas`` form paid a pandas DataFrame slice +
    sort + duplicate-scan PER KEY — at high key cardinality the
    per-group overhead dwarfed the recursion itself (measured 3.9 s ->
    1.1 s at sf0.1's 1,500 keys x 100k rows; identical output). Same
    exchange either way (hash by key); sortWithinPartitions replaces
    the per-group sorts. At 100 TB this is the shape streaming EWMA
    jobs take anyway: partition by key, iterate in event order.

    CONTRACT: ``(key_col, order_col)`` must be unique — a duplicate
    order key has no defined visit order, so the recursion (and any
    SQL oracle's row_number) would be nondeterministic. Rows arrive
    key-sorted, so a duplicate shows up as equal consecutive order
    values; the loop raises ValueError rather than returning
    layout-dependent output.

    Returns (key, order, ewma_q) with ewma_q in micro-units.
    """
    import pandas as pd

    def run(batches):
        # state survives batch boundaries: a key's series may span
        # adjacent Arrow batches of the same partition (rows are
        # (key, order)-sorted within the partition, so key runs are
        # contiguous across the whole batch iterator)
        last_k, last_o, e = object(), None, None
        for pdf in batches:
            # .tolist() up front: iterating Series yields numpy
            # scalars whose per-element int coercion measurably
            # dominates this loop; plain ints keep it cheap
            ks = pdf["_k"].tolist()
            os_ = pdf["_ord"].tolist()
            xs = pdf["_xq"].tolist()
            out = []
            ap = out.append
            for kk, oo, xq in zip(ks, os_, xs):
                if kk != last_k:
                    last_k, e = kk, xq
                elif oo == last_o:
                    raise ValueError(
                        "ewma_quantized: duplicate order values "
                        f"within key {kk!r}; (key_col, order_col) "
                        "must uniquely identify rows"
                    )
                else:
                    s = xq + e
                    # trunc, not floor (Python // floors)
                    e = -((-s) // 2) if s < 0 else s // 2
                last_o = oo
                ap(e)
            yield pd.DataFrame(
                {"k": pdf["_k"], "o": pdf["_ord"], "ewma_q": out}
            )

    staged = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_ord"),
        F.round(F.col(value_col) * micro).cast("long").alias("_xq"),
    )
    k_t = staged.schema["_k"].dataType.simpleString()
    o_t = staged.schema["_ord"].dataType.simpleString()
    out = staged.repartition("_k").sortWithinPartitions(
        "_k", "_ord"
    ).mapInPandas(run, f"k {k_t}, o {o_t}, ewma_q long")
    return out.select(
        F.col("k").alias(key_col),
        F.col("o").alias(order_col),
        "ewma_q",
    )


def holt_quantized(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing with
    alpha = beta = 1/2 as an EXACT two-state integer recursion — the
    ewma_quantized trick extended to coupled state (level + trend),
    which is what turns "smoothed forecast" from a float artifact
    into a value-hash-checkable column:

        l_1 = q(x_1),                 b_1 = 0
        l_t = (q(x_t) + l_{t-1} + b_{t-1}) div 2
        b_t = ((l_t - l_{t-1}) + b_{t-1}) div 2

    with q(x) = round(x * micro) and ``div`` truncating toward zero
    (the Spark/DuckDB-shared convention; Python's ``//`` floors, so
    the loop truncs explicitly). The one-step-ahead forecast is the
    exact integer l_t + b_t. A recursive-CTE oracle carries BOTH
    state columns and replays every step bit-for-bit.

    Same execution shape and (key, order)-uniqueness contract as
    ewma_quantized: one ``mapInPandas`` pass over rows
    hash-partitioned by key and sorted (key, order) within partitions,
    per-key state carried across Arrow batches, loud ValueError on a
    duplicate order key (r12: migrated off per-group applyInPandas
    together with ewma_quantized — same per-group-overhead
    measurement; two-variable coupled recursions don't vectorize;
    keys partition freely, which is the 100 TB story — one pass per
    key in event order, exactly the shape a streaming forecaster
    takes).

    Returns (key, order, level_q, trend_q, forecast_q), all in
    micro-units.
    """
    import pandas as pd

    def trunc2(s: int) -> int:
        return -((-s) // 2) if s < 0 else s // 2

    def run(batches):
        last_k, last_o = object(), None
        l = b = None
        for pdf in batches:
            ks = pdf["_k"].tolist()
            os_ = pdf["_ord"].tolist()
            xs = pdf["_xq"].tolist()
            ls, bs, fs = [], [], []
            for kk, oo, xq in zip(ks, os_, xs):
                if kk != last_k:
                    last_k, l, b = kk, xq, 0
                elif oo == last_o:
                    raise ValueError(
                        "holt_quantized: duplicate order values "
                        f"within key {kk!r}; (key_col, order_col) "
                        "must uniquely identify rows"
                    )
                else:
                    l_prev = l
                    l = trunc2(xq + l + b)
                    b = trunc2((l - l_prev) + b)
                last_o = oo
                ls.append(l)
                bs.append(b)
                fs.append(l + b)
            yield pd.DataFrame(
                {
                    "k": pdf["_k"],
                    "o": pdf["_ord"],
                    "level_q": ls,
                    "trend_q": bs,
                    "forecast_q": fs,
                }
            )

    staged = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_ord"),
        F.round(F.col(value_col) * micro).cast("long").alias("_xq"),
    )
    k_t = staged.schema["_k"].dataType.simpleString()
    o_t = staged.schema["_ord"].dataType.simpleString()
    out = staged.repartition("_k").sortWithinPartitions(
        "_k", "_ord"
    ).mapInPandas(
        run,
        f"k {k_t}, o {o_t}, level_q long, trend_q long, forecast_q long",
    )
    return out.select(
        F.col("k").alias(key_col),
        F.col("o").alias(order_col),
        "level_q",
        "trend_q",
        "forecast_q",
    )
