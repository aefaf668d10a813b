"""Time-series operators: hypertable-style rollup cascades, exact
autocorrelation, and CUSUM changepoint scores.

Greenfield per SURVEY.md §7 (the reference delegates time-bucketed
aggregation to its warehouse); the designs are the standard published
ones — continuous-aggregate cascades (TimescaleDB's hypertable
rollups), the sample autocorrelation function, and Page's CUSUM
(Page 1954) in its prefix-min closed form.

Determinism contract: every accumulation is integer-quantized (cents
/ micro-units) so both engines sum exact integers in any order; final
ratios are single double divisions of exact ints (IEEE-deterministic,
identical expression trees both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Partial-aggregate state columns a rollup level carries. COUNT and
#: integer SUM re-aggregate by summing, MIN/MAX by min/max — the
#: classic "algebraic aggregate" decomposition (Gray et al., Data
#: Cube, 1997) that makes each level derivable from the level below.
_STATE = ("n", "sum_q", "min_q", "max_q")


def rollup_level(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    value_col: str | None = None,
    quantum: int = 100,
) -> DataFrame:
    """One rollup level. If ``value_col`` is given, aggregates RAW
    rows: quantizes value to integer units (default cents) and emits
    the partial state. Otherwise ``df`` must already carry the state
    columns from a finer level, and this level RE-AGGREGATES them —
    never touching the raw table. ``bucket`` is a date_trunc unit
    (minute/hour/day/...).

    Scale shape: the cascade is the whole point — at 100 TB the raw
    scan happens once (finest level); each coarser level reads the
    previous one (60x, 24x, ... smaller). One shuffle per level, on
    the bucket key; AQE coalesces the shrinking partitions.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    if value_col is not None:
        q = F.round(F.col(value_col) * quantum).cast("long")
        return df.groupBy(b).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q).alias("sum_q"),
            F.min(q).alias("min_q"),
            F.max(q).alias("max_q"),
        )
    missing = [c for c in _STATE if c not in df.columns]
    if missing:
        raise ValueError(f"re-aggregation level lacks state {missing}")
    return df.groupBy(
        F.date_trunc(bucket, F.col("bucket")).alias("bucket")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_q").alias("sum_q"),
        F.min("min_q").alias("min_q"),
        F.max("max_q").alias("max_q"),
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
    quantum: int = 100,
) -> DataFrame:
    """Hypertable rollup: build every level of ``levels`` in order,
    each derived from the previous (raw rows feed only the first).
    Returns the COARSEST level with a closed-out ``avg`` column —
    the re-aggregation algebra is what the oracle checks (a direct
    day-level aggregation of the raw table must match bit-for-bit).
    """
    cur = rollup_level(df, ts_col, levels[0], value_col, quantum)
    for lv in levels[1:]:
        cur = rollup_level(cur, "bucket", lv)
    return cur.select(
        "bucket",
        "n",
        "sum_q",
        "min_q",
        "max_q",
        (F.col("sum_q").cast("double") / F.col("n") / quantum).alias("avg"),
    )


def acf_quantized(
    series: DataFrame,
    order_col: str,
    value_q_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation at lags 1..max_lag of an integer-valued
    series, EXACT until the final division.

    Mean-centering without leaving the integers: with S = sum(x) and
    n rows, n*(x_t - mean) = n*x_t - S is an integer, so

        acf(L) = sum_{t>L} (n*x_t - S)(n*x_{t-L} - S)
                 / sum_t (n*x_t - S)^2

    (the n^2 scale cancels). Everything up to the ratio is exact
    integer arithmetic — both engines sum exact integers in any
    order — and the ratio is one double division. Headroom (r8): the
    centered value c = n*x - S is ~days * daily-mass, so c*c wraps
    int64 at ~3e9 of |c|; c and its products therefore compute in
    decimal(38,0) (oracle: HUGEINT) — the series frame is O(days),
    so the per-row decimal cost is nil, and headroom extends from
    ~3e9 to ~1e19 of |c| (~3e15 daily mass units on a 10-year
    series, six orders beyond the int64 form); quantize coarser
    past that. Denominator uses the FULL series (the
    standard plug-in ACF estimator, constant across lags).

    The series frame is one row per period — O(days), not O(events)
    — so the two global windows (lag, and the cross-join'd scalars)
    are bounded; aggregate to the period grain first.
    """
    n_s = series.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col(value_q_col)).cast("long").alias("_s"),
    )
    w = Window.orderBy(order_col)
    base = (
        series.select(order_col, value_q_col)
        .crossJoin(F.broadcast(n_s))
        .withColumn(
            "_c",
            F.col("_n").cast("decimal(38,0)") * F.col(value_q_col)
            - F.col("_s"),
        )
    )
    denom = base.agg(F.sum(F.col("_c") * F.col("_c")).alias("_d"))
    lagged = base.select(
        "_c",
        *[
            F.lag("_c", lag).over(w).alias(f"_c{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    nums = lagged.agg(
        *[
            F.sum(F.col("_c") * F.col(f"_c{lag}")).alias(f"_n{lag}")
            for lag in range(1, max_lag + 1)
        ]
    )
    pairs = ", ".join(
        f"named_struct('lag', {lag}, "
        f"'acf', CAST(_n{lag} AS DOUBLE) / CAST(_d AS DOUBLE))"
        for lag in range(1, max_lag + 1)
    )
    return (
        nums.crossJoin(F.broadcast(denom))
        .select(F.expr(f"inline(array({pairs}))"))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.round("acf", 9).alias("acf"),
        )
    )


def ljung_box_q_expr(max_lag: int) -> str:
    """The Ljung-Box Q expression over the wide per-lag numerator
    columns (_n1.._n{max_lag}), the denominator _d and the series
    length _n — shared VERBATIM between the Spark operator and the
    DuckDB oracle (the RUNS_TEST_Z_EXPR discipline) so both engines
    build the identical float expression tree.

    Q = n(n+2) * sum_k rho_k^2 / (n-k) with rho_k = num_k / denom.
    The sum over lags is a FIXED-ORDER literal chain of max_lag
    terms, never a float row-aggregation — float addition is only
    order-stable when the order is spelled out.
    """
    terms = " + ".join(
        f"(CAST(_n{k} AS DOUBLE) / CAST(_d AS DOUBLE))"
        f" * (CAST(_n{k} AS DOUBLE) / CAST(_d AS DOUBLE))"
        f" / (_n - {k})"
        for k in range(1, max_lag + 1)
    )
    return f"CAST(_n AS DOUBLE) * (_n + 2) * ({terms})"


def ljung_box(
    series: DataFrame,
    order_col: str,
    value_q_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Ljung-Box portmanteau Q over the plug-in autocorrelations of an
    integer-valued series — the standard "is there ANY autocorrelation
    through lag h" test (Ljung & Box 1978) that upgrades acf_quantized
    from per-lag eyeballing to one decision statistic:

        Q = n (n + 2) * sum_{k=1..h} rho_k^2 / (n - k)

    with rho_k the same exact-integer plug-in ACF acf_quantized
    computes (centered via n*x - S; like acf_quantized, c and its
    products ride decimal(38,0)/HUGEINT so the bound is ~1e19 of
    |c|, not int64's ~3e9). Returns ONE row (n_days, max_lag, lb_q);
    lb_q is NULL for series shorter than max_lag + 1 (a lag with no
    overlap has an undefined rho). Under H0 (white noise) Q ~
    chi2(h), so the caller compares against the literal chi2 critical
    value for their alpha.

    Scale shape: identical to acf_quantized — the series frame is one
    row per period (O(days), aggregated upstream), the per-lag
    numerators ride ONE window pass, and the lag sum is a fixed-order
    scalar expression on a single joined row (see ljung_box_q_expr).
    """
    n_s = series.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col(value_q_col)).cast("long").alias("_s"),
    )
    w = Window.orderBy(order_col)
    base = (
        series.select(order_col, value_q_col)
        .crossJoin(F.broadcast(n_s))
        .withColumn(
            "_c",
            F.col("_n").cast("decimal(38,0)") * F.col(value_q_col)
            - F.col("_s"),
        )
    )
    denom = base.agg(F.sum(F.col("_c") * F.col("_c")).alias("_d"))
    lagged = base.select(
        "_c",
        F.col("_n"),
        *[
            F.lag("_c", lag).over(w).alias(f"_c{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    # Global agg, carrying _n via MAX, to mirror the oracle's
    # no-GROUP-BY aggregate exactly: an EMPTY series must yield one
    # row of NULLs in BOTH engines (a groupBy("_n") would yield zero
    # rows here while the oracle yields one — r8 ADVICE shape fix).
    nums = lagged.agg(
        F.max("_n").alias("_n"),
        *[
            F.sum(F.col("_c") * F.col(f"_c{lag}")).alias(f"_n{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    q = F.when(
        (F.col("_n") > max_lag) & (F.col("_d") > 0),
        F.expr(ljung_box_q_expr(max_lag)),
    )
    return (
        nums.crossJoin(F.broadcast(denom))
        .select(
            F.col("_n").alias("n_days"),
            F.lit(max_lag).cast("int").alias("max_lag"),
            F.round(q, 9).alias("lb_q"),
        )
    )


def seasonal_residuals(
    series: DataFrame,
    day_col: str,
    value_q_col: str,
    micro: int = 1_000,
) -> DataFrame:
    """Day-of-week seasonal decomposition with z-scored residuals —
    the "is Tuesday actually anomalous, or is it just Tuesday"
    detrending step every event-volume monitor needs before
    thresholding.

    seasonal(dow) = mean of the integer series over that weekday
    (exact int sums, one double division per of-7 bucket); residual =
    x - seasonal(dow), quantized to micro-units before the global
    moment sums so the z-score's mean/variance accumulate as exact
    int64 in any order. z = (r - mean_r) / sample_std(r), one double
    expression over five exact scalars.

    int64 headroom: the residual grid only needs 1/n_dow resolution
    (seasonal means are rationals over day counts), so milli-units
    default; m * (resid_u)^2 < 9.2e18 bounds |resid| * micro to
    ~3e8/sqrt(days) — quantize coarser for larger daily magnitudes.

    Weekday convention: ISO (Mon=1..Sun=7) — Spark's weekday()+1;
    replays as DuckDB isodow(). (Spark dayofweek() is Sun=1 — the
    classic cross-engine off-by-one, avoided here.)

    Input is the period-grain frame (one row per day, integer value),
    same bounded-frame contract as acf_quantized. The seasonal and
    moment frames are O(7) and O(1) broadcasts.
    """
    dow = F.expr(f"weekday({day_col}) + 1")
    # O(days) frame with THREE downstream consumers (seasonal means,
    # residual join, and transitively the moment sums) — without the
    # cache each Catalyst branch re-runs whatever raw-event
    # aggregation produced `series` (the bigram_lift lesson).
    base = series.select(
        day_col,
        F.col(value_q_col).alias("_xq"),
        dow.cast("int").alias("dow"),
    ).cache()
    seasonal = base.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("_nd"),
        F.sum("_xq").alias("_sd"),
    )
    resid = (
        base.join(F.broadcast(seasonal), "dow")
        .withColumn(
            "resid_u",
            F.round(
                (
                    F.col("_xq").cast("double")
                    - F.col("_sd").cast("double") / F.col("_nd")
                )
                * micro
            ).cast("long"),
        )
        .drop("_nd", "_sd")
    )
    moments = resid.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("resid_u").alias("_sr"),
        F.sum(F.col("resid_u") * F.col("resid_u")).alias("_srr"),
    )
    mean_r = F.col("_sr").cast("double") / F.col("_m")
    var_r = (
        F.col("_srr").cast("double")
        - F.col("_sr").cast("double") * F.col("_sr") / F.col("_m")
    ) / (F.col("_m") - 1)
    # A perfectly-seasonal series has residual variance EXACTLY 0
    # (all integer sums are 0), so the z guard is an exact-zero
    # compare replaying identically in the oracle — and it keeps
    # ANSI mode from raising DIVIDE_BY_ZERO.
    return (
        resid.crossJoin(F.broadcast(moments))
        .select(
            day_col,
            "dow",
            F.col("_xq").alias("xq"),
            "resid_u",
            F.when(
                var_r > 0,
                F.round((F.col("resid_u") - mean_r) / F.sqrt(var_r), 9),
            ).alias("z"),
        )
    )


def cusum_scores(
    series: DataFrame,
    order_col: str,
    value_q_col: str,
) -> DataFrame:
    """One-sided CUSUM drift score per period (Page 1954) against the
    series' own mean, in its prefix-min closed form:

        s_t = max(0, s_{t-1} + d_t)  ==  cs_t - min(0, min_{j<=t} cs_j)

    with d_t = n*x_t - S (integer mean-centering as in acf_quantized)
    and cs the running sum of d. The recursion that looks inherently
    sequential is two window functions — running SUM and running MIN —
    so it scales as a sort + one pass instead of a per-row loop, and
    the identical windows replay exactly in the oracle (all integers).

    Returns (order, d, score_q) where score_q = s_t in n*quantum
    units; the caller thresholds it. One row per period — aggregate
    to the period grain first (same bounded-frame contract as ACF).
    """
    n_s = series.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col(value_q_col)).cast("long").alias("_s"),
    )
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        series.select(order_col, value_q_col)
        .crossJoin(F.broadcast(n_s))
        .withColumn("d", F.col("_n") * F.col(value_q_col) - F.col("_s"))
        .withColumn("_cs", F.sum("d").over(w))
        .withColumn("_m", F.min("_cs").over(w))
        .select(
            order_col,
            "d",
            (F.col("_cs") - F.least(F.col("_m"), F.lit(0))).alias(
                "score_q"
            ),
        )
    )


def page_hinkley(
    series: DataFrame,
    order_col: str,
    value_q_col: str,
    delta_q: int = 0,
) -> DataFrame:
    """Page-Hinkley upward-drift score per period: PH_t = m_t -
    min_{s<=t} m_s with m_t = sum_{i<=t} (x_i - xbar_i - delta),
    xbar_i the RUNNING mean. Where cusum_scores centers on the
    full-series mean (an offline changepoint view), PH is the online
    monitor — each term compares against only what was known at time
    i, so a late drift can't contaminate the early baseline. Returns
    (order, ph_q) in the same quantum as ``value_q_col``; the caller
    alarms on ph_q > lambda.

    The running mean makes the textbook form look sequential; it is
    three window passes — running SUM for xbar, running SUM of the
    centered terms for m, running MIN for the envelope. xbar_i rides
    as an integer truncated division (cs_i div i, identical
    truncation semantics both engines; bias <= 1 quantum unit per
    term, documented), so every accumulated value stays exact int64
    and the replay is engine-independent.
    """
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = (
        series.select(order_col, value_q_col)
        .withColumn("_cs", F.sum(value_q_col).over(w))
        .withColumn("_rn", F.count(F.lit(1)).over(w))
        .withColumn(
            "_term",
            F.col(value_q_col)
            - F.expr("_cs div _rn")
            - F.lit(delta_q),
        )
        .withColumn("_m", F.sum("_term").over(w))
        .withColumn("_mmin", F.min("_m").over(w))
    )
    return stepped.select(
        order_col, (F.col("_m") - F.col("_mmin")).alias("ph_q")
    )


def rs_hurst(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_q_col: str,
    sizes: tuple = (8, 16, 32, 64),
) -> DataFrame:
    """Hurst exponent per key via rescaled-range (R/S) analysis:
    chop the ordered series into complete blocks of each dyadic size,
    compute each block's range-of-cumulative-deviations over its
    standard deviation, average per size, and fit log(R/S) ~
    H*log(size) — H ~= 0.5 is a random walk, > 0.5 trending
    (persistent), < 0.5 mean-reverting. Returns (key, n_periods,
    rs_<size>... , hurst); hurst is NULL when any size has no
    complete non-constant block.

    Exactness discipline: within a block of size n, deviations are
    scaled by n (D_i = n*x_i - sum) so cumulative deviations, their
    range, and sum-of-squares are all int64; R/S = range /
    sqrt(sd2/n) is one double expression per block, micro-quantized
    before the per-size average. The four sizes are log2-equally
    spaced, so the regression slope collapses to the closed form
    (3*(y_8k - y_k) + (y_4k - y_2k)) / (10*ln2) over nano-quantized
    log R/S values — an integer numerator, no cross-row double sum
    anywhere. Requires ln(2^k) spacing: ``sizes`` must be four
    consecutive powers of two.

    Scale: everything partitions by (key, size, block); the widest
    frame is len(sizes) copies of the period-grain series.
    """
    if len(sizes) != 4 or any(
        sizes[i + 1] != 2 * sizes[i] for i in range(3)
    ):
        raise ValueError("sizes must be 4 consecutive powers of two")
    wkey = Window.partitionBy("_k").orderBy(order_col)
    base = series.select(
        F.col(key_col).alias("_k"),
        order_col,
        F.col(value_q_col).alias("_x"),
    ).withColumn("_rn", F.row_number().over(wkey))
    sized = base.crossJoin(
        F.broadcast(
            base.sparkSession.createDataFrame(
                [(s,) for s in sizes], "size long"
            )
        )
    ).select(
        "_k",
        "size",
        order_col,
        "_x",
        "_rn",
        # integer div, NOT double-divide + cast: Spark's double->long
        # cast truncates while DuckDB's rounds — div sidesteps both
        F.expr("(_rn - 1) div size").alias("_blk"),
    )
    wblk = Window.partitionBy("_k", "size", "_blk")
    wcum = wblk.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = (
        sized.withColumn("_bs", F.sum("_x").over(wblk))
        .withColumn("_bn", F.count(F.lit(1)).over(wblk))
        .filter(F.col("_bn") == F.col("size"))
        .withColumn(
            "_d", F.col("size") * F.col("_x") - F.col("_bs")
        )
        .withColumn("_cd", F.sum("_d").over(wcum))
    )
    blocks = dev.groupBy("_k", "size", "_blk").agg(
        (F.max("_cd") - F.min("_cd")).alias("_rng"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sd2"),
    )
    rs = blocks.select(
        "_k",
        "size",
        F.round(
            F.col("_rng").cast("double")
            / F.sqrt(
                F.when(F.col("_sd2") > 0, F.col("_sd2"))
                .cast("double")
                / F.col("size")
            )
            * 1000000.0
        )
        .cast("long")
        .alias("_rsq"),
    ).filter(F.col("_rsq").isNotNull())
    per_size = rs.groupBy("_k", "size").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        F.sum("_rsq").alias("_srs"),
    )
    avg_rs = F.col("_srs").cast("double") / F.col("_cnt") / 1000000.0
    pivoted = per_size.select(
        "_k",
        "size",
        F.round(avg_rs, 6).alias("_rs"),
        F.round(F.log(avg_rs) * 1000000000.0).cast("long").alias("_yq"),
    )
    aggs = []
    for s in sizes:
        aggs.append(
            F.max(F.when(F.col("size") == s, F.col("_rs"))).alias(
                f"rs_{s}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("size") == s, F.col("_yq"))).alias(
                f"_y{s}"
            )
        )
    n_per = base.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_periods")
    )
    wide = pivoted.groupBy("_k").agg(*aggs)
    s1, s2, s3, s4 = sizes
    num = (
        3 * (F.col(f"_y{s4}") - F.col(f"_y{s1}"))
        + (F.col(f"_y{s3}") - F.col(f"_y{s2}"))
    )
    return (
        n_per.join(wide, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n_periods",
            *[F.col(f"rs_{s}") for s in sizes],
            F.round(
                num.cast("double")
                / 10000000000.0
                / 0.6931471805599453,
                9,
            ).alias("hurst"),
        )
    )


# Shared engine/oracle expression text (parity rule). Aliases
# (n_steps, sx, sy, sxx, sxy) are fixed by ar1_halflife's moments.
AR1_BETA_EXPR = (
    "((CAST(n_steps AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CASE WHEN CAST(n_steps AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0"
    "     THEN CAST(n_steps AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) END))"
)
AR1_HALFLIFE_EXPR = (
    f"(CASE WHEN {AR1_BETA_EXPR} > 0 AND {AR1_BETA_EXPR} < 1"
    f" THEN -ln(2) / ln({AR1_BETA_EXPR}) END)"
)


def ar1_halflife(
    df: DataFrame,
    key_col: str,
    order_col: str,
    xq_col: str,
) -> DataFrame:
    """Mean-reversion half-life per key from an AR(1) fit: regress
    x_t on x_{t-1} (OLS, closed-form moments), then
    halflife = -ln(2) / ln(beta) for 0 < beta < 1 — the number of
    steps for a shock to decay halfway back, the standard
    mean-reversion speed statistic (Ornstein-Uhlenbeck discretized).
    Returns (key, n_steps, beta, halflife); beta NULL when var(lag)
    is zero, halflife NULL outside (0, 1) (non-reverting series).

    One lag window per key over the already-aggregated O(periods)
    series, then per-key exact int64 moments (n, sums, squares,
    cross) — same shape as the rolling-beta family. The big products
    n*sxy - sx*sy compute in DOUBLE after casting each factor (the
    moment-product convention, docs/SCALE_NOTES.md).
    """
    w = Window.partitionBy("k").orderBy("_o")
    lagged = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("_o"),
            F.col(xq_col).cast("long").alias("_y"),
        )
        .withColumn("_x", F.lag("_y").over(w))
        .filter(F.col("_x").isNotNull())
    )
    m = lagged.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    return m.select(
        F.col("k"),
        "n_steps",
        F.round(F.expr(AR1_BETA_EXPR), 9).alias("beta"),
        F.round(F.expr(AR1_HALFLIFE_EXPR), 9).alias("halflife"),
    )


def backtest_folds(
    df: DataFrame,
    key_col: str,
    day_col: str,
    n_folds: int = 4,
    horizon: int = 14,
) -> DataFrame:
    """Rolling-origin backtest fold assignment — the time-series
    cross-validation split (never shuffle-split a series: training on
    the future leaks). Fold i trains on days <= cut_i and tests on
    the next ``horizon`` days, where the cuts advance evenly across
    the span that leaves room for the last test window:
    cut_i = mn + base + i * step (exact integer day arithmetic off
    the global [mn, mx] day range, so both engines draw identical
    boundaries). Returns one row per (key, fold): n_train, n_test,
    train_end (epoch day).

    One scalar min/max aggregate broadcast onto the scan, a literal
    fold frame crossed in, then a single groupBy — the fold fan-out
    multiplies rows by n_folds before the aggregation, never
    afterwards; no windows. Degenerate case: a day span shorter than
    ``horizon`` yields a negative step (cuts before the span start,
    empty training sets) — defined and engine-consistent because div
    truncates identically on both engines (python // floors; see the
    property test), but such a series is too short to backtest."""
    spark = df.sparkSession
    span = df.agg(
        F.min(day_col).alias("_mn"), F.max(day_col).alias("_mx")
    )
    folds = spark.createDataFrame(
        [(i,) for i in range(n_folds)], "fold long"
    )
    j = (
        df.select(
            F.col(key_col).alias("key"), F.col(day_col).alias("_d")
        )
        .crossJoin(F.broadcast(span))
        .crossJoin(F.broadcast(folds))
    )
    # usable span for cuts: everything except the final horizon
    base = f"(((_mx - _mn + 1) - {horizon}) div {n_folds})"
    cut = f"(_mn + {base} * (fold + 1) - 1)"
    tagged = j.select(
        "key",
        "fold",
        F.expr(f"CASE WHEN _d <= {cut} THEN 1 ELSE 0 END").alias(
            "_tr"
        ),
        F.expr(
            f"CASE WHEN _d > {cut} AND _d <= {cut} + {horizon}"
            " THEN 1 ELSE 0 END"
        ).alias("_te"),
        F.expr(cut).alias("train_end"),
    )
    return (
        tagged.groupBy("key", "fold", "train_end")
        .agg(
            F.sum("_tr").cast("long").alias("n_train"),
            F.sum("_te").cast("long").alias("n_test"),
        )
        .select("key", "fold", "train_end", "n_train", "n_test")
    )
