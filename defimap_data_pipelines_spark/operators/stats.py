"""Statistical-test operators: Welch's t and the chi-square
independence test, in engine-exact form.

The reference surface has no test-statistic operators (greenfield per
SURVEY.md §7); the formulas are the textbook ones (Welch 1947;
Pearson 1900). What this module adds over "just write the formula" is
the cross-engine determinism discipline:

- all COUNTS/SUMS are exact int64 (values quantized to integer cents
  before any aggregation) — order-insensitive in both engines;
- per-cell/per-group float math happens AFTER aggregation, on O(groups)
  rows, as identical expression trees of exact ints (IEEE ops on the
  same inputs are bit-identical across JVM and DuckDB);
- any SUM over float contributions is quantized to integer micro-units
  per term first, so the one remaining order-sensitive accumulation is
  again an integer sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_t_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantum: int = 100,
) -> DataFrame:
    """Welch's unequal-variance t statistic for EVERY ordered pair of
    groups (a < b by name): t = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b),
    plus the Welch–Satterthwaite degrees of freedom.

    One scan: per-group (n, sum, sum of squares) as exact ints, then a
    broadcast self-join of the O(groups) stats frame builds the pairs
    — the raw table is never joined. Variance via the sum-of-squares
    identity v = (ssq - s^2/n) / (n-1) in double over exact ints.
    int64 headroom: ssq needs n * (quantum*max)^2 < 9.2e18 — cents on
    ~500-unit values hold to ~3e9 rows per group; quantize coarser
    beyond.
    """
    q = F.round(F.col(value_col) * quantum).cast("long")
    stats = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q).alias("s"),
            F.sum(q * q).alias("ssq"),
        )
        .filter(F.col("n") >= 2)
    )
    a = stats.select(
        F.col("g").alias("g_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("ssq").alias("ssq_a"),
    )
    b = stats.select(
        F.col("g").alias("g_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("ssq").alias("ssq_b"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    var = lambda s, ssq, n: (  # noqa: E731
        F.col(ssq).cast("double")
        - F.col(s).cast("double") * F.col(s) / F.col(n)
    ) / (F.col(n) - 1)
    out = (
        a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
        .withColumn("_se2a", var("s_a", "ssq_a", "n_a") / F.col("n_a"))
        .withColumn("_se2b", var("s_b", "ssq_b", "n_b") / F.col("n_b"))
        .select(
            "g_a",
            "g_b",
            "n_a",
            "n_b",
            # t is scale-invariant: quantized units cancel between the
            # numerator and the sqrt'd denominator, so no de-scaling
            F.round(
                (mean("s_a", "n_a") - mean("s_b", "n_b"))
                / F.sqrt(F.col("_se2a") + F.col("_se2b")),
                9,
            ).alias("t"),
            F.round(
                (F.col("_se2a") + F.col("_se2b"))
                * (F.col("_se2a") + F.col("_se2b"))
                / (
                    F.col("_se2a") * F.col("_se2a") / (F.col("n_a") - 1)
                    + F.col("_se2b") * F.col("_se2b") / (F.col("n_b") - 1)
                ),
                6,
            ).alias("df"),
        )
    )
    return out


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square statistic for independence of two
    categorical columns, one row out: (chi2, dof, n).

    Contingency counts in one groupBy; marginals by re-aggregating the
    O(cells) counts frame (never rescanning raw rows); expected counts
    E = R*C/N in double over exact ints. The cell contributions
    (O-E)^2/E are floats, so summing them directly would be
    order-sensitive — each is quantized to integer micro-units first
    and the total is an exact integer sum (the module's standing
    trick). chi2 is reported in those micro-units / 1e6.
    """
    # cells is O(categories^2) tiny but derives from a full scan;
    # four consumers (contrib, both marginals, total) would re-scan
    # the raw table four times without the cache (the bigram_lift
    # one-pass lesson).
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("o")).cache()
    rows = cells.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("c").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    contrib = (
        cells.join(F.broadcast(rows), "r")
        .join(F.broadcast(cols), "c")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_e",
            F.col("rt").cast("double") * F.col("ct") / F.col("n"),
        )
        .withColumn(
            "_chi_u",
            F.round(
                (F.col("o") - F.col("_e"))
                * (F.col("o") - F.col("_e"))
                / F.col("_e")
                * 1_000_000
            ).cast("long"),
        )
    )
    nr = rows.agg(F.count(F.lit(1)).cast("long").alias("nr"))
    nc = cols.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    return (
        contrib.agg(F.sum("_chi_u").alias("_cu"), F.max("n").alias("n"))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            (F.col("_cu").cast("double") / 1_000_000).alias("chi2"),
            ((F.col("nr") - 1) * (F.col("nc") - 1))
            .cast("long")
            .alias("dof"),
            "n",
        )
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
) -> DataFrame:
    """Gini concentration coefficient of ``value_col`` within each
    group — "is this source's token mass spread evenly or carried by
    a few giant documents?", the inequality metric curation reports
    track per slice. Uses the order-statistics identity

        G = (2 * sum(i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))

    with x sorted ascending and rank i from a window ordered by
    (value, tie_col). The rank-weighted sum is TIE-SAFE: permuting
    equal values among their positions leaves sum(i * x) unchanged
    (the tied block contributes x * sum(positions) either way), so
    any total order gives the same G — the tie column only pins the
    per-row rank for the oracle replay. All sums exact int64; one
    double division per group.

    Shape: one window sort per group + one groupBy — the same cost as
    any per-group ranking; no self-joins, no O(n^2) pair sums.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(value_col, tie_col)
    ranked = df.select(
        group_col,
        F.col(value_col).cast("long").alias("_x"),
        F.row_number().over(w).cast("long").alias("_i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_i") * F.col("_x")).alias("six"),
    )
    g = (
        (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    return agg.select(
        group_col, "n", "sx", F.round(g, 9).alias("gini")
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation of ``x_col`` vs ``y_col`` within each
    group, EXACT until one final double expression.

    Ties get average ranks (the standard rho-b estimator). Average
    ranks are half-integers, so everything runs on DOUBLED ranks:
    r2 = 2*RANK() + (ties - 1), an integer both engines compute from
    the same (min-rank, tie-count) windows. Centering uses the closed
    form sum(r2) = n*(n+1) exactly (tie blocks preserve rank sums), so
    c = r2 - (n+1) gives sum(c) = 0 and

        rho = sum(cx*cy) / sqrt(sum(cx^2) * sum(cy^2))

    with all three sums exact int64 — order-insensitive in both
    engines — and one sqrt/division at the end. |c| <= n keeps the
    squared sums under int64 to ~2e6 rows PER GROUP; beyond that,
    pre-aggregate to a coarser grain first (a correlation over more
    points than that is insensitive to the aggregation anyway).

    Groups with zero variance in either variable (all-tied) are
    dropped — rho is undefined there, and emitting an engine-specific
    inf/NULL would break replay.

    Shape: two rank windows + one tie-count window per variable over
    the grouped sort, then a single groupBy — the same cost class as
    gini_by_group; no self-joins.
    """
    from pyspark.sql.window import Window

    n_w = Window.partitionBy(group_col)
    out = df.select(group_col, x_col, y_col)
    for col, tag in ((x_col, "x"), (y_col, "y")):
        rw = Window.partitionBy(group_col).orderBy(col)
        tw = Window.partitionBy(group_col, col)
        r2 = (
            2 * F.rank().over(rw)
            + F.count(F.lit(1)).over(tw)
            - 1
        ).cast("long")
        out = out.withColumn(f"_r{tag}", r2)
    out = out.withColumn(
        "_n", F.count(F.lit(1)).over(n_w).cast("long")
    )
    cx = F.col("_rx") - (F.col("_n") + 1)
    cy = F.col("_ry") - (F.col("_n") + 1)
    agg = (
        out.select(
            group_col,
            cx.alias("_cx"),
            cy.alias("_cy"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_cx") * F.col("_cy")).alias("sxy"),
            F.sum(F.col("_cx") * F.col("_cx")).alias("sxx"),
            F.sum(F.col("_cy") * F.col("_cy")).alias("syy"),
        )
        .filter((F.col("sxx") > 0) & (F.col("syy") > 0))
    )
    rho = F.col("sxy").cast("double") / F.sqrt(
        F.col("sxx").cast("double") * F.col("syy").cast("double")
    )
    return agg.select(group_col, "n", F.round(rho, 9).alias("rho"))


def mannwhitney_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantum: int = 100,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) for EVERY ordered pair of
    groups (a < b by name), tie-corrected, exact integers end to end.

    The textbook route ranks the combined sample per pair — G^2 sorts
    of raw rows. This runs ONE groupBy to value-block counts
    (g, vq, cnt) with vq = round(value * quantum), then joins the
    O(V*G) counts frame to the O(G^2) pair list and computes, per
    pair, the doubled rank-sum from block arithmetic:

        R2 = sum_blocks cnt_a * (2*cum_before + blk + 1)

    (every member of a tie block takes the block's average rank;
    doubling keeps the half-integer average ranks in int64). Then
    2U = R2 - n_a*(n_a + 1), and the normal approximation uses the
    tie-corrected variance

        var = n_a*n_b/12 * ((N+1) - T/(N*(N-1))),  T = sum(t^3 - t)

    computed in double from exact int64 sums (T from the same block
    counts). No continuity correction (documented; both engines would
    apply it identically anyway, but the raw z replays cleaner).

    Scale shape: raw rows are scanned once; the per-pair window runs
    over value blocks (V rows), partitioned by pair — at 100 TB the
    heavy lifting is the one groupBy; the pair expansion is
    O(G^2 * V) on an already-aggregated frame.
    """
    from pyspark.sql.window import Window

    vq = F.round(F.col(value_col) * quantum).cast("long")
    counts = (
        df.groupBy(F.col(group_col).alias("g"), vq.alias("vq"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .cache()  # feeds the pair list AND the tagged join below
    )
    groups = counts.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .join(
            F.broadcast(groups.select(F.col("g").alias("g_b"))),
            F.col("g_a") < F.col("g_b"),
        )
    )
    tagged = counts.join(
        F.broadcast(pairs),
        (F.col("g") == F.col("g_a")) | (F.col("g") == F.col("g_b")),
    )
    blocks = tagged.groupBy("g_a", "g_b", "vq").agg(
        F.sum("cnt").alias("blk"),
        F.sum(
            F.when(F.col("g") == F.col("g_a"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("cnt_a"),
    )
    w = (
        Window.partitionBy("g_a", "g_b")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = blocks.withColumn(
        "_cumbef", F.coalesce(F.sum("blk").over(w), F.lit(0))
    )
    agg = stepped.groupBy("g_a", "g_b").agg(
        F.sum("cnt_a").alias("n_a"),
        (F.sum("blk") - F.sum("cnt_a")).alias("n_b"),
        F.sum(
            F.col("cnt_a")
            * (2 * F.col("_cumbef") + F.col("blk") + 1)
        ).alias("r2"),
        F.sum(
            F.col("blk") * F.col("blk") * F.col("blk") - F.col("blk")
        ).alias("t_ties"),
    )
    u2 = F.col("r2") - F.col("n_a") * (F.col("n_a") + 1)
    n = F.col("n_a") + F.col("n_b")
    var = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("t_ties").cast("double") / (n * (n - 1))
        )
    )
    z = (
        (u2.cast("double") / 2.0)
        - F.col("n_a").cast("double") * F.col("n_b") / 2.0
    ) / F.sqrt(var)
    return (
        agg.filter(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0)
        )
        .select(
            "g_a",
            "g_b",
            "n_a",
            "n_b",
            u2.alias("u2"),
            F.round(z, 9).alias("z"),
        )
    )


def kaplan_meier_curve(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimator per group — the retention
    curve with right-censoring done properly (users still active at
    the observation cutoff inform the at-risk counts without being
    counted as churn).

    Input: one row per subject with integer ``duration_col`` and
    ``observed_col`` in {0, 1} (1 = the terminal event happened,
    0 = censored). Per (group, duration): tot subjects ending, dth
    observed deaths. At-risk via one descending window (at_risk(d) =
    subjects with duration >= d); survival through the standard
    product, replayed cross-engine in log space:

        S(t) = exp( sum_{d<=t} ln((at_risk - dth)/at_risk) )

    with each ln term quantized to integer NANO-units before the one
    order-sensitive cumulative sum (the bigram_perplexity trick —
    IEEE ln of identical double ratios differs by far less than the
    1e-9 grid, and the running total is an exact integer sum both
    engines window identically).

    Steps where at_risk == dth (everyone left dies at the maximum
    duration) would take ln(0), whose engine behavior differs
    (-inf vs NULL) — those steps and everything after are dropped;
    survival is exactly 0 beyond them and the caller knows it from
    the at_risk == dth tail row being absent.

    Shape: one groupBy to O(groups * distinct-durations), two windows
    on that bounded frame. Aggregate subjects first — never window
    the raw event table.
    """
    from pyspark.sql.window import Window

    per_dur = df.groupBy(
        F.col(group_col).alias("g"),
        F.col(duration_col).cast("long").alias("dur"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("tot"),
        F.sum(F.col(observed_col).cast("long")).alias("dth"),
    )
    w_risk = (
        Window.partitionBy("g")
        .orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risky = per_dur.withColumn("at_risk", F.sum("tot").over(w_risk))
    steps = risky.filter(
        (F.col("dth") > 0) & (F.col("at_risk") > F.col("dth"))
    ).withColumn(
        "_ln_nano",
        F.round(
            F.log(
                (F.col("at_risk") - F.col("dth")).cast("double")
                / F.col("at_risk")
            )
            * 1_000_000_000
        ).cast("long"),
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        steps.withColumn("_cum", F.sum("_ln_nano").over(w_cum))
        .select(
            F.col("g").alias(group_col),
            "dur",
            "at_risk",
            "dth",
            F.round(
                F.exp(F.col("_cum").cast("double") / 1_000_000_000), 9
            ).alias("survival"),
        )
    )


def rank_buckets(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    k: int,
    out_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Equal-frequency bucket id in [0, k) by explicit integer rank
    arithmetic: bucket = ((rank - 1) * k) div n with rank from a
    (value, tie) total order. NTILE's "first buckets get the extra
    row" convention is engine-defined folklore; this formula is two
    integer ops both engines compute identically, which is what lets
    quantile-bucket features (RFM segments, decile caps) survive an
    oracle replay. Adds ``out_col`` to all input columns.
    """
    from pyspark.sql.window import Window

    part = (
        [partition_col] if partition_col is not None else []
    )
    w = Window.partitionBy(*part).orderBy(value_col, tie_col)
    cnt = Window.partitionBy(*part).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rn = (F.row_number().over(w) - 1).cast("long") * k
    n = F.count(F.lit(1)).over(cnt).cast("long")
    return df.withColumn("_rk", rn).withColumn("_nn", n).withColumn(
        out_col, F.expr("_rk div _nn")
    ).drop("_rk", "_nn")
