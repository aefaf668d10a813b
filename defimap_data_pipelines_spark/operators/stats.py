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
