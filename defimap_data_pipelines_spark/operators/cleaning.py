"""Cleaning operators for the bronze -> silver hop
(aave_extract.py:679-694).

- fillna_zero: df[["aave_apy","liquidity_index"]].fillna(0.0)
  (aave_extract.py:685,691)
- interpolate_linear: pandas df.interpolate(method="linear",
  limit_direction="forward") (aave_extract.py:686-694), re-expressed as
  pure window functions so it runs distributed with no Python in the
  loop:

    prev value/index  = last(x ignorenulls)  over preceding rows
    next value/index  = first(x ignorenulls) over following rows
    interior gap      -> prev + (next-prev) * (i-pi)/(ni-pi)
    trailing NULLs    -> prev (pandas linear interpolate forward-fills
                          past the last valid observation)
    leading NULLs     -> stay NULL (limit_direction="forward")

Windows partition by ``name`` (per-strategy series, SURVEY.md §2.5).

The "next" lookups are computed over a DESCENDING cumulative frame
(last ignorenulls), not a currentRow->unboundedFollowing frame: Spark
executes unbounded-following ("shrinking") frames by re-aggregating
the remaining rows for EVERY row — O(n^2) per partition — while
cumulative ("growing") frames update incrementally in O(n). Same
results (dates are unique within a partition), ~10x faster at 12k
rows, and the gap widens with partition size. Cost: one extra
in-partition sort, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fillna_zero(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.fillna(0.0, subset=cols)


def interpolate_linear(
    df: DataFrame,
    cols: list[str],
    partition_col: str = "name",
    order_col: str = "date",
) -> DataFrame:
    w = Window.partitionBy(partition_col).orderBy(order_col)
    wprev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # descending growing frame == "nearest following non-null", O(n)
    wnext = (
        Window.partitionBy(partition_col)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    df = df.withColumn("_idx", F.row_number().over(w))
    for c in cols:
        prev_v = F.last(c, ignorenulls=True).over(wprev)
        prev_i = F.last(
            F.when(F.col(c).isNotNull(), F.col("_idx")), ignorenulls=True
        ).over(wprev)
        next_v = F.last(c, ignorenulls=True).over(wnext)
        next_i = F.last(
            F.when(F.col(c).isNotNull(), F.col("_idx")), ignorenulls=True
        ).over(wnext)
        interp = prev_v + (next_v - prev_v) * (
            (F.col("_idx") - prev_i) / (next_i - prev_i)
        ).cast("double")
        df = df.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(prev_v.isNull(), F.lit(None))
            .when(next_v.isNull(), prev_v)
            .otherwise(interp),
        )
    return df.drop("_idx")


def quantile_normalize_dims(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """Quantile normalization across embedding dimensions (the
    Bolstad et al. 2003 microarray recipe applied to feature columns):
    every dimension's values are replaced by the ACROSS-DIMENSION mean
    of the order statistics at their rank, so afterwards all
    dimensions share exactly the same marginal distribution — the
    heavy-tailed-dimension fix batch-norm can't give you offline.

    Exact arithmetic: values quantize to integer micro-units, the
    reference value at each rank is the truncating integer mean
    (sum div n_dims), ranks break ties by (value, id) — fully
    deterministic, SQL-replayable. Returns (id, dim, ref_q): the
    normalized value of vector ``id``'s ``dim`` in micro-units.

    Shape: posexplode to (n x d) rows — the honest layout for
    columnar statistics — then one window rank PER DIMENSION
    (partitioned, parallel across dims) and one groupBy(rank) whose
    output is n rows joined back by rank. Two shuffles total; no
    driver collection.
    """
    from pyspark.sql.window import Window

    x = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "_val"),
    ).select(
        "id",
        "dim",
        F.round(F.col("_val").cast("double") * micro)
        .cast("long")
        .alias("_q"),
    )
    w = Window.partitionBy("dim").orderBy("_q", "id")
    ranked = x.withColumn("_rk", F.row_number().over(w))
    ref = ranked.groupBy("_rk").agg(
        F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("_d")
    ).select("_rk", F.expr("_s div _d").alias("ref_q"))
    return ranked.join(ref, "_rk").select("id", "dim", "ref_q")


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """Weighted isotonic regression per group via Pool-Adjacent-
    Violators (Barlow et al. 1972) — the calibration-curve fitter:
    the least-squares NON-DECREASING step function through
    (x, mean(y)) points, e.g. P(convert | score-bucket) that a
    monotone model is allowed to output.

    Exactness: ``y_col`` must already be integer (quantize first —
    indicator labels are the common case). Points pre-aggregate to
    per-(group, x) (sum, count); PAVA runs on the O(buckets) frame
    inside applyInPandas with pool-merge decisions by INTEGER
    cross-multiplication (s_prev * c_cur > s_cur * c_prev — no float
    ever), and the fitted value is (pool_sum * micro) div pool_count,
    truncated — so the whole fit replays exactly.

    A stack algorithm has no SQL twin, but the fit does: the minimax
    identity y_hat(k) = max_{i<=k} min_{j>=k} mean(y[i..j]) turns
    PAVA into an O(B^3) interval join an oracle can run — and
    truncation COMMUTES with min/max (it is monotone), so quantized
    minimax == quantized pool means bit-for-bit. The registered
    query's oracle does exactly that.

    Scale: the heavy input collapses in the one groupBy; PAVA itself
    touches B rows per group (keep B bounded — it is a CURVE, not a
    table). Groups partition freely.

    Returns (group, x, n, y_hat_micro), one row per distinct x.
    """
    import pandas as pd

    agg = df.groupBy(
        F.col(group_col).alias("_g"), F.col(x_col).alias("_x")
    ).agg(
        F.sum(F.col(y_col).cast("long")).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_c"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_x", kind="stable")
        ss = pdf["_s"].tolist()
        cs = pdf["_c"].tolist()
        # pools: [sum, count, n_points]
        pools: list[list[int]] = []
        for s, c in zip(ss, cs):
            pools.append([s, c, 1])
            while (
                len(pools) > 1
                and pools[-2][0] * pools[-1][1]
                > pools[-1][0] * pools[-2][1]
            ):
                s2, c2, k2 = pools.pop()
                pools[-1][0] += s2
                pools[-1][1] += c2
                pools[-1][2] += k2
        fitted = []
        for s, c, k in pools:
            m = s * micro
            q = -((-m) // c) if m < 0 else m // c  # trunc, not floor
            fitted.extend([q] * k)
        return pd.DataFrame(
            {
                "g": pdf["_g"],
                "x": pdf["_x"],
                "n": cs,
                "y_hat_micro": fitted,
            }
        )

    g_t = agg.schema["_g"].dataType.simpleString()
    x_t = agg.schema["_x"].dataType.simpleString()
    out = agg.groupBy("_g").applyInPandas(
        run, f"g {g_t}, x {x_t}, n long, y_hat_micro long"
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("x").alias(x_col),
        "n",
        "y_hat_micro",
    )


def target_encoding(
    df: DataFrame,
    category_col: str,
    target_q_col: str,
    smoothing: int = 100,
    quantum: int = 100,
) -> DataFrame:
    """Smoothed mean target encoding of a categorical column — the
    feature-engineering standard for high-cardinality categories:
    enc(c) = (sum_c + m * global_mean) / (n_c + m), shrinking rare
    categories toward the global mean so a 2-row category can't
    memorize its targets. Returns (category, n, raw_mean, encoded)
    with m = ``smoothing`` (in rows).

    The target must arrive integer-quantized (``target_q_col``).
    Both outputs are TRUNCATED integer divisions scaled by 1e4 (so
    the reported values carry 4 + log10(quantum) exact decimal
    places): a ROUND() over the raw rational s/n can land exactly on
    a decimal-tie of its double representation, where Spark's
    HALF_UP BigDecimal and DuckDB's float rounding disagree by 1 ulp
    (seen live at sf0.001, category 8: ...780.5 rounded both ways).
    Truncated div has no tie to disagree on. The global mean rides
    as gm4 = S * 1e4 div N (a deterministic <=1e-4-quantum-unit
    bias, identical both engines). Int64 headroom: sum_c * 1e4 <
    9.2e18 — ~$9e12 of cents per category; lift to decimal beyond.

    Leakage note: this is the FIT step (per-category table). For
    honest training features, fit on one fold and join onto another
    — the operator returns the table precisely so callers can do
    that split themselves.
    """
    per = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(target_q_col)).cast("long").alias("_sc"),
    )
    tot = df.agg(
        F.count(F.lit(1)).cast("long").alias("_nn"),
        F.sum(F.col(target_q_col)).cast("long").alias("_ss"),
    )
    j = per.crossJoin(F.broadcast(tot)).withColumn(
        "_gm4", F.expr("_ss * 10000 div _nn")
    )
    raw4 = F.expr("_sc * 10000 div n")
    enc4 = F.expr(
        f"(_sc * 10000 + {smoothing} * _gm4) div (n + {smoothing})"
    )
    scale = 10000.0 * quantum
    return j.select(
        "category",
        "n",
        (raw4.cast("double") / scale).alias("raw_mean"),
        (enc4.cast("double") / scale).alias("encoded"),
    )
