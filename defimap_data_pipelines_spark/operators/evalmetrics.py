"""Model-evaluation metrics as exact-integer rank arithmetic.

The missing last mile of a training-data pipeline: after curation
(dedup.py), quality scoring (textops.py), and split generation
(sampling.py), you evaluate whether a score column actually predicts
a label — AUC for discrimination, decile lift/gains for targeting.
Both are rank statistics, so the mannwhitney_u doubled-rank trick
(operators/stats.py) makes them pure int64 arithmetic: the only
float op is the final ratio.

Scale posture: everything aggregates to the score-DISTINCT level
first (one map-side-combining groupBy over the raw rows), so the
window passes run over an O(distinct scores) frame, not O(rows).
`lift_gains` needs a true per-row rank for its tie-break, but gets
it two-phase: a partitioned row_number WITHIN each score value plus
the block's cumulative offset — no global row-grained window ever
exists. Headroom (r8): rank-by-count products are ~2·n² —
rows-squared-scaled — so the doubled rank sums, marginal products
and nano-quantized precision sums accumulate in decimal(38,0)
(HUGEINT in the DuckDB oracles): exact, order-independent, ~1e38
headroom; rows-squared OUTPUT quantities (u2) emit as double.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _score_blocks(
    df: DataFrame, label_col, score_col: str, quantum: int
) -> DataFrame:
    """Collapse rows to (vq, cnt, pos): quantized-score blocks with
    row and positive counts — the O(distinct) substrate both metrics
    rank over.

    NULL scores are DROPPED (sklearn convention: a row without a
    score cannot be ranked). This is a correctness requirement, not
    hygiene: a NULL forms its own vq block and Spark places it
    NULLS FIRST under ASC while DuckDB places it NULLS LAST, so
    leaving it in shifts every non-null block's cumulative offset by
    the null count on one engine only (r9 bug-hunt finding,
    docs/ROUND9_NOTES.md §15: measured AUC 0.25 vs 0.5)."""
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(
            F.round(F.col(score_col) * quantum).cast("long").alias("vq"),
            F.when(label_col, 1).otherwise(0).cast("long").alias("y"),
        )
        .groupBy("vq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").alias("pos"),
        )
    )


def roc_auc(
    df: DataFrame,
    label_col,
    score_col: str,
    quantum: int = 100,
) -> DataFrame:
    """ROC AUC of ``score_col`` predicting boolean ``label_col``,
    tie-aware (ties contribute 1/2, the Mann-Whitney convention), as
    one row (n_pos, n_neg, auc, gini).

    AUC = (R₁ - n₁(n₁+1)/2) / (n₁n₀) where R₁ is the rank-sum of
    positives under average ranks. Per tied block at cumulative
    offset cb with cnt rows, the DOUBLED rank-sum contribution of its
    pos positives is pos·(2·cb + cnt + 1) — an exact integer — so
    2R₁ accumulates in int64 and AUC = (2R₁ - n₁(n₁+1)) / (2n₁n₀)
    divides once at the end. gini = 2·AUC - 1 (the accuracy-ratio
    form credit scoring reports).

    The ordered window runs over score-distinct blocks only; with a
    quantized score that's range-sized, not row-sized.
    """
    blocks = _score_blocks(df, label_col, score_col, quantum)
    w = Window.orderBy("vq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = blocks.select(
        "cnt",
        "pos",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cb"),
    )
    # headroom (r8): the doubled rank-sum is ROWS-SQUARED-scaled
    # (r2 ~ n^2, as are n1*(n1+1) and 2*n1*n0) — decimal(38,0)
    # accumulation (oracle: HUGEINT), exact and order-independent;
    # one double division at the end.
    agg = ranked.agg(
        F.sum("pos").alias("n1"),
        (F.sum("cnt") - F.sum("pos")).alias("n0"),
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("cb") + F.col("cnt") + 1)
        ).alias("r2"),
    )
    n1d = F.col("n1").cast("decimal(38,0)")
    auc = (F.col("r2") - n1d * (F.col("n1") + 1)).cast("double") / (
        (2 * n1d * F.col("n0")).cast("double")
    )
    return agg.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(auc, 9).alias("auc"),
        F.round(2 * auc - 1, 9).alias("gini"),
    )


def lift_gains(
    df: DataFrame,
    label_col,
    score_col: str,
    tiebreak_col: str,
    quantum: int = 100,
    n_bins: int = 10,
) -> DataFrame:
    """Decile lift / cumulative-gains table: rank rows by score
    descending, cut into ``n_bins`` equal-count bins, and report per
    bin (bin, n, pos, rate, lift, cum_gain). Bin 0's lift says "how
    much better than random is targeting the top decile"; cum_gain
    is the gains-curve y-axis.

    Determinism under ties: a row's global rank is the cumulative
    count of strictly-better scores (block offset, from the
    score-distinct frame) plus its row_number within its own score
    block ordered by ``tiebreak_col`` — exact, engine-independent,
    and never materialized as a global row-grained window (the
    within-block window is partitioned by score value). Bin =
    (rank-1)·n_bins div n, an integer decision.
    """
    vq = F.round(F.col(score_col) * quantum).cast("long")
    # NULL scores dropped (sklearn convention) — family-wide substrate
    # contract; see _score_blocks.
    rows = df.filter(F.col(score_col).isNotNull()).select(
        vq.alias("vq"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(label_col, 1).otherwise(0).cast("long").alias("y"),
    )
    blocks = rows.groupBy("vq").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wdesc = Window.orderBy(F.col("vq").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = blocks.select(
        "vq", (F.sum("cnt").over(wdesc) - F.col("cnt")).alias("off")
    )
    win_block = Window.partitionBy("vq").orderBy("_tb")
    ranked = (
        rows.join(offs, "vq")
        .select(
            "y",
            (F.col("off") + F.row_number().over(win_block)).alias("rk"),
        )
    )
    total = blocks.agg(F.sum("cnt").alias("_n"))
    binned = (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.expr(f"((rk - 1) * {n_bins}) div _n").alias("bin"), "y", "_n"
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").alias("pos"),
        )
    )
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = binned.select(
        "bin",
        "n",
        "pos",
        F.sum("pos").over(wcum).alias("cum_pos"),
        F.sum("pos").over(wall).alias("tp"),
        F.sum("n").over(wall).alias("tn"),
    )
    return out.select(
        "bin",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 9).alias("rate"),
        F.round(
            (F.col("pos").cast("double") * F.col("tn"))
            / (F.col("n").cast("double") * F.col("tp")),
            9,
        ).alias("lift"),
        F.round(
            F.col("cum_pos").cast("double") / F.col("tp"), 9
        ).alias("cum_gain"),
    )


def ndcg_weight_nano(rank: int) -> int:
    """round(1e9 / log2(rank+1)): the nano-quantized DCG position
    weight — exported so oracle SQL can embed the SAME int literals
    instead of trusting two engines' log2 to agree to the last ulp."""
    return round(1e9 / math.log2(rank + 1))


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    score_col,
    tiebreak_col: str,
    rel_col,
    k: int = 10,
) -> DataFrame:
    """Per-query NDCG@k of a ranking: rank candidates by
    ``score_col`` descending (``tiebreak_col`` ascending breaks ties
    deterministically), take the top k, and score
    DCG = sum(rel_i / log2(i+1)) against the ideal ordering's IDCG
    (relevance descending, same tie-break). Returns one row per query
    group: (query, n_cands, dcg, idcg, ndcg); a group with zero total
    relevance reports NULL ndcg (0/0 is "nothing to rank", not 0).

    Two windows, BOTH partitioned by the query key — rank fan-in is
    per-group, never global — over the same single scan (one
    projection computes both row_numbers). The log2 weights enter
    NANO-QUANTIZED: wq_i = round(1e9 / log2(i+1)) as int64 literals,
    so the DCG sums are exact integers (a float SUM's addition order
    is partition-dependent; an int sum is not) and dcg/idcg/ndcg each
    do exactly one float division at the end.
    """
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_tb").asc()
    )
    wr = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_tb").asc()
    )
    ranked = df.select(
        F.col(query_col).alias("_q"),
        score_col.alias("_s") if not isinstance(score_col, str)
        else F.col(score_col).alias("_s"),
        F.col(tiebreak_col).alias("_tb"),
        (rel_col if not isinstance(rel_col, str) else F.col(rel_col))
        .cast("long")
        .alias("_rel"),
    ).select(
        "_q",
        "_rel",
        F.row_number().over(wq).alias("_rk"),
        F.row_number().over(wr).alias("_ik"),
    )
    wq = [ndcg_weight_nano(i + 1) for i in range(k)]
    wgt_rk = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in wq]), F.col("_rk")
    )
    wgt_ik = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in wq]), F.col("_ik")
    )
    agg = ranked.groupBy(F.col("_q").alias("query")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"),
        F.sum(
            F.when(F.col("_rk") <= k, F.col("_rel") * wgt_rk).otherwise(
                F.lit(0)
            )
        ).alias("_dcgq"),
        F.sum(
            F.when(F.col("_ik") <= k, F.col("_rel") * wgt_ik).otherwise(
                F.lit(0)
            )
        ).alias("_idcgq"),
    )
    return agg.select(
        "query",
        "n_cands",
        F.round(F.col("_dcgq").cast("double") / 1e9, 9).alias("dcg"),
        F.round(F.col("_idcgq").cast("double") / 1e9, 9).alias("idcg"),
        F.round(
            F.col("_dcgq").cast("double")
            / F.when(F.col("_idcgq") > 0, F.col("_idcgq")),
            9,
        ).alias("ndcg"),
    )


def avg_precision_at_k(
    df: DataFrame,
    query_col: str,
    score_col,
    tiebreak_col: str,
    rel_bool,
    k: int = 10,
) -> DataFrame:
    """Per-query Average Precision@k with binary relevance: rank by
    score descending (tie-break ascending), AP = sum over relevant
    ranks i<=k of precision@i, divided by min(k, total relevant in
    the group). Returns (query, n_cands, n_rel, ap).

    EXACT-integer AP: precision@i = cum_rel_i / i sums as
    cum_rel_i * (L/i) where L = lcm(1..k) — every term is an int64,
    so the sum never depends on float addition order (a groupBy SUM
    of doubles is partition-order-nondeterministic; this one is not).
    One divide at the end: ap = sum / (L * min(k, n_rel)).
    """
    lcm = 1
    for i in range(1, k + 1):
        lcm = lcm * i // math.gcd(lcm, i)
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_tb").asc()
    )
    wcum = wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = df.select(
        F.col(query_col).alias("_q"),
        score_col.alias("_s") if not isinstance(score_col, str)
        else F.col(score_col).alias("_s"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(rel_bool, 1).otherwise(0).cast("long").alias("_y"),
    ).select(
        "_q",
        "_y",
        F.row_number().over(wq).alias("_rk"),
        F.sum("_y").over(wcum).alias("_cum"),
    )
    # integer weights L/i folded to a literal lookup array
    wgt = F.element_at(
        F.array(*[F.lit(lcm // (i + 1)) for i in range(k)]),
        F.col("_rk"),
    )
    agg = ranked.groupBy(F.col("_q").alias("query")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"),
        F.sum("_y").alias("n_rel"),
        F.sum(
            F.when(
                (F.col("_y") == 1) & (F.col("_rk") <= k),
                F.col("_cum") * wgt,
            ).otherwise(F.lit(0))
        ).alias("_num"),
    )
    denom = F.lit(lcm).cast("double") * F.least(
        F.lit(k).cast("long"), F.col("n_rel")
    )
    return agg.select(
        "query",
        "n_cands",
        "n_rel",
        F.round(
            F.col("_num").cast("double")
            / F.when(F.col("n_rel") > 0, denom),
            9,
        ).alias("ap"),
    )


def brier_calibration(
    df: DataFrame,
    pred_permille,
    label_bool,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table + per-bin Brier score for a probabilistic
    prediction: ``pred_permille`` is the prediction as an INTEGER in
    [0, 1000] (the caller quantizes — keeping the contract integer
    makes binning and the squared error exact), ``label_bool`` the
    outcome. Rows bin by predicted probability into ``n_bins`` equal
    ranges; each bin reports (bin, n, mean_pred, obs_rate, brier)
    where brier = mean((p - y)^2) over the bin — the calibration
    curve is mean_pred vs obs_rate, and sum(n*brier)/sum(n) is the
    overall Brier score.

    One map-side-combining aggregate: (p - 1000y)^2 is int64-exact
    (max 1e6 per row), so every engine bins and accumulates
    identically; the three final divides are the only floats.
    """
    p = (
        pred_permille
        if not isinstance(pred_permille, str)
        else F.col(pred_permille)
    ).cast("long")
    y = F.when(label_bool, 1).otherwise(0).cast("long")
    rows = df.select(
        p.alias("_p"),
        y.alias("_y"),
        # p*n_bins <= 1e4ish: the double division is exact, floor
        # makes the truncation explicit (Column has no // operator)
        F.least(
            F.floor(p * n_bins / F.lit(1000)),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
    )
    agg = rows.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_p").alias("_sp"),
        F.sum("_y").alias("_sy"),
        F.sum(
            (F.col("_p") - 1000 * F.col("_y"))
            * (F.col("_p") - 1000 * F.col("_y"))
        ).alias("_se"),
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("_sp").cast("double") / (F.col("n") * 1000.0), 9)
        .alias("mean_pred"),
        F.round(F.col("_sy").cast("double") / F.col("n"), 9).alias(
            "obs_rate"
        ),
        F.round(
            F.col("_se").cast("double") / (F.col("n") * 1000000.0), 9
        ).alias("brier"),
    )


def average_precision(
    df: DataFrame,
    label_col,
    score_col: str,
    quantum: int = 100,
) -> DataFrame:
    """Area under the precision-recall curve (average precision),
    tie-aware at the score-block level: walking score-DISTINCT
    blocks from best to worst, AP = sum_b (pos_b / n_pos) *
    precision_at_block_end — the step-integral sklearn convention
    with tied scores collapsed to one threshold. Returns one row
    (n_pos, n_neg, baseline, avg_precision); baseline = prevalence
    (the AP of a random scorer), the number AP must beat.

    The PR companion of roc_auc for imbalanced labels (AUC saturates
    when negatives dominate; AP doesn't). Same O(distinct scores)
    block substrate; each block's precision term is nano-quantized
    BEFORE the cross-block sum so the double reduction order can't
    leak, then one divide by n_pos at the end.
    """
    blocks = _score_blocks(df, label_col, score_col, quantum)
    w = Window.orderBy(F.col("vq").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = blocks.select(
        "pos",
        F.sum("cnt").over(w).alias("_ccnt"),
        F.sum("pos").over(w).alias("_cpos"),
    )
    termq = F.round(
        F.col("_cpos").cast("double") / F.col("_ccnt") * 1000000000.0
    ).cast("long")
    # headroom (r8): the nano-quantized precision sum is ~n_pos*1e9
    # (wraps int64 at ~9e9 positives) — decimal(38,0) accumulation
    # (oracle: HUGEINT)
    agg = stepped.select(
        "pos",
        "_ccnt",
        "_cpos",
        (F.col("pos").cast("decimal(38,0)") * termq).alias("_tq"),
    ).agg(
        F.max("_cpos").alias("n1"),
        (F.max("_ccnt") - F.max("_cpos")).alias("n0"),
        F.sum("_tq").alias("_stq"),
    )
    n1 = F.col("n1")
    return agg.select(
        n1.alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(
            n1.cast("double") / (n1 + F.col("n0")).cast("double"), 9
        ).alias("baseline"),
        F.round(
            F.col("_stq").cast("double") / n1 / 1000000000.0, 9
        ).alias("avg_precision"),
    )


def cohens_kappa(
    df: DataFrame, rater_a, rater_b
) -> DataFrame:
    """Cohen's kappa between two categorical rating columns on the
    same rows — chance-corrected agreement ((p_o - p_e) / (1 - p_e)).
    The standard check that two labeling passes (two quality
    classifiers, a model vs a heuristic, two annotator cohorts)
    agree beyond what their marginal label rates force. Returns one
    row (n, observed_agreement, expected_agreement, kappa); kappa is
    NULL when p_e is exactly 1 (both raters constant — agreement is
    unfalsifiable).

    One groupBy to the O(categories^2) confusion frame; p_o and p_e
    are exact ratios (agree*N and sum of marginal products over
    N^2), so kappa = (agree*N - sum_rc) / (N^2 - sum_rc) divides
    exact integers once. Marginals come from the confusion frame,
    never a second scan. Headroom (r8): na*nb, agree*N and N^2 are
    ROWS-SQUARED-scaled — they compute in decimal(38,0) (oracle:
    HUGEINT), exact with ~1e38 headroom.
    """
    conf = (
        df.select(rater_a.alias("ra"), rater_b.alias("rb"))
        .groupBy("ra", "rb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .cache()  # feeds both marginals and the diagonal
    )
    ma = conf.groupBy("ra").agg(F.sum("c").alias("na"))
    mb = conf.groupBy("rb").agg(F.sum("c").alias("nb"))
    cross = (
        ma.join(
            F.broadcast(mb), F.col("ra") == F.col("rb"), "inner"
        )
        .agg(
            F.sum(
                F.col("na").cast("decimal(38,0)") * F.col("nb")
            ).alias("sum_rc")
        )
    )
    base = conf.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(F.lit(0))).alias(
            "agree"
        ),
    )
    j = base.crossJoin(F.broadcast(cross))
    n = F.col("n")
    nd = n.cast("decimal(38,0)")
    po = F.col("agree").cast("double") / n
    pe = F.col("sum_rc").cast("double") / (nd * n).cast("double")
    kappa = (
        F.col("agree").cast("decimal(38,0)") * n - F.col("sum_rc")
    ).cast("double") / (nd * n - F.col("sum_rc")).cast("double")
    return j.select(
        n.alias("n"),
        F.round(po, 9).alias("observed_agreement"),
        F.round(pe, 9).alias("expected_agreement"),
        F.round(
            F.when(nd * n - F.col("sum_rc") > 0, kappa), 9
        ).alias("kappa"),
    )


def forecast_mase(
    df: DataFrame,
    key_col: str,
    order_col: str,
    xq_col: str,
    season: int = 7,
) -> DataFrame:
    """MASE (mean absolute SCALED error, Hyndman & Koehler) of the
    seasonal-naive forecaster per key: MAE of the lag-``season``
    forecast divided by the in-sample MAE of the one-step naive —
    the scale-free forecast-skill metric (< 1 beats naive). Returns
    (key, n_scored, mase); NULL when the naive MAE is zero (a
    constant series has no scale).

    One lag window per key over the already-aggregated O(periods)
    series; both MAE numerators are exact integer |diff| sums, the
    single division is the only float. The two means use their own
    row counts (rows where the respective lag exists), the standard
    estimator on a truncated sample."""
    w = Window.partitionBy("k").orderBy("_o")
    lagged = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("_o"),
        F.col(xq_col).cast("long").alias("_y"),
    ).select(
        "k",
        "_o",
        "_y",
        F.lag("_y", 1).over(w).alias("_l1"),
        F.lag("_y", season).over(w).alias("_ls"),
    )
    m = lagged.groupBy("k").agg(
        F.sum(F.when(F.col("_ls").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_scored"),
        F.sum(F.abs(F.col("_y") - F.col("_ls"))).alias("_sf"),
        F.sum(F.when(F.col("_l1").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("_nn"),
        F.sum(F.abs(F.col("_y") - F.col("_l1"))).alias("_sn"),
    )
    mase = (
        "((CAST(_sf AS DOUBLE) / n_scored)"
        " / (CAST(CASE WHEN _sn > 0 THEN _sn END AS DOUBLE) / _nn))"
    )
    return m.select(
        F.col("k"),
        "n_scored",
        F.round(F.expr(mase), 9).alias("mase"),
    )


def conformal_interval(
    df: DataFrame,
    key_col: str,
    order_col: str,
    xq_col: str,
    season: int = 7,
    cal_pct_num: int = 7,
    cal_pct_den: int = 10,
    cov_num: int = 9,
    cov_den: int = 10,
) -> DataFrame:
    """Split-conformal interval calibration for the seasonal-naive
    forecaster, per key: the first cal_pct (by time) of scored
    periods calibrate q = the ceil((n_cal+1) * cov)-th smallest
    absolute residual (the finite-sample-valid conformal quantile),
    and the remaining periods report empirical coverage of
    |y - yhat| <= q — the distribution-free uncertainty wrapper any
    point forecaster gets for free. Returns (key, n_cal, n_test, q,
    coverage).

    Every selection is an integer decision (the var_cvar rank
    discipline): the calibration cut is rn <= (num*n) div den over a
    per-key time order, the quantile picks an exact rank over
    (residual, time) — engine-reproducible bit-for-bit; the only
    floats are the final q de-scale and coverage ratio."""
    w = Window.partitionBy("k").orderBy("_o")
    scored = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("_o"),
            F.col(xq_col).cast("long").alias("_y"),
        )
        .select(
            "k", "_o", "_y", F.lag("_y", season).over(w).alias("_f")
        )
        .filter(F.col("_f").isNotNull())
        .withColumn("_r", F.abs(F.col("_y") - F.col("_f")))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("k"))
        )
        .withColumn(
            "_cal",
            F.col("_rn")
            <= F.expr(f"({cal_pct_num} * _n) div {cal_pct_den}"),
        )
    )
    wq = Window.partitionBy("k").orderBy("_r", "_o")
    cal = (
        scored.filter(F.col("_cal"))
        .withColumn("_qr", F.row_number().over(wq))
        .withColumn(
            "_ncal", F.count(F.lit(1)).over(Window.partitionBy("k"))
        )
    )
    # ceil((n_cal+1)*cov) via integer arithmetic — div alone floors,
    # which at e.g. n_cal=10, cov=9/10 picks rank 9 instead of 10 and
    # loses the finite-sample coverage guarantee (r8 ADVICE fix; the
    # oracle SQL carries the identical +den-1 form)
    qsel = cal.filter(
        F.col("_qr")
        == F.least(
            F.col("_ncal"),
            F.expr(
                f"({cov_num} * (_ncal + 1) + {cov_den} - 1)"
                f" div {cov_den}"
            ),
        )
    ).select(
        "k", F.col("_r").alias("_q"), F.col("_ncal").alias("n_cal")
    )
    test = scored.filter(~F.col("_cal")).select("k", "_r")
    cov = (
        test.join(qsel, "k")
        .groupBy("k", "_q", "n_cal")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("_r") <= F.col("_q"), 1).otherwise(0)
            )
            .cast("long")
            .alias("_nc"),
        )
    )
    return cov.select(
        F.col("k"),
        "n_cal",
        "n_test",
        F.round(F.col("_q").cast("double") / 100.0, 9).alias("q"),
        F.round(
            F.col("_nc").cast("double") / F.col("n_test"), 9
        ).alias("coverage"),
    )


def pinball_loss(
    df: DataFrame,
    key_col: str,
    order_col: str,
    xq_col: str,
    season: int = 7,
    deciles: tuple = (1, 5, 9),
    quantum: int = 100,
) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecaster at
    the requested deciles — the metric that scores an UNCERTAINTY
    forecast (quantile q should over-predict exactly q of the time;
    pinball is its proper scoring rule). With q = k/10 the per-period
    loss is the exact integer k*(y-f) when y >= f else (10-k)*(f-y),
    summed in int64 and de-scaled ONCE by 10*quantum*n — no float
    accumulation. Returns (key, decile, n_scored, pinball).

    Same frame contract as forecast_mase: one lag window per key over
    the O(periods) series, then the decile list fans out as a literal
    broadcast frame BEFORE one map-side-combinable aggregation."""
    w = Window.partitionBy("k").orderBy("_o")
    scored = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("_o"),
            F.col(xq_col).cast("long").alias("_y"),
        )
        .select(
            "k", "_o", "_y", F.lag("_y", season).over(w).alias("_f")
        )
        .filter(F.col("_f").isNotNull())
    )
    spark = df.sparkSession
    dec = spark.createDataFrame(
        [(int(k),) for k in deciles], "decile long"
    )
    fanned = scored.crossJoin(F.broadcast(dec))
    loss = F.when(
        F.col("_y") >= F.col("_f"),
        F.col("decile") * (F.col("_y") - F.col("_f")),
    ).otherwise((10 - F.col("decile")) * (F.col("_f") - F.col("_y")))
    out = fanned.groupBy("k", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum(loss).cast("long").alias("_lq"),
    )
    return out.select(
        F.col("k"),
        "decile",
        "n_scored",
        F.round(
            F.col("_lq").cast("double")
            / 10.0
            / F.lit(float(quantum))
            / F.col("n_scored"),
            9,
        ).alias("pinball"),
    )


def qini_uplift(
    df: DataFrame,
    treat_col,
    response_col,
    score_col: str,
    quantum: int = 100,
    n_bins: int = 10,
) -> DataFrame:
    """Qini (cumulative uplift) table — the evaluation curve for
    uplift models, the treatment-aware sibling of lift_gains: rank
    everyone by score descending, and at each decile boundary report
    how many EXTRA responses the treated group shows over the
    control-rate expectation at the same depth:

        qini(d) = cum_resp_t(d) - cum_resp_c(d) * cum_n_t(d) / cum_n_c(d)

    Returns one row per occupied bin: (bin, cum_n_t, cum_n_c,
    cum_resp_t, cum_resp_c, qini); qini is NULL while the control
    side is still empty. A perfect uplift model front-loads qini; a
    random one grows it linearly to the endpoint.

    Determinism under ties: rows collapse to quantized-score blocks
    (O(distinct scores), the roc_auc substrate) carrying per-arm row
    and response counts; cumulative counts ride ONE ordered window
    over that block frame, and a block's bin is decided by its START
    offset — (off * n_bins) div n, an integer decision, so tied
    scores can never straddle engines differently. Every cumulative
    is int64; the two float ops (the control scaling and the ratio)
    run per output row.
    """
    rows = df.select(
        F.round(F.col(score_col) * quantum).cast("long").alias("vq"),
        F.when(treat_col, 1).otherwise(0).cast("long").alias("t"),
        F.when(response_col, 1).otherwise(0).cast("long").alias("y"),
    )
    blocks = rows.groupBy("vq").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("t").alias("nt"),
        F.sum(F.col("t") * F.col("y")).alias("rt"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("rc"),
    )
    wdesc = Window.orderBy(F.col("vq").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = blocks.select(
        (F.sum("cnt").over(wdesc) - F.col("cnt")).alias("off"),
        F.sum("nt").over(wdesc).alias("cnt_t"),
        (F.sum("cnt").over(wdesc) - F.sum("nt").over(wdesc)).alias(
            "cnt_c"
        ),
        F.sum("rt").over(wdesc).alias("crt"),
        F.sum("rc").over(wdesc).alias("crc"),
    )
    total = blocks.agg(F.sum("cnt").alias("_n"))
    binned = (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.expr(f"(off * {n_bins}) div _n").alias("bin"),
            "cnt_t",
            "cnt_c",
            "crt",
            "crc",
        )
        .groupBy("bin")
        .agg(
            # all four cumulatives are monotone in block order, so
            # max = the value at the bin's last block
            F.max("cnt_t").alias("cum_n_t"),
            F.max("cnt_c").alias("cum_n_c"),
            F.max("crt").alias("cum_resp_t"),
            F.max("crc").alias("cum_resp_c"),
        )
    )
    qini = F.col("cum_resp_t").cast("double") - F.col(
        "cum_resp_c"
    ).cast("double") * F.col("cum_n_t").cast("double") / F.col(
        "cum_n_c"
    ).cast("double")
    return binned.select(
        F.col("bin").cast("long").alias("bin"),
        "cum_n_t",
        "cum_n_c",
        "cum_resp_t",
        "cum_resp_c",
        F.round(F.when(F.col("cum_n_c") > 0, qini), 9).alias("qini"),
    )


def mrr_at_k(
    df: DataFrame,
    query_col: str,
    score_col,
    tiebreak_col: str,
    rel_bool,
    k: int = 10,
) -> DataFrame:
    """Corpus Mean Reciprocal Rank@k: rank each query group's
    candidates by ``score_col`` descending (``tiebreak_col``
    ascending breaks ties deterministically), find the FIRST relevant
    candidate's rank, and average 1/rank over all query groups
    (queries with no relevant candidate in the top k contribute 0 —
    the standard MRR convention). Returns ONE row
    (n_queries, n_hit, mrr).

    EXACT-integer MRR (the avg_precision_at_k LCM trick): 1/rank
    enters as the int64 literal L/rank with L = lcm(1..k), so the
    corpus sum is exact in any partition order; the single float
    division mrr = sum / (L * n_queries) happens on one row. The
    rank window partitions by the query key — per-group fan-in,
    never a global sort.
    """
    lcm = 1
    for i in range(1, k + 1):
        lcm = lcm * i // math.gcd(lcm, i)
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_tb").asc()
    )
    ranked = df.select(
        F.col(query_col).alias("_q"),
        score_col.alias("_s")
        if not isinstance(score_col, str)
        else F.col(score_col).alias("_s"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(rel_bool, 1).otherwise(0).cast("long").alias("_y"),
    ).select("_q", "_y", F.row_number().over(wq).alias("_rk"))
    # first relevant rank per query, restricted to the top k
    firsts = ranked.groupBy("_q").agg(
        F.min(
            F.when((F.col("_y") == 1) & (F.col("_rk") <= k), F.col("_rk"))
        ).alias("_frk")
    )
    wgt = F.element_at(
        F.array(*[F.lit(lcm // (i + 1)).cast("long") for i in range(k)]),
        F.col("_frk").cast("int"),
    )
    agg = firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.count("_frk").cast("long").alias("n_hit"),
        F.sum(F.when(F.col("_frk").isNotNull(), wgt).otherwise(F.lit(0)))
        .cast("long")
        .alias("_num"),
    )
    return agg.select(
        "n_queries",
        "n_hit",
        F.round(
            F.col("_num").cast("double")
            / (
                F.lit(float(lcm))
                * F.when(F.col("n_queries") > 0, F.col("n_queries"))
            ),
            9,
        ).alias("mrr"),
    )


def recall_at_k(
    df: DataFrame,
    query_col: str,
    score_col,
    tiebreak_col: str,
    rel_bool,
    k: int = 10,
) -> DataFrame:
    """Per-query Recall@k with binary relevance: rank by score
    descending (tie-break ascending), recall = |relevant in top k| /
    |relevant| — the retrieval-eval complement of avg_precision_at_k
    (which rewards ORDER inside the cut; recall only rewards making
    the cut). Returns one row per query group:
    (query, n_cands, n_rel, hits_k, recall); recall is NULL when the
    group has no relevant candidates (0/0 is "nothing to find").

    Pure integer counts from one partitioned rank window over one
    scan; the single float division per group happens on the
    O(queries) aggregate frame.
    """
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_tb").asc()
    )
    ranked = df.select(
        F.col(query_col).alias("_q"),
        score_col.alias("_s")
        if not isinstance(score_col, str)
        else F.col(score_col).alias("_s"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(rel_bool, 1).otherwise(0).cast("long").alias("_y"),
    ).select("_q", "_y", F.row_number().over(wq).alias("_rk"))
    agg = ranked.groupBy(F.col("_q").alias("query")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"),
        F.sum("_y").cast("long").alias("n_rel"),
        F.sum(
            F.when((F.col("_y") == 1) & (F.col("_rk") <= k), F.lit(1))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("hits_k"),
    )
    return agg.select(
        "query",
        "n_cands",
        "n_rel",
        "hits_k",
        F.round(
            F.col("hits_k").cast("double")
            / F.when(F.col("n_rel") > 0, F.col("n_rel")),
            9,
        ).alias("recall"),
    )


def logloss_nano_weights(n_bins: int) -> tuple[list[int], list[int]]:
    """Per-bin nano-quantized cross-entropy weights for
    ``logloss_binned``: bin b predicts the bin-center probability
    p_b = (2b+1)/(2*n_bins), and the per-row loss is the int64
    literal round(-ln(p_b)*1e9) (positive rows) or
    round(-ln(1-p_b)*1e9) (negative rows) — computed ONCE in Python
    and shared with the oracle SQL as literals, the
    ndcg_weight_nano discipline (two engines' ln() are never trusted
    to agree at the last ulp on data rows)."""
    pos, neg = [], []
    for b in range(n_bins):
        p = (2 * b + 1) / (2 * n_bins)
        pos.append(round(-math.log(p) * 1e9))
        neg.append(round(-math.log(1.0 - p) * 1e9))
    return pos, neg


def logloss_binned(
    df: DataFrame,
    pred_permille,
    label_bool,
    n_bins: int = 10,
) -> DataFrame:
    """Binned binary log loss (cross-entropy of the DISCRETIZED
    predictor): rows bin by predicted probability exactly as
    brier_calibration does, each bin predicts its center probability,
    and the loss of that binned predictor is
    mean(-y ln p_bin - (1-y) ln(1-p_bin)). Returns ONE row
    (n_rows, n_pos, log_loss). The deliberate binning makes the
    metric exactly replayable: the per-row loss is a LITERAL int64
    lookup (logloss_nano_weights), so the corpus sum is exact in any
    order and one float division ends it. The un-binned metric would
    need per-row ln() on data values — float row-aggregation, not
    oracle-able.

    Headroom: the per-row weight is ~3e9 nano-units at the extreme
    bins, so rows x weight wraps int64 at ~3e9 rows — the loss sum
    accumulates in decimal(38,0) (oracle: HUGEINT) via the
    degree_assortativity pattern: the per-row value STAYS int64 (it
    is a literal with a row-local bound), only the SUM widens.
    """
    pos_w, neg_w = logloss_nano_weights(n_bins)
    p = (
        pred_permille
        if not isinstance(pred_permille, str)
        else F.col(pred_permille)
    ).cast("long")
    y = F.when(label_bool, 1).otherwise(0).cast("long")
    rows = df.select(
        y.alias("_y"),
        F.least(
            F.floor(p * n_bins / F.lit(1000)),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
    )
    wp = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in pos_w]),
        (F.col("bin") + 1).cast("int"),
    )
    wn = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in neg_w]),
        (F.col("bin") + 1).cast("int"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(
            F.when(F.col("_y") == 1, wp)
            .otherwise(wn)
            .cast("decimal(38,0)")
        ).alias("_loss_nano"),
    )
    return agg.select(
        "n_rows",
        "n_pos",
        F.round(
            F.col("_loss_nano").cast("double")
            / 1e9
            / F.when(F.col("n_rows") > 0, F.col("n_rows")),
            9,
        ).alias("log_loss"),
    )
