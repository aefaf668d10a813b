"""Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB corpus job cannot use ``df.sample()`` for anything that must be
reproducible across reruns, engines, or partition layouts: Spark's
sampler is seeded per-partition, so adding one input file reshuffles
every assignment. Everything here derives from a *content-keyed* hash
(md5 of a stable key column), so a row's split/sample membership is a
pure function of the row — stable under repartitioning, incremental
appends, and even engine migration (md5 is engine-neutral, unlike
xxhash64/murmur which only Spark exposes).

Reference parity: the reference pipelines have no sampling operators
(SURVEY.md §2.6 — no TABLESAMPLE); this module is part of the
training-data extension surface. The hash-mod idiom is the standard
deterministic-holdout trick from public data-pipeline practice.

Scale notes: the bucket expression is a pure per-row projection —
no shuffle, fully whole-stage-codegen'd, and it pushes nothing *less*
down (filters on ``split``/membership sit on top of the scan). A
stratified variant that needed exact per-stratum counts would require a
window/shuffle; we keep the fraction-based form precisely to stay
shuffle-free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash buckets the unit interval is quantized into. 10_000
#: gives 0.01% granularity for split weights while staying far below
#: 2^32 (we parse 8 hex chars = 32 bits of md5).
BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in ``[0, buckets)`` from md5 of ``key``'s string form.

    Parses the first 8 hex chars of md5 — ``conv(..., 16, 10)`` on the
    Spark side; the DuckDB oracle twin is
    ``('0x' || substr(md5(x), 1, 8))::BIGINT % buckets``.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def bucket_sql(key_expr: str, buckets: int = BUCKETS) -> str:
    """DuckDB-dialect twin of :func:`hash_bucket` (for oracle SQL)."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def split_column(
    key: Column, weights: dict[str, float], buckets: int = BUCKETS
) -> Column:
    """CASE expression assigning each row a split label from ``weights``.

    ``weights`` maps label -> fraction; fractions must sum to 1. Labels
    are assigned in iteration order over contiguous bucket ranges, so
    e.g. ``{"train": .8, "val": .1, "test": .1}`` puts buckets
    [0, 8000) in train, [8000, 9000) in val, the rest in test.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(key, buckets)
    expr: Column | None = None
    edge = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        edge += weights[label]
        cond = b < int(round(edge * buckets))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(labels[-1])
    return last if expr is None else expr.otherwise(last)


def split_case_sql(
    key_expr: str, weights: dict[str, float], buckets: int = BUCKETS
) -> str:
    """DuckDB twin of :func:`split_column`."""
    b = bucket_sql(key_expr, buckets)
    edge = 0.0
    arms = []
    labels = list(weights)
    for label in labels[:-1]:
        edge += weights[label]
        arms.append(f"WHEN {b} < {int(round(edge * buckets))} THEN '{label}'")
    return "CASE " + " ".join(arms) + f" ELSE '{labels[-1]}' END"


def train_val_test_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Stamp a deterministic train/val/test label on every row."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(F.col(key), weights))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep a stable ``fraction`` of rows, chosen by content hash.

    Unlike ``df.sample``, re-running on a superset of the data keeps
    every previously-sampled row (append-stable holdouts).
    """
    return df.filter(
        hash_bucket(F.col(key), buckets) < int(round(fraction * buckets))
    )


def stratified_sample(
    df: DataFrame,
    strata: str,
    key: str,
    fractions: dict[str, float],
    default: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` made stable).

    ``fractions`` maps a stratum value to its keep-fraction; strata not
    listed fall back to ``default``. Still a pure per-row filter — the
    stratum threshold comes from a CASE over ``strata``, not a join or
    window, so the 100 TB plan is scan → filter with zero shuffles.
    """
    thr: Column = F.lit(int(round(default * buckets)))
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata) == value
        t = int(round(frac * buckets))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = thr if expr is None else expr.otherwise(thr)
    return df.filter(hash_bucket(F.col(key), buckets) < thr)


def mixture_resample(
    df: DataFrame,
    strata: str,
    key: str,
    rates: dict[str, float],
    default: float = 1.0,
    buckets: int = BUCKETS,
    copy_col: str = "copy",
) -> DataFrame:
    """Materialize a source-mixture resample: per-stratum rate ``r``
    emits each row ``floor(r)`` times plus one more for the stable
    ``frac(r)`` fraction of keys — i.e. downsampling (r < 1) AND
    epoch-style upsampling (r > 1, the "2.3 epochs of Wikipedia"
    mixture idiom) in one operator. ``copy_col`` numbers the emitted
    copies 0..k-1 so downstream shuffles can keep copies distinct.

    Deterministic: membership of the fractional copy is the same
    content-keyed md5 bucket as every sampler here, so a rerun (or an
    incremental append) reproduces byte-identical output. The emit is
    a per-row ``explode(sequence(...))`` — no shuffle, no join; the
    100 TB plan stays scan -> project -> generate.
    """
    expr = F.lit(int(default * buckets))
    case = None
    for value, rate in rates.items():
        t = int(round(rate * buckets))
        cond = F.col(strata) == value
        case = F.when(cond, t) if case is None else case.when(cond, t)
    thr = case.otherwise(expr) if case is not None else expr
    # copies = floor(r) + (bucket < frac(r)); thr is r scaled by buckets
    whole = F.floor(thr / F.lit(buckets)).cast("int")
    frac_thr = thr - whole * F.lit(buckets)
    n_copies = whole + F.when(
        hash_bucket(F.col(key), buckets) < frac_thr, 1
    ).otherwise(0)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def deterministic_group_cap(
    df: DataFrame,
    group: str,
    key: str,
    k: int,
    salt_partitions: int = 32,
    out_col: str = "rank_in_group",
) -> DataFrame:
    """Cap each group at ``k`` rows, chosen deterministically — the
    domain-capping rule of corpus curation (no single web domain may
    contribute more than K documents), with selection keyed on the md5
    of ``key`` so reruns and incremental appends pick a stable subset.

    Scale shape: a plain ``row_number() OVER (PARTITION BY group)``
    funnels a hot group (the big web crawl) through ONE task. This is
    the salted two-stage top-k instead: stage 1 ranks within
    (group, salt) partitions — ``salt_partitions``-way parallel even
    inside one group — and keeps k candidates per salt; stage 2 ranks
    the <= k * salt_partitions survivors per group. Single-task state
    is bounded by max(group_rows / salt_partitions, k * salt_partitions)
    regardless of group skew. Both stages order by (md5(key), key), a
    total order, so the result is EXACTLY the naive single-window
    form's (asserted in tests).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(key).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(salt_partitions))
    w1 = Window.partitionBy(group, "_salt").orderBy(h.asc(), F.col(key).asc())
    w2 = Window.partitionBy(group).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn(out_col, F.row_number().over(w2))
        .filter(F.col(out_col) <= k)
        .drop("_salt", "_r1")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    max_weight: int = 64,
    draw_col: str = "draw",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement in EXACT integer
    arithmetic (Efraimidis & Spirakis 2006, A-ES), for integer
    weights: each row enters the exponential race with
    ``max_{j=1..w} U_j`` where the U_j are md5-derived 60-bit
    uniforms — ranking that maximum DESCENDING is distribution-
    identical to ranking A-ES keys ``u^(1/w)`` (min of w Exp(1)
    clocks = Exp(w); -ln is monotone), but needs NO pow/log: the draw
    stays a 60-bit integer, so the sample — inclusion decisions,
    order, everything — replays bit-identically in a SQL oracle.
    Float-keyed A-ES cannot promise that (libm pow differs in ulps
    across engines).

    Cost: one explode to ``w`` rows per input (weights are capped at
    ``max_weight``; the intended weights are small integers — quality
    tiers, duplication counts, per-domain caps), one max-aggregate,
    then a distributed top-n (TakeOrdered: per-partition heaps + one
    driver merge — no global sort).

    Returns the n sampled rows as (key, weight, draw) ordered by
    draw DESC; draw is kept so downstream can re-verify the race.
    """
    # clamp into [1, max_weight]: Spark's sequence(1, 0) would emit a
    # DESCENDING [1, 0] rather than an empty array, silently giving
    # zero-weight rows a draw — and the oracle's range(1, 1) is empty
    w = F.least(
        F.greatest(F.col(weight_col).cast("int"), F.lit(1)),
        F.lit(max_weight),
    )
    drawn = (
        df.select(
            F.col(key),
            F.col(weight_col).cast("long").alias(weight_col),
            F.explode(F.sequence(F.lit(1), w)).alias("_j"),
        )
        .select(
            key,
            weight_col,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col(key).cast("string"),
                            F.col("_j").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("_u"),
        )
        .groupBy(key, weight_col)
        .agg(F.max("_u").alias(draw_col))
    )
    return drawn.orderBy(F.col(draw_col).desc(), F.col(key).asc()).limit(n)


def weighted_sample_sql(
    key_expr: str, weight_expr: str, n: int, max_weight: int = 64
) -> str:
    """DuckDB twin of :func:`weighted_sample` (FROM-clause supplied by
    the caller as ``{src}``)."""
    return f"""
    WITH e AS (
        SELECT {key_expr} AS k, CAST({weight_expr} AS BIGINT) AS w,
               unnest(range(1, least(greatest(
                   CAST({weight_expr} AS INTEGER), 1),
                   {max_weight}) + 1)) AS j
        FROM {{src}}
    ),
    d AS (
        SELECT k, w,
               MAX(('0x' || substr(md5(CAST(k AS VARCHAR)
                    || '|' || CAST(j AS VARCHAR)), 1, 15))::BIGINT)
                   AS draw
        FROM e GROUP BY 1, 2
    )
    SELECT k, w, draw FROM d ORDER BY draw DESC, k ASC LIMIT {n}
    """


def epoch_shuffle(
    df: DataFrame,
    epoch: int | list[int],
    key: str = "doc_id",
    shard_size: int | None = None,
    out: str = "position",
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: every epoch
    permutes the corpus by ``md5(epoch || '|' || key)`` — a different,
    reproducible total order per epoch with no RNG state to persist
    (the property a distributed data loader needs: any worker can
    recompute any epoch's order from the epoch number alone).

    ``out`` is the 0-based global position in the epoch order;
    ``shard_size`` additionally assigns ``shard = position //
    shard_size`` (contiguous ranges of the shuffled order -> shard
    files). The global rank comes from the two-pass parallel prefix
    sum (packing.global_cumsum), never a single-task global window,
    and md5 keys replay exactly in a SQL oracle — no floats anywhere.

    ``epoch`` may be a LIST of epochs: all of them then share ONE
    prefix-sum pass (an ``epoch`` output column is added). Ordering by
    (epoch, md5 key) makes the global rank epoch-contiguous, and every
    epoch holds exactly |df| rows, so the within-epoch position is
    just ``rank - 1 - epoch_index * n`` — a projection, not another
    shuffle. Planning E epochs costs one range shuffle instead of E.
    """
    from defimap_data_pipelines_spark.operators.packing import (
        global_cumsum,
    )

    # Sort + de-duplicate: the global rank below is ordered by epoch
    # VALUE ascending, so the subtracted per-epoch offset must use the
    # epoch's rank among SORTED distinct epochs — an unsorted or
    # duplicated list (e.g. [3, 1]) would otherwise map epoch 1 to
    # offset 1*n while its ranks start at 0, yielding negative
    # positions (round-4 advice item).
    single = not isinstance(epoch, list)
    epochs = sorted(set(epoch if isinstance(epoch, list) else [epoch]))
    n = df.count()
    exploded = df.withColumn(
        "epoch",
        F.explode(F.array(*[F.lit(e).cast("int") for e in epochs])),
    )
    keyed = exploded.withColumn(
        "_ek",
        F.md5(F.concat_ws("|", F.col("epoch").cast("string"),
                          F.col(key).cast("string"))),
    ).withColumn("_one", F.lit(1).cast("long"))
    # epoch_index among sorted distinct epochs (values need not be
    # 0..E-1, but the offset must follow the rank sort order above)
    eidx = F.array_position(
        F.array(*[F.lit(e).cast("int") for e in epochs]), F.col("epoch")
    ) - 1
    ranked = global_cumsum(
        keyed,
        [F.col("epoch").asc(), F.col("_ek").asc(), F.col(key).asc()],
        "_one",
        out="_rank",
    )
    ranked = ranked.withColumn(
        out, (F.col("_rank") - 1 - eidx * F.lit(n)).cast("long")
    ).drop("_ek", "_one", "_rank")
    if shard_size is not None:
        ranked = ranked.withColumn(
            "shard", (F.col(out) / F.lit(shard_size)).cast("long")
        )
    return ranked.drop("epoch") if single else ranked


#: Poisson(1) CDF at 15-bit resolution: w = #{k : u >= _POISSON_T[k]}
#: for a uniform u in [0, 32768). Tail truncated at w = 7
#: (P ~ 1e-5; the bias is far below bootstrap resolution).
_POISSON_T = (12055, 24109, 30137, 32146, 32648, 32749, 32765)


def _boot_word(key, i: int, lo: bool):
    """60-bit word from md5(key || '|i'): hex chars [1..15] (lo) or
    [16..30] — two words per md5, four 15-bit uniforms per word."""
    start = 1 if lo else 16
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(i)))),
            start,
            15,
        ),
        16,
        10,
    ).cast("long")


def _boot_word_sql(key_expr: str, i: int, lo: bool) -> str:
    start = 1 if lo else 16
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '|{i}'),"
        f" {start}, 15))::BIGINT)"
    )


def poisson_weight(word, slot: int):
    """Poisson(1) weight from 15-bit slot ``slot`` (0..3) of a word:
    w = sum of (u >= T_k) indicator casts — branch-free, identical
    arithmetic both engines."""
    u = F.shiftright(word, 15 * slot).bitwiseAND(F.lit(32767))
    w = None
    for t in _POISSON_T:
        ind = (u >= F.lit(t)).cast("int")
        w = ind if w is None else w + ind
    return w


def poisson_weight_sql(word_expr: str, slot: int) -> str:
    u = f"((({word_expr}) >> {15 * slot}) & 32767)"
    return (
        "("
        + " + ".join(f"CAST({u} >= {t} AS INT)" for t in _POISSON_T)
        + ")"
    )


def poisson_bootstrap_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    resamples: int = 32,
    quantum: int = 100,
) -> DataFrame:
    """Deterministic Poisson bootstrap confidence interval for the
    mean — the resampling CI that works in ONE distributed pass:
    instead of materializing B resamples, each row carries B
    independent Poisson(1) weights (the classic "Poisson bootstrap"
    of Chamandy et al. / the streaming-bootstrap literature), so all
    B resample means come out of a single aggregate.

    Determinism is the point: the weights derive from md5(key || b)
    bits (15-bit uniforms through an integer-threshold Poisson CDF),
    so the "randomness" replays bit-for-bit in a SQL oracle — a
    bootstrap you can value-hash-check. Per resample, S_b = sum(w*xq)
    and N_b = sum(w) are exact int64; the B means are identical
    doubles both engines; the CI is (2nd smallest, 2nd largest) of
    the sorted means — ~94% coverage at B = 32, documented rather
    than interpolated (quantile interpolation conventions differ
    across engines; order statistics don't).

    Scale: one scan, 2*B integer sums, md5 count = ceil(B/8) per row
    (each md5 yields eight 15-bit uniforms — the ams_f2 bit-slicing
    lesson). No shuffle at all: the aggregate is a scalar.

    Contract: n must be >> B (an all-zero resample yields a NULL
    mean, dropped from the order statistics; below ~100 rows use the
    exact percentile machinery instead).
    """
    if not 1 <= resamples <= 64:
        raise ValueError("resamples must be in [1, 64]")
    key = F.col(key_col)
    xq = F.round(F.col(value_col) * quantum).cast("long")
    words = df.select(
        xq.alias("_xq"),
        *[
            _boot_word(key, i, lo).alias(f"_w{i}_{int(lo)}")
            for i in range((resamples + 7) // 8)
            for lo in (True, False)
        ],
    )
    # A flat 2B-sum aggregate (one S_b/N_b column pair per resample)
    # builds a B-proportional expression forest: at B = 32 the stage
    # lost whole-stage codegen (Janino 64KB method limit) and
    # measured 4-6 s at sf0.1. Instead ONE small transform() lambda
    # derives all B weights, posexplode turns them into (b, w) rows,
    # and a tiny groupBy(b) aggregates — expression size is CONSTANT
    # in B and the same query runs in 1.0 s min-of-3. Element 0 is a
    # sentinel weight-1 "resample" that carries the full-sample n
    # and sum through the same single scan.
    n_words = (resamples + 7) // 8
    arr = ", ".join(
        f"_w{i}_{int(lo)}"
        for i in range(n_words)
        for lo in (True, False)
    )
    thr = ", ".join(str(t) for t in _POISSON_T)
    word_ix = (
        "CAST(b div 8 * 2"
        " + (CASE WHEN b % 8 < 4 THEN 0 ELSE 1 END) + 1 AS INT)"
    )
    u15 = (
        f"(shiftright(element_at(array({arr}), {word_ix}),"
        " (b % 4) * 15) & 32767)"
    )
    wexpr = (
        f"concat(array(1), transform(sequence(0, {resamples - 1}),"
        f" b -> size(filter(array({thr}), t -> {u15} >= t))))"
    )
    per = (
        words.select("_xq", F.posexplode(F.expr(wexpr)).alias("b", "w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w").cast("long") * F.col("_xq")).alias("sb"),
            F.sum(F.col("w").cast("long")).alias("nb"),
        )
        .cache()  # 1 + resamples rows; two consumers below
    )
    stats = per.filter(F.col("b") == 0).select(
        F.col("nb").alias("n"), F.col("sb").alias("_s")
    )
    ms = (
        per.filter((F.col("b") > 0) & (F.col("nb") > 0))
        .select(
            (
                F.col("sb").cast("double") / F.col("nb") / quantum
            ).alias("_m")
        )
        .agg(F.array_sort(F.collect_list("_m")).alias("_ms"))
    )
    return stats.crossJoin(F.broadcast(ms)).select(
        "n",
        F.round(
            F.col("_s").cast("double") / F.col("n") / quantum, 9
        ).alias("mean"),
        F.round(F.try_element_at(F.col("_ms"), F.lit(2)), 9).alias(
            "ci_lo"
        ),
        F.round(
            F.try_element_at(F.col("_ms"), F.size(F.col("_ms")) - 1), 9
        ).alias("ci_hi"),
        F.lit(resamples).cast("int").alias("resamples"),
    )


def permutation_mean_test(
    df: DataFrame,
    key_col: str,
    label_col,
    value_col: str,
    resamples: int = 32,
    quantum: int = 100,
) -> DataFrame:
    """Deterministic permutation test for a two-group difference in
    means (the Fisher-Pitman idea): re-label every row B times with
    md5-derived coin flips and ask how often the |mean_A - mean_B|
    of a random split reaches the observed one. Returns one row
    (n_a, n_b, t_obs, n_valid, n_extreme, p_value) with p = (1 +
    #extreme) / (n_valid + 1), the add-one convention that keeps a
    Monte-Carlo p strictly positive.

    This is the UNCONDITIONAL variant — each permutation draws
    Bernoulli(1/2) labels rather than preserving exact group sizes
    (exact-size permutation needs a per-resample global sort;
    binomial relabeling is one scan and converges to the same test
    for n >> 1, documented). Degenerate resamples (a side empty) are
    dropped from both counts.

    Same replayable-randomness scheme as poisson_bootstrap_mean: one
    md5 per row, B sign bits sliced from the 60-bit word, observed
    labels ride as resample 0 of the same posexplode (expression
    size constant in B — the Janino lesson), so all B+1 splits cost
    ONE scan and 4 integer sums per split. |T| values are rounded to
    9 places before the >= comparison, the cross-engine threshold
    discipline.
    """
    if not 1 <= resamples <= 59:
        raise ValueError("resamples must be in [1, 59]")
    key = F.col(key_col)
    xq = F.round(F.col(value_col) * quantum).cast("long")
    y = F.when(label_col, 1).otherwise(0).cast("long")
    rows = df.select(
        xq.alias("_xq"),
        y.alias("_y"),
        _boot_word(key, 0, True).alias("_w"),
    )
    wexpr = (
        f"concat(array(_y), transform(sequence(0, {resamples - 1}),"
        " b -> shiftright(_w, b) & 1))"
    )
    per = (
        rows.select("_xq", F.posexplode(F.expr(wexpr)).alias("b", "bit"))
        .groupBy("b")
        .agg(
            F.sum(F.col("bit") * F.col("_xq")).alias("_s1"),
            F.sum("bit").alias("_n1"),
            F.sum("_xq").alias("_s"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
    )
    t = (
        F.col("_s1").cast("double") / F.col("_n1") / quantum
        - (F.col("_s") - F.col("_s1")).cast("double")
        / (F.col("_n") - F.col("_n1"))
        / quantum
    )
    valid = (
        per.filter(
            (F.col("_n1") > 0) & (F.col("_n") - F.col("_n1") > 0)
        )
        .select(
            "b",
            F.col("_n1").alias("_na"),
            (F.col("_n") - F.col("_n1")).alias("_nb"),
            F.round(t, 9).alias("_t"),
            F.round(F.abs(t), 9).alias("_tabs"),
        )
        .cache()  # observed row + resample rows
    )
    obs = valid.filter(F.col("b") == 0).select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.col("_t").alias("t_obs"),
        F.col("_tabs").alias("_tabs_obs"),
    )
    perm = (
        valid.filter(F.col("b") > 0)
        .crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max("t_obs").alias("t_obs"),
            F.count(F.lit(1)).cast("long").alias("n_valid"),
            F.sum(
                (F.col("_tabs") >= F.col("_tabs_obs")).cast("long")
            ).alias("n_extreme"),
        )
    )
    return perm.select(
        "n_a",
        "n_b",
        "t_obs",
        "n_valid",
        "n_extreme",
        F.round(
            (F.col("n_extreme") + 1).cast("double")
            / (F.col("n_valid") + 1).cast("double"),
            9,
        ).alias("p_value"),
    )
